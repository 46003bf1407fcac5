"""Fully-fused DDIM sampler: the whole reverse process in ONE Pallas kernel.

Motivation (measured on TPU v5e): the scan-based sampler is bound by
re-streaming the decoder's ~17 MB of fp32 weights from HBM on every one of
the 1000 denoising steps (~60 of the ~66 us/step).  This kernel loads the
oneway-cross-attention denoiser ONCE into VMEM (bf16, ~8.5 MB) and runs all
steps with a `fori_loop` inside the kernel: per-step work is pure
VMEM-resident MXU/VPU compute.

Scope: s2g_v2 / "default" memory layout + oneway_cross_attention decoder,
DDIM eta=0 (the operational sampling mode — deterministic, so no in-kernel
RNG), with optional seed-pose x0-blending folded in as two elementwise
tensors (a + b * x0_hat).  Everything else falls back to the scan sampler.

Computation per step (mirrors models/denoiser.py + models/decoders.py):
  token = emb_mem(step_mlp(temb[t])) + pe[0]
  mem   = [token ; precomputed emb_mem(speech)+pe[1:]]
  h     = emb_x(x) + pe[:T]
  4 x { pre-LN self-attn (dconv QKV) -> pre-LN cross-attn(mem) -> pre-LN FF }
  eps   = out_proj(LN(h));  x0 = c0*x - c1*eps;  x0 = blend(x0)
  x     = c2*x0 + c3*eps

Kernel-level optimizations over the straightforward translation (all
numerics-preserving up to fp reassociation; the kernel is VPU-bound at
these shapes, so most of them move work onto the otherwise-idle MXU or
delete VPU passes):
  * LayerNorm scale/bias are FOLDED into the following projection weights
    at pack time: z = norm(x)*s + b feeding zW + c equals norm(x)(s.W) +
    (bW + c), so the kernel's ln() is normalize-only.
  * Q/K/V projections are one (rows, D) x (D, 3D) matmul (self-attention;
    cross-attention uses a merged (D, 2D) K/V), and the Primer depthwise
    conv runs ONCE over the merged lanes.
  * The depthwise conv's row shifts are permutation-matrix MXU matmuls
    (exact; boundary zeroing baked into the loop-invariant matrices) —
    no f32 roll scratch, masks, or casts (see dconv()).
  * Per-clip, head-stacked attention: one score matmul + one softmax per
    clip covers all heads via lane-masked query stacking (see attention()).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PackedDenoiser(NamedTuple):
    """Stacked, padded weights for the fused kernel (L = n_layers).

    All LayerNorm affine terms are pre-folded into the projection weights
    that consume them (ln1 -> self qkv, ln2 -> cross q + kv, ln3 -> ff1,
    out_norm -> out head)."""

    # embeddings
    w_embx: jax.Array      # (Dp_pad, D)
    b_embx: jax.Array      # (1, D)
    pe_x: jax.Array        # (T, D)
    # timestep-token path
    w_sp1: jax.Array       # (D, D)
    b_sp1: jax.Array
    w_sp2: jax.Array
    b_sp2: jax.Array
    w_emm: jax.Array       # (D, D)  emb_mem
    b_emm: jax.Array
    pe_m0: jax.Array       # (1, D)
    # per-layer stacks
    self_wqkv: jax.Array   # (L, D, 3D)   ln1-folded
    self_bqkv: jax.Array   # (L, 1, 3D)
    self_dconv: jax.Array  # (L, 3, 3D)   [tap][q|k|v lanes] tiled across heads
    self_dbias: jax.Array  # (L, 1, 3D)
    self_wo: jax.Array     # (L, D, D)
    self_bo: jax.Array     # (L, 1, D)
    cross_wq: jax.Array    # (L, D, D)    ln2-folded
    cross_bq: jax.Array    # (L, 1, D)
    cross_wkv: jax.Array   # (L, D, 2D)   (memory side, no LN fold)
    cross_bkv: jax.Array   # (L, 1, 2D)
    cross_dq: jax.Array    # (L, 3, D)
    cross_dqb: jax.Array   # (L, 1, D)
    cross_dkv: jax.Array   # (L, 3, 2D)
    cross_dkvb: jax.Array  # (L, 1, 2D)
    cross_wo: jax.Array    # (L, D, D)
    cross_bo: jax.Array    # (L, 1, D)
    ff_w1: jax.Array       # (L, D, F)    ln3-folded
    ff_b1: jax.Array       # (L, 1, F)
    ff_w2: jax.Array       # (L, F, D)
    ff_b2: jax.Array       # (L, 1, D)
    # output head (out_norm-folded)
    w_out: jax.Array       # (D, Dp_pad)
    b_out: jax.Array       # (1, Dp_pad)


def _fold_ln(w: jax.Array, b: jax.Array, ln_scale: jax.Array,
             ln_bias: jax.Array):
    """(zW + b) with z = n*s + t  ->  n(W*s[:,None]) + (tW + b)."""
    w32 = w.astype(jnp.float32)
    w_f = w32 * ln_scale.astype(jnp.float32)[:, None]
    b_f = b.astype(jnp.float32) + ln_bias.astype(jnp.float32) @ w32
    return w_f, b_f


def pack_oneway_denoiser(
    params: dict,
    d_pose: int,
    t_window: int,
    weight_dtype=jnp.bfloat16,
) -> PackedDenoiser:
    """Flatten GestureDenoiser params (s2g_v2/oneway) into kernel stacks.

    d_pose is zero-padded to a multiple of 128 on both the input embedding
    and the output head (extra eps columns are discarded by the caller).
    """
    from ..models.attention import sinusoidal_position_encoding

    dec = params["decoder"]
    step = params["step_encoder"]
    d_model = dec["emb_x"]["kernel"].shape[1]
    if d_model % 128:
        raise ValueError("fused kernel requires d_model % 128 == 0 "
                         "(merged-QKV lane slicing)")
    dp_pad = _round_up(d_pose, 128)
    wd = weight_dtype

    def pad_rows(w, rows):
        return jnp.zeros((rows, w.shape[1]), w.dtype).at[: w.shape[0]].set(w)

    def pad_cols(w, cols):
        return jnp.zeros((w.shape[0], cols), w.dtype).at[:, : w.shape[1]].set(w)

    pe = jnp.asarray(sinusoidal_position_encoding(5000, d_model))

    layers = sorted((k for k in dec if k.startswith("layer")),
                    key=lambda s: int(s[len("layer"):]))

    def tiled_dconv(a, names):
        d_k = a["query_dconv"]["kernel"].shape[1]
        n_heads = d_model // d_k
        taps = jnp.concatenate(
            [jnp.tile(a[nm]["kernel"], (1, n_heads)) for nm in names], axis=1)
        bias = jnp.concatenate(
            [jnp.tile(a[nm]["bias"], (n_heads,))[None, :] for nm in names],
            axis=1)
        return taps, bias

    def stack_self():
        wqkv, bqkv, dconv, dbias, wo, bo = [], [], [], [], [], []
        for lk in layers:
            a = dec[lk]["self_attn"]
            ln = dec[lk]["norm_self_attn"]
            w3 = jnp.concatenate([a["query"]["kernel"], a["key"]["kernel"],
                                  a["value"]["kernel"]], axis=1)  # (D, 3D)
            b3 = jnp.concatenate([a["query"]["bias"], a["key"]["bias"],
                                  a["value"]["bias"]])[None, :]
            w3, b3 = _fold_ln(w3, b3, ln["scale"], ln["bias"])
            wqkv.append(w3)
            bqkv.append(b3)
            taps, bias = tiled_dconv(
                a, ("query_dconv", "key_dconv", "value_dconv"))
            dconv.append(taps)
            dbias.append(bias)
            wo.append(a["output"]["kernel"])
            bo.append(a["output"]["bias"][None, :])
        return (jnp.stack(wqkv).astype(wd), jnp.stack(bqkv).astype(wd),
                jnp.stack(dconv).astype(wd), jnp.stack(dbias).astype(wd),
                jnp.stack(wo).astype(wd), jnp.stack(bo).astype(wd))

    def stack_cross():
        wq, bq, wkv, bkv, dq, dqb, dkv, dkvb, wo, bo = ([] for _ in range(10))
        for lk in layers:
            a = dec[lk]["cross_attn"]
            ln = dec[lk]["norm_cross_attn"]
            w_q, b_q = _fold_ln(a["query"]["kernel"],
                                a["query"]["bias"][None, :],
                                ln["scale"], ln["bias"])
            wq.append(w_q)
            bq.append(b_q)
            wkv.append(jnp.concatenate([a["key"]["kernel"],
                                        a["value"]["kernel"]], axis=1))
            bkv.append(jnp.concatenate([a["key"]["bias"],
                                        a["value"]["bias"]])[None, :])
            taps_q, bias_q = tiled_dconv(a, ("query_dconv",))
            taps_kv, bias_kv = tiled_dconv(a, ("key_dconv", "value_dconv"))
            dq.append(taps_q)
            dqb.append(bias_q)
            dkv.append(taps_kv)
            dkvb.append(bias_kv)
            wo.append(a["output"]["kernel"])
            bo.append(a["output"]["bias"][None, :])
        return tuple(jnp.stack(x).astype(wd)
                     for x in (wq, bq, wkv, bkv, dq, dqb, dkv, dkvb, wo, bo))

    self_w = stack_self()
    cross_w = stack_cross()

    ff_w1, ff_b1 = [], []
    for lk in layers:
        w1, b1 = _fold_ln(dec[lk]["ff"]["layer1"]["kernel"],
                          dec[lk]["ff"]["layer1"]["bias"][None, :],
                          dec[lk]["norm_ff"]["scale"],
                          dec[lk]["norm_ff"]["bias"])
        ff_w1.append(w1)
        ff_b1.append(b1)
    ff_w1 = jnp.stack(ff_w1).astype(wd)
    ff_b1 = jnp.stack(ff_b1).astype(wd)
    ff_w2 = jnp.stack([dec[lk]["ff"]["layer2"]["kernel"] for lk in layers]).astype(wd)
    ff_b2 = jnp.stack([dec[lk]["ff"]["layer2"]["bias"][None, :] for lk in layers]).astype(wd)

    w_out, b_out = _fold_ln(pad_cols(dec["out_proj"]["kernel"], dp_pad),
                            pad_cols(dec["out_proj"]["bias"][None, :], dp_pad),
                            dec["out_norm"]["scale"], dec["out_norm"]["bias"])

    return PackedDenoiser(
        w_embx=pad_rows(dec["emb_x"]["kernel"], dp_pad).astype(wd),
        b_embx=dec["emb_x"]["bias"][None, :].astype(wd),
        pe_x=pe[:t_window].astype(jnp.float32),
        w_sp1=step["proj1"]["kernel"].astype(wd),
        b_sp1=step["proj1"]["bias"][None, :].astype(wd),
        w_sp2=step["proj2"]["kernel"].astype(wd),
        b_sp2=step["proj2"]["bias"][None, :].astype(wd),
        w_emm=dec["emb_mem"]["kernel"].astype(wd),
        b_emm=dec["emb_mem"]["bias"][None, :].astype(wd),
        pe_m0=pe[:1].astype(jnp.float32),
        self_wqkv=self_w[0], self_bqkv=self_w[1], self_dconv=self_w[2],
        self_dbias=self_w[3], self_wo=self_w[4], self_bo=self_w[5],
        cross_wq=cross_w[0], cross_bq=cross_w[1], cross_wkv=cross_w[2],
        cross_bkv=cross_w[3], cross_dq=cross_w[4], cross_dqb=cross_w[5],
        cross_dkv=cross_w[6], cross_dkvb=cross_w[7], cross_wo=cross_w[8],
        cross_bo=cross_w[9],
        ff_w1=ff_w1, ff_b1=ff_b1, ff_w2=ff_w2, ff_b2=ff_b2,
        w_out=w_out.astype(wd),
        b_out=b_out.astype(jnp.float32),
    )


def ddim_coefficients(sched) -> np.ndarray:
    """(S, 4) fp32: [sqrt_recip_acp, sqrt_recipm1_acp, sqrt(acp_prev),
    sqrt(1-acp_prev)] per step.  Pass the RESPACED schedule (the one
    ``make_diffusion(..., "ddimN")`` returns) — respacing is baked into its
    tables; the timestep_map only feeds the kernel's embedding lookup."""
    c = np.stack([
        np.asarray(sched.sqrt_recip_alphas_cumprod),
        np.asarray(sched.sqrt_recipm1_alphas_cumprod),
        np.sqrt(np.asarray(sched.alphas_cumprod_prev)),
        np.sqrt(1.0 - np.asarray(sched.alphas_cumprod_prev)),
    ], axis=1).astype(np.float32)
    return c


def ddpm_coefficients(sched) -> np.ndarray:
    """(S, 5) fp32 for ancestral sampling: [sqrt_recip_acp,
    sqrt_recipm1_acp, posterior_mean_coef1, posterior_mean_coef2,
    noise std exp(0.5*posterior_log_variance)] — the std column is zeroed
    at step 0 (no noise at t == 0).  ``fused_ddim_sample(stochastic=True)``
    requires this 5-column layout."""
    sigma = np.exp(0.5 * np.asarray(sched.posterior_log_variance_clipped))
    sigma[0] = 0.0
    c = np.stack([
        np.asarray(sched.sqrt_recip_alphas_cumprod),
        np.asarray(sched.sqrt_recipm1_alphas_cumprod),
        np.asarray(sched.posterior_mean_coef1),
        np.asarray(sched.posterior_mean_coef2),
        sigma,
    ], axis=1).astype(np.float32)
    return c


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _gaussian_noise(shape):
    """Box-Muller from the in-kernel PRNG: (shape) float32 ~ N(0, 1)."""
    def uniform01(bits):
        # top 23 bits into the mantissa of [1, 2), minus 1 -> [0, 1)
        f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
        return f - 1.0

    u1 = uniform01(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = uniform01(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    return r * jnp.cos(2.0 * np.pi * u2)


def _make_kernel(n_layers: int, heads: int, t_window: int, n_mem: int,
                 num_steps: int, compute_dtype, n_clips: int = 1,
                 stochastic: bool = False, with_xadd: bool = False,
                 with_blend: bool = True, t_real: "int | None" = None,
                 m_real: "int | None" = None):
    """n_mem counts PER-CLIP memory rows including the timestep token slot
    (row 0); speech rows live at 1..n_mem-1 of each clip's block.

    n_clips > 1 packs several clips into one program as a long sequence:
    projections/FF run over (n_clips*T, D) — much better MXU fill — while
    attention loops per clip (exact work, no cross-clip score waste) and
    the depthwise conv's shift matrices zero at clip boundaries.

    with_xadd adds a loop-invariant (rows_x, Dp_pad) f32 tensor to the
    diffusion state before the input projection each step — the inpaint
    model type's t-independent conditioning MLP output (reference
    ``models/model.py:120-166`` recomputes that MLP every denoise step;
    here it is hoisted into the prep and enters the kernel as data).

    t_real / m_real (None = all rows real): Mosaic's sublane slicing needs
    t_window and n_mem to be multiples of 8, so callers zero-PAD each
    clip's x / memory block to alignment and name the real row counts
    here.  Padding is exact, not approximate: pad rows are removed from
    attention (a -1e30 additive column mask before every softmax) and
    from the depthwise conv (shift matrices drop links INTO pad rows, so
    the last real row's next-tap is zero exactly like an unpadded
    boundary).  Pad-row outputs are garbage that never feeds a real row;
    the caller slices them off.
    """
    cd = compute_dtype
    t_real = t_window if t_real is None else t_real
    m_real = n_mem if m_real is None else m_real

    def ln(x):
        """Normalize-only (affine folded into the consuming matmul)."""
        x32 = x.astype(jnp.float32)
        mu = x32.mean(axis=-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + LN_EPS)).astype(cd)

    def shift_mats(n_rows, clip_len, real_len):
        """Loop-invariant (n_rows, n_rows) row-shift permutation matrices
        with clip-boundary zeroing baked in: S_prev @ x == x shifted down
        one row (x[t-1], zero at each clip's first row), S_next @ x ==
        x[t+1] (zero at each clip's last row).  real_len < clip_len also
        drops links into each block's pad tail, so the last REAL row's
        next-tap is zero — identical to an unpadded block boundary."""
        i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_rows), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_rows), 1)
        valid_j = j % clip_len < real_len
        s_prev = jnp.where((j == i - 1) & (i % clip_len != 0) & valid_j,
                           1.0, 0.0).astype(cd)
        s_next = jnp.where((j == i + 1) & (i % clip_len != clip_len - 1)
                           & valid_j, 1.0, 0.0).astype(cd)
        return s_prev, s_next

    def dconv(x, taps, bias, shifts):
        """Primer depthwise conv y[t] = w0 x[t-1] + w1 x[t] + w2 x[t+1]
        (shifts never cross clip boundaries), with the row shifts computed
        as permutation-matrix matmuls on the otherwise-idle MXU: exact
        (each output element is a single 1.0*x product), no f32 roll
        scratch (Mosaic's roll is f32-only), no boundary masks or casts —
        the kernel is VPU-bound, so moving the shifts off the VPU is a
        direct win and the scoped-VMEM footprint drops with the dropped
        (rows, K*D) f32 temporaries."""
        s_prev, s_next = shifts
        # Mosaic requires a 32-bit matmul accumulator; values are exact
        # single-term sums either way
        prev = jnp.dot(s_prev, x,
                       preferred_element_type=jnp.float32).astype(cd)
        nxt = jnp.dot(s_next, x,
                      preferred_element_type=jnp.float32).astype(cd)
        return prev * taps[0] + x * taps[1] + nxt * taps[2] + bias

    def head_masks(d_model):
        d_k = d_model // heads
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_model), 1)
        return [(lane // d_k == h).astype(cd) for h in range(heads)]

    def attention(q, k, v, wo, bo, d_model, q_len, k_len, out_masks,
                  k_mask=None):
        """Per-clip, head-stacked attention.  For each packed clip the
        stack Q = [q_c * m_h for h in heads] (lane-masked queries on rows)
        makes ONE (H*q_len, D) x (D, k_len) matmul yield every head's
        scores (q's zeroed lanes kill cross-head terms), one row-softmax
        normalises all heads at once, and one (H*q_len, k_len) x
        (k_len, D) matmul gives per-head outputs to be lane-masked and
        summed.  Looping clips instead of packing them block-diagonally
        keeps softmax/score work at exactly heads*q_len*k_len per clip —
        the block-diagonal alternative costs n_clips x more VPU time on
        scores that the mask then throws away, and the fused kernel is
        VPU-bound.  Clip slices are sublane slices (q_len, k_len multiples
        of 8); lane slicing (128-aligned) is avoided entirely."""
        d_k = d_model // heads
        scale = 1.0 / np.sqrt(d_k)
        outs = []
        for c in range(n_clips):
            qc = q[c * q_len:(c + 1) * q_len]
            kc = k[c * k_len:(c + 1) * k_len]
            vc = v[c * k_len:(c + 1) * k_len]
            q_stack = jnp.concatenate(
                [qc * out_masks[h] for h in range(heads)], axis=0)
            s = jax.lax.dot_general(
                q_stack, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if k_mask is not None:
                s = s + k_mask          # -1e30 on pad key columns
            a = jax.nn.softmax(s, axis=1).astype(cd)
            o_stack = jnp.dot(a, vc, preferred_element_type=jnp.float32
                              ).astype(cd)
            out = None
            for h in range(heads):
                o_h = o_stack[h * q_len:(h + 1) * q_len] * out_masks[h]
                out = o_h if out is None else out + o_h
            outs.append(out)
        out = outs[0] if n_clips == 1 else jnp.concatenate(outs, axis=0)
        return jnp.dot(out, wo, preferred_element_type=jnp.float32
                       ).astype(cd) + bo

    def kernel(x0_ref, mem_ref, tmap_ref, freqs_ref, coef_ref, seed_ref,
               *rest, out_ref):
        rest = list(rest)
        blend_a = blend_b = xadd = None
        if with_blend:
            blend_a = rest.pop(0)[:]
            blend_b = rest.pop(0)[:]
        if with_xadd:
            xadd = rest.pop(0)[:]                 # (rows_x, Dp_pad) f32
        w_refs = rest
        if stochastic:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * 9973)
        p = PackedDenoiser(*w_refs)
        d_model = p.w_emm.shape[0]
        mem_buf = mem_ref[:].astype(cd)   # (n_clips*n_mem, D); slot rows @ k*n_mem
        mem_row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (n_clips * n_mem, 1), 0)
        freqs = freqs_ref[:]                        # (1, D/2) f32
        if n_clips == 1:
            pe_x = p.pe_x[:].astype(cd)
        else:
            pe_x = jnp.concatenate([p.pe_x[:]] * n_clips, axis=0).astype(cd)

        # attention masks + dconv shift matrices, hoisted out of the step
        # loop (loop-invariant)
        rows_x = n_clips * t_window
        rows_m = n_clips * n_mem
        shifts_x = shift_mats(rows_x, t_window, t_real)
        shifts_m = shift_mats(rows_m, n_mem, m_real)
        out_masks = head_masks(d_model)

        def pad_kmask(k_len, real):
            if real == k_len:
                return None
            col = jax.lax.broadcasted_iota(jnp.int32, (1, k_len), 1)
            return jnp.where(col < real, 0.0, -1e30)

        kmask_x = pad_kmask(t_window, t_real)
        kmask_m = pad_kmask(n_mem, m_real)

        def step(i, x):
            si = num_steps - 1 - i
            # sinusoidal embedding of the ORIGINAL timestep, in-kernel
            t_orig = tmap_ref[si, 0].astype(jnp.float32)
            args = t_orig * freqs
            e = jnp.concatenate([jnp.cos(args), jnp.sin(args)],
                                axis=-1).astype(cd)           # (1, D)
            t1 = jnp.dot(e, p.w_sp1[:], preferred_element_type=jnp.float32
                         ) + p.b_sp1[:].astype(jnp.float32)
            # silu in f32: Mosaic miscompiles bf16 sigmoid (verifier bug)
            t1 = (t1 * jax.nn.sigmoid(t1)).astype(cd)
            t2 = jnp.dot(t1, p.w_sp2[:], preferred_element_type=jnp.float32
                         ).astype(cd) + p.b_sp2[:]
            tok = jnp.dot(t2, p.w_emm[:], preferred_element_type=jnp.float32
                          ).astype(cd) + p.b_emm[:] + p.pe_m0[:].astype(cd)
            # place the (shared) token in every clip's row 0 without an
            # unaligned concat
            mem = jnp.where(mem_row_ids % n_mem == 0,
                            jnp.broadcast_to(tok, mem_buf.shape), mem_buf)

            xin = x if xadd is None else x + xadd
            h = jnp.dot(xin.astype(cd), p.w_embx[:],
                        preferred_element_type=jnp.float32).astype(cd) \
                + p.b_embx[:] + pe_x

            for l in range(n_layers):
                # self-attention: one merged QKV matmul + one merged dconv
                z = ln(h)
                qkv = jnp.dot(z, p.self_wqkv[l],
                              preferred_element_type=jnp.float32
                              ).astype(cd) + p.self_bqkv[l]
                qkv = dconv(qkv, p.self_dconv[l], p.self_dbias[l], shifts_x)
                q = qkv[:, :d_model]
                k = qkv[:, d_model:2 * d_model]
                v = qkv[:, 2 * d_model:]
                h = h + attention(q, k, v, p.self_wo[l], p.self_bo[l],
                                  d_model, t_window, t_window, out_masks,
                                  k_mask=kmask_x)

                # cross-attention: q from x, merged KV from memory
                z = ln(h)
                q = jnp.dot(z, p.cross_wq[l],
                            preferred_element_type=jnp.float32
                            ).astype(cd) + p.cross_bq[l]
                q = dconv(q, p.cross_dq[l], p.cross_dqb[l], shifts_x)
                kv = jnp.dot(mem, p.cross_wkv[l],
                             preferred_element_type=jnp.float32
                             ).astype(cd) + p.cross_bkv[l]
                kv = dconv(kv, p.cross_dkv[l], p.cross_dkvb[l], shifts_m)
                k = kv[:, :d_model]
                v = kv[:, d_model:]
                h = h + attention(q, k, v, p.cross_wo[l], p.cross_bo[l],
                                  d_model, t_window, n_mem, out_masks,
                                  k_mask=kmask_m)

                z = ln(h)
                f = jnp.dot(z, p.ff_w1[l], preferred_element_type=jnp.float32
                            ).astype(cd) + p.ff_b1[l]
                f = jax.nn.relu(f)
                f = f * f
                h = h + jnp.dot(f, p.ff_w2[l],
                                preferred_element_type=jnp.float32
                                ).astype(cd) + p.ff_b2[l]

            z = ln(h)
            eps = jnp.dot(z, p.w_out[:], preferred_element_type=jnp.float32
                          ) + p.b_out[:]                      # (T, Dp) f32

            c0 = coef_ref[si, 0]
            c1 = coef_ref[si, 1]
            c2 = coef_ref[si, 2]
            c3 = coef_ref[si, 3]
            if not with_blend:
                # identity blend folded OUT algebraically (scalar arithmetic
                # is free; tensor work drops from 9 VPU ops to 3 per step):
                #   ddim:  c2*x0_hat + c3*eps' with eps' == eps exactly
                #          (the re-derivation (c0 x - x0_hat)/c1 inverts the
                #          x0_hat definition when no blend intervenes)
                #        = (c2*c0) x + (c3 - c2*c1) eps
                #   ddpm:  c2*x0_hat + c3*x + sigma z
                #        = (c2*c0 + c3) x - (c2*c1) eps + sigma z
                if stochastic:
                    return ((c2 * c0 + c3) * x - (c2 * c1) * eps
                            + coef_ref[si, 4] * _gaussian_noise(x.shape))
                return (c2 * c0) * x + (c3 - c2 * c1) * eps
            x0_hat = c0 * x - c1 * eps
            x0_hat = blend_a + blend_b * x0_hat
            if stochastic:
                # ancestral DDPM: posterior mean + sigma * z
                # (c2, c3) = posterior mean coefs; coef col 4 = sigma
                # (0 at t == 0)
                return (c2 * x0_hat + c3 * x
                        + coef_ref[si, 4] * _gaussian_noise(x.shape))
            # DDIM eta=0: re-derive eps from the (possibly blended) x0_hat,
            # matching the scan sampler / reference (gaussian_diffusion.py:465)
            eps = (c0 * x - x0_hat) / c1
            return c2 * x0_hat + c3 * eps

        x = x0_ref[:].astype(jnp.float32)
        x = jax.lax.fori_loop(0, num_steps, step, x)
        out_ref[:] = x

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "heads", "num_steps", "compute_dtype",
                     "interpret", "n_clips", "stochastic", "t_real",
                     "n_mem_real"))
def fused_ddim_sample(
    packed: PackedDenoiser,
    x_T: jax.Array,          # (N, T, Dp_pad) f32 initial noise (pose cols padded)
    mem_rows: jax.Array,     # (N, n_mem, D) f32; row 0 is the token slot,
                             # rows 1.. are emb_mem(speech)+pe[1:]
    tmap: jax.Array,         # (S, 1) int32 respaced -> original timestep map
    coefs: jax.Array,        # (S, 4) f32 ddim / (S, 5) ddpm coefficients
    blend_a: "jax.Array | None",   # (N, T, Dp_pad) f32, or None with blend_b
    blend_b: "jax.Array | None",   # None = identity blend: the kernel skips
                                   # the blend tensors AND collapses the
                                   # ddim/ddpm update to 3 VPU ops per step
    n_layers: int,
    heads: int,
    num_steps: int,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    n_clips: int = 1,
    stochastic: bool = False,
    seed: "jax.Array | int" = 0,
    x_add: "jax.Array | None" = None,
    t_real: "int | None" = None,
    n_mem_real: "int | None" = None,
) -> jax.Array:
    """stochastic=True runs ancestral DDPM: coefs must come from
    ddpm_coefficients() and per-step Gaussian noise is drawn from the
    in-kernel TPU PRNG seeded by ``seed`` (+ grid-program offset).

    x_add, when given, must be (N, T, Dp_pad) f32: a loop-invariant term
    added to the diffusion state before the model's input projection each
    step (inpaint model type conditioning, hoisted out of the loop).

    t_real / n_mem_real: when the true window / memory length is not a
    multiple of 8, zero-pad x_T (and blend/x_add) rows to t_window and
    mem_rows to n_mem, and pass the REAL counts here — pad rows are
    masked out of attention and the depthwise conv exactly (see
    _make_kernel), and the caller slices the output back to t_real."""
    n, t_window, dp_pad = x_T.shape
    n_mem = mem_rows.shape[1]
    d_model = packed.w_emm.shape[0]
    if n % n_clips != 0:
        raise ValueError(f"batch {n} not divisible by n_clips {n_clips}")
    if t_window % 8 or n_mem % 8:
        # per-head (and per-clip when packed) attention/dconv slices are
        # sublane slices at offsets that are multiples of t_window / n_mem:
        # Mosaic requires 8-alignment even at n_clips == 1 — validate here
        # rather than dying later in an opaque lowering error
        raise ValueError(
            f"fused sampler needs t_window ({t_window}) and n_mem ({n_mem}) "
            "to be multiples of 8 (zero-pad and pass t_real/n_mem_real)")
    for name, real, padded in (("t_real", t_real, t_window),
                               ("n_mem_real", n_mem_real, n_mem)):
        if real is not None and not 0 < real <= padded:
            raise ValueError(f"{name} ({real}) must be in (0, {padded}]")
    if n_mem_real is not None and n_mem_real < 2:
        raise ValueError("n_mem_real must cover the timestep-token row "
                         "plus at least one speech row")
    # the kernel indexes tmap/coefs rows with a DYNAMIC step index in
    # [0, num_steps); dynamic SMEM reads are not bounds-checked, so a row
    # mismatch would read garbage silently instead of raising
    if tmap.shape[0] != num_steps or coefs.shape[0] != num_steps:
        raise ValueError(
            f"tmap ({tmap.shape[0]} rows) and coefs ({coefs.shape[0]}) must "
            f"both have num_steps ({num_steps}) rows — pass the RESPACED "
            "schedule's tables")
    if stochastic and coefs.shape[1] < 5:
        raise ValueError(
            "stochastic=True needs the 5-column ddpm_coefficients() layout "
            f"(got {coefs.shape[1]} columns)")
    if x_add is not None and x_add.shape != (n, t_window, dp_pad):
        raise ValueError(
            f"x_add shape {x_add.shape} must match x_T {(n, t_window, dp_pad)}")
    if (blend_a is None) != (blend_b is None):
        raise ValueError("blend_a and blend_b must both be given or both None")
    with_blend = blend_a is not None
    if n_clips > 1:
        # pack n_clips clips per grid program as one long sequence —
        # projections/FF fill the MXU across clips
        n_prog = n // n_clips
        x_T = x_T.reshape(n_prog, n_clips * t_window, dp_pad)
        mem_rows = mem_rows.reshape(n_prog, n_clips * n_mem, d_model)
        if with_blend:
            blend_a = blend_a.reshape(n_prog, n_clips * t_window, dp_pad)
            blend_b = blend_b.reshape(n_prog, n_clips * t_window, dp_pad)
        if x_add is not None:
            x_add = x_add.reshape(n_prog, n_clips * t_window, dp_pad)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    kernel = _make_kernel(n_layers, heads, t_window, n_mem, num_steps,
                          compute_dtype, n_clips=n_clips,
                          stochastic=stochastic,
                          with_xadd=x_add is not None,
                          with_blend=with_blend, t_real=t_real,
                          m_real=n_mem_real)
    from ..models.denoiser import timestep_freqs

    freqs = timestep_freqs(d_model)[None, :]

    def batch_spec(shape):
        return pl.BlockSpec((1, *shape), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def shared_spec(arr):
        # same block every grid step -> fetched once, resident in VMEM
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def smem_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.SMEM)

    rows_x = n_clips * t_window
    rows_m = n_clips * n_mem
    n_prog = n // n_clips
    w_list = list(packed)
    in_specs = [
        batch_spec((rows_x, dp_pad)),            # x0
        batch_spec((rows_m, d_model)),
        smem_spec(tmap),
        shared_spec(freqs),
        smem_spec(coefs),
        smem_spec(seed_arr),
    ]
    operands = [x_T, mem_rows, tmap, freqs, coefs, seed_arr]
    for extra in ((blend_a, blend_b) if with_blend else ()) + (
            (x_add,) if x_add is not None else ()):
        in_specs.append(batch_spec((rows_x, dp_pad)))
        operands.append(extra)
    n_lead = len(operands)                       # refs before the weights
    in_specs += [shared_spec(w) for w in w_list]
    operands += w_list

    def kernel_wrap(*refs):
        *ins, out_ref = refs
        lead, w_refs = ins[:n_lead], ins[n_lead:]
        x0_ref, mem_ref, tmap_ref, freqs_ref, coef_ref, seed_ref = lead[:6]
        # strip the leading batch-block dim of per-batch refs
        args = [x0_ref.at[0], mem_ref.at[0], tmap_ref, freqs_ref, coef_ref,
                seed_ref]
        args += [r.at[0] for r in lead[6:]]      # blend_a/blend_b/x_add
        kernel(*args, *w_refs, out_ref=out_ref.at[0])

    out = pl.pallas_call(
        kernel_wrap,
        out_shape=jax.ShapeDtypeStruct((n_prog, rows_x, dp_pad), jnp.float32),
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=batch_spec((rows_x, dp_pad)),
        interpret=interpret,
    )(*operands)
    return out.reshape(n, t_window, dp_pad)
