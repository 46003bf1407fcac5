"""Sampling-time API: single windows, long sequences, bpd, latency.

Re-design of ``models/generator.py:8-309``:

  * ``generate_sample`` — one fused jitted program per (algorithm, inpaint)
    signature: speech memory encoded ONCE, then the whole reverse process
    runs as a scan.  The reference re-ran the speech encoder inside every
    one of the (up to 1000) steps — SURVEY.md §3.2 calls this the single
    biggest waste — and this hoisting is where most of the speedup lives.
  * seed-pose continuation via the x0-blending ``denoise_fn`` with the
    ``trans_factor`` per-frame ramp (generator.py:256-281), fused into the
    scan body.
  * ``generate_sequence`` — long audio chunked into overlapping windows,
    chunk i seeded from the tail of chunk i-1 (generator.py:80-195),
    with optional linear crossfade at seams.
  * ``eval_bpd`` — full-T variational bound with memory hoisted.
  * ``eval_infer_time`` — warmup + timed reps with ``block_until_ready``
    (mirroring the reference's cuda-event harness, generator.py:47-78).

All layouts are (N, T, C).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import bpd_loop, ddim_sample_loop, ddpm_sample_loop
from ..diffusion.gaussian import Schedule
from ..models.denoiser import GestureDenoiser


def window_plan(wav_len: int, wav_sr: int, pose_fps: int,
                pose_window_len: int, pose_seed_len: int) -> Tuple[int, int]:
    """(seq_len, num_div) of the overlapped-window generation plan for
    ``wav_len`` audio samples — the single source of truth shared by
    ``generate_sequence`` and ``GestureStream`` (the two previously carried
    separate copies and drifted).  Output length truncates to whole seconds
    of audio, bug-compat with the reference (generator.py:96-104).

    NOTE ``num_div`` is NOT monotone in ``wav_len``: the ``-1`` correction
    can make the plan shrink as audio grows (e.g. fps=20, window=60,
    seed=25: 2 s of audio plans 2 windows, 3 s plans 1).  GestureStream may
    therefore dispatch window ``d`` early ONLY when BOTH (a) ``d`` is in
    the plan for the audio received so far AND (b) the window's audio has
    fully arrived — (b) implies the stream's final plan includes ``d``
    whenever (a) held at dispatch time (the shrink points lie before the
    window's own end), so neither check alone is sufficient."""
    if not pose_seed_len < pose_window_len:
        # user-input validation: must survive `python -O` (assert would be
        # stripped and a seed >= window silently yields stride <= 0)
        raise ValueError(
            f"pose_seed_len ({pose_seed_len}) must be < pose_window_len "
            f"({pose_window_len}) — stride would be <= 0")
    seq_len = wav_len // wav_sr * pose_fps
    stride = pose_window_len - pose_seed_len
    if seq_len == 0:
        # sub-second audio truncates to zero output frames: an empty plan,
        # NOT a crash (the reference's th.cat([]) dies here; documented
        # deviation so offline and streaming agree on 'emit nothing')
        return 0, 0
    num_div = int(np.ceil(seq_len / stride))
    if (seq_len - pose_seed_len) % stride == 0:
        num_div -= 1
    if num_div <= 0:
        # only when 0 < seq_len <= stride and seq_len == seed (mod stride):
        # the reference plans zero windows yet owes seq_len frames and then
        # crashes in th.cat([]); fail loudly and identically on both paths
        raise ValueError(
            f"audio too short for the window plan: {seq_len} output frames "
            f"but 0 windows (window={pose_window_len}, seed={pose_seed_len}"
            f", fps={pose_fps}); provide at least one more second of audio")
    return seq_len, num_div


def crossfade_head(x: np.ndarray, prev_tail: np.ndarray,
                   seed_len: int) -> np.ndarray:
    """Linear blend of a window's first ``seed_len`` frames with the
    previous window's raw tail (reference generator.py:171-183) — shared
    by ``generate_sequence`` and ``GestureStream`` so their bit-equality
    cannot drift (same hazard class window_plan closes)."""
    ratio = (np.arange(seed_len, dtype=np.float32) / seed_len)[None, :, None]
    head = x[:, :seed_len] * ratio + prev_tail * (1.0 - ratio)
    return np.concatenate([head, x[:, seed_len:]], axis=1)


def make_trans_ramp(trans_factor: Optional[float], pose_seed_len: int,
                    window_len: int) -> Optional[np.ndarray]:
    """(1, T, 1) per-frame seed-adherence ramp: trans_factor -> 1 over the
    seed frames, then 1 (generator.py:262-268).  None -> hard seed copy."""
    if trans_factor is None:
        return None
    assert 0.0 <= trans_factor <= 1.0
    ramp = np.linspace(trans_factor, 1.0, pose_seed_len, endpoint=False)
    full = np.concatenate([ramp, np.ones(window_len - pose_seed_len)])
    return full[None, :, None].astype(np.float32)


class Generator:
    def __init__(
        self,
        model: GestureDenoiser,
        variables: dict,
        sched: Schedule,
        timestep_map: Optional[jax.Array] = None,
        use_fused: "bool | str" = "auto",
        fused_dtype=None,
        mesh=None,
    ):
        """:param use_fused: route DDIM sampling through the single-Pallas-
        kernel sampler (ops/fused_sampler.py — weights resident in VMEM)
        when supported.  "auto" enables it on TPU backends only.

        :param mesh: optional ``jax.sharding.Mesh`` whose only non-trivial
        axis is "data".  When given, the fused kernel runs under
        ``shard_map`` over that axis — each device holds its own
        VMEM-resident weight copy and samples its local clips with ZERO
        collectives (clips are independent), so fused serving throughput
        scales linearly with the data axis.  Batches not divisible by the
        data axis run the fused kernel UNSHARDED on one device (sampling
        stays fused; sharding resumes on the next divisible batch).  The
        scan path ignores the mesh: GSPMD shards it from the input
        shardings alone, so it runs on one device unless the CALLER
        device_puts its batch onto a sharded layout."""
        self.model = model
        self.variables = variables
        self.sched = sched
        self.timestep_map = timestep_map
        self.use_fused = use_fused
        self.fused_dtype = fused_dtype
        self.mesh = mesh
        if mesh is not None:
            if "data" not in mesh.shape:
                raise ValueError(
                    f"Generator mesh needs a 'data' axis, got "
                    f"{dict(mesh.shape)}")
            extra = {k: v for k, v in mesh.shape.items()
                     if k != "data" and v > 1}
            if extra:
                # shard_map maps over EVERY mesh axis; an unmentioned
                # model axis would run duplicate kernel instances whose
                # outputs are discarded — half the fleet silently wasted
                raise ValueError(
                    f"Generator mesh must be data-only; non-trivial axes "
                    f"{extra} would run duplicate kernel instances. Pass "
                    f"a mesh whose only axis > 1 is 'data'.")
        self._sample_jit = {}   # keyed by (alg, inpaint?)
        self._bpd_jit = {}      # keyed by pose_seed_len (closure captures it)
        #: which path produced the last ``generate_sample`` output —
        #: "fused" (single Pallas kernel) or "scan" (XLA lax.scan sampler).
        #: bench.py reports this so a silent fused->scan fallback is visible.
        self.last_sample_path = None
        self._fused_packed = None
        self._fused_prep = None
        self._fused_prep_key = None
        self._fused_key = None
        self._fused_xadd = None

    def update_variables(self, variables: dict) -> None:
        """Swap in new weights (e.g. after further training).  Use this
        instead of assigning ``self.variables`` directly: the fused path
        packs weights into its VMEM layout once and caches them, so a bare
        assignment would keep sampling with the STALE packed weights."""
        self.variables = variables
        self._fused_packed = None
        self._fused_key = None

    # -- fused single-kernel DDIM path ---------------------------------
    def _fused_enabled(self) -> bool:
        if self.use_fused is False:
            return False
        cfg = self.model.cfg
        # all three model types share the oneway decoder weights the kernel
        # packs; they differ only in t-independent prep (s2g_v2 blends the
        # speech streams, default/inpaint concat them along time) and, for
        # inpaint, an additive conditioning term hoisted into the kernel's
        # x_add input.  Window/memory lengths that are not multiples of 8
        # are zero-padded to sublane alignment and masked exactly in the
        # kernel (t_real/n_mem_real) — no alignment fallback remains.
        supported = (
            cfg.decoder_type == "oneway_cross_attention"
            and cfg.model_type in ("s2g_v2", "default", "inpaint")
            and cfg.d_model % 256 == 0
        )
        if self.use_fused == "auto":
            return supported and jax.default_backend() == "tpu"
        return supported

    def _fused_sample(self, wavs, pose_dim, pose_window_len, noise,
                      inpaint_poses, inpaint_masks, ramp, n_clips=1,
                      stochastic=False, seed=0, rng=None, n_shards=1):
        import jax.numpy as jnp

        from ..ops import fused_sampler as fs

        cfg = self.model.cfg
        if self._fused_packed is None or \
                self._fused_key != (pose_dim, pose_window_len):
            # measured best default on v5e: bf16 weights (to fit VMEM's
            # 16 MB) with f32 compute — faster AND more accurate than bf16
            # compute (no cast churn around rolls/LN; full-rate VPU f32)
            weight_dtype = self.fused_dtype or jnp.bfloat16
            self._fused_key = (pose_dim, pose_window_len)
            # pack the positional encoding at the 8-ALIGNED window length
            # (pad rows read real PE values — garbage rows, masked anyway)
            self._fused_packed = fs.pack_oneway_denoiser(
                self.variables["params"], pose_dim,
                pose_window_len + (-pose_window_len) % 8,
                weight_dtype=weight_dtype)
            tmap = (np.asarray(self.timestep_map)
                    if self.timestep_map is not None
                    else np.arange(self.sched.num_timesteps))
            self._fused_tmap = jnp.asarray(tmap[:, None].astype(np.int32))
            self._fused_coefs = jnp.asarray(fs.ddim_coefficients(self.sched))
            self._fused_ddpm_coefs = jnp.asarray(
                fs.ddpm_coefficients(self.sched))

        if self._fused_prep is None or \
                self._fused_prep_key != (pose_dim, pose_window_len):
            # cached separately from the packed weights: the prep programs
            # take `variables` as a TRACED argument (emb_mem read inside the
            # trace, not closed over), so an update_variables weight swap
            # hits the existing compiled program instead of paying a fresh
            # ~minutes XLA compile per swap on this host
            self._fused_prep_key = (pose_dim, pose_window_len)

            from ..models.attention import sinusoidal_position_encoding

            pe = jnp.asarray(
                sinusoidal_position_encoding(5000, cfg.d_model))

            def memory_rows(variables, wavs):
                emm = variables["params"]["decoder"]["emb_mem"]
                speech = self.model.apply(
                    variables, wavs, train=False,
                    method=GestureDenoiser.encode_memory)
                m_s = speech.shape[1]
                rows = speech @ emm["kernel"] + emm["bias"] + pe[1:m_s + 1]
                slot = jnp.zeros((rows.shape[0], 1, cfg.d_model), rows.dtype)
                return jnp.concatenate([slot, rows], axis=1).astype(jnp.float32)

            self._fused_prep = jax.jit(memory_rows)

            @jax.jit
            def prep_memory_rng(variables, wavs, rng):
                """memory rows + split + noise + kernel-seed in ONE
                dispatch (each host->device round trip on a tunnel-attached
                chip costs ~1 ms, a visible slice of the 37 ms fused loop).
                RNG streams are bit-identical to the unfused path: noise
                from the split subkey, seed derived from the post-split key
                without consuming it, so a scan fallback that re-derives
                them on the host sees the same values."""
                mem_rows = memory_rows(variables, wavs)
                rng2, sub = jax.random.split(rng)
                noise = jax.random.normal(
                    sub, (wavs.shape[0], pose_window_len, pose_dim))
                seed = jax.random.randint(
                    jax.random.fold_in(rng2, 0x5EED), (), 0, 2 ** 31 - 1)
                return mem_rows, noise, seed

            self._fused_prep_rng = prep_memory_rng

            self._fused_xadd = None
            if cfg.model_type == "inpaint":
                @jax.jit
                def inpaint_xadd(variables, ip, im):
                    # t-independent conditioning MLP, hoisted out of the
                    # denoising loop (the scan path recomputes it per step
                    # inside model_fn — same values, dropout off at eval)
                    return self.model.apply(
                        variables, ip, im,
                        method=GestureDenoiser.inpaint_projection)

                self._fused_xadd = inpaint_xadd

        if cfg.model_type == "inpaint" and (
                inpaint_poses is None or inpaint_masks is None):
            return None   # scan fallback raises the clear error

        if rng is not None:
            mem_rows, noise, seed = self._fused_prep_rng(
                self.variables, wavs, rng)
        else:
            mem_rows = self._fused_prep(self.variables, wavs)
        # Mosaic sublane slicing needs 8-aligned per-clip row blocks; zero-
        # pad the memory (time-concat layouts are rarely aligned) and the
        # pose window to alignment and tell the kernel the real counts —
        # pad rows are masked out of attention/dconv exactly, so this is
        # the same math as the scan path, not an approximation
        n_mem_real = int(mem_rows.shape[1])
        n_mem_pad = (-n_mem_real) % 8
        t_pad = (-pose_window_len) % 8

        # conditioning dispatch AFTER the alignment gate: a model that
        # permanently falls back to scan must not pay a wasted ~1 ms
        # tunnel round trip per call for a discarded xadd
        xadd = None
        if cfg.model_type == "inpaint":
            xadd = self._fused_xadd(self.variables, inpaint_poses,
                                    inpaint_masks)

        # the cached run() closure captures pose_window_len/dp_pad — key on
        # them too, or a window/pose-dim change reuses a stale closure
        # (n_mem_real varies with the wav length: key on it as well)
        key = ("exec", inpaint_poses is not None, ramp is not None, n_clips,
               stochastic, pose_dim, pose_window_len, xadd is not None,
               n_mem_real, n_shards)
        if key not in self._sample_jit:
            dp_pad = ((pose_dim + 127) // 128) * 128
            t_win = pose_window_len + t_pad
            # measured on v5e: f32 compute wins at batch<=2 (VPU-bound, no
            # cast churn); clip-packed programs are matmul-bound and the
            # f32 score/attn transients overflow the 16 MB VMEM at 8 clips,
            # so packed programs compute in bf16 (x/eps state stays f32)
            cd = self.fused_dtype or (
                jnp.bfloat16 if n_clips > 2 else jnp.float32)
            interp = jax.default_backend() != "tpu"

            def run(packed, tmap, coefs, mem_rows, noise, ip, im, rp, seed,
                    xadd):
                # memory rows feed bf16 matmuls anyway — ship them in the
                # compute dtype so the kernel block is half-size (pad rows
                # to sublane alignment inside the jit: zero rows, masked
                # out of attention/dconv by the kernel)
                n = noise.shape[0]
                mem = jnp.zeros((n, n_mem_real + n_mem_pad, mem_rows.shape[2]),
                                cd).at[:, :n_mem_real].set(
                    mem_rows.astype(cd))

                def embed(val, fill=0.0):
                    # pose tensor -> kernel block: rows padded to sublane
                    # alignment, lanes to dp_pad (pad cells hold `fill`)
                    return jnp.full((n, t_win, dp_pad), fill, jnp.float32
                                    ).at[:, :pose_window_len,
                                         :pose_dim].set(val)

                x_T = embed(noise)
                x_add = None if xadd is None else embed(
                    xadd.astype(jnp.float32))
                if ip is None:
                    # identity blend: pass None so the kernel skips the
                    # blend tensors and collapses the update epilogue
                    blend_a = blend_b = None
                else:
                    tf = 0.0 if rp is None else rp
                    blend_a = embed((1.0 - tf) * im * ip)
                    blend_b = embed(jnp.broadcast_to(
                        tf * im + (1.0 - im), ip.shape), fill=1.0)
                if n_shards > 1:
                    # continue the kernel's seed + program_id*9973 stream
                    # across shards: shard s's programs pick up where
                    # shard s-1's left off, so DDPM noise is decorrelated
                    # across devices (identical seeds would draw IDENTICAL
                    # per-step noise on every shard) and deterministic
                    seed = seed + jax.lax.axis_index("data").astype(
                        jnp.int32) * jnp.int32((n // n_clips) * 9973)
                out = fs.fused_ddim_sample(
                    packed, x_T, mem, tmap, coefs, blend_a, blend_b,
                    n_layers=cfg.n_layers, heads=cfg.heads,
                    num_steps=self.sched.num_timesteps,
                    compute_dtype=cd, interpret=interp, n_clips=n_clips,
                    stochastic=stochastic, seed=seed, x_add=x_add,
                    t_real=pose_window_len if t_pad else None,
                    n_mem_real=n_mem_real if n_mem_pad else None)
                return out[:, :pose_window_len, :pose_dim]

            if n_shards > 1:
                from jax.sharding import PartitionSpec as P

                # one kernel instance per data-axis device: weights/tables
                # replicated (each chip keeps its own VMEM-resident copy),
                # batch tensors sharded, zero collectives (clips are
                # independent).  check_vma off: the pallas_call carries no
                # varying-manual-axes annotation to infer from.
                run = jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(P(), P(), P(), P("data"), P("data"),
                              P("data"), P("data"), P(), P(), P("data")),
                    out_specs=P("data"), check_vma=False)
            self._sample_jit[key] = jax.jit(run)
        coefs = self._fused_ddpm_coefs if stochastic else self._fused_coefs
        return self._sample_jit[key](
            self._fused_packed, self._fused_tmap, coefs,
            mem_rows, noise, inpaint_poses, inpaint_masks, ramp,
            jnp.asarray(seed, jnp.int32), xadd)

    # ------------------------------------------------------------------
    def _model_fn(self, variables, memory, inpaint_pose=None, inpaint_mask=None):
        extra = {}
        if self.model.cfg.model_type == "inpaint":
            extra = {"inpaint_pose": inpaint_pose, "inpaint_mask": inpaint_mask}
            if inpaint_pose is None:
                raise ValueError("inpaint model requires inpaint tensors")

        def model_fn(x, t):
            return self.model.apply(
                variables, x, t, memory, train=False,
                method=GestureDenoiser.denoise, **extra)

        return model_fn

    def _get_sampler(self, alg: str, with_inpaint: bool):
        key = (alg, with_inpaint)
        if key in self._sample_jit:
            return self._sample_jit[key]
        loop = {"ddim": ddim_sample_loop, "ddpm": ddpm_sample_loop}[alg]

        def fn(variables, wavs, noise, rng, inpaint_poses, inpaint_masks, ramp):
            memory = self.model.apply(
                variables, wavs, train=False,
                method=GestureDenoiser.encode_memory)
            model_fn = self._model_fn(variables, memory, inpaint_poses, inpaint_masks)
            denoise_fn = None
            if with_inpaint:
                tf = 0.0 if ramp is None else ramp

                def denoise_fn(x0_hat):
                    return (
                        (1.0 - tf) * inpaint_masks * inpaint_poses
                        + tf * inpaint_masks * x0_hat
                        + (1.0 - inpaint_masks) * x0_hat
                    )

            return loop(self.sched, model_fn, noise, rng,
                        denoise_fn=denoise_fn, timestep_map=self.timestep_map)

        jitted = jax.jit(fn)
        self._sample_jit[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    @staticmethod
    def _check_wav_dtype(wav) -> None:
        """Integer PCM (what scipy.io.wavfile.read returns) is 32768x the
        trained [-1, 1] scale; silently casting it produced garbage poses
        with no error.  Use data.beat.load_wav (scales + resamples)."""
        # dtype-less inputs (plain lists) are converted to float32 by the
        # caller anyway — don't materialise a second full asarray copy of a
        # streaming chunk just to inspect it
        if not hasattr(wav, "dtype"):
            return
        dt = wav.dtype
        if np.issubdtype(dt, np.integer):
            raise TypeError(
                f"wav has integer dtype {dt}: expected float audio in "
                "[-1, 1] (load it with data.beat.load_wav)")

    def generate_sample(
        self,
        wavs: jax.Array,                       # (N, T_wav)
        pose_dim: int,
        pose_window_len: int,
        rng: jax.Array,
        noise: Optional[jax.Array] = None,
        inpaint_poses: Optional[jax.Array] = None,   # (N, T, C)
        inpaint_masks: Optional[jax.Array] = None,   # (N, T, 1)
        sample_alg: str = "ddim",
        trans_factor: Optional[float] = None,
        pose_seed_len: Optional[int] = None,
    ) -> jax.Array:
        """One window batch -> (N, T, C) poses."""
        assert wavs.ndim == 2, f"wavs must be (N, T_wav), got {wavs.shape}"
        self._check_wav_dtype(wavs)
        n = wavs.shape[0]
        with_inpaint = inpaint_poses is not None
        if with_inpaint:
            assert inpaint_masks is not None, "Provide inpaint_masks."
        ramp = None
        if with_inpaint and trans_factor is not None:
            assert pose_seed_len is not None
            ramp = jnp.asarray(
                make_trans_ramp(trans_factor, pose_seed_len, pose_window_len))
        # fused path: weights VMEM-resident, up to 8 clips packed per grid
        # program via per-clip attention.  Grid programs run serially,
        # so for batch shapes that pack poorly (odd N > 2) the XLA scan —
        # which amortises weight streaming across the whole batch — wins.
        # With a mesh, the kernel runs per-shard under shard_map, so the
        # packing heuristic applies to the PER-DEVICE batch.  Indivisible
        # batches cannot shard; they run the kernel UNSHARDED on one
        # device when the single-device heuristic allows it (which still
        # beats the scan fallback — that is single-device too unless the
        # caller shards its inputs).
        import math

        n_shards = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        if n_shards > 1 and n % n_shards:
            n_shards = 1
        n_local = n // n_shards
        n_clips = math.gcd(n_local, 8) if n_local else 1
        fused_eligible = (
            sample_alg in ("ddim", "ddpm") and n_local > 0
            and (n_local <= 2 or n_clips >= 4) and self._fused_enabled())
        # noise is None + fused eligible: memory prep, split, noise and
        # kernel-seed all run in ONE jitted dispatch (_fused_prep_rng) —
        # the streams are bit-identical to the host derivation below, so a
        # fallback that re-derives them on the host matches exactly
        fused_rng = rng if (noise is None and fused_eligible) else None
        if noise is None and fused_rng is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, (n, pose_window_len, pose_dim))
        if fused_eligible:
            try:
                seed = None
                if fused_rng is None:
                    # explicit-noise callers: derive the kernel PRNG seed
                    # WITHOUT consuming rng, so a runtime fallback to the
                    # scan path sees the same stream
                    seed = jax.random.randint(
                        jax.random.fold_in(rng, 0x5EED), (), 0, 2**31 - 1)
                out = self._fused_sample(wavs, pose_dim, pose_window_len,
                                         noise, inpaint_poses, inpaint_masks,
                                         ramp, n_clips=n_clips,
                                         stochastic=(sample_alg == "ddpm"),
                                         seed=seed, rng=fused_rng,
                                         n_shards=n_shards)
                if out is not None:
                    self.last_sample_path = "fused"
                    return out
            except Exception as e:  # pragma: no cover — compiler/env specific
                # a Mosaic/compile failure must never take down sampling;
                # disable the fused path for this Generator and fall back
                print(f"[Warning] fused sampler failed ({type(e).__name__}: "
                      f"{str(e)[:200]}); falling back to the scan sampler")
                self.use_fused = False
        if noise is None:
            # fused path derived noise on-device and then fell back —
            # re-derive the identical values on the host
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, (n, pose_window_len, pose_dim))
        sampler = self._get_sampler(sample_alg, with_inpaint)
        out = sampler(self.variables, wavs, noise, rng,
                      inpaint_poses, inpaint_masks, ramp)
        # set only after the sampler returned: a raising sampler must not
        # leave the attribute claiming a path that produced nothing
        self.last_sample_path = "scan"
        return out

    # ------------------------------------------------------------------
    def generate_sequence(
        self,
        wav_seqs: jax.Array,                  # (N, T_wav_long)
        wav_sr: int,
        pose_dim: int,
        pose_fps: int,
        pose_window_len: int,
        pose_seed_len: int,
        rng: jax.Array,
        smooth_trans: bool = True,
        trans_factor: Optional[float] = None,
        init_poses: Optional[jax.Array] = None,   # (N, seed_len, C)
        sample_alg: str = "ddim",
        batch_size: int = 64,
    ) -> np.ndarray:
        """Long audio -> (N, T_seq, C) by overlapped windows with seed-pose
        continuation (generator.py:80-195)."""
        assert wav_seqs.ndim == 2
        self._check_wav_dtype(wav_seqs)
        n_seq, wav_seq_len = wav_seqs.shape
        seq_len, num_div = window_plan(wav_seq_len, wav_sr, pose_fps,
                                       pose_window_len, pose_seed_len)
        if num_div == 0:
            # sub-second audio: empty plan -> empty output (matches what
            # GestureStream emits for the same audio; window_plan docs)
            return np.zeros((n_seq, 0, pose_dim), np.float32)
        stride = pose_window_len - pose_seed_len
        wav_window_len = int(wav_sr * pose_window_len / pose_fps)

        outs = []
        for b0 in range(0, n_seq, batch_size):
            wav_seq = np.asarray(wav_seqs[b0:b0 + batch_size])
            nb = len(wav_seq)
            base_mask = np.zeros((nb, pose_window_len, 1), np.float32)
            base_mask[:, :pose_seed_len] = 1.0

            samples = []
            prev_tail = None
            if init_poses is not None:
                prev_tail = np.asarray(init_poses[b0:b0 + batch_size])
            pose_start = 0
            for d in range(num_div):
                wav_start = int(pose_start / pose_fps * wav_sr)
                window = wav_seq[:, wav_start:wav_start + wav_window_len]
                if window.shape[1] < wav_window_len:   # zero-pad last window
                    window = np.concatenate([
                        window,
                        np.zeros((nb, wav_window_len - window.shape[1]), np.float32)
                    ], axis=1)
                if prev_tail is None:
                    ip = im = None
                else:
                    ip = np.zeros((nb, pose_window_len, pose_dim), np.float32)
                    ip[:, :pose_seed_len] = prev_tail
                    ip, im = jnp.asarray(ip), jnp.asarray(base_mask)
                rng, sub = jax.random.split(rng)
                sample = self.generate_sample(
                    jnp.asarray(window), pose_dim, pose_window_len, sub,
                    inpaint_poses=ip, inpaint_masks=im,
                    sample_alg=sample_alg, trans_factor=trans_factor,
                    pose_seed_len=pose_seed_len)
                sample = np.asarray(sample)
                samples.append(sample)
                prev_tail = sample[:, -pose_seed_len:]
                pose_start += stride

            combined = []
            for i, x in enumerate(samples):
                if smooth_trans and i > 0:
                    x = crossfade_head(
                        x, samples[i - 1][:, -pose_seed_len:], pose_seed_len)
                combined.append(x[:, :-pose_seed_len] if i < len(samples) - 1 else x)
            outs.append(np.concatenate(combined, axis=1)[:, :seq_len])
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------------
    def stream(
        self,
        wav_sr: int,
        pose_dim: int,
        pose_fps: int,
        pose_window_len: int,
        pose_seed_len: int,
        rng: jax.Array,
        smooth_trans: bool = True,
        trans_factor: Optional[float] = None,
        init_poses: Optional[jax.Array] = None,
        sample_alg: str = "ddim",
        max_in_flight: int = 4,
        mesh=None,
    ) -> "GestureStream":
        """Streaming counterpart of :meth:`generate_sequence`: push audio
        chunks of ANY size, receive pose chunks as they complete.

        :param mesh: optional ``jax.sharding.Mesh`` — shard each window's
        batch over the mesh's ``data`` axis.  Works in multi-process SPMD
        (every process pushes the SAME audio; emitted chunks are gathered
        to full batches on every host), validated for real in
        tests/test_multiprocess.py.

        Latency design for a tunnel/real-time service: windows are
        dispatched as soon as enough audio is buffered, the seed-pose tail
        is carried across windows ON DEVICE (no host round trip between
        windows), and the host only blocks when more than ``max_in_flight``
        windows are outstanding — the issue-N-block-once pattern that
        measures ~3 ms per 2 s window vs ~30 ms when blocking per window
        (PERF.md).  Output is bit-identical to ``generate_sequence`` on the
        same audio and rng (asserted in tests/test_streaming.py) PROVIDED
        the offline call's ``batch_size >= N``: the offline path splits the
        rng per (batch-chunk, window) while the stream samples the whole
        batch per window, so with more than ``batch_size`` sequences the
        two draw different noise.
        """
        return GestureStream(self, wav_sr, pose_dim, pose_fps,
                             pose_window_len, pose_seed_len, rng,
                             smooth_trans=smooth_trans,
                             trans_factor=trans_factor,
                             init_poses=init_poses, sample_alg=sample_alg,
                             max_in_flight=max_in_flight, mesh=mesh)

    # ------------------------------------------------------------------
    def eval_bpd(
        self,
        poses: jax.Array,                     # (N, T, C)
        wavs: jax.Array,                      # (N, T_wav)
        rng: jax.Array,
        pose_seed_len: Optional[int] = None,
        t_block: int = 1,
    ) -> dict:
        """:param t_block: timesteps per model call (see
        ``diffusion.sampling.bpd_loop``) — the per-t terms are
        independent given ``x_start``, so k timesteps batch into one
        (k*N)-row call with the hoisted memory (and inpaint tensors)
        tiled k×; same math up to f32 reduction order.  A ``t_block``
        that does not divide the (possibly respaced) timestep count is
        clamped down to the largest divisor — results are block-invariant
        (noise is keyed per-t), so clamping only changes throughput,
        never the numbers."""
        T = (len(self.timestep_map) if self.timestep_map is not None
             else self.sched.num_timesteps)
        t_block = max(k for k in range(1, min(int(t_block), T) + 1)
                      if T % k == 0)
        # keyed on (pose_seed_len, t_block): the closure below captures
        # both, so an unkeyed cache would silently reuse the first call's
        # values for later calls with different settings (same bug class
        # as the fused cache, fixed by keying — see _fused_key)
        cache_key = (pose_seed_len, int(t_block))
        if cache_key not in self._bpd_jit:
            k = int(t_block)

            def fn(variables, poses, wavs, rng):
                memory = self.model.apply(
                    variables, wavs, train=False,
                    method=GestureDenoiser.encode_memory)
                ip = im = None
                if self.model.cfg.model_type == "inpaint":
                    assert pose_seed_len is not None
                    ip = poses
                    im = jnp.zeros(poses.shape[:2] + (1,), poses.dtype
                                   ).at[:, :pose_seed_len].set(1.0)
                if k > 1:
                    def tile(a):
                        return (None if a is None
                                else jnp.concatenate([a] * k, axis=0))

                    memory = jax.tree_util.tree_map(tile, memory)
                    ip, im = tile(ip), tile(im)
                model_fn = self._model_fn(variables, memory, ip, im)
                return bpd_loop(self.sched, model_fn, poses, rng,
                                timestep_map=self.timestep_map, t_block=k)

            self._bpd_jit[cache_key] = jax.jit(fn)
        return self._bpd_jit[cache_key](self.variables, poses, wavs, rng)

    # ------------------------------------------------------------------
    def eval_infer_time(
        self,
        wavs: jax.Array,
        pose_dim: int,
        pose_window_len: int,
        sample_alg: str = "ddim",
        repetitions: int = 10,
        warmup: int = 10,
        return_raw: bool = False,
    ):
        """:return: (mean_ms, std_ms, steps_per_sec)[, raw ms array] over
        timed reps."""
        rng = jax.random.key(0)
        for i in range(warmup):
            out = self.generate_sample(wavs, pose_dim, pose_window_len,
                                       jax.random.fold_in(rng, i),
                                       sample_alg=sample_alg)
        jax.block_until_ready(out)
        timings = np.zeros(repetitions)
        for rep in range(repetitions):
            t0 = time.perf_counter()
            out = self.generate_sample(wavs, pose_dim, pose_window_len,
                                       jax.random.fold_in(rng, 1000 + rep),
                                       sample_alg=sample_alg)
            jax.block_until_ready(out)
            timings[rep] = (time.perf_counter() - t0) * 1e3
        steps = self.sched.num_timesteps
        stats = (float(timings.mean()), float(timings.std()),
                 float(steps / (timings.mean() / 1e3)))
        return stats + (timings,) if return_raw else stats


class GestureStream:
    """Incremental window-by-window gesture generation over pushed audio.

    Reproduces ``Generator.generate_sequence``'s window/seed/crossfade
    semantics (reference ``models/generator.py:80-195``) as a push API:

        stream = generator.stream(sr, d_pose, fps, window, seed, rng)
        for audio_chunk in mic:               # any chunk size
            for poses in stream.push(audio_chunk):
                play(poses)                   # (N, stride, d_pose)
        for poses in stream.flush():
            play(poses)                       # last chunk: up to window_len

    ``push`` chunks are exactly ``stride`` frames; ``flush``'s FINAL chunk
    carries everything still owed and can be up to ``pose_window_len``
    frames (the plan truncates to whole seconds, so the last window's
    contribution is 1..window_len frames) — size playback buffers for
    ``pose_window_len``, not ``stride``.

    Pipelining: each window's reverse process is dispatched as soon as its
    audio is buffered; the seed tail feeds the next window as a DEVICE
    array (no host sync between windows), and results are only pulled to
    host once ``max_in_flight`` windows are outstanding (or at flush).
    """

    def __init__(self, generator: Generator, wav_sr: int, pose_dim: int,
                 pose_fps: int, pose_window_len: int, pose_seed_len: int,
                 rng: jax.Array, smooth_trans: bool = True,
                 trans_factor: Optional[float] = None,
                 init_poses: Optional[jax.Array] = None,
                 sample_alg: str = "ddim", max_in_flight: int = 4,
                 mesh=None):
        if not pose_seed_len < pose_window_len:
            raise ValueError(
                f"pose_seed_len ({pose_seed_len}) must be < pose_window_len "
                f"({pose_window_len}) — stride would be <= 0")
        self.gen = generator
        self.wav_sr = wav_sr
        self.pose_dim = pose_dim
        self.pose_fps = pose_fps
        self.window_len = pose_window_len
        self.seed_len = pose_seed_len
        self.stride = pose_window_len - pose_seed_len
        self.wav_window_len = int(wav_sr * pose_window_len / pose_fps)
        self.smooth_trans = smooth_trans
        self.trans_factor = trans_factor
        self.sample_alg = sample_alg
        self.max_in_flight = max(1, max_in_flight)
        self._rng = rng
        # batch sharding over the mesh's data axis (None -> single-device).
        # In multi-process SPMD, host-replicated numpy windows device_put
        # directly onto the global sharding (every process holds the same
        # audio bytes for its addressable shards)
        self._sharding = None
        if mesh is not None:
            from ..parallel import data_sharding

            self._sharding = data_sharding(mesh)
        self._init_tail = (None if init_poses is None
                           else self._put(init_poses))
        self._buf = []                  # received audio chunks (np)
        self._buf_offset = 0            # absolute index of _buf[0][..., 0]
        self._received = 0
        self._n = None                  # batch size, fixed by first push
        self._next_div = 0              # next window index to dispatch
        self._in_flight = []            # device samples, dispatch order
        self._last_dispatched = None    # device sample of the newest window
        self._emitted_idx = 0           # next window index to emit
        self._prev_np = None            # last materialised sample (np)
        self._emitted_frames = 0
        self._assemble = None           # jitted device-side ip builder
        self._finished = False

    # -- internals -----------------------------------------------------
    def _put(self, x) -> jax.Array:
        """Host tensor -> device, onto the mesh's data sharding when one
        was given (single-device otherwise)."""
        return (jax.device_put(x, self._sharding)
                if self._sharding is not None else jnp.asarray(x))

    def _audio(self, start: int, end: int) -> np.ndarray:
        """Buffered audio [start:end) zero-padded to the window length."""
        full = np.concatenate(self._buf, axis=-1)
        s = start - self._buf_offset
        window = full[..., s:s + min(end, self._received) - start]
        if window.shape[-1] < end - start:
            pad = np.zeros(window.shape[:-1] + (end - start - window.shape[-1],),
                           np.float32)
            window = np.concatenate([window, pad], axis=-1)
        return window

    def _compact(self) -> None:
        """Drop buffered chunks wholly before the next window's start so a
        long-running stream holds O(window) audio, not O(stream)."""
        keep_from = int(self._next_div * self.stride
                        / self.pose_fps * self.wav_sr)
        while self._buf and (self._buf_offset + self._buf[0].shape[-1]
                             <= keep_from):
            self._buf_offset += self._buf[0].shape[-1]
            self._buf.pop(0)

    def _dispatch_ready(self, final_len: Optional[int] = None) -> None:
        """Issue every window whose audio is available (all remaining ones
        when ``final_len`` marks the end of the stream)."""
        while True:
            d = self._next_div
            wav_start = int(d * self.stride / self.pose_fps * self.wav_sr)
            wav_end = wav_start + self.wav_window_len
            if final_len is None:
                # dispatch only windows certainly in the FINAL plan.  Both
                # checks are required (see window_plan's docstring): the
                # plan membership alone is unsafe because num_div can
                # SHRINK as audio grows, and audio-arrival alone is unsafe
                # because the plan truncates to whole seconds — together,
                # a fully-arrived window that is in today's plan stays in
                # every future plan.
                # a degenerate plan on the PARTIAL audio (window_plan
                # raises when it owes frames but plans no window) just
                # means nothing can be confirmed yet — more audio may
                # arrive; only the final plan may propagate that error
                try:
                    confirmed = self._num_divisions(self._received)
                except ValueError:
                    confirmed = 0
                if wav_end > self._received or d >= confirmed:
                    return
            else:
                if d >= self._num_divisions(final_len):
                    return
            wavs = self._put(self._audio(wav_start, wav_end))
            if self._init_tail is None and d == 0:
                ip = im = None
            else:
                prev = self._init_tail if d == 0 else self._last_dispatched
                if self._assemble is None:
                    n = wavs.shape[0]
                    mask = np.zeros((n, self.window_len, 1), np.float32)
                    mask[:, :self.seed_len] = 1.0
                    self._mask = self._put(mask)
                    s = self.seed_len

                    # the seed-tail slice lives INSIDE the jit so multihost
                    # global samples never hit an eager slice; prev is
                    # either the previous full window or init_poses (whose
                    # last s frames are the whole tensor) — one trace each
                    def assemble(prev):
                        return jnp.zeros(
                            (n, self.window_len, self.pose_dim), jnp.float32
                        ).at[:, :s].set(prev[:, -s:])

                    self._assemble = jax.jit(assemble)
                ip, im = self._assemble(prev), self._mask
            self._rng, sub = jax.random.split(self._rng)
            sample = self.gen.generate_sample(
                wavs, self.pose_dim, self.window_len, sub,
                inpaint_poses=ip, inpaint_masks=im,
                sample_alg=self.sample_alg, trans_factor=self.trans_factor,
                pose_seed_len=self.seed_len)
            self._in_flight.append(sample)
            self._last_dispatched = sample
            self._next_div += 1

    def _num_divisions(self, wav_len: int) -> int:
        return window_plan(wav_len, self.wav_sr, self.pose_fps,
                           self.window_len, self.seed_len)[1]

    def _crossfade(self, x: np.ndarray) -> np.ndarray:
        if self.smooth_trans and self._emitted_idx > 0:
            s = self.seed_len
            x = crossfade_head(x, self._prev_np[:, -s:], s)
        return x

    @staticmethod
    def _materialise(x) -> np.ndarray:
        """Device sample -> host numpy.  Multi-process global samples are
        gathered first so every host emits the FULL batch (np.asarray on a
        non-fully-addressable array raises)."""
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def _emit(self, final: bool, seq_len: Optional[int] = None):
        """Materialise the oldest in-flight sample and build its output
        chunk (stride frames; the final chunk is trimmed to seq_len)."""
        raw = self._materialise(self._in_flight.pop(0))
        x = self._crossfade(raw)
        self._prev_np = raw
        self._emitted_idx += 1
        if final:
            # the plan guarantees 1 <= remaining <= window_len; the clamp
            # turns a latent planning bug into an empty chunk, not frames
            # the offline path would never emit
            chunk = x[:, : max(0, seq_len - self._emitted_frames)]
        else:
            chunk = x[:, : self.stride]
        self._emitted_frames += chunk.shape[1]
        return chunk

    # -- public API ----------------------------------------------------
    def push(self, audio) -> list:
        """Feed an audio chunk (shape ``(T,)`` or ``(N, T)``); returns the
        pose chunks (each exactly ``(N, stride, pose_dim)`` — only flush's
        final chunk differs) completed so far.  Blocks only when more than
        ``max_in_flight`` windows are pending."""
        assert not self._finished, "stream already flushed"
        Generator._check_wav_dtype(audio)
        chunk = np.asarray(audio, np.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if self._n is None:
            self._n = chunk.shape[0]
        assert chunk.shape[0] == self._n, "batch size changed mid-stream"
        self._buf.append(chunk)
        self._received += chunk.shape[-1]
        self._dispatch_ready()
        self._compact()
        out = []
        # a popped window is final only if it is the stream's last — which
        # we can't know until flush; so keep >=1 window pending here
        while len(self._in_flight) > self.max_in_flight:
            out.append(self._emit(final=False))
        return out

    def flush(self) -> list:
        """End of audio: dispatch the remaining (zero-padded) windows and
        return all remaining pose chunks (the final one up to
        ``pose_window_len`` frames).  Total emitted length equals
        ``generate_sequence``'s output for the same audio."""
        assert not self._finished, "stream already flushed"
        self._finished = True
        self._dispatch_ready(final_len=self._received)
        seq_len = window_plan(self._received, self.wav_sr, self.pose_fps,
                              self.window_len, self.seed_len)[0]
        out = []
        while self._in_flight:
            out.append(self._emit(final=not self._in_flight[1:],
                                  seq_len=seq_len))
        return out
