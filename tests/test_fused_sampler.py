"""Fused single-kernel DDIM sampler: equivalence with the scan path
(interpret mode on CPU), including the seed-pose blending path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu.diffusion import make_diffusion
from gesture_diffusion_tpu.generation import Generator
from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser

D_POSE, T, N, DM = 12, 8, 2, 256
WAV = jnp.asarray(np.random.default_rng(0).normal(
    0, 0.3, (N, 8000)).astype(np.float32))


@pytest.fixture(scope="module")
def setup():
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=DM, heads=8, n_layers=1)
    model = GestureDenoiser(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((N, T, D_POSE)),
                           jnp.zeros((N,), jnp.int32), WAV, train=False)
    sched, tmap = make_diffusion("linear", 100, "ddim10", is_training=False)
    gen_scan = Generator(model, variables, sched, tmap, use_fused=False)
    gen_fused = Generator(model, variables, sched, tmap, use_fused=True,
                          fused_dtype=jnp.float32)
    return gen_scan, gen_fused


def test_fused_matches_scan(setup):
    gen_scan, gen_fused = setup
    noise = jax.random.normal(jax.random.key(1), (N, T, D_POSE))
    a = gen_scan.generate_sample(WAV, D_POSE, T, jax.random.key(2), noise=noise)
    b = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(2), noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_matches_scan_with_inpaint_ramp(setup):
    gen_scan, gen_fused = setup
    noise = jax.random.normal(jax.random.key(3), (N, T, D_POSE))
    seeds = jnp.asarray(np.random.default_rng(4).normal(
        size=(N, T, D_POSE)).astype(np.float32))
    mask = jnp.zeros((N, T, 1)).at[:, :3].set(1.0)
    kw = dict(noise=noise, inpaint_poses=seeds, inpaint_masks=mask,
              trans_factor=0.5, pose_seed_len=3)
    a = gen_scan.generate_sample(WAV, D_POSE, T, jax.random.key(5), **kw)
    b = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(5), **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_update_variables_keeps_prep_program(setup):
    """Weight swaps must NOT rebuild the fused memory-prep jits: they take
    `variables` as a traced argument (emb_mem read inside the trace, not
    closed over), so a swap reuses the existing compiled prep program
    instead of paying a fresh multi-minute XLA compile per swap — and the
    new weights must still flow through to the output."""
    _, gen_fused = setup
    old_vars = gen_fused.variables
    noise = jax.random.normal(jax.random.key(21), (N, T, D_POSE))
    try:
        a = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(22),
                                      noise=noise)
        prep, prep_rng = gen_fused._fused_prep, gen_fused._fused_prep_rng
        assert prep is not None
        perturbed = jax.tree.map(lambda x: x + 0.05, old_vars["params"])
        gen_fused.update_variables(
            {"params": perturbed,
             **{k: v for k, v in old_vars.items() if k != "params"}})
        b = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(22),
                                      noise=noise)
        assert gen_fused._fused_prep is prep
        assert gen_fused._fused_prep_rng is prep_rng
        assert not np.allclose(np.asarray(a), np.asarray(b))
    finally:
        gen_fused.update_variables(old_vars)


def test_fused_hard_seed_copies(setup):
    _, gen_fused = setup
    seeds = jnp.asarray(np.random.default_rng(6).normal(
        size=(N, T, D_POSE)).astype(np.float32))
    mask = jnp.zeros((N, T, 1)).at[:, :3].set(1.0)
    out = gen_fused.generate_sample(
        WAV, D_POSE, T, jax.random.key(7),
        inpaint_poses=seeds, inpaint_masks=mask)
    np.testing.assert_allclose(np.asarray(out[:, :3]),
                               np.asarray(seeds[:, :3]), atol=1e-4)


def test_fused_batched_clip_packing_matches(setup):
    """N=4 -> n_clips=4: clips packed into one block-diagonal program must
    produce the same result as independent sampling."""
    gen_scan, gen_fused = setup
    wav4 = jnp.concatenate([WAV, WAV[::-1]], axis=0)  # N=4
    noise = jax.random.normal(jax.random.key(9), (4, T, D_POSE))
    a = gen_scan.generate_sample(wav4, D_POSE, T, jax.random.key(10), noise=noise)
    b = gen_fused.generate_sample(wav4, D_POSE, T, jax.random.key(10), noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_max_clip_packing_matches(setup):
    """N=8 -> n_clips=8 (the maximum pack): the per-clip attention loop and
    clip-boundary shift matrices must reproduce independent sampling."""
    gen_scan, gen_fused = setup
    wav8 = jnp.concatenate([WAV, WAV[::-1], WAV * 0.5, WAV[::-1] * 2.0], axis=0)
    noise = jax.random.normal(jax.random.key(19), (8, T, D_POSE))
    a = gen_scan.generate_sample(wav8, D_POSE, T, jax.random.key(20), noise=noise)
    b = gen_fused.generate_sample(wav8, D_POSE, T, jax.random.key(20), noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_ddpm_stochastic(setup):
    """Ancestral DDPM through the fused path: deterministic per rng key,
    different across keys, finite, and statistically in family with the
    scan DDPM sampler.  On CPU the in-kernel TPU PRNG is unavailable
    (prng_seed has no CPU lowering, even interpreted), so this also
    exercises the runtime fallback; on TPU it runs the fused kernel."""
    gen_scan, gen_fused = setup
    noise = jax.random.normal(jax.random.key(20), (N, T, D_POSE))
    a = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(21),
                                  noise=noise, sample_alg="ddpm")
    b = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(21),
                                  noise=noise, sample_alg="ddpm")
    c = gen_fused.generate_sample(WAV, D_POSE, T, jax.random.key(22),
                                  noise=noise, sample_alg="ddpm")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.isfinite(np.asarray(a)).all()
    # distributional sanity vs the scan DDPM (different RNG streams, so
    # compare moments, not values)
    d = gen_scan.generate_sample(WAV, D_POSE, T, jax.random.key(23),
                                 noise=noise, sample_alg="ddpm")
    sa, sd = np.asarray(a), np.asarray(d)
    assert abs(sa.mean() - sd.mean()) < 0.25 * max(1.0, abs(sd.mean()))
    assert 0.5 < sa.std() / sd.std() < 2.0


def test_fused_falls_back_for_unsupported_configs():
    """cross_attention decoder -> scan path (no error, same API)."""
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=DM, heads=8, n_layers=1,
                         decoder_type="cross_attention")
    model = GestureDenoiser(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((N, T, D_POSE)),
                           jnp.zeros((N,), jnp.int32), WAV, train=False)
    sched, tmap = make_diffusion("linear", 100, "ddim10", is_training=False)
    gen = Generator(model, variables, sched, tmap, use_fused=True)
    assert not gen._fused_enabled()
    out = gen.generate_sample(WAV, D_POSE, T, jax.random.key(8))
    assert out.shape == (N, T, D_POSE)


def test_fused_entrypoint_validates_shapes(setup):
    """Direct fused_ddim_sample callers get clear errors, not silent
    out-of-bounds SMEM reads (tmap/coefs row mismatch vs num_steps), opaque
    Mosaic lowering failures (unaligned t_window), or a bare IndexError
    (4-column coefs with stochastic=True)."""
    import gesture_diffusion_tpu.ops.fused_sampler as fs

    _, gen_fused = setup
    sched = gen_fused.sched
    packed = fs.pack_oneway_denoiser(
        gen_fused.variables["params"], D_POSE, T, weight_dtype=jnp.float32)
    tmap = jnp.asarray(np.asarray(gen_fused.timestep_map)[:, None]
                       .astype(np.int32))
    coefs = jnp.asarray(fs.ddim_coefficients(sched))
    S = tmap.shape[0]
    x_T = jnp.zeros((N, T, 128))
    mem = jnp.zeros((N, 8, DM))
    ba, bb = jnp.zeros_like(x_T), jnp.ones_like(x_T)
    kw = dict(n_layers=1, heads=8, compute_dtype=jnp.float32, interpret=True)

    with pytest.raises(ValueError, match="num_steps"):
        fs.fused_ddim_sample(packed, x_T, mem, tmap, coefs, ba, bb,
                             num_steps=S + 1, **kw)
    with pytest.raises(ValueError, match="multiples of 8"):
        fs.fused_ddim_sample(packed, jnp.zeros((N, T - 1, 128)), mem, tmap,
                             coefs, ba[:, :T - 1], bb[:, :T - 1],
                             num_steps=S, **kw)
    with pytest.raises(ValueError, match="5-column"):
        fs.fused_ddim_sample(packed, x_T, mem, tmap, coefs, ba, bb,
                             num_steps=S, stochastic=True, **kw)


WAV6 = jnp.asarray(np.random.default_rng(30).normal(
    0, 0.3, (N, 6000)).astype(np.float32))  # time-concat memory: n_mem 16


@pytest.fixture(scope="module")
def inpaint_setup():
    """inpaint MODEL TYPE (additive conditioning MLP + time-concat speech
    memory) — the reference's long-sequence workhorse (model.py:120-166)."""
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=DM, heads=8, n_layers=1,
                         model_type="inpaint", pose_seed_len=3)
    model = GestureDenoiser(cfg)
    seeds = jnp.asarray(np.random.default_rng(31).normal(
        size=(N, T, D_POSE)).astype(np.float32))
    mask = jnp.zeros((N, T, 1)).at[:, :3].set(1.0)
    variables = model.init(jax.random.key(0), jnp.zeros((N, T, D_POSE)),
                           jnp.zeros((N,), jnp.int32), WAV6, train=False,
                           inpaint_pose=seeds, inpaint_mask=mask)
    # make the zero-init conditioning MLP actually contribute
    params = jax.tree.map(
        lambda x: x + 0.02, variables["params"]["inpaint_proj"])
    variables = {**variables, "params": {**variables["params"],
                                         "inpaint_proj": params}}
    sched, tmap = make_diffusion("linear", 100, "ddim10", is_training=False)
    gen_scan = Generator(model, variables, sched, tmap, use_fused=False)
    gen_fused = Generator(model, variables, sched, tmap, use_fused=True,
                          fused_dtype=jnp.float32)
    return gen_scan, gen_fused, seeds, mask


def test_fused_inpaint_model_type_matches_scan(inpaint_setup):
    """The conditioning MLP is hoisted into the kernel's x_add input; the
    fused trajectory must match the scan path, and it must actually BE the
    fused path (a time-concat memory misalignment falls back silently)."""
    gen_scan, gen_fused, seeds, mask = inpaint_setup
    noise = jax.random.normal(jax.random.key(32), (N, T, D_POSE))
    kw = dict(noise=noise, inpaint_poses=seeds, inpaint_masks=mask,
              trans_factor=0.5, pose_seed_len=3)
    a = gen_scan.generate_sample(WAV6, D_POSE, T, jax.random.key(33), **kw)
    assert gen_scan.last_sample_path == "scan"
    b = gen_fused.generate_sample(WAV6, D_POSE, T, jax.random.key(33), **kw)
    assert gen_fused.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    # the conditioning must matter: zeroing it changes the output
    c = gen_scan.generate_sample(WAV6, D_POSE, T, jax.random.key(33),
                                 noise=noise, inpaint_poses=0 * seeds,
                                 inpaint_masks=mask, trans_factor=0.5,
                                 pose_seed_len=3)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_fused_inpaint_clip_packed_matches(inpaint_setup):
    gen_scan, gen_fused, seeds, mask = inpaint_setup
    wav4 = jnp.concatenate([WAV6, WAV6[::-1]], axis=0)
    seeds4 = jnp.concatenate([seeds, seeds * 0.5], axis=0)
    mask4 = jnp.concatenate([mask, mask], axis=0)
    noise = jax.random.normal(jax.random.key(34), (4, T, D_POSE))
    kw = dict(noise=noise, inpaint_poses=seeds4, inpaint_masks=mask4)
    a = gen_scan.generate_sample(wav4, D_POSE, T, jax.random.key(35), **kw)
    b = gen_fused.generate_sample(wav4, D_POSE, T, jax.random.key(35), **kw)
    assert gen_fused.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_default_model_type_matches_scan():
    """model_type='default' (time-concat memory, no conditioning) through
    the fused path."""
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=DM, heads=8, n_layers=1,
                         model_type="default")
    model = GestureDenoiser(cfg)
    variables = model.init(jax.random.key(40), jnp.zeros((N, T, D_POSE)),
                           jnp.zeros((N,), jnp.int32), WAV6, train=False)
    sched, tmap = make_diffusion("linear", 100, "ddim10", is_training=False)
    gen_scan = Generator(model, variables, sched, tmap, use_fused=False)
    gen_fused = Generator(model, variables, sched, tmap, use_fused=True,
                          fused_dtype=jnp.float32)
    noise = jax.random.normal(jax.random.key(41), (N, T, D_POSE))
    a = gen_scan.generate_sample(WAV6, D_POSE, T, jax.random.key(42),
                                 noise=noise)
    b = gen_fused.generate_sample(WAV6, D_POSE, T, jax.random.key(42),
                                  noise=noise)
    assert gen_fused.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


# ---------------------------------------------------------------------------
# padded (non-8-aligned) window / memory lengths: zero-pad + exact masking
# instead of a scan fallback
# ---------------------------------------------------------------------------

def _zoo(model_type, wav, t, seed):
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=DM, heads=8, n_layers=1,
                         model_type=model_type)
    model = GestureDenoiser(cfg)
    n = wav.shape[0]
    variables = model.init(jax.random.key(seed), jnp.zeros((n, t, D_POSE)),
                           jnp.zeros((n,), jnp.int32), wav, train=False)
    sched, tmap = make_diffusion("linear", 100, "ddim10", is_training=False)
    gen_scan = Generator(model, variables, sched, tmap, use_fused=False)
    gen_fused = Generator(model, variables, sched, tmap, use_fused=True,
                          fused_dtype=jnp.float32)
    return model, variables, gen_scan, gen_fused


def test_fused_misaligned_memory_matches_scan():
    """default model type at a wav length whose time-concat memory is NOT a
    multiple of 8 (n_mem 20 here): the fused path must zero-pad + mask, not
    silently fall back to scan."""
    wav = jnp.asarray(np.random.default_rng(50).normal(
        0, 0.3, (N, 8000)).astype(np.float32))
    model, variables, gen_scan, gen_fused = _zoo("default", wav, T, 50)
    mem = model.apply(variables, wav, train=False,
                      method=GestureDenoiser.encode_memory)
    assert (mem.shape[1] + 1) % 8 != 0, "fixture must be misaligned"
    noise = jax.random.normal(jax.random.key(51), (N, T, D_POSE))
    a = gen_scan.generate_sample(wav, D_POSE, T, jax.random.key(52),
                                 noise=noise)
    b = gen_fused.generate_sample(wav, D_POSE, T, jax.random.key(52),
                                  noise=noise)
    assert gen_fused.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_misaligned_window_matches_scan():
    """pose window not a multiple of 8 (the tedexp configs use T=34), with
    the seed-pose blend ramp exercising the padded blend tensors."""
    t = 12
    model, variables, gen_scan, gen_fused = _zoo("s2g_v2", WAV, t, 60)
    noise = jax.random.normal(jax.random.key(61), (N, t, D_POSE))
    seeds = jnp.asarray(np.random.default_rng(62).normal(
        size=(N, t, D_POSE)).astype(np.float32))
    mask = jnp.zeros((N, t, 1)).at[:, :3].set(1.0)
    kw = dict(noise=noise, inpaint_poses=seeds, inpaint_masks=mask,
              trans_factor=0.5, pose_seed_len=3)
    a = gen_scan.generate_sample(WAV, D_POSE, t, jax.random.key(63), **kw)
    b = gen_fused.generate_sample(WAV, D_POSE, t, jax.random.key(63), **kw)
    assert gen_fused.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_misaligned_both_clip_packed():
    """window AND memory both padded, 4 clips packed per grid program (the
    per-clip pad rows must survive the (n, rows) -> (n_prog, n_clips*rows)
    reshape as in-block tails)."""
    t = 12
    wav = jnp.asarray(np.random.default_rng(70).normal(
        0, 0.3, (8, 8000)).astype(np.float32))
    model, variables, gen_scan, gen_fused = _zoo("default", wav, t, 70)
    noise = jax.random.normal(jax.random.key(71), (8, t, D_POSE))
    a = gen_scan.generate_sample(wav, D_POSE, t, jax.random.key(72),
                                 noise=noise)
    b = gen_fused.generate_sample(wav, D_POSE, t, jax.random.key(72),
                                  noise=noise)
    assert gen_fused.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_real_length_validation(setup):
    import gesture_diffusion_tpu.ops.fused_sampler as fs

    _, gen_fused = setup
    packed = fs.pack_oneway_denoiser(
        gen_fused.variables["params"], D_POSE, T, weight_dtype=jnp.float32)
    tmap = jnp.asarray(np.asarray(gen_fused.timestep_map)[:, None]
                       .astype(np.int32))
    coefs = jnp.asarray(fs.ddim_coefficients(gen_fused.sched))
    x_T = jnp.zeros((N, T, 128))
    mem = jnp.zeros((N, 8, DM))
    kw = dict(n_layers=1, heads=8, num_steps=tmap.shape[0],
              compute_dtype=jnp.float32, interpret=True)
    with pytest.raises(ValueError, match="t_real"):
        fs.fused_ddim_sample(packed, x_T, mem, tmap, coefs, None, None,
                             t_real=T + 1, **kw)
    with pytest.raises(ValueError, match="token row"):
        fs.fused_ddim_sample(packed, x_T, mem, tmap, coefs, None, None,
                             n_mem_real=1, **kw)


# -- Generator(mesh=...): fused kernel under shard_map ---------------------

def _mesh_generators(setup, n_data=2):
    from gesture_diffusion_tpu.parallel import make_mesh

    gen_scan, shared = setup
    # fresh single-device fused generator: the module-scoped one may have
    # self-disabled (test_fused_ddpm_stochastic exercises the CPU runtime
    # fallback, which flips use_fused off permanently)
    gen_fused = Generator(shared.model, shared.variables, shared.sched,
                          shared.timestep_map, use_fused=True,
                          fused_dtype=jnp.float32)
    mesh = make_mesh(n_data=n_data, n_model=1,
                     devices=jax.devices()[:n_data])
    gen_mesh = Generator(shared.model, shared.variables,
                         shared.sched, shared.timestep_map,
                         use_fused=True, fused_dtype=jnp.float32, mesh=mesh)
    return gen_scan, gen_fused, gen_mesh


def test_fused_mesh_matches_scan_and_single_device(setup):
    """Generator(mesh=...) runs the fused kernel one-instance-per-data-
    shard (shard_map, weights replicated, zero collectives) and matches
    both the scan path and the single-device fused path on the same
    inputs.  Per-shard clip packing differs from single-device packing
    (n_local=2 -> 2-clip programs vs one 4-clip program), so agreement
    here also re-checks packing invariance."""
    gen_scan, gen_fused, gen_mesh = _mesh_generators(setup)
    n = 4
    wav4 = jnp.concatenate([WAV, WAV], axis=0)
    noise = jax.random.normal(jax.random.key(31), (n, T, D_POSE))
    a = gen_scan.generate_sample(wav4, D_POSE, T, jax.random.key(32),
                                 noise=noise)
    b = gen_fused.generate_sample(wav4, D_POSE, T, jax.random.key(32),
                                  noise=noise)
    c = gen_mesh.generate_sample(wav4, D_POSE, T, jax.random.key(32),
                                 noise=noise)
    assert gen_fused.last_sample_path == "fused"
    assert gen_mesh.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-3)
    np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=2e-3)


def test_fused_mesh_with_inpaint_ramp_matches_scan(setup):
    """The blend/inpaint tensors shard with the batch under the mesh."""
    gen_scan, _, gen_mesh = _mesh_generators(setup)
    n = 4
    wav4 = jnp.concatenate([WAV, WAV], axis=0)
    noise = jax.random.normal(jax.random.key(33), (n, T, D_POSE))
    seeds = jnp.asarray(np.random.default_rng(34).normal(
        size=(n, T, D_POSE)).astype(np.float32))
    mask = jnp.zeros((n, T, 1)).at[:, :3].set(1.0)
    kw = dict(noise=noise, inpaint_poses=seeds, inpaint_masks=mask,
              trans_factor=0.5, pose_seed_len=3)
    a = gen_scan.generate_sample(wav4, D_POSE, T, jax.random.key(35), **kw)
    c = gen_mesh.generate_sample(wav4, D_POSE, T, jax.random.key(35), **kw)
    assert gen_mesh.last_sample_path == "fused"
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-3)


def test_fused_mesh_seed_continues_program_stream_per_shard(setup,
                                                            monkeypatch):
    """Each shard's kernel seed continues the kernel's
    seed + program_id*9973 stream where the previous shard's programs
    left off — equal per-shard seeds would draw IDENTICAL per-step DDPM
    noise on every shard.  The in-kernel PRNG has no CPU lowering (even
    interpreted), so the wiring is checked with a kernel mock that
    echoes the seed each shard received: with n=4 over 2 shards and
    2-clip packing (1 program per shard), shard 1 must see shard 0's
    seed + 1*9973 exactly."""
    import gesture_diffusion_tpu.ops.fused_sampler as fs

    _, _, gen_mesh = _mesh_generators(setup)

    def echo_seed(packed, x_T, mem, tmap, coefs, ba, bb, **kw):
        # int32 passthrough: a float cast would round large seeds (f32
        # spacing near 2^31 is 256) and hide the exact +9973 offset
        return jnp.broadcast_to(jnp.asarray(kw["seed"], jnp.int32),
                                x_T.shape)

    monkeypatch.setattr(fs, "fused_ddim_sample", echo_seed)
    n = 4
    wav_same = jnp.tile(WAV[:1], (n, 1))
    noise_same = jnp.tile(
        jax.random.normal(jax.random.key(36), (1, T, D_POSE)), (n, 1, 1))
    out = np.asarray(gen_mesh.generate_sample(
        wav_same, D_POSE, T, jax.random.key(37), noise=noise_same,
        sample_alg="ddpm"))
    assert gen_mesh.last_sample_path == "fused"
    seeds = out[:, 0, 0].astype(np.int64)      # per-clip echoed seed
    # clips within a shard share the seed; shard 1 = shard 0 + 1*9973
    assert seeds[0] == seeds[1] and seeds[2] == seeds[3]
    assert seeds[2] - seeds[0] == 9973, \
        f"shard seed offset wrong: {seeds}"


def test_fused_mesh_indivisible_batch_falls_back_to_scan(setup):
    """A batch not divisible by the data axis cannot shard; it is then
    judged by the SINGLE-DEVICE heuristic — n=3 packs poorly (gcd(3,8)=1)
    so it lands on the scan path, same as a mesh-less Generator."""
    _, _, gen_mesh = _mesh_generators(setup)
    wav3 = jnp.concatenate([WAV, WAV[:1]], axis=0)      # n=3, 2 shards
    noise = jax.random.normal(jax.random.key(38), (3, T, D_POSE))
    out = gen_mesh.generate_sample(wav3, D_POSE, T, jax.random.key(39),
                                   noise=noise)
    assert gen_mesh.last_sample_path == "scan"
    assert np.isfinite(np.asarray(out)).all()


def test_fused_mesh_indivisible_small_batch_runs_fused_unsharded(setup):
    """An indivisible batch that the single-device heuristic accepts
    (n=1 <= 2) must stay on the fused path, UNSHARDED — it must not
    regress to the scan sampler just because a mesh is attached (the
    CLI's eval-time phase measures exactly this shape), and it must
    match the mesh-less fused Generator bit-exactly (same program:
    n_shards=1 keys the same cache entry shape)."""
    _, gen_fused, gen_mesh = _mesh_generators(setup)
    noise = jax.random.normal(jax.random.key(40), (1, T, D_POSE))
    a = gen_fused.generate_sample(WAV[:1], D_POSE, T, jax.random.key(41),
                                  noise=noise)
    c = gen_mesh.generate_sample(WAV[:1], D_POSE, T, jax.random.key(41),
                                 noise=noise)
    assert gen_fused.last_sample_path == "fused"
    assert gen_mesh.last_sample_path == "fused"
    np.testing.assert_array_equal(np.asarray(c), np.asarray(a))


def test_generator_mesh_requires_data_axis(setup):
    from jax.sharding import Mesh

    _, gen_fused = setup
    bad = Mesh(np.array(jax.devices()[:2]), ("model",))
    with pytest.raises(ValueError, match="data"):
        Generator(gen_fused.model, gen_fused.variables, gen_fused.sched,
                  gen_fused.timestep_map, mesh=bad)


def test_generator_mesh_rejects_model_axis(setup):
    """shard_map maps over EVERY mesh axis; a model axis > 1 would run
    duplicate kernel instances with the extra chips' outputs discarded.
    Reject it at construction instead of silently wasting the fleet."""
    from gesture_diffusion_tpu.parallel import make_mesh

    _, gen_fused = setup
    bad = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="data-only"):
        Generator(gen_fused.model, gen_fused.variables, gen_fused.sched,
                  gen_fused.timestep_map, mesh=bad)
    # a trailing size-1 model axis stays fine (make_mesh always emits 2-D)
    ok = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    Generator(gen_fused.model, gen_fused.variables, gen_fused.sched,
              gen_fused.timestep_map, mesh=ok)
