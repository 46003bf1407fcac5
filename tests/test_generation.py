"""Generator tests: window sampling determinism, seed-pose inpainting,
long-sequence chunking math, and the bpd evaluation path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu.diffusion import (
    linear_betas,
    respaced_schedule,
    space_timesteps,
)
from gesture_diffusion_tpu.generation import Generator
from gesture_diffusion_tpu.generation.generator import make_trans_ramp
from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser

D_POSE, T_POSE, T_WAV = 12, 10, 8000


@pytest.fixture(scope="module")
def gen():
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=32, heads=4, n_layers=1)
    model = GestureDenoiser(cfg)
    wav = jnp.zeros((2, T_WAV))
    variables = model.init(jax.random.key(0), jnp.zeros((2, T_POSE, D_POSE)),
                           jnp.zeros((2,), jnp.int32), wav, train=False)
    sched, tmap = respaced_schedule(
        linear_betas(100), space_timesteps(100, "ddim10"))
    return Generator(model, variables, sched, jnp.asarray(tmap))


def _wav(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        0, 0.3, (n, T_WAV)).astype(np.float32))


class TestGenerateSample:
    def test_shape_and_determinism(self, gen):
        wavs = _wav(2)
        a = gen.generate_sample(wavs, D_POSE, T_POSE, jax.random.key(1))
        b = gen.generate_sample(wavs, D_POSE, T_POSE, jax.random.key(1))
        assert a.shape == (2, T_POSE, D_POSE)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_wav_conditioning_matters(self, gen):
        noise = jax.random.normal(jax.random.key(2), (2, T_POSE, D_POSE))
        a = gen.generate_sample(_wav(2, 0), D_POSE, T_POSE, jax.random.key(3), noise=noise)
        b = gen.generate_sample(_wav(2, 9), D_POSE, T_POSE, jax.random.key(3), noise=noise)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_hard_seed_inpaint_copies_seed_frames(self, gen):
        """trans_factor=None -> blended x0 keeps seed frames verbatim; the
        DDIM eta=0 final step (t=0) returns blended x0, so the output's
        seed frames equal the seeds exactly."""
        seed_len = 4
        seeds = jnp.asarray(np.random.default_rng(5).normal(
            size=(2, T_POSE, D_POSE)).astype(np.float32))
        mask = jnp.zeros((2, T_POSE, 1)).at[:, :seed_len].set(1.0)
        out = gen.generate_sample(
            _wav(2), D_POSE, T_POSE, jax.random.key(4),
            inpaint_poses=seeds, inpaint_masks=mask)
        np.testing.assert_allclose(
            np.asarray(out[:, :seed_len]), np.asarray(seeds[:, :seed_len]),
            atol=1e-5)

    def test_trans_factor_ramp_blends(self, gen):
        seed_len = 4
        seeds = jnp.zeros((2, T_POSE, D_POSE)) + 5.0
        mask = jnp.zeros((2, T_POSE, 1)).at[:, :seed_len].set(1.0)
        out = gen.generate_sample(
            _wav(2), D_POSE, T_POSE, jax.random.key(5),
            inpaint_poses=seeds, inpaint_masks=mask,
            trans_factor=0.5, pose_seed_len=seed_len)
        out_free = gen.generate_sample(
            _wav(2), D_POSE, T_POSE, jax.random.key(5))
        # ramped frames are pulled toward the seed but not equal to it
        assert not np.allclose(np.asarray(out[:, :seed_len]), 5.0, atol=1e-3)
        assert np.abs(np.asarray(out[:, :seed_len]) - 5.0).mean() < \
            np.abs(np.asarray(out_free[:, :seed_len]) - 5.0).mean()

    def test_ddpm_alg(self, gen):
        out = gen.generate_sample(_wav(2), D_POSE, T_POSE, jax.random.key(6),
                                  sample_alg="ddpm")
        assert np.isfinite(np.asarray(out)).all()

    def test_ramp_layout(self):
        r = make_trans_ramp(0.5, 4, 10)
        assert r.shape == (1, 10, 1)
        np.testing.assert_allclose(r[0, :, 0],
                                   [0.5, 0.625, 0.75, 0.875, 1, 1, 1, 1, 1, 1])


class TestGenerateSequence:
    def test_length_and_continuity(self, gen):
        # 2 s of audio @ 16 kHz -> 40 pose frames @ 20 fps (seq_len floors
        # to whole seconds, matching the reference generator.py:109)
        wav = jnp.asarray(np.random.default_rng(7).normal(
            0, 0.3, (2, 32000)).astype(np.float32))
        init = jnp.zeros((2, 4, D_POSE))
        out = gen.generate_sequence(
            wav, wav_sr=16000, pose_dim=D_POSE, pose_fps=20,
            pose_window_len=T_POSE, pose_seed_len=4,
            rng=jax.random.key(8), smooth_trans=True, trans_factor=0.5,
            init_poses=init)
        assert out.shape == (2, 40, D_POSE)
        jumps = np.abs(np.diff(out, axis=1)).max(axis=(0, 2))
        assert np.isfinite(jumps).all()

    def test_no_init_poses_unconditioned_first_chunk(self, gen):
        wav = jnp.asarray(np.random.default_rng(9).normal(
            0, 0.3, (1, 16000)).astype(np.float32))
        out = gen.generate_sequence(
            wav, 16000, D_POSE, 20, T_POSE, 4,
            rng=jax.random.key(10), smooth_trans=False)
        assert out.shape == (1, 20, D_POSE)


class TestEvalPaths:
    def test_eval_bpd(self, gen):
        poses = jnp.asarray(np.random.default_rng(11).normal(
            size=(2, T_POSE, D_POSE)).astype(np.float32))
        out = gen.eval_bpd(poses, _wav(2), jax.random.key(12))
        assert out["vb"].shape == (2, 10)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()

    def test_update_variables_changes_output(self, gen):
        """update_variables must invalidate weight caches so subsequent
        samples use the new weights (a bare .variables assignment would
        leave the fused path's packed weights stale)."""
        import jax as _jax

        old_vars = gen.variables
        noise = jax.random.normal(jax.random.key(7), (1, T_POSE, D_POSE))
        a = gen.generate_sample(_wav(1), D_POSE, T_POSE, jax.random.key(8),
                                noise=noise)
        perturbed = _jax.tree.map(lambda x: x + 0.05, old_vars["params"])
        gen.update_variables({"params": perturbed,
                              **{k: v for k, v in old_vars.items()
                                 if k != "params"}})
        b = gen.generate_sample(_wav(1), D_POSE, T_POSE, jax.random.key(8),
                                noise=noise)
        gen.update_variables(old_vars)
        c = gen.generate_sample(_wav(1), D_POSE, T_POSE, jax.random.key(8),
                                noise=noise)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(a), np.asarray(c))

    def test_eval_infer_time(self, gen):
        mean_ms, std_ms, steps_per_sec = gen.eval_infer_time(
            _wav(1), D_POSE, T_POSE, repetitions=2, warmup=1)
        assert mean_ms > 0 and steps_per_sec > 0


def test_integer_wav_rejected(gen):
    """Integer PCM (scipy.io.wavfile.read's output) is 32768x the trained
    [-1,1] scale; silently casting produced garbage poses with no error.
    All three public wav entries reject it (fuzz finding)."""
    int_wav = np.zeros((2, T_WAV), np.int16)
    with pytest.raises(TypeError, match="integer dtype.*load_wav"):
        gen.generate_sample(int_wav, D_POSE, T_POSE, jax.random.key(1))
    with pytest.raises(TypeError, match="integer dtype"):
        gen.generate_sequence(int_wav, 16000, D_POSE, 20, T_POSE, 5,
                              jax.random.key(1))
    stream = gen.stream(16000, D_POSE, 20, T_POSE, 5, jax.random.key(1))
    with pytest.raises(TypeError, match="integer dtype"):
        stream.push(np.zeros(1600, np.int32))
