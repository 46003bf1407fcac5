"""Generator.stream(): push-API output must equal the offline
``generate_sequence`` on the same audio and rng (reference continuation
semantics, ``models/generator.py:80-195``), regardless of push chunking
or in-flight depth."""

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
from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser

D_POSE, T_POSE, SEED_LEN = 12, 10, 4
SR, FPS = 16000, 20          # 10-frame window = 0.5 s = 8000 samples
WAV_WINDOW = SR * T_POSE // FPS


@pytest.fixture(scope="module")
def gen():
    cfg = DenoiserConfig(d_pose=D_POSE, d_model=32, heads=4, n_layers=1)
    model = GestureDenoiser(cfg)
    wav = jnp.zeros((1, WAV_WINDOW))
    variables = model.init(jax.random.key(0), jnp.zeros((1, T_POSE, D_POSE)),
                           jnp.zeros((1,), jnp.int32), wav, train=False)
    sched, tmap = respaced_schedule(
        linear_betas(100), space_timesteps(100, "ddim5"))
    return Generator(model, variables, sched, jnp.asarray(tmap))


def _long_wav(seconds, n=1, seed=0):
    return np.random.default_rng(seed).normal(
        0, 0.3, (n, SR * seconds)).astype(np.float32)


def _offline(gen, wav, **kw):
    return gen.generate_sequence(
        jnp.asarray(wav), SR, D_POSE, FPS, T_POSE, SEED_LEN,
        rng=jax.random.key(42), **kw)


def _streamed(gen, wav, chunk, max_in_flight=4, **kw):
    stream = gen.stream(SR, D_POSE, FPS, T_POSE, SEED_LEN,
                        rng=jax.random.key(42),
                        max_in_flight=max_in_flight, **kw)
    chunks = []
    for i in range(0, wav.shape[-1], chunk):
        chunks.extend(stream.push(wav[:, i:i + chunk]))
    chunks.extend(stream.flush())
    return np.concatenate(chunks, axis=1)


class TestStreamEqualsOffline:
    def test_basic(self, gen):
        wav = _long_wav(2)
        ref = _offline(gen, wav)
        out = _streamed(gen, wav, chunk=3000)
        assert out.shape == ref.shape == (1, 2 * FPS, D_POSE)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_chunk_size_invariance(self, gen):
        wav = _long_wav(2, seed=1)
        ref = _streamed(gen, wav, chunk=WAV_WINDOW)
        for chunk in (512, 7999, 16000):
            out = _streamed(gen, wav, chunk=chunk)
            np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_in_flight_depth_invariance(self, gen):
        wav = _long_wav(2, seed=2)
        ref = _streamed(gen, wav, chunk=4000, max_in_flight=1)
        out = _streamed(gen, wav, chunk=4000, max_in_flight=8)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_with_init_poses_and_ramp(self, gen):
        wav = _long_wav(2, seed=3)
        init = np.random.default_rng(7).normal(
            size=(1, SEED_LEN, D_POSE)).astype(np.float32)
        kw = dict(init_poses=jnp.asarray(init), trans_factor=0.5)
        ref = _offline(gen, wav, **kw)
        out = _streamed(gen, wav, chunk=2500, **kw)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_no_smooth_trans(self, gen):
        wav = _long_wav(1, seed=4)
        ref = _offline(gen, wav, smooth_trans=False)
        out = _streamed(gen, wav, chunk=1000, smooth_trans=False)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_batch_of_streams(self, gen):
        wav = _long_wav(2, n=2, seed=5)
        ref = _offline(gen, wav)
        out = _streamed(gen, wav, chunk=6000)
        assert out.shape == (2, 2 * FPS, D_POSE)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_fractional_second_audio(self, gen):
        """Total audio that is NOT a whole number of seconds: the offline
        plan truncates output to whole seconds (window_plan), and eager
        dispatch must not issue windows beyond that plan.  Regression for
        streamed (1, 30, C) vs offline (1, 20, C) on 1.9 s of audio."""
        for seconds in (1.9, 2.3, 3.05):
            wav = np.random.default_rng(11).normal(
                0, 0.3, (1, int(SR * seconds))).astype(np.float32)
            ref = _offline(gen, wav)
            out = _streamed(gen, wav, chunk=2000)
            assert out.shape == np.asarray(ref).shape
            np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_buffer_stays_bounded(self, gen):
        """A long-running stream must hold O(window) audio, not O(stream)
        (GestureStream._compact): regression for the un-called compaction."""
        wav = _long_wav(6, seed=8)
        stream = gen.stream(SR, D_POSE, FPS, T_POSE, SEED_LEN,
                            rng=jax.random.key(42), max_in_flight=2)
        chunks = []
        max_buffered = 0
        for i in range(0, wav.shape[-1], 1000):
            chunks.extend(stream.push(wav[:, i:i + 1000]))
            max_buffered = max(
                max_buffered, sum(c.shape[-1] for c in stream._buf))
        chunks.extend(stream.flush())
        # bound: one window of look-back, plus up to one second of
        # plan-confirmation lag (dispatch waits for the whole-second
        # window plan to include a window), plus one push chunk of slack
        assert max_buffered <= stream.wav_window_len + SR + 1000
        ref = _offline(gen, wav)
        np.testing.assert_allclose(
            np.concatenate(chunks, axis=1), np.asarray(ref), atol=1e-5)

    def test_nonmonotone_plan_config(self):
        """window_plan is NOT monotone in wav_len when stride > fps (the
        -1 correction shrinks the plan as audio grows); stream dispatch
        must still match offline.  fps=4, window=12, seed=5 -> stride 7:
        2 s of audio plans 2 windows, 3 s plans 1."""
        from gesture_diffusion_tpu.generation.generator import window_plan
        assert window_plan(2 * SR, SR, 4, 12, 5) == (8, 2)
        assert window_plan(3 * SR, SR, 4, 12, 5) == (12, 1)   # shrank

        fps, t_pose, seed_len = 4, 12, 5
        wav_window = SR * t_pose // fps
        cfg = DenoiserConfig(d_pose=D_POSE, d_model=32, heads=4, n_layers=1)
        model = GestureDenoiser(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, t_pose, D_POSE)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, wav_window)),
            train=False)
        sched, tmap = respaced_schedule(
            linear_betas(100), space_timesteps(100, "ddim5"))
        g = Generator(model, variables, sched, jnp.asarray(tmap))
        for seconds in (2, 3):
            wav = _long_wav(seconds, seed=20 + seconds)
            ref = g.generate_sequence(
                jnp.asarray(wav), SR, D_POSE, fps, t_pose, seed_len,
                rng=jax.random.key(42))
            stream = g.stream(SR, D_POSE, fps, t_pose, seed_len,
                              rng=jax.random.key(42))
            chunks = []
            for i in range(0, wav.shape[-1], 5000):
                chunks.extend(stream.push(wav[:, i:i + 5000]))
            chunks.extend(stream.flush())
            out = np.concatenate(chunks, axis=1)
            assert out.shape == np.asarray(ref).shape == (
                1, seconds * fps, D_POSE)
            np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_seed_ge_window_rejected(self):
        # ValueError (not assert) so the check survives `python -O`
        from gesture_diffusion_tpu.generation.generator import window_plan
        with pytest.raises(ValueError, match="stride would be <= 0"):
            window_plan(SR, SR, FPS, T_POSE, T_POSE)

    def test_sub_second_audio_empty_output(self, gen):
        """<1 s of audio truncates to zero output frames: offline returns
        an empty (N, 0, C) array and the stream emits no chunks — the two
        paths must agree instead of the reference's th.cat([]) crash
        (documented deviation, window_plan docstring)."""
        from gesture_diffusion_tpu.generation.generator import window_plan
        assert window_plan(SR - 1, SR, FPS, T_POSE, SEED_LEN) == (0, 0)
        wav = np.random.default_rng(9).normal(
            0, 0.3, (1, SR // 2)).astype(np.float32)
        out = _offline(gen, wav)
        assert np.asarray(out).shape == (1, 0, D_POSE)
        stream = gen.stream(SR, D_POSE, FPS, T_POSE, SEED_LEN,
                            rng=jax.random.key(42))
        chunks = stream.push(wav) + stream.flush()
        assert chunks == []

    def test_degenerate_plan_raises_consistently(self, gen):
        """seq_len > 0 but zero planned windows (seq_len == seed mod
        stride, seq_len <= stride — the reference plans no window yet owes
        frames and dies in th.cat([])): both paths raise the same clear
        ValueError."""
        from gesture_diffusion_tpu.generation.generator import window_plan
        fps, t_pose, seed_len = 5, 12, 5        # stride 7; 1 s -> seq 5
        with pytest.raises(ValueError, match="audio too short"):
            window_plan(SR, SR, fps, t_pose, seed_len)
        wav = np.random.default_rng(10).normal(
            0, 0.3, (1, SR)).astype(np.float32)
        with pytest.raises(ValueError, match="audio too short"):
            gen.generate_sequence(jnp.asarray(wav), SR, D_POSE, fps,
                                  t_pose, seed_len, rng=jax.random.key(0))
        stream = gen.stream(SR, D_POSE, fps, t_pose, seed_len,
                            rng=jax.random.key(0))
        assert stream.push(wav) == []           # transient: no crash
        with pytest.raises(ValueError, match="audio too short"):
            stream.flush()

    def test_transient_degenerate_plan_recovers(self):
        """A stream whose PARTIAL audio passes through the degenerate
        plan length (1 s at fps=5, window=12, seed=5 -> 5 frames, 0
        windows) must not crash mid-push and must still match offline
        once enough audio arrives."""
        fps, t_pose, seed_len = 5, 12, 5
        wav_window = SR * t_pose // fps
        cfg = DenoiserConfig(d_pose=D_POSE, d_model=32, heads=4, n_layers=1)
        model = GestureDenoiser(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, t_pose, D_POSE)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, wav_window)),
            train=False)
        sched, tmap = respaced_schedule(
            linear_betas(100), space_timesteps(100, "ddim5"))
        g = Generator(model, variables, sched, jnp.asarray(tmap))
        wav = _long_wav(3, seed=12)
        ref = g.generate_sequence(jnp.asarray(wav), SR, D_POSE, fps,
                                  t_pose, seed_len, rng=jax.random.key(42))
        stream = g.stream(SR, D_POSE, fps, t_pose, seed_len,
                          rng=jax.random.key(42))
        chunks = []
        for i in range(0, wav.shape[-1], SR):   # 1-second pushes
            chunks.extend(stream.push(wav[:, i:i + SR]))
        chunks.extend(stream.flush())
        out = np.concatenate(chunks, axis=1)
        assert out.shape == np.asarray(ref).shape == (1, 3 * fps, D_POSE)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_incremental_emission(self, gen):
        """Chunks must come out DURING streaming (pipelined), not all at
        flush."""
        wav = _long_wav(4, seed=6)
        stream = gen.stream(SR, D_POSE, FPS, T_POSE, SEED_LEN,
                            rng=jax.random.key(0), max_in_flight=1)
        seen_before_flush = 0
        for i in range(0, wav.shape[-1], 2000):
            seen_before_flush += len(stream.push(wav[:, i:i + 2000]))
        assert seen_before_flush > 0
        total = seen_before_flush + len(stream.flush())
        assert total >= seen_before_flush + 1
