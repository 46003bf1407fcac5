"""Diffusion-core tests.

Golden values in this file were produced by executing the *reference*
implementation (/root/reference, torch CPU) with a deterministic fake model
``eps = 0.1*x + 0.05 + 0.001*t`` and fixed numpy-seeded noise — behavioural
equivalence without code sharing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu import diffusion as gd


def fake_model(x, t):
    # layout here is (N, T, C); reference ran (N, C, T) — the op is
    # elementwise so values match after transpose.
    return 0.1 * x + 0.05 + 0.001 * t.astype(jnp.float32)[:, None, None]


@pytest.fixture(scope="module")
def sched1000():
    return gd.make_schedule(gd.linear_betas(1000))


class TestSchedules:
    def test_linear_betas_golden(self):
        b = gd.linear_betas(1000)
        assert b[0] == pytest.approx(1e-4)
        assert b[-1] == pytest.approx(2e-2)

    def test_coefficient_table_golden(self, sched1000):
        s = sched1000
        assert float(s.alphas_cumprod[999]) == pytest.approx(4.035829765375676e-05, rel=1e-5)
        assert float(s.sqrt_alphas_cumprod[123]) == pytest.approx(0.9210647550353591, rel=1e-6)
        assert float(s.posterior_variance[1]) == pytest.approx(5.4531876613021935e-05, rel=1e-5)
        assert float(s.posterior_log_variance_clipped[0]) == pytest.approx(-9.81672513529567, rel=1e-6)
        assert float(s.posterior_mean_coef1[500]) == pytest.approx(0.003058057075629619, rel=1e-5)
        assert float(s.posterior_mean_coef2[500]) == pytest.approx(0.9941043507567258, rel=1e-6)

    def test_cosine_schedule_valid(self):
        b = gd.cosine_betas(1000)
        assert (b > 0).all() and (b <= 0.999).all()


class TestRespace:
    def test_space_timesteps_ddim50(self):
        st = sorted(gd.space_timesteps(1000, "ddim50"))
        assert st[:5] == [0, 20, 40, 60, 80]
        assert st[-1] == 980 and len(st) == 50

    def test_respaced_betas_golden(self):
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), gd.space_timesteps(1000, "ddim50"))
        np.testing.assert_allclose(
            np.asarray(sched.betas[:3]),
            [1.0000000000e-04, 6.1651879466e-03, 1.4056562866e-02], rtol=1e-5)
        assert list(np.asarray(tmap[:5])) == [0, 20, 40, 60, 80]

    def test_fast27(self):
        st = gd.space_timesteps(1000, "fast27")
        assert len(st) == 27 and 997 in st and 999 not in st

    def test_sections(self):
        st = sorted(gd.space_timesteps(300, "10,15,20"))
        assert len(st) == 45


class TestQProcess:
    def test_q_sample_statistics(self, sched1000):
        rng = jax.random.key(0)
        x0 = jnp.ones((2048, 4, 3))
        t = jnp.full((2048,), 500)
        noise = jax.random.normal(rng, x0.shape)
        xt = gd.q_sample(sched1000, x0, t, noise)
        want_mean = float(sched1000.sqrt_alphas_cumprod[500])
        want_std = float(sched1000.sqrt_one_minus_alphas_cumprod[500])
        assert np.asarray(xt).mean() == pytest.approx(want_mean, abs=0.01)
        assert np.asarray(xt).std() == pytest.approx(want_std, abs=0.01)

    def test_q_sample_t_minus_one_passthrough(self, sched1000):
        x0 = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
        noise = jnp.ones_like(x0)
        t = jnp.array([-1, 3])
        xt = gd.q_sample(sched1000, x0, t, noise)
        np.testing.assert_allclose(np.asarray(xt[0]), np.asarray(x0[0]))
        assert not np.allclose(np.asarray(xt[1]), np.asarray(x0[1]))

    def test_xstart_eps_inverse(self, sched1000):
        rng = jax.random.key(1)
        x0 = jax.random.normal(rng, (8, 5, 3))
        noise = jax.random.normal(jax.random.key(2), x0.shape)
        t = jnp.arange(8) * 100 + 50
        xt = gd.q_sample(sched1000, x0, t, noise)
        eps_back = gd.predict_eps_from_xstart(sched1000, xt, t, x0)
        np.testing.assert_allclose(np.asarray(eps_back), np.asarray(noise), atol=2e-3)
        x0_back = gd.predict_xstart_from_eps(sched1000, xt, t, noise)
        np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=2e-3)


def _ref_noise(shape_nct, seed):
    """Noise drawn like the golden-generation script: (N,C,T) order, then
    transposed to our (N,T,C) layout."""
    z = np.random.default_rng(seed).normal(size=shape_nct).astype(np.float32)
    return jnp.asarray(np.swapaxes(z, 1, 2))


class TestGoldenEquivalence:
    def test_ddim50_loop_matches_reference(self):
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), gd.space_timesteps(1000, "ddim50"))
        noise = _ref_noise((2, 3, 5), 42)
        out = gd.ddim_sample_loop(sched, fake_model, noise, jax.random.key(0),
                                  timestep_map=tmap)
        out_nct = np.swapaxes(np.asarray(out), 1, 2)
        golden = np.array([-54.29933, -157.56601, -20.069063, -5.469236, -227.5306])
        np.testing.assert_allclose(out_nct[0, 0], golden, rtol=2e-4)

    def test_ddim1000_loop_matches_reference(self):
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), range(1000))
        noise = _ref_noise((2, 3, 5), 42)
        out = gd.ddim_sample_loop(sched, fake_model, noise, jax.random.key(0),
                                  timestep_map=tmap)
        out_nct = np.swapaxes(np.asarray(out), 1, 2)
        golden = np.array([-63.867783, -183.13852, -24.332378, -7.4699426, -263.9462])
        np.testing.assert_allclose(out_nct[0, 0], golden, rtol=2e-4)

    def test_training_losses_match_reference(self):
        sched = gd.make_schedule(gd.linear_betas(1000))
        x0 = _ref_noise((2, 3, 5), 7)
        noise = _ref_noise((2, 3, 5), 8)
        t = jnp.array([10, 700])
        tl = gd.training_losses(sched, fake_model, x0, t, noise)
        np.testing.assert_allclose(np.asarray(tl["mse"]), [1.3923122, 1.2358441], rtol=1e-5)
        pxs = np.swapaxes(np.asarray(tl["pred_x_start"]), 1, 2)
        np.testing.assert_allclose(
            pxs[0, 0], [-0.08270651, 0.23215762, -0.33918434, -0.90564245, -0.56327313],
            rtol=1e-4)
        mm = np.swapaxes(np.asarray(tl["model_mean"]), 1, 2)
        np.testing.assert_allclose(
            mm[1, 2], [-0.26650378, -0.3760513, 0.16391535, -1.8351109, 1.5547093],
            rtol=1e-4)

    def test_prior_bpd_matches_reference(self):
        from gesture_diffusion_tpu.diffusion.sampling import prior_bpd

        sched = gd.make_schedule(gd.linear_betas(1000))
        x0 = _ref_noise((2, 3, 5), 7)
        # prior bpd is ~0; fp32 cancellation in normal_kl dominates, so
        # compare with an absolute tolerance at that scale.
        np.testing.assert_allclose(
            np.asarray(prior_bpd(sched, x0)), [1.1295104e-05, 3.8047063e-05], atol=2e-6)


class TestSamplers:
    def test_ddim_eta0_deterministic(self):
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), gd.space_timesteps(1000, "ddim50"))
        noise = _ref_noise((2, 3, 5), 5)
        a = gd.ddim_sample_loop(sched, fake_model, noise, jax.random.key(1), timestep_map=tmap)
        b = gd.ddim_sample_loop(sched, fake_model, noise, jax.random.key(99), timestep_map=tmap)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_ddpm_runs_and_denoise_fn_applied(self):
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), gd.space_timesteps(1000, "ddim10"))
        noise = _ref_noise((2, 3, 5), 6)

        def clamp_denoise(x0_hat):
            return jnp.clip(x0_hat, -1.0, 1.0)

        out = gd.ddpm_sample_loop(sched, fake_model, noise, jax.random.key(2),
                                  denoise_fn=clamp_denoise, timestep_map=tmap)
        assert np.isfinite(np.asarray(out)).all()

    def test_perfect_model_recovers_x0(self):
        """With model_fn returning the exact forward noise, DDIM eta=0 from
        x_T = q_sample(x0, T-1, eps) must reconstruct x0's direction."""
        sched = gd.make_schedule(gd.linear_betas(100))
        x0 = _ref_noise((2, 3, 8), 11)
        eps = _ref_noise((2, 3, 8), 12)

        def oracle(x, t):
            return jnp.broadcast_to(eps, x.shape)

        t_top = jnp.full((2,), 99)
        x_T = gd.q_sample(sched, x0, t_top, eps)
        out = gd.ddim_sample_loop(sched, oracle, x_T, jax.random.key(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)


class TestBpd:
    def test_bpd_shapes_and_finiteness(self):
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), gd.space_timesteps(1000, "ddim25"))
        x0 = _ref_noise((3, 4, 6), 13)
        out = gd.bpd_loop(sched, fake_model, x0, jax.random.key(4), timestep_map=tmap)
        assert out["vb"].shape == (3, 25)
        assert out["total_bpd"].shape == (3,)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"]),
            np.asarray(out["vb"].sum(1) + out["prior_bpd"]), rtol=1e-5)

    def test_bpd_t_block_invariance(self):
        """t_block=k stacks k timesteps per model call; noise is keyed
        per timestep (fold_in(rng, t)) so every block size computes the
        SAME sweep up to f32 reduction order — including the respaced
        per-t vb/mse columns and their ordering."""
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(1000), gd.space_timesteps(1000, "ddim24"))
        x0 = _ref_noise((3, 4, 6), 13)
        outs = {k: gd.bpd_loop(sched, fake_model, x0, jax.random.key(4),
                               timestep_map=tmap, t_block=k)
                for k in (1, 2, 4)}
        for k in (2, 4):
            for name in ("total_bpd", "vb", "x_start_mse", "mse"):
                np.testing.assert_allclose(
                    np.asarray(outs[k][name]), np.asarray(outs[1][name]),
                    rtol=2e-5, atol=1e-6, err_msg=f"{name} @ t_block={k}")
        with pytest.raises(ValueError, match="t_block"):
            gd.bpd_loop(sched, fake_model, x0, jax.random.key(4),
                        timestep_map=tmap, t_block=5)

    def test_generator_eval_bpd_t_block_tiles_conditioning(self):
        """Generator.eval_bpd(t_block=k) must tile the hoisted memory
        (and the inpaint tensors) k× so the (k*N)-row model calls see
        each example's own conditioning — equal results per block size."""
        import jax

        from gesture_diffusion_tpu.generation import Generator
        from gesture_diffusion_tpu.models import (DenoiserConfig,
                                                  GestureDenoiser)

        cfg = DenoiserConfig(d_pose=6, d_model=32, heads=2, n_layers=1,
                             model_type="inpaint", pose_seed_len=2)
        model = GestureDenoiser(cfg)
        rng = np.random.default_rng(5)
        poses = jnp.asarray(rng.normal(size=(2, 8, 6)).astype(np.float32))
        wavs = jnp.asarray(rng.normal(0, 0.3, (2, 6400)).astype(np.float32))
        mask = jnp.zeros((2, 8, 1)).at[:, :2].set(1.0)
        variables = model.init(jax.random.key(0), poses,
                               jnp.zeros((2,), jnp.int32), wavs, train=False,
                               inpaint_pose=poses, inpaint_mask=mask)
        sched, tmap = gd.respaced_schedule(
            gd.linear_betas(100), gd.space_timesteps(100, "ddim4"))
        gen = Generator(model, variables, sched, jnp.asarray(tmap))
        out1 = gen.eval_bpd(poses, wavs, jax.random.key(7),
                            pose_seed_len=2, t_block=1)
        out2 = gen.eval_bpd(poses, wavs, jax.random.key(7),
                            pose_seed_len=2, t_block=2)
        np.testing.assert_allclose(np.asarray(out2["total_bpd"]),
                                   np.asarray(out1["total_bpd"]),
                                   rtol=5e-4)
        np.testing.assert_allclose(np.asarray(out2["vb"]),
                                   np.asarray(out1["vb"]),
                                   rtol=5e-4, atol=1e-5)
        # a t_block that does not divide the respaced T=4 clamps down to
        # the largest divisor (results are block-invariant), instead of
        # raising minutes into an eval run when the user changes
        # timestep_respacing without touching bpd_t_block
        out3 = gen.eval_bpd(poses, wavs, jax.random.key(7),
                            pose_seed_len=2, t_block=3)
        np.testing.assert_array_equal(np.asarray(out3["total_bpd"]),
                                      np.asarray(out2["total_bpd"]))
        assert (2, 2) in gen._bpd_jit and (2, 3) not in gen._bpd_jit


class TestResamplers:
    def test_uniform_sampler_range(self):
        s = gd.UniformSampler(1000)
        t, w = s.sample(jax.random.key(0), 512)
        t = np.asarray(t)
        assert t.min() >= 0 and t.max() < 1000
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_aware_sampler_warmup_and_weighting(self):
        s = gd.LossSecondMomentResampler(10, history_per_term=2)
        np.testing.assert_allclose(s.weights(), 1.0)
        for _ in range(2):
            s.update_with_all_losses(list(range(10)), [float(t + 1) for t in range(10)])
        w = s.weights()
        assert w[9] > w[0]
        assert w.sum() == pytest.approx(1.0)
