"""End-to-end sampled-trajectory parity vs the EXECUTED torch reference.

This closes the BASELINE.json north star ("frame-MSE parity vs reference
outputs"): one transplanted weight set, identical x_T noise, and the full
sampling pipeline on both sides —

  * reference: ``GaussianSpacedDiffusion`` (respace.py:71-113) built by
    ``model_creation.py:30-48`` + ``Generator.generate_sample``
    (generator.py:218-303, incl. the trans-ramp ``denoise_fn`` blending)
    + ``ddim_sample_loop`` (gaussian_diffusion.py:486-529);
  * ours: ``diffusion.make_diffusion`` + ``generation.Generator`` (scan
    sampler; the fused Pallas path is covered by its own on-chip check in
    bench.py).

Forward parity alone (test_torch_parity.py, max err 1.3e-5) cannot catch
schedule/respacing/blending bugs — only running both *loops* can.

The reference code is EXECUTED, never copied (repo norm); the stubs it
needs come from test_torch_parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import _install_stubs  # noqa: E402

D_POSE, D_MODEL, T_POSE, T_WAV = 123, 256, 40, 32000
SEED_LEN = 10


@pytest.fixture(scope="module")
def pair():
    """(ref torch model, our model, transplanted variables) — flagship
    config (Speech2GestureModelV2 + HA2G + 4-layer oneway)."""
    _install_stubs()
    from models.model import Speech2GestureModelV2
    from models.modules.ha2g.speech_encoder import HA2GSpeechEncoder
    from models.nn import DiffusionStepEncoder, OnewayCrossAttention

    torch.manual_seed(11)
    ref = Speech2GestureModelV2(
        D_POSE, D_MODEL,
        HA2GSpeechEncoder(d_model=D_MODEL, dropout_prob=0.0),
        OnewayCrossAttention(d_x=D_POSE, d_memory=D_MODEL, d_model=D_MODEL,
                             heads=8, dropout_prob=0.0, n_layers=4,
                             d_out=D_POSE),
        DiffusionStepEncoder(D_MODEL, 0.0),
    )
    # move BN running stats off (0, 1) so a transplant bug is visible
    rng = np.random.default_rng(5)
    ref.train()
    with torch.no_grad():
        for i in range(2):
            ref(torch.from_numpy(rng.normal(size=(2, D_POSE, T_POSE))
                                 .astype(np.float32)),
                torch.tensor([i, 700 + i]),
                wav=torch.from_numpy(rng.normal(0, 0.3, (2, T_WAV))
                                     .astype(np.float32)))
    ref.eval()

    from gesture_diffusion_tpu.interop import import_torch_state_dict
    from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser

    cfg = DenoiserConfig(d_pose=D_POSE)
    return ref, GestureDenoiser(cfg), import_torch_state_dict(ref.state_dict(), cfg)


@pytest.fixture(scope="module")
def ref_diffusion():
    """The reference's eval-time spaced diffusion, built through its own
    factory (model_creation.py:30-48) with the flagship config's params
    (configs/beat-ours.json:73-76) respaced to ddim50."""
    _install_stubs()
    from types import SimpleNamespace

    from models.model_creation import create_diffusion

    params = SimpleNamespace(type="gaussian", noise_schedule="linear",
                             diffusion_steps=1000,
                             timestep_respacing="ddim50",
                             model_var_type="fixed_small")
    return create_diffusion(params, is_training=False)


@pytest.fixture(scope="module")
def our_diffusion():
    from gesture_diffusion_tpu.diffusion import make_diffusion

    return make_diffusion("linear", 1000, "ddim50", is_training=False)


def _our_generator(model, variables, our_diffusion):
    from gesture_diffusion_tpu.generation import Generator

    sched, tmap = our_diffusion
    return Generator(model, variables, sched, tmap, use_fused=False)


def _frame_mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


class TestTrajectoryParity:
    N = 1

    def _inputs(self, seed=0):
        rng = np.random.default_rng(seed)
        wav = rng.normal(0, 0.3, (self.N, T_WAV)).astype(np.float32)
        x_T = rng.normal(size=(self.N, T_POSE, D_POSE)).astype(np.float32)
        return wav, x_T

    def test_ddim50_unconditional(self, pair, ref_diffusion, our_diffusion):
        import jax
        import jax.numpy as jnp

        ref, model, variables = pair
        wav, x_T = self._inputs(0)

        from models.generator import Generator as RefGenerator

        ref_out = RefGenerator(ref, ref_diffusion).generate_sample(
            (self.N, D_POSE, T_POSE),
            torch.from_numpy(wav),
            noise=torch.from_numpy(x_T.transpose(0, 2, 1)),
            sample_alg="ddim", progress=False,
        ).numpy()                                   # (N, T, C)

        ours = _our_generator(model, variables, our_diffusion).generate_sample(
            jnp.asarray(wav), D_POSE, T_POSE, jax.random.key(0),
            noise=jnp.asarray(x_T))

        mse = _frame_mse(ours, ref_out)
        scale = float(np.mean(np.asarray(ref_out) ** 2))
        # 50 iterated f32 steps compound the 1e-5-scale forward deviation;
        # measured values are recorded in PARITY.md (frame_mse_vs_reference)
        print(f"\n[parity] ddim50 unconditional frame MSE {mse:.3e} "
              f"(E[x^2] {scale:.3e})")
        assert mse < 1e-4 * scale, f"frame MSE {mse:.3e} vs E[x^2] {scale:.3e}"

    def test_ddim50_inpaint_trans_ramp(self, pair, ref_diffusion, our_diffusion):
        """Seed-pose continuation: the x0-blending denoise_fn with the
        trans_factor per-frame ramp (generator.py:256-281) — semantics
        forward parity cannot reach."""
        import jax
        import jax.numpy as jnp

        ref, model, variables = pair
        wav, x_T = self._inputs(1)
        rng = np.random.default_rng(2)
        seeds = rng.normal(size=(self.N, T_POSE, D_POSE)).astype(np.float32)
        masks = np.zeros((self.N, T_POSE, 1), np.float32)
        masks[:, :SEED_LEN] = 1.0

        from models.generator import Generator as RefGenerator

        ref_out = RefGenerator(ref, ref_diffusion).generate_sample(
            (self.N, D_POSE, T_POSE),
            torch.from_numpy(wav),
            noise=torch.from_numpy(x_T.transpose(0, 2, 1)),
            inpaint_poses=torch.from_numpy(seeds),
            inpaint_masks=torch.from_numpy(masks),
            sample_alg="ddim", trans_factor=0.5, pose_seed_len=SEED_LEN,
            progress=False,
        ).numpy()

        ours = _our_generator(model, variables, our_diffusion).generate_sample(
            jnp.asarray(wav), D_POSE, T_POSE, jax.random.key(1),
            noise=jnp.asarray(x_T),
            inpaint_poses=jnp.asarray(seeds), inpaint_masks=jnp.asarray(masks),
            trans_factor=0.5, pose_seed_len=SEED_LEN)

        mse = _frame_mse(ours, ref_out)
        scale = float(np.mean(np.asarray(ref_out) ** 2))
        print(f"\n[parity] ddim50 inpaint+ramp frame MSE {mse:.3e} "
              f"(E[x^2] {scale:.3e})")
        assert mse < 1e-4 * scale, f"frame MSE {mse:.3e} vs E[x^2] {scale:.3e}"

    def test_ddpm_single_step_same_z(self, pair, ref_diffusion, our_diffusion):
        """One stochastic ancestral step with IDENTICAL injected z: the
        posterior mean/variance path (p_sample, gaussian_diffusion.py:
        300-329) under respacing.  torch and jax PRNGs can never be made
        to agree, so z is injected into the reparameterisation on both
        sides; the reference's mean/log_variance come from its own
        p_mean_variance."""
        import jax.numpy as jnp

        from gesture_diffusion_tpu.diffusion.gaussian import p_mean_variance
        from gesture_diffusion_tpu.diffusion.sampling import wrap_respaced
        from gesture_diffusion_tpu.models import GestureDenoiser

        ref, model, variables = pair
        wav, x_t = self._inputs(3)
        rng = np.random.default_rng(4)
        z = rng.normal(size=x_t.shape).astype(np.float32)
        t_step = 37                                  # respaced index

        with torch.no_grad():
            out = ref_diffusion.p_mean_variance(
                ref,
                torch.from_numpy(x_t.transpose(0, 2, 1)),
                torch.tensor([t_step] * self.N),
                model_kwargs={"wav": torch.from_numpy(wav)})
            ref_prev = (out["mean"] + torch.exp(0.5 * out["log_variance"])
                        * torch.from_numpy(z.transpose(0, 2, 1))).numpy()
        ref_prev = ref_prev.transpose(0, 2, 1)       # -> (N, T, C)

        sched, tmap = our_diffusion
        memory = model.apply(variables, jnp.asarray(wav), train=False,
                             method=GestureDenoiser.encode_memory)

        def model_fn(x, t):
            return model.apply(variables, x, t, memory, train=False,
                               method=GestureDenoiser.denoise)

        ours_out = p_mean_variance(
            sched, wrap_respaced(model_fn, jnp.asarray(tmap)),
            jnp.asarray(x_t), jnp.full((self.N,), t_step, jnp.int32))
        ours_prev = np.asarray(
            ours_out["mean"]
            + jnp.exp(0.5 * ours_out["log_variance"]) * jnp.asarray(z))

        err = np.abs(ours_prev - ref_prev).max()
        scale = np.abs(ref_prev).max()
        assert err < 1e-3 * max(scale, 1.0), f"max err {err:.2e} vs {scale:.2e}"
