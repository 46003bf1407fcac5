"""Model-stack tests: audio front-end invariants, encoder/decoder shape
contracts (matching the reference's documented shapes), parameter-count
parity, and variant behaviours."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
from gesture_diffusion_tpu.models.attention import MultiHeadAttention
from gesture_diffusion_tpu.models.denoiser import timestep_embedding
from gesture_diffusion_tpu.models.speech_encoder import pixel_shuffle_nhwc
from gesture_diffusion_tpu.ops import audio


WAV = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32000)).astype(np.float32))


class TestAudioFrontend:
    def test_pre_emphasis_formula(self):
        x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        y = np.asarray(audio.pre_emphasis(x, coef=0.5))
        # y[0] = x[0] - c*x[1] (left reflect pad), y[t] = x[t] - c*x[t-1]
        np.testing.assert_allclose(y[0], [1 - 0.5 * 2, 2 - 0.5 * 1, 3 - 0.5 * 2, 4 - 0.5 * 3])

    def test_mel_shape(self):
        mel = audio.mel_spectrogram(WAV)
        assert mel.shape == (2, 128, 63)  # 32000 samples @ hop 512, center

    def test_mel_matches_direct_dft(self):
        """Independent oracle: naive numpy DFT over explicitly built frames."""
        wav = np.asarray(WAV[:1, :4096])
        n_fft, hop = 1024, 512
        pad = n_fft // 2
        x = np.pad(wav[0], (pad, pad), mode="reflect")
        win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
        frames = np.stack([
            x[i * hop: i * hop + n_fft] * win
            for i in range(1 + (len(x) - n_fft) // hop)
        ])
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        fb = audio.mel_filterbank(513, 128, 16000)
        want = (spec @ fb).T
        got = np.asarray(audio.mel_spectrogram(jnp.asarray(wav)))[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_mel_tone_peaks_at_right_bin(self):
        sr, f = 16000, 2000.0
        t = np.arange(32000) / sr
        tone = jnp.asarray(np.sin(2 * np.pi * f * t)[None].astype(np.float32))
        mel = np.asarray(audio.mel_spectrogram(tone))[0].mean(axis=1)
        peak_mel_bin = mel.argmax()
        # expected bin: mel scale htk, 128 bins over 0..8000 Hz
        m = 2595 * np.log10(1 + f / 700)
        m_max = 2595 * np.log10(1 + 8000 / 700)
        expected = int(round(m / m_max * 129)) - 1
        assert abs(int(peak_mel_bin) - expected) <= 2

    def test_filterbank_properties(self):
        fb = audio.mel_filterbank(513, 128, 16000)
        assert fb.shape == (513, 128)
        assert (fb >= 0).all()
        assert (fb.sum(axis=0) > 0).all()  # every filter has support

    def test_instance_norm(self):
        x = jnp.asarray(np.random.default_rng(1).normal(2.0, 5.0, (3, 4, 100)).astype(np.float32))
        y = np.asarray(audio.instance_norm(x))
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-3)


class TestPixelShuffle:
    def test_matches_torch_semantics(self):
        import torch

        x = np.random.default_rng(2).normal(size=(2, 8, 4, 6)).astype(np.float32)  # NCHW
        want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # (2,2,8,12)
        got = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-6)


class TestTimestepEmbedding:
    def test_layout_cos_then_sin(self):
        t = jnp.asarray([0.0, 3.0])
        emb = np.asarray(timestep_embedding(t, 8))
        # reference layout (nn.py:27-34): [cos(args) | sin(args)]
        freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
        args = 3.0 * freqs
        np.testing.assert_allclose(emb[1], np.concatenate([np.cos(args), np.sin(args)]), atol=1e-5)
        np.testing.assert_allclose(emb[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)


class TestAttention:
    def test_dconv_attention_shapes_and_mixing(self):
        mha = MultiHeadAttention(heads=4, d_model=32, dconv=True)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 10, 32)).astype(np.float32))
        m = jnp.asarray(np.random.default_rng(4).normal(size=(2, 7, 32)).astype(np.float32))
        v = mha.init(jax.random.key(0), x, m, m)
        out = mha.apply(v, x, m, m)
        assert out.shape == (2, 10, 32)
        # temporal conv on K/V means perturbing one memory frame affects output
        m2 = m.at[:, 3].add(1.0)
        out2 = mha.apply(v, x, m2, m2)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_attention_rows_sum_via_uniform_value(self):
        """With dconv off and V projected from a constant value stream, output
        before the out-proj is that constant -> attention rows sum to 1."""
        mha = MultiHeadAttention(heads=2, d_model=16, dconv=False)
        x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 5, 16)).astype(np.float32))
        const_v = jnp.ones((1, 5, 16))
        v = mha.init(jax.random.key(1), x, x, const_v)
        out1 = mha.apply(v, x, x, const_v)
        # same constant value stream but different keys: output identical
        x2 = x + 0.3
        out2 = mha.apply(v, x2, x2, const_v)
        # out = out_proj(value_proj(1-vector)) both times (attn is a convex combo)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.fixture(scope="module")
def v2_model():
    cfg = DenoiserConfig(d_pose=123)
    model = GestureDenoiser(cfg)
    x = jnp.zeros((2, 40, 123))
    t = jnp.asarray([5, 900])
    variables = model.init(jax.random.key(0), x, t, WAV, train=False)
    return model, variables


class TestDenoiser:
    def test_param_count_matches_reference(self, v2_model):
        """Reference BEAT model (s2g_v2 / oneway / d_model 256 / 4 layers /
        8 heads / d_pose 123) has exactly 10,340,087 learnable params
        (measured by running /root/reference model_creation.create_model)."""
        _, variables = v2_model
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert n == 10_340_087

    def test_v2_memory_shape(self, v2_model):
        model, variables = v2_model
        mem = model.apply(variables, WAV, train=False,
                          method=GestureDenoiser.encode_memory)
        assert mem.shape == (2, 31, 256)  # 63 spec frames -> 31 low tokens

    def test_eps_shape_and_split_path_identity(self, v2_model):
        model, variables = v2_model
        x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 40, 123)).astype(np.float32))
        t = jnp.asarray([5, 900])
        eps = model.apply(variables, x, t, WAV, train=False)
        assert eps.shape == (2, 40, 123)
        mem = model.apply(variables, WAV, train=False,
                          method=GestureDenoiser.encode_memory)
        eps2 = model.apply(variables, x, t, mem, train=False,
                           method=GestureDenoiser.denoise)
        np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), atol=1e-6)

    def test_t_dependence(self, v2_model):
        model, variables = v2_model
        x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 40, 123)).astype(np.float32))
        e1 = model.apply(variables, x, jnp.asarray([0, 0]), WAV, train=False)
        e2 = model.apply(variables, x, jnp.asarray([999, 999]), WAV, train=False)
        assert not np.allclose(np.asarray(e1), np.asarray(e2))

    def test_default_model_memory_is_three_streams(self):
        cfg = DenoiserConfig(d_pose=12, d_model=64, heads=4, n_layers=1,
                             model_type="default")
        model = GestureDenoiser(cfg)
        x = jnp.zeros((1, 40, 12))
        variables = model.init(jax.random.key(0), x, jnp.asarray([1]), WAV[:1], train=False)
        mem = model.apply(variables, WAV[:1], train=False,
                          method=GestureDenoiser.encode_memory)
        assert mem.shape == (1, 31 + 30 + 30, 64)

    def test_inpaint_zero_init_is_identity(self):
        """GLIDE-style zero init (model.py:149-153): at init the inpaint
        projection must contribute exactly nothing."""
        cfg_in = DenoiserConfig(d_pose=12, d_model=64, heads=4, n_layers=1,
                                model_type="inpaint")
        model_in = GestureDenoiser(cfg_in)
        x = jnp.asarray(np.random.default_rng(8).normal(size=(1, 40, 12)).astype(np.float32))
        t = jnp.asarray([7])
        pose = jnp.ones((1, 40, 12))
        mask = jnp.ones((1, 40, 1))
        v_in = model_in.init(jax.random.key(0), x, t, WAV[:1], train=False,
                             inpaint_pose=pose, inpaint_mask=mask)
        out_masked = model_in.apply(v_in, x, t, WAV[:1], train=False,
                                    inpaint_pose=pose, inpaint_mask=mask)
        out_zero = model_in.apply(v_in, x, t, WAV[:1], train=False,
                                  inpaint_pose=jnp.zeros_like(pose),
                                  inpaint_mask=jnp.zeros_like(mask))
        np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_zero), atol=1e-6)

    def test_cross_attention_decoder_variant(self):
        cfg = DenoiserConfig(d_pose=12, d_model=64, heads=4, n_layers=2,
                             decoder_type="cross_attention")
        model = GestureDenoiser(cfg)
        x = jnp.zeros((1, 40, 12))
        variables = model.init(jax.random.key(0), x, jnp.asarray([1]), WAV[:1], train=False)
        out = model.apply(variables, x, jnp.asarray([1]), WAV[:1], train=False)
        assert out.shape == (1, 40, 12)

    def test_train_mode_updates_batch_stats(self, v2_model):
        model, variables = v2_model
        x = jnp.zeros((2, 40, 123))
        t = jnp.asarray([1, 2])
        out, mutated = model.apply(
            variables, x, t, WAV, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(9)})
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))


class TestSEBottleneck:
    """Forward parity vs the EXECUTED reference SEBottleneck
    (ResNetBlocks.py:40-78) with transplanted weights."""

    def test_torch_oracle(self):
        import importlib.util
        import torch
        import torch.nn as tnn

        spec = importlib.util.spec_from_file_location(
            "ref_resnetblocks",
            "/root/reference/models/modules/ha2g/model/ResNetBlocks.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        torch.manual_seed(0)
        inplanes, planes, stride = 16, 8, 2
        downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, planes * 4, kernel_size=1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * 4))
        block = ref.SEBottleneck(inplanes, planes, stride=stride,
                                 downsample=downsample).eval()
        # randomise BN stats so eval mode is a real check
        with torch.no_grad():
            for m in block.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

        x = torch.randn(2, inplanes, 12, 16)
        with torch.no_grad():
            want = block(x).permute(0, 2, 3, 1).numpy()       # NCHW -> NHWC

        from gesture_diffusion_tpu.interop.torch_import import _se_bottleneck
        from gesture_diffusion_tpu.models.speech_encoder import SEBottleneck

        sd = {f"x.{k}": v for k, v in block.state_dict().items()}
        params, stats = _se_bottleneck(sd, "x", has_proj=False)
        params["proj_conv"] = {
            "kernel": sd["x.downsample.0.weight"].permute(2, 3, 1, 0).numpy()}
        params["proj_bn"] = {"scale": sd["x.downsample.1.weight"].numpy(),
                             "bias": sd["x.downsample.1.bias"].numpy()}
        stats["proj_bn"] = {"mean": sd["x.downsample.1.running_mean"].numpy(),
                            "var": sd["x.downsample.1.running_var"].numpy()}

        ours = SEBottleneck(planes=planes, stride=stride, use_projection=True)
        variables = {"params": params, "batch_stats": stats}
        got = ours.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                         train=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_unknown_model_type_raises():
    """A typo'd Model.type must not silently build the 'default'
    architecture (reference raises at model_creation.py:160)."""
    import jax
    import jax.numpy as jnp

    from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser

    cfg = DenoiserConfig(d_pose=6, d_model=64, heads=4, n_layers=1,
                         model_type="s2g-v2")
    model = GestureDenoiser(cfg)
    with pytest.raises(ValueError, match="Unsupported model_type"):
        model.init(jax.random.key(0), jnp.zeros((1, 8, 6)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8000)),
                   train=False)


def test_unsupported_model_var_type_raises():
    """diffusion/gaussian.py implements FIXED_SMALL only; a config asking
    for fixed_large must fail loudly, not sample with the wrong variance."""
    from gesture_diffusion_tpu.models.factory import build_all
    from gesture_diffusion_tpu.utils import JsonConfig

    cfg = JsonConfig({"Model": {
        "type": "s2g_v2", "d_model": 64,
        "Decoder": {"type": "oneway_cross_attention", "heads": 4,
                    "n_layers": 1},
        "Diffusion": {
            "noise_schedule": "linear", "diffusion_steps": 10,
            "model_var_type": "fixed_large"}}})
    with pytest.raises(ValueError, match="model_var_type"):
        build_all(cfg, d_pose=6)
