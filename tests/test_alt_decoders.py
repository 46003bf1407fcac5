"""Alternate decoder tests: graph adjacency golden values, GCN decoder
shape/grad contracts, UNet decoder padding + conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_diffusion_tpu.models import DenoiserConfig, GestureDenoiser
from gesture_diffusion_tpu.models.unet_decoder import UNetAttn, _pad_lengths
from gesture_diffusion_tpu.ops.graph import build_graph

WAV = jnp.asarray(np.random.default_rng(0).normal(
    0, 0.3, (2, 8000)).astype(np.float32))


class TestGraph:
    def test_beat_spatial_matches_reference(self):
        """Golden: verified equal to the reference Graph('beat','spatial').A
        (modules/gcn/graph.py) for all layouts/strategies; spot values here."""
        A = build_graph("beat", "spatial")
        assert A.shape == (3, 75, 75)
        # partition 0 is the diagonal self-loop part
        assert A[0].diagonal().min() > 0
        # rows of the summed adjacency are symmetric-normalised
        total = A.sum(0)
        assert np.allclose(total, total.T, atol=1e-12)

    def test_uniform_and_distance(self):
        u = build_graph("lara", "uniform")
        d = build_graph("lara", "distance")
        assert u.shape == (1, 19, 19) and d.shape == (2, 19, 19)
        np.testing.assert_allclose(u[0], d.sum(0), atol=1e-12)

    def test_unknown_layout_raises(self):
        with pytest.raises(ValueError, match="layout"):
            build_graph("nope")


class TestGCNDecoder:
    def test_denoiser_with_gcn_decoder(self):
        # d_model must be divisible by 75 vertices -> use 150
        cfg = DenoiserConfig(d_pose=225, d_model=150, heads=5, n_layers=2,
                             decoder_type="cross_attention_gcn")
        model = GestureDenoiser(cfg)
        x = jnp.zeros((2, 10, 225))
        t = jnp.asarray([1, 5])
        variables = model.init(jax.random.key(0), x, t, WAV, train=False)
        out = model.apply(variables, x, t, WAV, train=False)
        assert out.shape == (2, 10, 225)
        assert np.isfinite(np.asarray(out)).all()

    def test_gcn_gradients_flow(self):
        cfg = DenoiserConfig(d_pose=150, d_model=75, heads=3, n_layers=1,
                             decoder_type="cross_attention_gcn")
        model = GestureDenoiser(cfg)
        x = jnp.ones((1, 10, 150))
        t = jnp.asarray([3])
        variables = model.init(jax.random.key(0), x, t, WAV[:1], train=False)

        def loss(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, t, WAV[:1], train=False)
            return (out ** 2).mean()

        grads = jax.grad(loss)(variables["params"])
        gnorms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert any(g > 0 for g in gnorms)


class TestUNetDecoder:
    def test_pad_lengths(self):
        # window 40, 2 downsamples: 40 -> pad to 48 (48/2/2 = 12, even)
        lo, hi = _pad_lengths(40, 2)
        assert (lo + hi + 40) % 4 == 0
        assert lo == hi

    def test_denoiser_with_unet_decoder(self):
        cfg = DenoiserConfig(d_pose=12, d_model=32, heads=4, n_layers=1,
                             decoder_type="unet_attention",
                             channel_mult=(1, 2), attention_resolutions=(1, 2),
                             window_len=10)
        model = GestureDenoiser(cfg)
        x = jnp.zeros((2, 10, 12))
        t = jnp.asarray([0, 40])
        variables = model.init(jax.random.key(0), x, t, WAV, train=False)
        out = model.apply(variables, x, t, WAV, train=False)
        assert out.shape == (2, 10, 12)

    def test_unet_audio_conditioning_matters(self):
        cfg = DenoiserConfig(d_pose=12, d_model=32, heads=4, n_layers=1,
                             decoder_type="unet_attention",
                             channel_mult=(1, 2), attention_resolutions=(1, 2),
                             window_len=10)
        model = GestureDenoiser(cfg)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 10, 12)).astype(np.float32))
        t = jnp.asarray([5, 5])
        variables = model.init(jax.random.key(0), x, t, WAV, train=False)
        # the GLIDE zero-inits (attention proj_out, res conv_out, final conv)
        # block all signal paths at init; replace every all-zero kernel so
        # conditioning can propagate
        params = jax.tree.map(
            lambda p: jnp.full_like(p, 0.01) if float(jnp.abs(p).max()) == 0 else p,
            variables["params"])
        variables = {"params": params, "batch_stats": variables["batch_stats"]}
        wav2 = jnp.asarray(np.random.default_rng(9).normal(
            0, 0.3, (2, 8000)).astype(np.float32))
        a = model.apply(variables, x, t, WAV, train=False)
        b = model.apply(variables, x, t, wav2, train=False)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_unet_zero_init_output_is_zero(self):
        """GLIDE zero_module on the final conv: untrained UNet outputs 0."""
        attn = UNetAttn(d_x=12, d_memory=32, d_model=32, heads=4, n_layers=1,
                        d_out=12, channel_mult=(1, 2),
                        attention_resolutions=(1,), window_len=10)
        x = jnp.ones((1, 10, 12))
        mem = jnp.ones((1, 6, 32))
        v = attn.init(jax.random.key(0), x, mem, False)
        out = attn.apply(v, x, mem, False)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestFactoryVariants:
    def test_factory_builds_all_decoders(self):
        from gesture_diffusion_tpu.models import build_model
        from gesture_diffusion_tpu.utils import JsonConfig

        for dec in [
            {"type": "oneway_cross_attention", "heads": 4, "n_layers": 1},
            {"type": "cross_attention", "heads": 4, "n_layers": 1},
            {"type": "cross_attention_gcn", "heads": 3, "n_layers": 1,
             "graph_layout": "beat", "graph_strategy": "spatial"},
            {"type": "unet_attention", "num_heads": 4, "num_res_blocks": 1,
             "channel_mult": [1, 2], "attention_resolutions": [1],
             "window_len": 10},
        ]:
            d_pose = 150 if dec["type"] == "cross_attention_gcn" else 12
            d_model = 75 if dec["type"] == "cross_attention_gcn" else 32
            cfg = JsonConfig({"type": "s2g_v2", "d_model": d_model,
                              "dropout_prob": 0.0, "Decoder": dec})
            model = build_model(d_pose, cfg)
            assert model.cfg.decoder_type == dec["type"]
