"""Transplant forward parity for the full model-type x decoder zoo.

Extends test_torch_parity.py (flagship s2g_v2 + oneway) to the remaining
``SUPPORTED_DECODERS`` and model types, each vs the EXECUTED reference
with randomly-initialized transplanted weights:

  * CrossAttention decoder (nn.py:381-447) under Speech2GestureModelV2
  * CrossAttentionGCN decoder (nn.py:231-378, tgcn.py:6-63) under the
    base model (reference requires d_pose == d_model for its gcn channel
    count, nn.py:311 — matched here)
  * UNetAttn decoder (nn.py:450-544 over glide/unet.py) under the base
    model
  * the inpaint model's zero-init conditioning MLP (model.py:120-166)
    under the oneway decoder — weights are perturbed off zero so a
    transplant bug is visible

The reference code is EXECUTED, never copied (repo norm)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import _install_stubs  # noqa: E402

T_POSE, T_WAV = 40, 32000


def _warm_bn(ref, d_pose, seed=3, inpaint=False, seed_len=5, t_pose=T_POSE):
    """Train-mode passes so BN running stats move off (0, 1)."""
    rng = np.random.default_rng(seed)
    ref.train()
    with torch.no_grad():
        for i in range(2):
            kw = {"wav": torch.from_numpy(
                rng.normal(0, 0.3, (2, T_WAV)).astype(np.float32))}
            if inpaint:
                ip = np.zeros((t_pose, 2, d_pose), np.float32)
                im = np.zeros((t_pose, 2, 1), np.float32)
                im[:seed_len] = 1.0
                kw["inpaint_pose"] = torch.from_numpy(ip)
                kw["inpaint_mask"] = torch.from_numpy(im)
            ref(torch.from_numpy(
                rng.normal(size=(2, d_pose, t_pose)).astype(np.float32)),
                torch.tensor([i, 500 + i]), **kw)
    ref.eval()


def _assert_parity(ref, cfg, inpaint=False, seed_len=5, t_pose=T_POSE):
    import jax
    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop import import_torch_state_dict
    from gesture_diffusion_tpu.models import GestureDenoiser

    model = GestureDenoiser(cfg)
    variables = import_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    wav_np = rng.normal(0, 0.3, (2, T_WAV)).astype(np.float32)
    x_np = rng.normal(size=(2, t_pose, cfg.d_pose)).astype(np.float32)
    t_np = np.array([3, 977], np.int32)

    kw_t, kw_j = {}, {}
    if inpaint:
        ip = rng.normal(size=(2, t_pose, cfg.d_pose)).astype(np.float32)
        im = np.zeros((2, t_pose, 1), np.float32)
        im[:, :seed_len] = 1.0
        kw_t = {"inpaint_pose": torch.from_numpy(ip.transpose(1, 0, 2)),
                "inpaint_mask": torch.from_numpy(im.transpose(1, 0, 2))}
        kw_j = {"inpaint_pose": jnp.asarray(ip), "inpaint_mask": jnp.asarray(im)}

    # structure parity vs a fresh init (catches missing/extra leaves)
    init_vars = GestureDenoiser(cfg).init(
        jax.random.key(0), jnp.asarray(x_np), jnp.asarray(t_np),
        jnp.asarray(wav_np), train=False, **kw_j)
    ours_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init_vars)}
    theirs_paths = {jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    assert ours_paths == theirs_paths, (
        f"missing: {sorted(ours_paths - theirs_paths)[:5]} "
        f"extra: {sorted(theirs_paths - ours_paths)[:5]}")

    n_ours = sum(np.size(x) for x in jax.tree.leaves(variables["params"]))
    n_ref = sum(p.numel() for p in ref.parameters() if p.requires_grad)
    assert n_ours == n_ref

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x_np.transpose(0, 2, 1)),
            torch.from_numpy(t_np.astype(np.int64)),
            wav=torch.from_numpy(wav_np), **kw_t,
        ).numpy().transpose(0, 2, 1)

    ours = np.asarray(model.apply(
        variables, jnp.asarray(x_np), jnp.asarray(t_np), jnp.asarray(wav_np),
        train=False, **kw_j))

    assert ours.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    err = np.abs(ours - ref_out).max()
    assert err < 1e-3 * max(scale, 1.0), (
        f"max abs err {err:.2e} vs output scale {scale:.2e}")


def test_cross_attention_decoder_parity():
    _install_stubs()
    from models.model import Speech2GestureModelV2
    from models.modules.ha2g.speech_encoder import HA2GSpeechEncoder
    from models.nn import CrossAttention, DiffusionStepEncoder

    from gesture_diffusion_tpu.models import DenoiserConfig

    d_pose, d_model, heads, n_layers = 20, 64, 4, 3
    torch.manual_seed(21)
    ref = Speech2GestureModelV2(
        d_pose, d_model,
        HA2GSpeechEncoder(d_model=d_model, dropout_prob=0.0),
        CrossAttention(d_x=d_pose, d_memory=d_model, d_model=d_model,
                       heads=heads, dropout_prob=0.0, n_layers=n_layers,
                       d_out=d_pose),
        DiffusionStepEncoder(d_model, 0.0),
    )
    _warm_bn(ref, d_pose)
    cfg = DenoiserConfig(d_pose=d_pose, d_model=d_model, heads=heads,
                         n_layers=n_layers, decoder_type="cross_attention")
    _assert_parity(ref, cfg)


def test_gcn_decoder_parity():
    _install_stubs()
    from models.model import Speech2GestureModel
    from models.modules.ha2g.speech_encoder import HA2GSpeechEncoder
    from models.nn import CrossAttentionGCN, DiffusionStepEncoder

    from gesture_diffusion_tpu.models import DenoiserConfig

    # tp-vicon layout: 9 vertices; the reference's graph conv is sized
    # d_x//V (nn.py:311) so d_pose must equal d_model for it to run
    d_pose = d_model = 72
    heads, n_layers = 4, 2
    torch.manual_seed(22)
    ref = Speech2GestureModel(
        d_pose, d_model,
        HA2GSpeechEncoder(d_model=d_model, dropout_prob=0.0),
        CrossAttentionGCN(d_x=d_pose, d_memory=d_model, d_model=d_model,
                          heads=heads, dropout_prob=0.0, n_layers=n_layers,
                          d_out=d_pose, graph_layout="tp-vicon",
                          graph_strategy="spatial"),
        DiffusionStepEncoder(d_model, 0.0),
    )
    _warm_bn(ref, d_pose)
    cfg = DenoiserConfig(d_pose=d_pose, d_model=d_model, heads=heads,
                         n_layers=n_layers, decoder_type="cross_attention_gcn",
                         model_type="default", graph_layout="tp-vicon",
                         graph_strategy="spatial")
    _assert_parity(ref, cfg)


def test_unet_decoder_parity():
    _install_stubs()
    from models.model import Speech2GestureModel
    from models.modules.ha2g.speech_encoder import HA2GSpeechEncoder
    from models.nn import DiffusionStepEncoder, UNetAttn

    from gesture_diffusion_tpu.models import DenoiserConfig

    # window 38 NOT 40: with a zero pad the reference's crop
    # ``x[:, :, 0:-0]`` (nn.py:542) empties the output — a latent bug we
    # sidestep, exercising the real pad path (38 -> 40 -> crop) instead
    d_pose, d_model, heads, n_res, t_u = 6, 64, 4, 1, 38
    torch.manual_seed(23)
    ref = Speech2GestureModel(
        d_pose, d_model,
        HA2GSpeechEncoder(d_model=d_model, dropout_prob=0.0),
        UNetAttn(in_channels=d_pose, model_channels=d_model,
                 out_channels=d_pose, num_res_blocks=n_res,
                 attention_resolutions=(1, 2), window_len=t_u,
                 pad_for_updown=True, dropout=0.0, channel_mult=(1, 2),
                 num_heads=heads, use_scale_shift_norm=True,
                 encoder_channels=d_model),
        DiffusionStepEncoder(d_model, 0.0),
    )
    _warm_bn(ref, d_pose, t_pose=t_u)
    cfg = DenoiserConfig(d_pose=d_pose, d_model=d_model, heads=heads,
                         n_layers=n_res, decoder_type="unet_attention",
                         model_type="default", channel_mult=(1, 2),
                         attention_resolutions=(1, 2), window_len=t_u)
    _assert_parity(ref, cfg, t_pose=t_u)


def test_inpaint_model_parity():
    _install_stubs()
    from models.model import Speech2GestureModelInpaint
    from models.modules.ha2g.speech_encoder import HA2GSpeechEncoder
    from models.nn import DiffusionStepEncoder, OnewayCrossAttention

    from gesture_diffusion_tpu.models import DenoiserConfig

    d_pose, d_model, heads, n_layers, seed_len = 12, 64, 4, 2, 5
    torch.manual_seed(24)
    ref = Speech2GestureModelInpaint(
        d_pose, d_model,
        HA2GSpeechEncoder(d_model=d_model, dropout_prob=0.0),
        OnewayCrossAttention(d_x=d_pose, d_memory=d_model, d_model=d_model,
                             heads=heads, dropout_prob=0.0,
                             n_layers=n_layers, d_out=d_pose),
        DiffusionStepEncoder(d_model, 0.0),
        dropout_prob=0.0, pose_seed_len=seed_len,
    )
    # the conditioning MLP is zero-init (model.py:146-147) — perturb it so
    # the transplant actually carries information
    with torch.no_grad():
        for p in ref.proj.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    _warm_bn(ref, d_pose, inpaint=True, seed_len=seed_len)
    cfg = DenoiserConfig(d_pose=d_pose, d_model=d_model, heads=heads,
                         n_layers=n_layers, model_type="inpaint",
                         pose_seed_len=seed_len)
    _assert_parity(ref, cfg, inpaint=True, seed_len=seed_len)


def test_import_rejects_foreign_state_dict():
    """A state dict that isn't a reference gesture-DDPM checkpoint fails
    the preflight with a summary of what it contains, not a bare KeyError
    on the first translated tensor (fuzz finding)."""
    import numpy as np
    import pytest

    from gesture_diffusion_tpu.interop.torch_import import import_torch_state_dict
    from gesture_diffusion_tpu.models import DenoiserConfig

    cfg = DenoiserConfig(d_pose=6)
    with pytest.raises(KeyError, match="does not look like a reference"):
        import_torch_state_dict({"nonsense.weight": np.zeros((3, 3))}, cfg)
    with pytest.raises(KeyError, match="does not look like a reference"):
        import_torch_state_dict({}, cfg)
