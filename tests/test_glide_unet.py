"""GLIDE UNet family parity vs the reference PyTorch implementation.

One set of weights, both frameworks: the reference ``UNetModel``
(``/root/reference/models/modules/glide/unet.py:280-611``) is instantiated
in torch on the branches the operational gesture path never exercises
(2-D NCHW, class conditioning, resblock_updown, num_head_channels,
encoder K/V, SuperRes/Inpaint wrappers), its weights are transplanted into
``models/glide_unet.py::GlideUNet`` (channel-last) via
``interop.import_glide_unet_state_dict``, and outputs are compared on
fixed inputs.

The reference code is EXECUTED, never copied (repo norm).  Two reference
defects require shims to execute it at all (documented in
``models/glide_unet.py``):
  * ``timestep_embedding`` is called at ``unet.py:509`` but defined
    nowhere — we inject the published GLIDE formula into the module
    namespace;
  * stray debug ``print(h.shape)`` calls in ``forward`` — stdout is
    swallowed.
"""

import contextlib
import io
import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_unet_module():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.modules.glide import unet as ref_unet

    if not hasattr(ref_unet, "timestep_embedding"):
        def timestep_embedding(timesteps, dim, max_period=10000):
            # the symbol the reference forgot to define (unet.py:509);
            # published GLIDE convention, mirrored in glide_unet.py
            half = dim // 2
            freqs = torch.exp(
                -math.log(max_period)
                * torch.arange(half, dtype=torch.float32) / half)
            args = timesteps.float()[:, None] * freqs[None]
            emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
            if dim % 2:
                emb = torch.nn.functional.pad(emb, (0, 1))
            return emb

        ref_unet.timestep_embedding = timestep_embedding
    return ref_unet


def _to_jax(model, torch_out, x_nchw, structure_kw, unet_kw, extra_inputs=None):
    import jax
    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop import import_glide_unet_state_dict
    from gesture_diffusion_tpu.models.glide_unet import GlideUNet

    params = import_glide_unet_state_dict(model.state_dict(), **structure_kw)
    net = GlideUNet(**unet_kw)
    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))
    out = net.apply({"params": params}, x, **(extra_inputs or {}))
    got = np.moveaxis(np.asarray(out), -1, 1)
    want = torch_out.detach().numpy()
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 2e-4, f"max err {err}"
    return err


def test_unet2d_class_conditional_parity(ref_unet_module):
    torch.manual_seed(0)
    model = ref_unet_module.UNetModel(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        num_classes=5, use_scale_shift_norm=True, dropout=0.0)
    model.eval()
    x = torch.randn(2, 3, 8, 8)
    t = torch.tensor([3, 500])
    y = torch.tensor([1, 4])
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        want = model(x, t, y=y)

    import jax.numpy as jnp

    _to_jax(
        model, want, x.numpy(),
        structure_kw=dict(num_res_blocks=1, attention_resolutions=(2,),
                          channel_mult=(1, 2), num_classes=5),
        unet_kw=dict(in_channels=3, model_channels=32, out_channels=6,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=2, num_classes=5,
                     use_scale_shift_norm=True),
        extra_inputs=dict(timesteps=jnp.asarray([3, 500]),
                          y=jnp.asarray([1, 4])))


def test_unet2d_resblock_updown_encoder_kv_parity(ref_unet_module):
    torch.manual_seed(1)
    model = ref_unet_module.UNetModel(
        in_channels=2, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=16, resblock_updown=True, encoder_channels=12,
        dropout=0.0)
    model.eval()
    x = torch.randn(1, 2, 8, 8)
    t = torch.tensor([17])
    enc = torch.randn(1, 12, 7)        # (N, C_enc, T_enc) torch layout
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        want = model(x, t)
    # encoder K/V goes through AttentionBlock.forward directly (UNetModel
    # forward has no encoder_out plumbing in the reference; the blocks do)
    attn = model.input_blocks[1][1]
    h = torch.randn(1, 32, 8, 8)
    with torch.no_grad():
        want_attn = attn(h, encoder_out=enc)

    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop import import_glide_unet_state_dict
    from gesture_diffusion_tpu.models.glide_unet import (GlideAttentionBlock,
                                                         GlideUNet)

    structure = dict(num_res_blocks=1, attention_resolutions=(1, 2),
                     channel_mult=(1, 2), resblock_updown=True)
    params = import_glide_unet_state_dict(model.state_dict(), **structure)

    net = GlideUNet(in_channels=2, model_channels=32, out_channels=2,
                    num_res_blocks=1, attention_resolutions=(1, 2),
                    channel_mult=(1, 2), num_head_channels=16,
                    resblock_updown=True, encoder_channels=12)
    out = net.apply({"params": params},
                    jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
                    timesteps=jnp.asarray([17]))
    err = np.abs(np.moveaxis(np.asarray(out), -1, 1)
                 - want.detach().numpy()).max()
    assert err < 2e-4, f"max err {err}"

    blk = GlideAttentionBlock(num_heads=1, num_head_channels=16,
                              encoder_channels=12)
    out_attn = blk.apply(
        {"params": params["input_1_attn"]},
        jnp.asarray(np.moveaxis(h.numpy(), 1, -1)),
        jnp.asarray(np.moveaxis(enc.numpy(), 1, -1)))
    err = np.abs(np.moveaxis(np.asarray(out_attn), -1, 1)
                 - want_attn.detach().numpy()).max()
    assert err < 2e-4, f"attn max err {err}"


def test_superres_and_inpaint_wrappers_parity(ref_unet_module):
    torch.manual_seed(2)
    kw = dict(model_channels=32, out_channels=2, num_res_blocks=1,
              attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
              dropout=0.0)
    x = torch.randn(1, 2, 8, 8)
    t = torch.tensor([44])
    low = torch.randn(1, 2, 4, 4)
    mask = (torch.rand(1, 1, 8, 8) > 0.5).float()
    ref_img = torch.randn(1, 2, 8, 8)

    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop import import_glide_unet_state_dict
    from gesture_diffusion_tpu.models.glide_unet import (
        GlideUNet, InpaintGlideUNet, SuperResGlideUNet)

    def transplant(model):
        return import_glide_unet_state_dict(
            model.state_dict(), num_res_blocks=1, attention_resolutions=(2,),
            channel_mult=(1, 2))

    sr = ref_unet_module.SuperResUNetModel(in_channels=2, **kw)
    sr.eval()
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        want = sr(x, t, low_res=low)
    net = SuperResGlideUNet(GlideUNet(
        **SuperResGlideUNet.config(in_channels=2, **{k: v for k, v in kw.items()
                                                     if k != "dropout"})))
    out = net.apply({"params": {"unet": transplant(sr)}},
                    jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
                    jnp.asarray([44]),
                    jnp.asarray(np.moveaxis(low.numpy(), 1, -1)))
    err = np.abs(np.moveaxis(np.asarray(out), -1, 1)
                 - want.detach().numpy()).max()
    assert err < 2e-4, f"superres max err {err}"

    inp = ref_unet_module.InpaintUNetModel(in_channels=2, **kw)
    inp.eval()
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        want = inp(x, t, inpaint_image=ref_img, inpaint_mask=mask)
    net = InpaintGlideUNet(GlideUNet(
        **InpaintGlideUNet.config(in_channels=2, **{k: v for k, v in kw.items()
                                                    if k != "dropout"})))
    out = net.apply({"params": {"unet": transplant(inp)}},
                    jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
                    jnp.asarray([44]),
                    inpaint_image=jnp.asarray(np.moveaxis(ref_img.numpy(), 1, -1)),
                    inpaint_mask=jnp.asarray(np.moveaxis(mask.numpy(), 1, -1)))
    err = np.abs(np.moveaxis(np.asarray(out), -1, 1)
                 - want.detach().numpy()).max()
    assert err < 2e-4, f"inpaint max err {err}"


def test_unet1d_parity(ref_unet_module):
    """dims=1 (Conv1d) branch of the family, scale-shift off (additive
    timestep conditioning path)."""
    torch.manual_seed(3)
    model = ref_unet_module.UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=2,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        dims=1, dropout=0.0)
    model.eval()
    x = torch.randn(2, 4, 16)           # (N, C, T) torch layout
    t = torch.tensor([0, 999])
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        want = model(x, t)

    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop import import_glide_unet_state_dict
    from gesture_diffusion_tpu.models.glide_unet import GlideUNet

    params = import_glide_unet_state_dict(
        model.state_dict(), num_res_blocks=2, attention_resolutions=(1,),
        channel_mult=(1, 2))
    net = GlideUNet(in_channels=4, model_channels=32, out_channels=4,
                    num_res_blocks=2, attention_resolutions=(1,),
                    channel_mult=(1, 2), num_heads=4, dims=1)
    out = net.apply({"params": params},
                    jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
                    timesteps=jnp.asarray([0, 999]))
    err = np.abs(np.moveaxis(np.asarray(out), -1, 1)
                 - want.detach().numpy()).max()
    assert err < 2e-4, f"max err {err}"
