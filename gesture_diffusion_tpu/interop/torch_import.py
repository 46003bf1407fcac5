"""Import reference (PyTorch) checkpoints into this framework.

Maps a torch ``state_dict`` of the reference flagship family —
``Speech2GestureModel``/``Speech2GestureModelV2``
(``/root/reference/models/model.py:23-117``) with the HA2G speech encoder
(``ha2g/speech_encoder.py:9-61``, ``ha2g/model/ResNetSE34V2.py:13-221``)
and the ``OnewayCrossAttention`` decoder (``models/nn.py:177-228``) — onto
this repo's ``GestureDenoiser`` variables (``params`` + ``batch_stats``).

Layout conversions:
  * ``nn.Linear``   weight (O, I)       -> flax ``kernel`` (I, O)
  * ``nn.Conv2d``   weight (O, I, kh, kw) -> flax HWIO (kh, kw, I, O)
  * ``nn.BatchNorm2d`` weight/bias -> params scale/bias;
    running_mean/var -> ``batch_stats`` mean/var
  * Primer ``SpatialDepthWiseConv`` grouped Conv1d weight (d_k, 1, 3)
    -> ``(3, d_k)`` (shared across heads; ``models/attention.py``)

All flatten orders (SE-ResNet tap heads' channel-major (C, H) flatten,
pixel-shuffle channel packing) were matched by construction in
``models/speech_encoder.py`` so ``nn.Linear`` weights transplant with a
plain transpose; ``tests/test_torch_parity.py`` verifies the full forward
end to end against the executed reference.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ..models.denoiser import DenoiserConfig

# reference SE-ResNet trunk: [3, 4, 6, 3] blocks (ResNetSE34V2.py:46-49)
_RESNET_LAYERS = (3, 4, 6, 3)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):            # torch tensor, no torch import needed
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd: Mapping, prefix: str):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _dconv(sd: Mapping, prefix: str) -> dict:
    # grouped Conv1d (d_k, 1, 3): w[c, 0, k] multiplies x[t + k - 1]
    w = _np(sd[f"{prefix}.weight"])[:, 0, :].T        # -> (3, d_k)
    return {"kernel": w, "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd: Mapping, prefix: str, dconv: bool = True) -> dict:
    """MultiDConvHeadAttention (transformer.py:63-127): each of q/k/v is
    Sequential(PrepareForMultiHeadAttention, SpatialDepthWiseConv)."""
    out = {}
    for name in ("query", "key", "value"):
        if dconv:
            out[name] = _linear(sd, f"{prefix}.{name}.0.linear")
            out[f"{name}_dconv"] = _dconv(sd, f"{prefix}.{name}.1.conv")
        else:
            out[name] = _linear(sd, f"{prefix}.{name}.linear")
    out["output"] = _linear(sd, f"{prefix}.output")
    return out


def _se_block(sd: Mapping, prefix: str, has_proj: bool):
    params = {"conv1": _conv(sd, f"{prefix}.conv1"),
              "conv2": _conv(sd, f"{prefix}.conv2"),
              "se": {"Dense_0": _linear(sd, f"{prefix}.se.fc.0"),
                     "Dense_1": _linear(sd, f"{prefix}.se.fc.2")}}
    stats = {}
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.bn1")
    params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.bn2")
    if has_proj:
        params["proj_conv"] = _conv(sd, f"{prefix}.downsample.0")
        params["proj_bn"], stats["proj_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def _se_bottleneck(sd: Mapping, prefix: str, has_proj: bool):
    """SEBottleneck (ResNetBlocks.py:40-78): 1x1 / 3x3 / 1x1x4 convs."""
    params = {"conv1": _conv(sd, f"{prefix}.conv1"),
              "conv2": _conv(sd, f"{prefix}.conv2"),
              "conv3": _conv(sd, f"{prefix}.conv3"),
              "se": {"Dense_0": _linear(sd, f"{prefix}.se.fc.0"),
                     "Dense_1": _linear(sd, f"{prefix}.se.fc.2")}}
    stats = {}
    for bn in ("bn1", "bn2", "bn3"):
        params[bn], stats[bn] = _bn(sd, f"{prefix}.{bn}")
    if has_proj:
        params["proj_conv"] = _conv(sd, f"{prefix}.downsample.0")
        params["proj_bn"], stats["proj_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def _tap_head(sd: Mapping, tag: str, base: str):
    params = {"conv": _conv(sd, f"{base}.conv_{tag}"),
              "fc": _linear(sd, f"{base}.fc_{tag}")}
    stats = {}
    params["bn"], stats["bn"] = _bn(sd, f"{base}.bn_{tag}")
    return params, stats


def _resnet(sd: Mapping, base: str):
    params = {"stem_conv": _conv(sd, f"{base}.conv1")}
    stats = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, f"{base}.bn1")
    for k, blocks in enumerate(_RESNET_LAYERS, start=1):
        for b in range(blocks):
            # stage 1 keeps stride 1 and constant width -> no projection
            has_proj = b == 0 and k > 1
            name = f"layer{k}_block{b}"
            params[name], stats[name] = _se_block(
                sd, f"{base}.layer{k}.{b}", has_proj)
    for tag in ("low", "mid", "high"):
        params[f"head_{tag}"], stats[f"head_{tag}"] = _tap_head(sd, tag, base)
    return params, stats


def _cross_layer(sd: Mapping, lp: str, with_ff_mem: bool) -> dict:
    """CrossAttentionLayer (nn.py:55-125): oneway's blocks plus a memory
    self-attention stream; all but the last layer also feed-forward the
    memory."""
    out = {
        "norm_self_attn": _layernorm(sd, f"{lp}.norm_self_attn"),
        "self_attn": _mha(sd, f"{lp}.self_attn"),
        "norm_self_attn_mem": _layernorm(sd, f"{lp}.norm_self_attn_mem"),
        "self_attn_mem": _mha(sd, f"{lp}.self_attn_mem"),
        "norm_cross_attn": _layernorm(sd, f"{lp}.norm_cross_attn"),
        "cross_attn": _mha(sd, f"{lp}.cross_attn"),
        "norm_ff": _layernorm(sd, f"{lp}.norm_ff"),
        "ff": {"layer1": _linear(sd, f"{lp}.feed_forward.layer1"),
               "layer2": _linear(sd, f"{lp}.feed_forward.layer2")},
    }
    if with_ff_mem:
        out["norm_ff_mem"] = _layernorm(sd, f"{lp}.norm_ff_mem")
        out["ff_mem"] = {
            "layer1": _linear(sd, f"{lp}.feed_forward_mem.layer1"),
            "layer2": _linear(sd, f"{lp}.feed_forward_mem.layer2")}
    return out


def _cross_decoder(sd: Mapping, base: str, n_layers: int) -> dict:
    """CrossAttention decoder (nn.py:381-447)."""
    params = {"emb_x": _linear(sd, f"{base}.emb_x"),
              "emb_mem": _linear(sd, f"{base}.emb_mem"),
              "out_norm": _layernorm(sd, f"{base}.out_layers.0"),
              "out_proj": _linear(sd, f"{base}.out_layers.1")}
    for i in range(n_layers):
        params[f"layer{i}"] = _cross_layer(
            sd, f"{base}.layers.{i}", with_ff_mem=i < n_layers - 1)
    return params


def _graph_conv(sd: Mapping, prefix: str) -> dict:
    """ConvTemporalGraphical (tgcn.py:6-63): a 1x1 Conv2d producing
    out_channels*K partition-major channels -> our Dense ``proj`` with the
    same (K-major) output layout."""
    w = _np(sd[f"{prefix}.conv.weight"])[:, :, 0, 0].T   # (I, O*K)
    return {"kernel": w, "bias": _np(sd[f"{prefix}.conv.bias"])}


def _gcn_decoder(sd: Mapping, base: str, n_layers: int) -> dict:
    """CrossAttentionGCN decoder (nn.py:277-378): per-vertex emb_x, the
    cross-attention layer stack each prefixed by a graph conv, plain Linear
    out head (no out LayerNorm, nn.py:348)."""
    params = {"emb_x": _linear(sd, f"{base}.emb_x"),
              "emb_mem": _linear(sd, f"{base}.emb_mem"),
              "out_proj": _linear(sd, f"{base}.out_layers")}
    for i in range(n_layers):
        lp = f"{base}.layers.{i}"
        params[f"layer{i}"] = {
            "norm_gcn": _layernorm(sd, f"{lp}.norm_gcn"),
            "gcn": {"proj": _graph_conv(sd, f"{lp}.gcn")},
            "attn": _cross_layer(sd, lp, with_ff_mem=i < n_layers - 1),
        }
    return params


def _oneway_decoder(sd: Mapping, base: str, n_layers: int):
    params = {"emb_x": _linear(sd, f"{base}.emb_x"),
              "emb_mem": _linear(sd, f"{base}.emb_mem"),
              "out_norm": _layernorm(sd, f"{base}.out_layers.0"),
              "out_proj": _linear(sd, f"{base}.out_layers.1")}
    for i in range(n_layers):
        lp = f"{base}.layers.{i}"
        params[f"layer{i}"] = {
            "norm_self_attn": _layernorm(sd, f"{lp}.norm_self_attn"),
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "norm_cross_attn": _layernorm(sd, f"{lp}.norm_cross_attn"),
            "cross_attn": _mha(sd, f"{lp}.cross_attn"),
            "norm_ff": _layernorm(sd, f"{lp}.norm_ff"),
            "ff": {"layer1": _linear(sd, f"{lp}.feed_forward.layer1"),
                   "layer2": _linear(sd, f"{lp}.feed_forward.layer2")},
        }
    return params


def _unet_res_block(sd: Mapping, prefix: str) -> dict:
    """GLIDE ResBlock (glide/unet.py:110-198, use_scale_shift_norm=True,
    the UNetAttn factory default — model_creation.py:118) -> ResBlock1D."""
    out = {
        "norm_in": _layernorm(sd, f"{prefix}.in_layers.0"),
        "conv_in": _conv_nd(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _linear(sd, f"{prefix}.emb_layers.1"),
        "norm_out": _layernorm(sd, f"{prefix}.out_layers.0"),
        "conv_out": _conv_nd(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip_proj"] = _conv_nd(sd, f"{prefix}.skip_connection")
    return out


def _unet_attn_block(sd: Mapping, prefix: str) -> dict:
    """GLIDE AttentionBlock (glide/unet.py:201-243): head-major interleaved
    QKV 1x1 convs -> Dense (layout preserved, see _dense_from_conv1)."""
    out = {
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "qkv": _dense_from_conv1(sd, f"{prefix}.qkv"),
        "proj_out": _dense_from_conv1(sd, f"{prefix}.proj_out"),
    }
    if f"{prefix}.encoder_kv.weight" in sd:
        out["encoder_kv"] = _dense_from_conv1(sd, f"{prefix}.encoder_kv")
    return out


def _unet_decoder(sd: Mapping, base: str, cfg: DenoiserConfig) -> dict:
    """UNetAttn decoder (nn.py:450-544 over glide/unet.py:280-493) ->
    ``models/unet_decoder.py::UNetAttn``.  Walks the same block-construction
    loop as the torch module list so indices line up with our layer names
    (conv_resample=True, resblock_updown=False — the UNetAttn defaults)."""
    channel_mult = tuple(cfg.channel_mult)
    attn_res = set(cfg.attention_resolutions)
    num_res_blocks = cfg.n_layers
    unet = {
        "conv_in": _conv_nd(sd, f"{base}.input_blocks.0.0"),
        "norm_out": _layernorm(sd, f"{base}.out.0"),
        "conv_out": _conv_nd(sd, f"{base}.out.2"),
    }
    ds, ti = 1, 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            unet[f"down_{level}_{i}"] = _unet_res_block(
                sd, f"{base}.input_blocks.{ti}.0")
            if ds in attn_res:
                unet[f"down_attn_{level}_{i}"] = _unet_attn_block(
                    sd, f"{base}.input_blocks.{ti}.1")
            ti += 1
        if level != len(channel_mult) - 1:
            unet[f"downsample_{level}"] = _conv_nd(
                sd, f"{base}.input_blocks.{ti}.0.op")
            ti += 1
            ds *= 2

    unet["middle_res1"] = _unet_res_block(sd, f"{base}.middle_block.0")
    unet["middle_attn"] = _unet_attn_block(sd, f"{base}.middle_block.1")
    unet["middle_res2"] = _unet_res_block(sd, f"{base}.middle_block.2")

    for oi in range(len(channel_mult) * (num_res_blocks + 1)):
        level = len(channel_mult) - 1 - oi // (num_res_blocks + 1)
        i = oi % (num_res_blocks + 1)
        unet[f"up_{level}_{i}"] = _unet_res_block(
            sd, f"{base}.output_blocks.{oi}.0")
        li = 1
        if ds in attn_res:
            unet[f"up_attn_{level}_{i}"] = _unet_attn_block(
                sd, f"{base}.output_blocks.{oi}.{li}")
            li += 1
        if level and i == num_res_blocks:
            unet[f"upsample_{level}"] = _conv_nd(
                sd, f"{base}.output_blocks.{oi}.{li}.conv")
            ds //= 2
    return {
        "time_embed_0": _linear(sd, f"{base}.time_embed.0"),
        "time_embed_2": _linear(sd, f"{base}.time_embed.2"),
        "unet": unet,
    }


_DECODER_IMPORTERS = {
    "oneway_cross_attention":
        lambda sd, cfg: _oneway_decoder(sd, "pose_decoder", cfg.n_layers),
    "cross_attention":
        lambda sd, cfg: _cross_decoder(sd, "pose_decoder", cfg.n_layers),
    "cross_attention_gcn":
        lambda sd, cfg: _gcn_decoder(sd, "pose_decoder", cfg.n_layers),
    "unet_attention":
        lambda sd, cfg: _unet_decoder(sd, "pose_decoder", cfg),
}


def import_torch_state_dict(state_dict: Mapping, cfg: DenoiserConfig) -> dict:
    """Reference torch ``state_dict`` -> ``{"params": ..., "batch_stats": ...}``
    ready for ``GestureDenoiser(cfg).apply``.

    Supports every ``model_type`` ("default"/"s2g_v2"/"inpaint", incl. the
    inpaint variant's zero-init conditioning MLP, model.py:137-147) crossed
    with every ``SUPPORTED_DECODERS`` entry.  Tensors may be torch tensors
    or anything ``np.asarray`` accepts.
    """
    if cfg.decoder_type not in _DECODER_IMPORTERS:
        raise NotImplementedError(
            f"unknown decoder type for torch import: {cfg.decoder_type}")

    sd = dict(state_dict)
    # preflight: a wrong/partial checkpoint otherwise dies with a bare
    # KeyError on whichever tensor is translated first, hiding what the
    # dict actually contains
    if not any(k.startswith("speech_encoder.") for k in sd):
        sample = ", ".join(sorted(sd)[:5]) or "(empty)"
        raise KeyError(
            "state dict does not look like a reference gesture-DDPM "
            f"checkpoint (no 'speech_encoder.*' keys; has {len(sd)} keys, "
            f"e.g. {sample}). Pass model.state_dict() from the reference's "
            "TransformerDDPM (model.py:23-117).")
    resnet_params, resnet_stats = _resnet(
        sd, "speech_encoder.wav_encoder.feat_extractor")
    params = {
        "speech_encoder": {
            "resnet": resnet_params,
            "wav_proj": _linear(sd, "speech_encoder.wav_proj_layer"),
        },
        "step_encoder": {
            "proj1": _linear(sd, "diffusion_step_encoder.proj.0"),
            "proj2": _linear(sd, "diffusion_step_encoder.proj.2"),
        },
        "decoder": _DECODER_IMPORTERS[cfg.decoder_type](sd, cfg),
    }
    if cfg.model_type == "s2g_v2":
        params["blend_layer"] = _linear(sd, "blend_layer")
    if cfg.model_type == "inpaint":
        # Sequential(Linear, SiLU, Linear, SiLU, Linear, Dropout) — torch
        # indices 0/2/4 == flax Sequential layers_0/2/4 (model.py:137-144)
        params["inpaint_proj"] = {
            "layers_0": _linear(sd, "proj.0"),
            "layers_2": _linear(sd, "proj.2"),
            "layers_4": _linear(sd, "proj.4"),
        }
    batch_stats = {"speech_encoder": {"resnet": resnet_stats}}
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# GLIDE UNet family (models/glide_unet.py <- modules/glide/unet.py)
# ---------------------------------------------------------------------------

def _conv_nd(sd: Mapping, prefix: str) -> dict:
    """torch conv weight (O, I, *k) -> flax channel-last kernel (*k, I, O)."""
    w = _np(sd[f"{prefix}.weight"])
    w = np.moveaxis(w, (0, 1), (-1, -2))
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _dense_from_conv1(sd: Mapping, prefix: str) -> dict:
    """1x1 Conv1d (O, I, 1) -> Dense kernel (I, O) (channel order preserved,
    so the head-major interleaved QKV layout carries over verbatim)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"])[:, :, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _glide_res(sd: Mapping, prefix: str) -> dict:
    """Same torch block as _unet_res_block; only the flax param names of
    GlideUNet's ResBlock differ — delegate so a layout fix lands in both."""
    p = _unet_res_block(sd, prefix)
    out = {"in_norm": p["norm_in"], "in_conv": p["conv_in"],
           "emb_proj": p["emb_proj"], "out_norm": p["norm_out"],
           "out_conv": p["conv_out"]}
    if "skip_proj" in p:
        out["skip"] = p["skip_proj"]
    return out


# byte-identical to the UNetAttn attention importer — one definition so the
# two import paths can never desynchronise
_glide_attn = _unet_attn_block


def import_glide_unet_state_dict(
    state_dict: Mapping,
    num_res_blocks: int,
    attention_resolutions,
    channel_mult=(1, 2, 4, 8),
    conv_resample: bool = True,
    resblock_updown: bool = False,
    num_classes: "int | None" = None,
) -> dict:
    """Reference ``UNetModel`` state_dict -> ``GlideUNet`` params.

    Walks the same block-construction loop as ``unet.py:360-493`` /
    ``models/glide_unet.py::GlideUNet`` so torch module indices line up
    with the flax layer names."""
    sd = dict(state_dict)
    attn_res = set(attention_resolutions)
    params = {
        "time_embed_0": _linear(sd, "time_embed.0"),
        "time_embed_2": _linear(sd, "time_embed.2"),
        "input_0_conv": _conv_nd(sd, "input_blocks.0.0"),
        "out_norm": _layernorm(sd, "out.0"),
        "out_conv": _conv_nd(sd, "out.2"),
    }
    if num_classes is not None:
        params["label_emb"] = {"embedding": _np(sd["label_emb.weight"])}

    ds, ti = 1, 1
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            params[f"input_{ti}_res"] = _glide_res(sd, f"input_blocks.{ti}.0")
            if ds in attn_res:
                params[f"input_{ti}_attn"] = _glide_attn(
                    sd, f"input_blocks.{ti}.1")
            ti += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                params[f"input_{ti}_down"] = _glide_res(
                    sd, f"input_blocks.{ti}.0")
            elif conv_resample:
                params[f"input_{ti}_down"] = _conv_nd(
                    sd, f"input_blocks.{ti}.0.op")
            ti += 1
            ds *= 2

    params["middle_res1"] = _glide_res(sd, "middle_block.0")
    params["middle_attn"] = _glide_attn(sd, "middle_block.1")
    params["middle_res2"] = _glide_res(sd, "middle_block.2")

    for oi in range(len(channel_mult) * (num_res_blocks + 1)):
        level = len(channel_mult) - 1 - oi // (num_res_blocks + 1)
        i = oi % (num_res_blocks + 1)
        params[f"output_{oi}_res"] = _glide_res(sd, f"output_blocks.{oi}.0")
        li = 1
        if ds in attn_res:
            params[f"output_{oi}_attn"] = _glide_attn(
                sd, f"output_blocks.{oi}.{li}")
            li += 1
        if level and i == num_res_blocks:
            if resblock_updown:
                params[f"output_{oi}_up"] = _glide_res(
                    sd, f"output_blocks.{oi}.{li}")
            elif conv_resample:
                params[f"output_{oi}_up"] = _conv_nd(
                    sd, f"output_blocks.{oi}.{li}.conv")
            ds //= 2
    return params


def import_primer_stack(state_dict: Mapping, n_layers: int,
                        with_src: bool) -> dict:
    """Reference ``PrimerEZEncoder``/``PrimerEZDecoder`` state_dict
    (``transformer.py:248-347``) -> ``models/primer.py`` params."""
    sd = dict(state_dict)
    params = {"pe": {"linear": _linear(sd, "pe.linear")},
              "out_norm": _layernorm(sd, "out_layers.0"),
              "out_proj": _linear(sd, "out_layers.1")}
    for i in range(n_layers):
        lp = f"layers.{i}"
        layer = {
            "norm_self_attn": _layernorm(sd, f"{lp}.norm_self_attn"),
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "norm_ff": _layernorm(sd, f"{lp}.norm_ff"),
            "ff": {"layer1": _linear(sd, f"{lp}.feed_forward.layer1"),
                   "layer2": _linear(sd, f"{lp}.feed_forward.layer2")},
        }
        if with_src:
            layer["norm_src_attn"] = _layernorm(sd, f"{lp}.norm_src_attn")
            layer["src_attn"] = _mha(sd, f"{lp}.src_attn")
        params[f"layer{i}"] = layer
    return params
