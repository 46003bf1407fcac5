"""Config-driven construction of model / diffusion / optimizer.

Parity with ``models/model_creation.py:19-191`` over the flat config schema
of ``configs/beat-ours.json`` (the TED nested schema is stale in the
reference — SURVEY.md defects).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import optax

from ..diffusion import Schedule, make_diffusion
from ..training.lr_schedule import build_lr_schedule
from .denoiser import DenoiserConfig, GestureDenoiser


SUPPORTED_DECODERS = ("oneway_cross_attention", "cross_attention",
                      "cross_attention_gcn", "unet_attention")


def build_model(d_pose: int, model_params, dtype: "str | None" = None,
                encoder_dtype: "str | None" = None) -> GestureDenoiser:
    decoder_params = model_params.get("Decoder")
    if decoder_params.type not in SUPPORTED_DECODERS:
        raise ValueError(f"Unsupported decoder type {decoder_params.type}")
    encoder_params = model_params.get("Encoder")
    if encoder_params is not None and encoder_params.get("type", "ha2g") != "ha2g":
        raise ValueError(f"Unsupported encoder type {encoder_params.type}")
    gen = model_params.get("Generate")
    extras = {}
    if decoder_params.type == "cross_attention_gcn":
        extras = dict(graph_layout=decoder_params.get("graph_layout", "beat"),
                      graph_strategy=decoder_params.get("graph_strategy", "spatial"))
    elif decoder_params.type == "unet_attention":
        # reference schema (model_creation.py:106-120): num_res_blocks,
        # channel_mult, attention_resolutions, window_len, num_heads
        extras = dict(
            channel_mult=tuple(decoder_params.get("channel_mult", (1, 2, 4))),
            attention_resolutions=tuple(
                decoder_params.get("attention_resolutions", (1, 2, 4))),
            window_len=decoder_params.get("window_len", 40))
    cfg = DenoiserConfig(
        d_pose=d_pose,
        d_model=model_params.d_model,
        heads=decoder_params.get("heads", decoder_params.get("num_heads", 8)),
        n_layers=decoder_params.get("n_layers",
                                    decoder_params.get("num_res_blocks", 4)),
        dropout=model_params.get("dropout_prob", 0.0),
        model_type=model_params.get("type", "s2g_v2"),
        decoder_type=decoder_params.type,
        pose_seed_len=(gen.get("pose_seed_len", 10) if gen is not None else 10),
        dtype=dtype,
        encoder_dtype=encoder_dtype,
        **extras,
    )
    return GestureDenoiser(cfg)


class ModelBundle(NamedTuple):
    model: GestureDenoiser
    schedule: Schedule           # training schedule (full steps)
    timestep_map: jnp.ndarray
    eval_schedule: Schedule      # respaced for sampling/eval
    eval_timestep_map: jnp.ndarray
    optimizer: Any               # optax.GradientTransformation
    lr_schedule: Any
    # NOTE no schedule_sampler field: the reference builds a UniformSampler
    # whose importance weights it then discards (trainer.py:152-154 —
    # ``diffusion_steps, _ = self.schedule_sampler.sample(...)``), so the
    # operational behaviour is a plain uniform draw.  make_train_step draws
    # uniform t in-graph (training/trainer.py:86), which is that same
    # behaviour without the dead field; diffusion/resample.py still ships
    # both samplers for users who want them.


def build_all(
    config,
    d_pose: int,
    is_training: bool = True,
    dtype: "str | None" = None,
    encoder_dtype: "str | None" = None,
) -> ModelBundle:
    model_params = config.Model
    model = build_model(d_pose, model_params, dtype=dtype,
                        encoder_dtype=encoder_dtype)

    dp = model_params.get("Diffusion")
    if dp.get("type", "gaussian") != "gaussian":
        raise ValueError(f"Unsupported diffusion type {dp.type}")
    # diffusion/gaussian.py implements FIXED_SMALL only (the value both
    # shipped reference configs use); any other requested variance type
    # must fail loudly, not silently sample with beta_tilde
    mvt = dp.get("model_var_type", "fixed_small")
    if mvt != "fixed_small":
        raise ValueError(
            f"Unsupported model_var_type {mvt!r}: only 'fixed_small' "
            "(gaussian_diffusion.py:91-94 equivalent) is implemented")
    sched, tmap = make_diffusion(
        dp.noise_schedule, dp.diffusion_steps, dp.get("timestep_respacing"),
        is_training=True)
    eval_sched, eval_tmap = make_diffusion(
        dp.noise_schedule, dp.diffusion_steps, dp.get("timestep_respacing"),
        is_training=False)

    train_params = config.get("Train") or {}
    lr = train_params.get("lr", 1e-2) if hasattr(train_params, "get") else 1e-2
    wd = (train_params.get("weight_decay") or 0.0) if hasattr(train_params, "get") else 0.0
    lr_schedule = build_lr_schedule(
        train_params.get("Scheduler") if hasattr(train_params, "get") else None, lr)
    # plain AdamW: make_train_step runs the whole optimizer tail on ONE
    # ravelled vector (training/train_state.py::init_opt_state), so no
    # optax.flatten wrapper is needed
    optimizer = optax.adamw(learning_rate=lr_schedule, weight_decay=wd)

    return ModelBundle(model, sched, tmap, eval_sched, eval_tmap,
                       optimizer, lr_schedule)
