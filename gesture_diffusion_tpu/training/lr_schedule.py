"""Learning-rate schedules as optax-compatible functions.

Parity with ``models/lr_scheduler.py:4-51``: "noamxf" (Attention-is-all-you-
need, scaled by d_model^-0.5 — BEAT's operational choice with base lr 1),
"noam" (StyleGestures decay with optional floor), "const".  Torch steps its
scheduler once at construction, so optimizer update k (0-based) sees
``curr_step = k + 1``; we reproduce that offset.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.parsing import parse_steps


def noam_xf_schedule(base_lr: float, d_model: int, warmup_steps: int):
    d_model = float(d_model)
    warmup = float(warmup_steps)

    def schedule(step):
        cur = jnp.asarray(step, jnp.float32) + 1.0
        factor = jnp.minimum(cur ** -0.5, cur * warmup ** -1.5)
        return base_lr * d_model ** -0.5 * factor

    return schedule


def noam_decay_schedule(base_lr: float, warmup_steps: int, minimum: "float | None" = None):
    warmup = float(warmup_steps)

    def schedule(step):
        cur = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        scale = warmup ** 0.5 * jnp.minimum(cur ** -0.5, cur * warmup ** -1.5)
        lr = base_lr * scale
        if minimum is not None:
            lr = jnp.where(cur > warmup, jnp.maximum(lr, minimum), lr)
        return lr

    return schedule


def build_lr_schedule(scheduler_params, base_lr: float):
    """From the config's ``Train.Scheduler`` block (may be None)."""
    if scheduler_params is None:
        return lambda step: base_lr
    stype = scheduler_params.get("type", "const")
    if stype == "const":
        return lambda step: base_lr
    if stype == "noam":
        return noam_decay_schedule(
            base_lr, parse_steps(scheduler_params.warmup_steps),
            scheduler_params.get("minimum"))
    if stype == "noamxf":
        return noam_xf_schedule(
            base_lr, scheduler_params.d_model,
            parse_steps(scheduler_params.warmup_steps))
    raise ValueError(f"Unsupported lr scheduler type: {stype}")
