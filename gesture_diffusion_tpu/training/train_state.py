"""Train state pytree and loss assembly.

Loss semantics mirror ``models/trainer.py:131-198`` (diffusion epsilon-MSE
mean plus optional speed losses) and ``trainer.py:310-322`` (1-D Gaussian
Wasserstein between mean |delta pose| curves), in (N, T, C) layout.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion import training_losses
from ..diffusion.gaussian import Schedule


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any           # over the RAVELLED param vector (init_opt_state)
    step: jax.Array          # scalar int32


def init_opt_state(optimizer: optax.GradientTransformation, params):
    """Optimizer state over the single ravelled parameter vector.

    The train step runs the whole optimizer tail (grad norm, clipping,
    AdamW) on ONE flat buffer: per-leaf tails cost ~2.5 us/op x ~360
    leaves x several ops on this model — an XLA Ops trace showed 8.1 ms
    of per-leaf ``global_norm`` reduces alone in a 25 ms step (PERF.md
    round 3).  AdamW is elementwise, so flat-vector math is bit-equivalent
    to per-leaf math.  (Trade-off: a flat optimizer state is replicated
    under tensor parallelism — the right choice for this 10M-param family;
    a multi-billion-param model would keep per-leaf sharded states.)
    """
    from jax.flatten_util import ravel_pytree

    return optimizer.init(ravel_pytree(params)[0])


def wasserstein_distance_1d(xs: jax.Array, ys: jax.Array, eps: float = 1e-12) -> jax.Array:
    """W2 between Gaussian fits of two 1-D samples (trainer.py:310-322)."""
    mu1, var1 = xs.mean(), xs.var()
    mu2, var2 = ys.mean(), ys.var()
    dist_quad = (mu1 - mu2) ** 2 + (var1 + var2 - 2.0 * jnp.sqrt(var1 * var2))
    return jnp.sqrt(jnp.maximum(dist_quad, eps))


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).mean()


def assemble_losses(
    sched: Schedule,
    model_fn,
    x_start: jax.Array,          # (N, T, C)
    t: jax.Array,                # (N,)
    noise: jax.Array,
    loss_params: Optional[Dict[str, float]] = None,
    weights: Optional[jax.Array] = None,
    with_per_example: bool = False,
) -> Dict[str, jax.Array]:
    """Total loss + per-term scalars (keys match the reference's wandb keys).

    :param weights: optional (N,) importance weights for the denoise term
        (loss-aware schedule sampling, reference ``trainer.py``-style
        ``(losses * weights).mean()``); aux speed losses are batch-global
        statistics and stay unweighted.
    :param with_per_example: include the UNWEIGHTED per-example mse vector
        under ``"mse_per_example"`` (consumed by
        ``LossSecondMomentResampler.update_with_local_losses`` — pop it
        before scalar logging)."""
    returns = training_losses(sched, model_fn, x_start, t, noise)
    mse = returns["mse"]
    denoise = (mse * weights).mean() if weights is not None else mse.mean()
    losses = {"loss": denoise, "denoise": denoise}
    if with_per_example:
        losses["mse_per_example"] = mse

    for name, weight in (loss_params or {}).items():
        pred_x_start = returns["pred_x_start"]
        if name == "speed_loss":
            speed = jnp.abs(jnp.diff(x_start, axis=1)).mean(axis=(0, 2))
            speed_pred = jnp.abs(jnp.diff(pred_x_start, axis=1)).mean(axis=(0, 2))
            term = wasserstein_distance_1d(speed, speed_pred)
            losses["speed"] = term
        elif name == "speed_l1_loss":
            speed = jnp.abs(jnp.diff(x_start, axis=1)).mean(axis=(0, 2))
            speed_pred = jnp.abs(jnp.diff(pred_x_start, axis=1)).mean(axis=(0, 2))
            term = smooth_l1(speed_pred, speed)
            losses["speed_l1"] = term
        elif name == "speed_constraint_loss":
            term = jnp.abs(jnp.diff(pred_x_start, axis=1)).mean()
            losses["speed_constraint"] = term
        else:
            raise ValueError(f"Unsupported loss: {name}")
        losses["loss"] = losses["loss"] + weight * term

    return losses


def clip_gradients(
    grads,
    grad_norm_clip_value: Optional[float],
    grad_clip_value: Optional[float],
):
    """Norm clip then value clip, as the reference applies both
    (trainer.py:233-236)."""
    if grad_norm_clip_value is not None:
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, grad_norm_clip_value / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
    if grad_clip_value is not None:
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -grad_clip_value, grad_clip_value), grads)
    return grads
