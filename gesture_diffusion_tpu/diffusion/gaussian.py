"""Gaussian diffusion as pure functions over a device-resident table.

TPU-first restructuring of the reference's ``GaussianDiffusion`` class
(``models/modules/gaussian_diffusion.py:75-694``):

  * All coefficient vectors are precomputed once in float64 on host, cast to
    float32 and stored in a :class:`Schedule` pytree that lives on device —
    eliminating the per-step ``torch.from_numpy`` host->device transfers the
    reference performs inside ``_extract_into_tensor`` (line 691).
  * Every operation is a pure, jit/vmap/scan-compatible function; model
    evaluation is abstracted as ``model_fn(x_t, t) -> eps`` so conditioning
    memory can be closed over and computed exactly once per clip.
  * Data layout is batch-first ``(N, T, C)`` (the reference uses (N, C, T)).
  * Variance type is FIXED_SMALL with epsilon prediction, the only mode the
    reference supports.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]   # (x_t, t) -> eps
DenoiseFn = Callable[[jax.Array], jax.Array]            # x0_hat -> x0_hat


class Schedule(NamedTuple):
    """Per-timestep diffusion coefficients, each of shape (T,) float32."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(betas: np.ndarray, dtype=jnp.float32) -> Schedule:
    """Build the coefficient table (host fp64 math, device fp32 storage)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    # variance is 0 at t=0; clip the log as the reference does (line 133)
    post_log_var = np.log(np.append(posterior_variance[1], posterior_variance[1:]))
    # short linear schedules can hit beta == 1 exactly (scale 1000/T), so
    # acp == 0 and 1/acp == inf from there on — the same values the
    # reference produces; only the fp64 divide-by-zero WARNING is suppressed
    with np.errstate(divide="ignore"):
        arrays = dict(
            betas=betas,
            alphas_cumprod=acp,
            alphas_cumprod_prev=acp_prev,
            sqrt_alphas_cumprod=np.sqrt(acp),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - acp),
            log_one_minus_alphas_cumprod=np.log(1.0 - acp),
            sqrt_recip_alphas_cumprod=np.sqrt(1.0 / acp),
            sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / acp - 1.0),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=post_log_var,
            posterior_mean_coef1=betas * np.sqrt(acp_prev) / (1.0 - acp),
            posterior_mean_coef2=(1.0 - acp_prev) * np.sqrt(alphas)
            / (1.0 - acp),
        )
    return Schedule(**{k: jnp.asarray(v, dtype=dtype) for k, v in arrays.items()})


def _gather(coef: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """coef[t] broadcast to an ndim-rank tensor with batch leading."""
    out = coef[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


# ---------------------------------------------------------------------------
# forward process q
# ---------------------------------------------------------------------------

def q_mean_variance(sched: Schedule, x_start: jax.Array, t: jax.Array):
    mean = _gather(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = _gather(1.0 - sched.alphas_cumprod, t, x_start.ndim)
    log_variance = _gather(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(sched: Schedule, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Sample q(x_t | x_0).  t == -1 passes x_start through (continuity-loss
    convention of the reference, ``gaussian_diffusion.py:182-205``)."""
    x_t = (
        _gather(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _gather(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )
    t_b = t.reshape(t.shape + (1,) * (x_start.ndim - t.ndim))
    return jnp.where(t_b == -1, x_start, x_t)


def q_posterior_mean_variance(sched: Schedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
    mean = (
        _gather(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _gather(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = _gather(sched.posterior_variance, t, x_t.ndim)
    log_variance = _gather(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


# ---------------------------------------------------------------------------
# reverse process p
# ---------------------------------------------------------------------------

def predict_xstart_from_eps(sched: Schedule, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
    return (
        _gather(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _gather(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_eps_from_xstart(sched: Schedule, x_t: jax.Array, t: jax.Array, x_start: jax.Array) -> jax.Array:
    return (
        _gather(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x_start
    ) / _gather(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def p_mean_variance(
    sched: Schedule,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    denoise_fn: Optional[DenoiseFn] = None,
    cond_fn: Optional[DenoiseFn] = None,
) -> dict:
    """Model mean/variance of p(x_{t-1} | x_t) with epsilon prediction and
    FIXED_SMALL variance (reference ``gaussian_diffusion.py:234-285``)."""
    eps = model_fn(x, t)
    if cond_fn is not None:
        eps = cond_fn(eps)
    pred_x_start = predict_xstart_from_eps(sched, x, t, eps)
    raw_x_start = pred_x_start
    if denoise_fn is not None:
        pred_x_start = denoise_fn(pred_x_start)
    mean, _, _ = q_posterior_mean_variance(sched, pred_x_start, x, t)
    variance = _gather(sched.posterior_variance, t, x.ndim)
    log_variance = _gather(sched.posterior_log_variance_clipped, t, x.ndim)
    return {
        "mean": mean,
        "variance": variance,
        "log_variance": log_variance,
        "eps": eps,
        "pred_x_start": pred_x_start,
        "raw_x_start": raw_x_start,
    }


# ---------------------------------------------------------------------------
# training losses
# ---------------------------------------------------------------------------

def mean_flat(x: jax.Array) -> jax.Array:
    return x.mean(axis=tuple(range(1, x.ndim)))


def training_losses(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> dict:
    """Epsilon-MSE diffusion loss plus auxiliary tensors
    (reference ``gaussian_diffusion.py:531-569``); (N, T, C) layout."""
    x_t = q_sample(sched, x_start, t, noise)
    eps = model_fn(x_t, t)
    mse = mean_flat((eps - noise) ** 2)
    pred_x_start = predict_xstart_from_eps(sched, x_t, t, eps)
    model_mean, _, _ = q_posterior_mean_variance(sched, pred_x_start, x_t, t)
    return {
        "mse": mse,
        "eps": eps,
        "x_t": x_t,
        "pred_x_start": pred_x_start,
        "model_mean": model_mean,
    }
