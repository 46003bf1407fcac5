"""Samplers and bpd evaluation as single fused ``lax.scan`` loops.

The reference iterates timesteps in Python (``gaussian_diffusion.py:331-529``),
re-running the full speech encoder every step and shipping coefficients from
host each iteration (SURVEY.md §3.2).  Here:

  * the whole reverse process is ONE compiled scan with a donated pose
    carry — no host round-trips;
  * ``model_fn`` closes over precomputed conditioning memory, so the
    t-independent speech encoder runs exactly once per clip;
  * respaced runs remap t -> original t inside the scan via a gather
    (replacing ``respace.py:104-113``'s wrapped model).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .gaussian import (
    DenoiseFn,
    ModelFn,
    Schedule,
    mean_flat,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_mean_variance,
    q_posterior_mean_variance,
    q_sample,
    _gather,
)
from .losses import continuous_gaussian_log_likelihood, normal_kl


def wrap_respaced(model_fn: ModelFn, timestep_map: Optional[jax.Array]) -> ModelFn:
    """Map respaced timestep indices to original-process indices before the
    model's sinusoidal embedding sees them."""
    if timestep_map is None:
        return model_fn
    tmap = jnp.asarray(timestep_map)

    def wrapped(x, t):
        return model_fn(x, tmap[t])

    return wrapped


def ddpm_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    noise: jax.Array,
    rng: jax.Array,
    denoise_fn: Optional[DenoiseFn] = None,
    timestep_map: Optional[jax.Array] = None,
) -> jax.Array:
    """Ancestral DDPM sampling, x_T -> x_0 (reference ``p_sample_loop``)."""
    model_fn = wrap_respaced(model_fn, timestep_map)
    n = noise.shape[0]

    def body(carry, i):
        x, key = carry
        t = jnp.full((n,), i, dtype=jnp.int32)
        out = p_mean_variance(sched, model_fn, x, t, denoise_fn=denoise_fn)
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, x.shape, x.dtype)
        keep_noise = (i != 0).astype(x.dtype)
        x = out["mean"] + keep_noise * jnp.exp(0.5 * out["log_variance"]) * z
        return (x, key), None

    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (noise, rng), steps)
    return x


def ddim_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    noise: jax.Array,
    rng: jax.Array,
    denoise_fn: Optional[DenoiseFn] = None,
    timestep_map: Optional[jax.Array] = None,
    eta: float = 0.0,
) -> jax.Array:
    """DDIM sampling (Song et al. eq. 12), deterministic at eta=0
    (reference ``ddim_sample_loop``, ``gaussian_diffusion.py:414-529``)."""
    model_fn = wrap_respaced(model_fn, timestep_map)
    n = noise.shape[0]
    deterministic = eta == 0.0

    def body(carry, i):
        x, key = carry
        t = jnp.full((n,), i, dtype=jnp.int32)
        eps = model_fn(x, t)
        pred_x_start = predict_xstart_from_eps(sched, x, t, eps)
        if denoise_fn is not None:
            pred_x_start = denoise_fn(pred_x_start)
            # re-derive eps from the blended x0_hat (identical to the model
            # eps when no blending — skip the extra gathers in that case)
            eps = predict_eps_from_xstart(sched, x, t, pred_x_start)
        a_prev = _gather(sched.alphas_cumprod_prev, t, x.ndim)
        if deterministic:
            x = pred_x_start * jnp.sqrt(a_prev) + jnp.sqrt(1.0 - a_prev) * eps
        else:
            a_bar = _gather(sched.alphas_cumprod, t, x.ndim)
            sigma = (
                eta
                * jnp.sqrt((1.0 - a_prev) / (1.0 - a_bar))
                * jnp.sqrt(1.0 - a_bar / a_prev)
            )
            mean_pred = (
                pred_x_start * jnp.sqrt(a_prev)
                + jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
            )
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, x.shape, x.dtype)
            keep_noise = (i != 0).astype(x.dtype)
            x = mean_pred + keep_noise * sigma * z
        return (x, key), None

    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (noise, rng), steps)
    return x


def prior_bpd(sched: Schedule, x_start: jax.Array) -> jax.Array:
    """KL(q(x_T|x_0) || N(0, I)) in bits/dim (reference ``_prior_bpd``)."""
    n = x_start.shape[0]
    t = jnp.full((n,), sched.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(sched, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def bpd_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jax.Array,
    rng: jax.Array,
    timestep_map: Optional[jax.Array] = None,
    t_block: int = 1,
) -> dict:
    """Full variational bound sweep over all timesteps as one scan
    (reference ``calc_bpd_loop``, ``gaussian_diffusion.py:624-678``).

    :param t_block: timesteps evaluated per model call.  The per-t terms
        are independent given ``x_start``, so ``t_block=k`` stacks k
        timesteps into one batch-``k*N`` model call and scans ``T/k``
        times — same math, k× fewer program steps (per-step op-issue
        amortisation; see PERF.md).  Noise is keyed per TIMESTEP
        (``fold_in(rng, t)``), so results are block-size-invariant up to
        f32 reduction order.  ``model_fn`` must accept any batch size
        (callers with per-example conditioning must tile it k× — see
        ``Generator.eval_bpd``).
    :return: dict with total_bpd (N,), prior_bpd (N,), and per-timestep
             vb / x_start_mse / mse of shape (N, T_steps) ordered from
             t = T-1 down to 0 (matching the reference's stacking order).
    """
    model_fn = wrap_respaced(model_fn, timestep_map)
    n = x_start.shape[0]
    T = sched.num_timesteps
    k = int(t_block)
    if k < 1 or T % k:
        raise ValueError(f"t_block {k} must divide num_timesteps {T}")

    xs = (x_start if k == 1
          else jnp.concatenate([x_start] * k, axis=0))    # (k*N, ...)

    def body(_, i):
        # block i covers t = T-1-i*k, ..., T-(i+1)*k (descending)
        ts = T - 1 - (i * k + jnp.arange(k, dtype=jnp.int32))   # (k,)
        t = jnp.repeat(ts, n)                                   # (k*N,)
        keys = jax.vmap(lambda tt: jax.random.fold_in(rng, tt))(ts)
        noise = jax.vmap(
            lambda kk: jax.random.normal(kk, x_start.shape, x_start.dtype)
        )(keys).reshape(xs.shape)
        x_t = q_sample(sched, xs, t, noise)

        true_mean, _, true_log_var = q_posterior_mean_variance(sched, xs, x_t, t)
        out = p_mean_variance(sched, model_fn, x_t, t)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / jnp.log(2.0)
        decoder_nll = -continuous_gaussian_log_likelihood(
            xs, means=out["mean"], log_scales=0.5 * out["log_variance"])
        decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
        vb = jnp.where(t == 0, decoder_nll, kl)

        x_start_mse = mean_flat((out["pred_x_start"] - xs) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, out["pred_x_start"])
        mse = mean_flat((eps - noise) ** 2)
        return None, (vb.reshape(k, n), x_start_mse.reshape(k, n),
                      mse.reshape(k, n))

    _, (vb, x_start_mse, mse) = jax.lax.scan(
        body, None, jnp.arange(T // k))
    # (T/k, k, N) -> (T, N) keeps the reference's t = T-1 .. 0 order
    vb = jnp.moveaxis(vb.reshape(T, n), 0, 1)                  # (N, T)
    x_start_mse = jnp.moveaxis(x_start_mse.reshape(T, n), 0, 1)
    mse = jnp.moveaxis(mse.reshape(T, n), 0, 1)
    prior = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "x_start_mse": x_start_mse,
        "mse": mse,
    }
