"""Gaussian likelihood helpers for the VLB/bpd suite.

Parity with ``models/modules/losses.py:6-56`` (continuous-variable NLL, not
the discretised image variant).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL( N(mean1, e^logvar1) || N(mean2, e^logvar2) ), elementwise."""
    mean1, logvar1, mean2, logvar2 = map(jnp.asarray, (mean1, logvar1, mean2, logvar2))
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def log_standard_normal_pdf(x):
    return -(x ** 2) / 2.0 - 0.5 * math.log(2.0 * math.pi)


def continuous_gaussian_log_likelihood(x, *, means, log_scales):
    """log N(x; means, e^{2*log_scales}) elementwise, in nats.

    NOTE: like the reference (``losses.py:43-56``), this is the *standardised*
    residual log-density without the -log_scales Jacobian term; kept for
    metric parity.
    """
    centered = (x - means) * jnp.exp(-log_scales)
    return log_standard_normal_pdf(centered)
