"""Robust kernels as IRLS weights.

g2o applies rho(e) to the squared error e = r^T Omega r and reweights by
rho'(e) (RobustKernel::robustify). The reference registers kernels by name
(graph_slam.cpp:334-350, robust_kernel_io.cpp:14-42); the same names are
accepted here (types.KERNEL_IDS) and dispatched by integer id inside jit
via `jnp.select`, so edges with different kernels batch together.
"""

from __future__ import annotations

import jax.numpy as jnp

from .types import (KERNEL_CAUCHY, KERNEL_DCS, KERNEL_FAIR,
                    KERNEL_GEMAN_MCCLURE, KERNEL_HUBER, KERNEL_NONE,
                    KERNEL_PSEUDO_HUBER, KERNEL_SATURATED, KERNEL_TUKEY,
                    KERNEL_WELSCH)


def robust_rho_and_weight(e: jnp.ndarray, kernel: jnp.ndarray,
                          delta: jnp.ndarray):
    """(rho(e), w=rho'(e)) for squared errors e >= 0, elementwise.

    Kernel formulas follow g2o's robust_kernel_impl.cpp.
    """
    e = jnp.maximum(e, 0.0)
    d2 = delta * delta
    sqrte = jnp.sqrt(e + 1e-20)

    # Huber
    huber_rho = jnp.where(e <= d2, e, 2.0 * delta * sqrte - d2)
    huber_w = jnp.where(e <= d2, 1.0, delta / sqrte)
    # Cauchy
    cauchy_rho = d2 * jnp.log1p(e / d2)
    cauchy_w = 1.0 / (1.0 + e / d2)
    # Dynamic Covariance Scaling: s = min(1, 2 delta / (delta + e))
    dcs_s = jnp.minimum(1.0, 2.0 * delta / (delta + e))
    dcs_rho = dcs_s * e  # effective scaled error
    dcs_w = dcs_s * dcs_s
    # Fair
    fair_rho = 2.0 * d2 * (sqrte / delta - jnp.log1p(sqrte / delta))
    fair_w = 1.0 / (1.0 + sqrte / delta)
    # Geman-McClure
    gm_rho = d2 * e / (d2 + e)
    gm_w = (d2 / (d2 + e)) ** 2
    # Pseudo-Huber
    ph_rho = 2.0 * d2 * (jnp.sqrt(1.0 + e / d2) - 1.0)
    ph_w = 1.0 / jnp.sqrt(1.0 + e / d2)
    # Saturated
    sat_rho = jnp.minimum(e, d2)
    sat_w = jnp.where(e <= d2, 1.0, 0.0)
    # Tukey
    tk = 1.0 - e / d2
    tukey_rho = jnp.where(e <= d2, d2 / 3.0 * (1.0 - tk ** 3), d2 / 3.0)
    tukey_w = jnp.where(e <= d2, tk * tk, 0.0)
    # Welsch
    welsch_rho = d2 * (1.0 - jnp.exp(-e / d2))
    welsch_w = jnp.exp(-e / d2)

    preds = [kernel == k for k in (
        KERNEL_NONE, KERNEL_HUBER, KERNEL_CAUCHY, KERNEL_DCS, KERNEL_FAIR,
        KERNEL_GEMAN_MCCLURE, KERNEL_PSEUDO_HUBER, KERNEL_SATURATED,
        KERNEL_TUKEY, KERNEL_WELSCH)]
    rho = jnp.select(preds, [e, huber_rho, cauchy_rho, dcs_rho, fair_rho,
                             gm_rho, ph_rho, sat_rho, tukey_rho, welsch_rho])
    w = jnp.select(preds, [jnp.ones_like(e), huber_w, cauchy_w, dcs_w,
                           fair_w, gm_w, ph_w, sat_w, tukey_w, welsch_w])
    return rho, w
