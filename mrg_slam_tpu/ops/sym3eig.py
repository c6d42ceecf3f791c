"""Closed-form symmetric 3x3 eigen-analysis (batched, branch-free).

`jnp.linalg.eigh` lowers to iterative QR on TPU — tens of milliseconds for
the 8k-point covariance batches the GICP preprocessing needs. The SLAM
kernels only ever need:

- the smallest eigenvector (surface normal / plane regularization), and
- the full eigenvalue triple (diagnostics).

Both have closed forms: eigenvalues via Cardano's trigonometric solution,
the eigenvector via cross products of rows of (A - lambda I) (the two
largest-norm cross products span the eigvector's direction). Pure
elementwise VPU math, `vmap`-free batched by construction.

Accuracy: ~1e-6 relative on well-separated spectra, degrading gracefully on
(near-)degenerate ones — ample for covariance regularization, where the
plane normal of a quasi-planar neighborhood is strongly determined.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues (ascending) of symmetric (..., 3, 3) via Cardano."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - qI)/p
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    half_det = 0.5 * (c00 * (c11 * c22 - c12 * c12)
                      - c01 * (c01 * c22 - c12 * c02)
                      + c02 * (c01 * c12 - c11 * c02))
    half_det = jnp.clip(half_det, -1.0, 1.0)
    angle = jnp.arccos(half_det) / 3.0
    two_pi_3 = 2.0943951023931953
    l2 = q + 2.0 * p * jnp.cos(angle)
    l0 = q + 2.0 * p * jnp.cos(angle + two_pi_3)
    l1 = 3.0 * q - l0 - l2
    return jnp.stack([l0, l1, l2], axis=-1)  # ascending


def _eigvec_for(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of symmetric A for (simple) eigenvalue lam."""
    eye = jnp.eye(3, dtype=A.dtype)
    B = A - lam[..., None, None] * eye
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    # pick the largest cross product (most numerically stable)
    best12 = (n12 >= n01) & (n12 >= n02)
    best02 = (n02 >= n01) & ~best12
    v = jnp.where(best12[..., None], c12,
                  jnp.where(best02[..., None], c02, c01))
    nv = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))
    v = v / nv
    # degenerate fallback: all cross products ~0 (isotropic block) -> z axis
    degen = (jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-20)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], A.dtype), v.shape)
    return jnp.where(degen[..., None], ez, v)


def smallest_eigvec3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(eigenvalues ascending, unit eigenvector of the smallest)."""
    w = eigvalsh3(A)
    return w, _eigvec_for(A, w[..., 0])


def largest_eigvec3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    w = eigvalsh3(A)
    return w, _eigvec_for(A, w[..., 2])
