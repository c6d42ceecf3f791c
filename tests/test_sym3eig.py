"""Closed-form symmetric 3x3 eigensolver vs numpy."""

import numpy as np
import jax.numpy as jnp

from mrg_slam_tpu.ops.sym3eig import eigvalsh3, smallest_eigvec3


def random_spd(rng, n):
    m = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (m @ m.transpose(0, 2, 1)).astype(np.float32)


def test_eigvalsh3(rng):
    A = random_spd(rng, 256)
    w = np.asarray(eigvalsh3(jnp.asarray(A)))
    w_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-3)


def test_smallest_eigvec(rng):
    A = random_spd(rng, 256)
    w, v = smallest_eigvec3(jnp.asarray(A))
    v = np.asarray(v)
    w_ref, v_ref = np.linalg.eigh(A)
    dots = np.abs(np.sum(v * v_ref[..., 0], axis=-1))
    # allow a handful of near-degenerate spectra to disagree
    assert (dots > 0.99).mean() > 0.97
    # residual check: ||A v - w0 v|| small relative to ||A||
    res = np.einsum("nij,nj->ni", A, v) - np.asarray(w)[:, 0:1] * v
    rel = np.linalg.norm(res, axis=1) / (np.linalg.norm(A, axis=(1, 2)) + 1e-9)
    assert np.median(rel) < 1e-3


def test_plane_covariance_normal(rng):
    # flat-ish covariances: normal must be the thin direction
    n = 128
    R = np.linalg.qr(rng.normal(size=(n, 3, 3)))[0].astype(np.float32)
    D = np.zeros((n, 3, 3), np.float32)
    D[:, 0, 0] = 1e-4
    D[:, 1, 1] = 1.0
    D[:, 2, 2] = 2.0
    A = R @ D @ R.transpose(0, 2, 1)
    _, v = smallest_eigvec3(jnp.asarray(A))
    dots = np.abs(np.einsum("ni,ni->n", np.asarray(v), R[:, :, 0]))
    assert (dots > 0.999).all()


def test_degenerate_isotropic():
    A = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    w, v = smallest_eigvec3(A)
    assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0,
                               atol=1e-5)
