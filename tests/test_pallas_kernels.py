"""Pallas kernels in interpreter mode (CPU CI) vs golden brute force.

On real TPU hardware these kernels were verified against float64 goldens
(100% argmin agreement at 8192x8192); these tests keep the kernel logic
honest on the CPU mesh via the Pallas interpreter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


@pytest.fixture
def interpret_pallas(monkeypatch):
    import mrg_slam_tpu.ops.pallas_nn as pn
    import mrg_slam_tpu.ops.pallas_stats as ps

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pn.pl, "pallas_call", interp)
    monkeypatch.setattr(ps.pl, "pallas_call", interp)
    yield


def test_pallas_nn_matches_golden(interpret_pallas, rng):
    from mrg_slam_tpu.ops.pallas_nn import nearest_neighbor_pallas

    src = rng.uniform(-20, 20, size=(1500, 3)).astype(np.float32)
    tgt = rng.uniform(-20, 20, size=(1100, 3)).astype(np.float32)
    mask = np.ones(1100, bool)
    mask[1000:] = False
    d2, idx = nearest_neighbor_pallas(jnp.asarray(src), jnp.asarray(tgt),
                                      jnp.asarray(mask))
    golden = ((src[:, None, :] - tgt[None, :1000, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), golden.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), golden.min(1), rtol=1e-5,
                               atol=1e-5)


def test_pallas_nn_empty_target(interpret_pallas, rng):
    from mrg_slam_tpu.ops.pallas_nn import nearest_neighbor_pallas

    src = rng.normal(size=(64, 3)).astype(np.float32)
    tgt = np.zeros((64, 3), np.float32)
    d2, idx = nearest_neighbor_pallas(jnp.asarray(src), jnp.asarray(tgt),
                                      jnp.zeros(64, bool))
    assert np.isinf(np.asarray(d2)).all()


def test_pallas_radius_count(interpret_pallas, rng):
    from mrg_slam_tpu.ops.pallas_stats import radius_count_pallas

    pts = rng.uniform(-3, 3, size=(800, 3)).astype(np.float32)
    mask = np.ones(800, bool)
    c = np.asarray(radius_count_pallas(jnp.asarray(pts), jnp.asarray(mask),
                                       0.5))
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    golden = ((d <= 0.25) & (d > 0)).sum(1)
    np.testing.assert_array_equal(c, golden)


def test_pallas_radius_moments(interpret_pallas, rng):
    from mrg_slam_tpu.ops.pallas_stats import radius_moments_pallas

    pts = rng.uniform(-2, 2, size=(600, 3)).astype(np.float32)
    mask = np.ones(600, bool)
    cnt, mean, cov = radius_moments_pallas(jnp.asarray(pts),
                                           jnp.asarray(mask), 1.0)
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    w = d <= 1.0
    gc = w.sum(1)
    np.testing.assert_array_equal(np.asarray(cnt), gc)
    i = 17
    nb = pts[w[i]]
    np.testing.assert_allclose(np.asarray(mean)[i], nb.mean(0), atol=1e-4)
    gcov = np.cov(nb.T, bias=True)
    np.testing.assert_allclose(np.asarray(cov)[i], gcov, atol=1e-3)


def test_radius_covariance_mode_equivalent_quality(rng):
    """radius-mode GICP recovers transforms as well as knn-mode (CPU path)."""
    import dataclasses
    from mrg_slam_tpu.config import RegistrationConfig
    from mrg_slam_tpu.ops import registration as reg
    from mrg_slam_tpu.ops.cloud import PointCloud
    from mrg_slam_tpu.utils import se3

    n = 500
    floor = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                      rng.normal(scale=0.02, size=n)], 1)
    wall = np.stack([rng.uniform(-10, 10, n),
                     10 + rng.normal(scale=0.02, size=n),
                     rng.uniform(0, 4, n)], 1)
    wall2 = np.stack([-10 + rng.normal(scale=0.02, size=n),
                      rng.uniform(-10, 10, n), rng.uniform(0, 4, n)], 1)
    pts = np.concatenate([floor, wall, wall2]).astype(np.float32)
    gt = se3.pose_exp(jnp.asarray([0.3, -0.2, 0.1, 0.02, 0.03, -0.05],
                                  dtype=jnp.float32))
    src = np.asarray(se3.pose_apply(se3.pose_inverse(gt), jnp.asarray(pts)))
    for mode in ("knn", "radius"):
        params = RegistrationConfig(reg_covariance_mode=mode,
                                    reg_covariance_radius=1.0,
                                    reg_transformation_epsilon=1e-4)
        res = reg.align_clouds(params, PointCloud.from_array(src, 2048),
                               PointCloud.from_array(pts, 2048),
                               se3.pose_identity())
        err = np.linalg.norm(np.asarray(res.pose)[:3] - np.asarray(gt)[:3])
        assert err < 0.05, (mode, err)
