"""C++ native runtime: build, and cross-check against the JAX kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrg_slam_tpu import native
from mrg_slam_tpu.ops import knn as jknn
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.voxel import voxel_downsample as jax_voxel

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_kdtree_matches_brute_force(rng):
    tgt = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(200, 3)).astype(np.float32)
    tree = native.KdTree(tgt)
    d2, idx = tree.knn(q, k=4)
    golden = ((q[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    gd = np.sort(golden, axis=1)[:, :4]
    np.testing.assert_allclose(d2, gd, atol=1e-4)


def test_native_vs_jax_nn(rng):
    """The MXU brute-force NN must agree with the exact kd-tree."""
    tgt = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    tc = PointCloud.from_array(tgt, capacity=512)
    d2_jax, idx_jax = jknn.nearest_neighbor(jnp.asarray(q), tc.points,
                                            tc.mask, chunk=64)
    tree = native.KdTree(tgt)
    d2_nat, idx_nat = tree.knn(q, k=1)
    np.testing.assert_allclose(np.asarray(d2_jax), d2_nat[:, 0], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx_jax), idx_nat[:, 0])


def test_native_radius_count_matches(rng):
    pts = rng.uniform(-2, 2, size=(300, 3)).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=512)
    cj = np.asarray(jknn.radius_count(pc.points, pc.mask, 0.5))[:300]
    cn = native.radius_count(pts, 0.5)
    np.testing.assert_array_equal(cj, cn)


def test_native_voxel_downsample(rng):
    pts = rng.uniform(-4, 4, size=(1000, 3)).astype(np.float32)
    out = native.voxel_downsample(pts, 1.0, min_points=1)
    coords = set(map(tuple, np.floor(pts / 1.0).astype(int)))
    assert len(out) == len(coords)
    # against the jax kernel: anchors differ (min-corner vs absolute), so
    # cell-boundary points may land one cell over — counts agree to ~0.5%
    pc = PointCloud.from_array(pts, capacity=1024)
    jout = jax_voxel(pc, 1.0, capacity=1024).to_numpy()
    assert abs(len(jout) - len(out)) <= max(3, len(out) // 200)


def test_native_distance_filter(rng):
    pts = np.array([[0.05, 0, 0], [1, 0, 0], [40, 0, 0]], np.float32)
    out = native.distance_filter(pts, 0.1, 35.0)
    np.testing.assert_allclose(out, pts[1:2])
