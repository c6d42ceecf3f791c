"""Tests for the padded PointCloud container, voxel grid, NN, and prefilter."""

import numpy as np
import jax.numpy as jnp

from mrg_slam_tpu.config import PrefilterConfig
from mrg_slam_tpu.ops import knn, prefilter, voxel
from mrg_slam_tpu.ops.cloud import PointCloud, compact, merge


def test_pointcloud_pad_and_compact(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=16)
    assert pc.capacity == 16
    assert int(pc.count()) == 10
    np.testing.assert_allclose(pc.to_numpy(), pts, atol=0)

    # knock out some points, compact, order preserved
    mask = np.asarray(pc.mask).copy()
    mask[[1, 3]] = False
    pc2 = compact(PointCloud(pc.points, jnp.asarray(mask)), capacity=8)
    expect = pts[[0, 2, 4, 5, 6, 7, 8, 9]]
    np.testing.assert_allclose(pc2.to_numpy(), expect, atol=0)


def test_merge(rng):
    a = PointCloud.from_array(rng.normal(size=(5, 3)).astype(np.float32), 8)
    b = PointCloud.from_array(rng.normal(size=(4, 3)).astype(np.float32), 8)
    m = merge(a, b, capacity=16)
    assert int(m.count()) == 9


def test_voxel_downsample_means(rng):
    # two clusters, one lone point
    c1 = np.array([[0.01, 0.01, 0.01], [0.09, 0.09, 0.09]], dtype=np.float32)
    c2 = np.array([[5.01, 0.0, 0.0], [5.09, 0.0, 0.0]], dtype=np.float32)
    lone = np.array([[10.05, 10.05, 0.0]], dtype=np.float32)
    pts = np.concatenate([c1, c2, lone])
    pc = PointCloud.from_array(pts, capacity=16)
    out = voxel.voxel_downsample(pc, resolution=0.5, min_points=1, capacity=8)
    got = out.to_numpy()
    assert got.shape[0] == 3
    expect = np.stack([c1.mean(0), c2.mean(0), lone[0]])
    # order not guaranteed: sort both by x
    np.testing.assert_allclose(got[np.argsort(got[:, 0])],
                               expect[np.argsort(expect[:, 0])], atol=1e-5)

    # min_points=2 drops the lone point
    out2 = voxel.voxel_downsample(pc, resolution=0.5, min_points=2, capacity=8)
    assert out2.to_numpy().shape[0] == 2


def test_voxel_downsample_count_matches_grid(rng):
    pts = rng.uniform(-4, 4, size=(500, 3)).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=512)
    res = 1.0
    out = voxel.voxel_downsample(pc, resolution=res, capacity=512)
    # golden: numpy voxel count
    coords = np.floor((pts - pts.min(0)) / res).astype(int)
    n_unique = len(set(map(tuple, coords)))
    assert out.to_numpy().shape[0] == n_unique


def test_nearest_neighbor_golden(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    tgt = rng.normal(size=(80, 3)).astype(np.float32)
    tc = PointCloud.from_array(tgt, capacity=128)
    d2, idx = knn.nearest_neighbor(jnp.asarray(src), tc.points, tc.mask,
                                   chunk=32)
    # golden brute force
    d_all = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), d_all.min(1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), d_all.argmin(1))


def test_knn_golden(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    tgt = rng.normal(size=(60, 3)).astype(np.float32)
    tc = PointCloud.from_array(tgt, capacity=64)
    d2, idx = knn.knn(jnp.asarray(src), tc.points, tc.mask, k=5, chunk=16)
    d_all = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    golden = np.sort(d_all, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), golden,
                               atol=1e-4)


def test_radius_count(rng):
    pts = np.array([[0, 0, 0], [0.3, 0, 0], [0.6, 0, 0], [5, 5, 5]],
                   dtype=np.float32)
    pc = PointCloud.from_array(pts, capacity=8)
    counts = np.asarray(knn.radius_count(pc.points, pc.mask, radius=0.5))
    np.testing.assert_array_equal(counts[:4], [1, 2, 1, 0])


def test_distance_filter():
    pts = np.array([[0.05, 0, 0], [1, 0, 0], [40, 0, 0]], dtype=np.float32)
    pc = PointCloud.from_array(pts, capacity=8)
    out = prefilter.distance_filter(pc, 0.1, 35.0)
    got = out.to_numpy()
    np.testing.assert_allclose(got, pts[1:2], atol=0)


def test_prefilter_pipeline(rng):
    # dense shell of points 5m out + close noise + far noise
    theta = rng.uniform(0, 2 * np.pi, size=2000)
    ring = np.stack([5 * np.cos(theta), 5 * np.sin(theta),
                     rng.uniform(-0.2, 0.2, 2000)], axis=1).astype(np.float32)
    junk_near = rng.normal(scale=0.01, size=(50, 3)).astype(np.float32)
    junk_far = (rng.normal(size=(50, 3)) * 3 + 100).astype(np.float32)
    pts = np.concatenate([ring, junk_near, junk_far])
    pc = PointCloud.from_array(pts, capacity=4096)
    cfg = PrefilterConfig(downsample_resolution=0.2,
                          capacity_filtered_points=1024,
                          radius_radius=0.5, radius_min_neighbors=2)
    out = prefilter.prefilter(pc, cfg)
    got = out.to_numpy()
    assert got.shape[0] > 50
    d = np.linalg.norm(got, axis=1)
    assert (d > 0.1).all() and (d < 35.0).all()


def test_statistical_outlier(rng):
    base = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    outlier = np.array([[30, 30, 30]], dtype=np.float32)
    pc = PointCloud.from_array(np.concatenate([base, outlier]), capacity=256)
    mask = np.asarray(prefilter.statistical_outlier_mask(pc, 10, 1.0))
    assert not mask[200]  # outlier removed
    assert mask[:200].mean() > 0.8


def test_deskew_identity(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=16)
    frac = np.linspace(0, 1, 16).astype(np.float32)
    out = prefilter.deskew(pc, jnp.asarray(frac),
                           jnp.zeros(3, jnp.float32), 0.1)
    np.testing.assert_allclose(out.to_numpy(), pts, atol=1e-6)


def test_voxel_absolute_origin_consistency(rng):
    """Two overlapping scans keep consistent voxel subsets under truncation
    with absolute_origin keys (min-corner anchoring would not)."""
    base = rng.uniform(0, 20, size=(4000, 3)).astype(np.float32)
    a = base + rng.normal(scale=0.01, size=base.shape).astype(np.float32)
    b = base + rng.normal(scale=0.01, size=base.shape).astype(np.float32)
    # shift cloud b's bounding box by adding a far-off corner point
    b = np.concatenate([b, [[-7.3, -9.1, -3.7]]]).astype(np.float32)
    ca = PointCloud.from_array(a, capacity=4096)
    cb = PointCloud.from_array(b, capacity=4096)
    cap = 512  # forces heavy truncation
    da = voxel.voxel_downsample(ca, 0.5, capacity=cap, absolute_origin=True)
    db = voxel.voxel_downsample(cb, 0.5, capacity=cap, absolute_origin=True)
    pa, pb = da.to_numpy(), db.to_numpy()
    # most kept voxels coincide (same keys -> same hash order)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pb).query(pa)
    frac_close = (d < 0.5).mean()
    assert frac_close > 0.9, frac_close


def test_synthetic_dynamic_objects_occlude_and_move():
    """Dynamic objects (io/synthetic.py): moving clusters enter the scan,
    shadow static structure behind them, move with t, and leave the
    static-world path byte-identical when disabled."""
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, _yaw_pose

    w0 = SyntheticWorld.build(seed=9, extent=20.0, n_ground=5000,
                              n_pillars=5, n_walls=3, noise=0.0)
    wd = SyntheticWorld.build(seed=9, extent=20.0, n_ground=5000,
                              n_pillars=5, n_walls=3, noise=0.0,
                              n_dynamic=4)
    pose = _yaw_pose(0.0, 0.0, 1.5, 0.0)

    s_static = w0.scan(pose, seed=3)
    s_t0 = wd.scan(pose, seed=3, t=0.0)
    s_t5 = wd.scan(pose, seed=3, t=5.0)
    # same seed+t reproduces exactly; different t moves the objects
    np.testing.assert_array_equal(s_t0, wd.scan(pose, seed=3, t=0.0))
    assert s_t0.shape != s_t5.shape or not np.array_equal(s_t0, s_t5)
    # static world path is untouched when dynamics are off
    np.testing.assert_array_equal(s_static, w0.scan(pose, seed=3))

    # occlusion: some static points visible at t=0 must be shadowed —
    # place one object directly between the sensor and a known pillar
    wd2 = SyntheticWorld.build(seed=9, extent=20.0, n_ground=5000,
                               n_pillars=5, n_walls=3, noise=0.0,
                               n_dynamic=1)
    wd2.dyn_p0[0] = [5.0, 0.0, 1.0]
    wd2.dyn_vel[0] = [0.0, 0.0, 0.0]
    wd2.dyn_size[0] = 1.0
    s_occ = wd2.scan(pose, seed=3, t=0.0)
    # strict inner shadow cone: rays within 0.6x the occluder's angular
    # radius, for points beyond it, are guaranteed shadowed
    c = np.asarray([5.0, 0.0, 1.0 - 1.5])
    cd = np.linalg.norm(c)

    def shadowed(pts):
        d = np.linalg.norm(pts, axis=1)
        u = pts / np.maximum(d, 1e-6)[:, None]
        cosang = u @ (c / cd)
        inner = np.cos(0.6 * np.arcsin(min(1.0 / cd, 1.0)))
        # d > cd + 2.0 clears the occluder's own surface shell (radius
        # 1.0 + z spread), which legitimately sits inside the cone
        return int(((cosang > inner) & (d > cd + 2.0)).sum())

    assert shadowed(s_static) > 0
    assert shadowed(s_occ) == 0
