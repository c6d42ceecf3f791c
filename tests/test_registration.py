"""Registration engine tests: recover known transforms on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import RegistrationConfig
from mrg_slam_tpu.ops import registration as reg
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.covariance import estimate_covariances, inv3x3
from mrg_slam_tpu.ops.fitness import fitness_score, inlier_fraction
from mrg_slam_tpu.ops.gaussian_voxel import build_gaussian_voxel_map, lookup
from mrg_slam_tpu.utils import se3


def structured_scene(rng, n=1500):
    """Points on two walls and a floor — full 6-dof constraint."""
    n1 = n // 3
    floor = np.stack([rng.uniform(-10, 10, n1), rng.uniform(-10, 10, n1),
                      rng.normal(scale=0.02, size=n1)], axis=1)
    wall1 = np.stack([rng.uniform(-10, 10, n1),
                      10 + rng.normal(scale=0.02, size=n1),
                      rng.uniform(0, 4, n1)], axis=1)
    wall2 = np.stack([-10 + rng.normal(scale=0.02, size=n1),
                      rng.uniform(-10, 10, n1),
                      rng.uniform(0, 4, n1)], axis=1)
    return np.concatenate([floor, wall1, wall2]).astype(np.float32)


def true_pose():
    xi = jnp.asarray(np.array([0.3, -0.2, 0.1, 0.02, 0.03, -0.05],
                              dtype=np.float32))
    return se3.pose_exp(xi)


@pytest.mark.parametrize("method", ["ICP", "SMALL_GICP", "FAST_VGICP", "NDT"])
def test_align_recovers_transform(rng, method):
    pts = structured_scene(rng)
    gt = true_pose()  # source->target: target = gt * source
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt),
                                        jnp.asarray(pts)))
    target = PointCloud.from_array(pts, capacity=2048)
    source = PointCloud.from_array(src_pts, capacity=2048)
    params = RegistrationConfig(registration_method=method,
                                reg_transformation_epsilon=1e-4,
                                reg_maximum_iterations=64,
                                reg_resolution=2.0,
                                reg_max_correspondence_distance=2.0)
    res = reg.align_clouds(params, source, target,
                           se3.pose_identity())
    est = np.asarray(res.pose)
    gt_np = np.asarray(gt)
    terr = np.linalg.norm(est[:3] - gt_np[:3])
    rerr = float(se3.rotation_angle(
        se3.pose_quat(se3.pose_between(jnp.asarray(est), gt))))
    # NDT with the Magnusson exponential weighting matches GICP accuracy
    # on this scene; VGICP quantizes the target to voxel Gaussians and is
    # allowed 2x
    tol_t = 0.10 if method == "FAST_VGICP" else 0.05
    tol_r = 0.02 if method == "FAST_VGICP" else 0.01
    assert terr < tol_t, f"{method}: trans err {terr}"
    assert rerr < tol_r, f"{method}: rot err {rerr}"
    assert int(res.num_inliers) > 500


def test_align_identity_noop(rng):
    pts = structured_scene(rng, n=600)
    pc = PointCloud.from_array(pts, capacity=1024)
    params = RegistrationConfig(registration_method="SMALL_GICP",
                                reg_transformation_epsilon=1e-4)
    res = reg.align_clouds(params, pc, pc, se3.pose_identity())
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.pose)[:3], 0, atol=1e-3)


def test_vmap_align_batch(rng):
    """Batched candidate matching: vmap over stacked source/target pairs."""
    pts = structured_scene(rng, n=600)
    gt = true_pose()
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt), jnp.asarray(pts)))
    params = RegistrationConfig(registration_method="SMALL_GICP",
                                reg_transformation_epsilon=1e-4)
    tgt = reg.make_target(PointCloud.from_array(pts, capacity=1024), params)
    src = reg.make_source(PointCloud.from_array(src_pts, capacity=1024), params)
    # batch of 3 identical problems
    stack = lambda t: jax.tree.map(lambda x: jnp.stack([x] * 3), t)
    res = jax.vmap(reg.align, in_axes=(None, 0, 0, 0))(
        params, stack(src), stack(tgt),
        jnp.stack([se3.pose_identity()] * 3))
    assert res.pose.shape == (3, 7)
    gt_np = np.asarray(gt)
    for i in range(3):
        assert np.linalg.norm(np.asarray(res.pose)[i, :3] - gt_np[:3]) < 0.05


def test_gaussian_voxel_map_and_lookup(rng):
    pts = rng.uniform(0, 8, size=(2000, 3)).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=2048)
    vm = build_gaussian_voxel_map(pc, resolution=1.0, capacity=1024,
                                  min_points=1)
    n_vox = int(np.sum(np.asarray(vm.valid)))
    coords = np.floor(pts - pts.min(0)).astype(int)
    assert n_vox == len(set(map(tuple, coords)))
    # lookup of original points must hit their own voxel
    idx, found = lookup(vm, pc.points, pc.mask, 1.0, "DIRECT1")
    assert bool(np.asarray(found)[:2000].all())
    means = np.asarray(vm.means)[np.asarray(idx)[:2000]]
    assert np.abs(means - pts).max() < np.sqrt(3.0)  # same voxel


def test_estimate_covariances_plane(rng):
    # points on a plane -> smallest eigenvalue ~eps, normal ~z
    pts = np.stack([rng.uniform(-1, 1, 400), rng.uniform(-1, 1, 400),
                    np.zeros(400)], axis=1).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=512)
    g = estimate_covariances(pc, k=10)
    covs = np.asarray(g.covs)[:400]
    w = np.linalg.eigvalsh(covs)
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=0.2)
    np.testing.assert_allclose(w[:, 2], 1.0, rtol=0.2)


def test_inv3x3(rng):
    m = rng.normal(size=(50, 3, 3)).astype(np.float32)
    m = m @ m.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)
    inv = np.asarray(inv3x3(jnp.asarray(m), ridge=0.0))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(3), m.shape),
                               atol=1e-3)


def test_fitness_and_inliers(rng):
    pts = structured_scene(rng, n=600)
    pc = PointCloud.from_array(pts, capacity=1024)
    ident = se3.pose_identity()
    f = float(fitness_score(pc, pc, ident))
    assert f < 1e-6
    frac = float(inlier_fraction(pc, pc, ident, 0.1))
    assert frac > 0.999
    # shifted cloud has nonzero fitness
    shift = se3.make_pose(jnp.asarray([0.5, 0.0, 0.0]), se3.quat_identity())
    f2 = float(fitness_score(pc, pc, shift))
    assert f2 > 1e-3


def test_reciprocal_correspondences(rng):
    pts = structured_scene(rng, n=600)
    gt = true_pose()
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt), jnp.asarray(pts)))
    params = RegistrationConfig(registration_method="SMALL_GICP",
                                reg_transformation_epsilon=1e-4,
                                reg_use_reciprocal_correspondences=True)
    res = reg.align_clouds(params, PointCloud.from_array(src_pts, 1024),
                           PointCloud.from_array(pts, 1024),
                           se3.pose_identity())
    gt_np = np.asarray(gt)
    assert np.linalg.norm(np.asarray(res.pose)[:3] - gt_np[:3]) < 0.05
    # mutual gating discards some correspondences but keeps most
    assert 200 < int(res.num_inliers) <= 600


def test_align_pairs_packed_matches_unpacked(rng):
    """The tick's single-fetch packed program must agree field-for-field
    with the reference `align_pairs` output it replaced."""
    pts = structured_scene(rng, n=600)
    gt = true_pose()
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt),
                                        jnp.asarray(pts)))
    params = RegistrationConfig(registration_method="SMALL_GICP",
                                reg_transformation_epsilon=1e-4)
    tgt = reg.make_source(PointCloud.from_array(pts, capacity=1024), params)
    src = reg.make_source(PointCloud.from_array(src_pts, capacity=1024),
                          params)
    B = 4
    tgts, srcs = [tgt] * B, [src] * B
    init = jnp.stack([se3.pose_identity()] * B)
    # row 0 registers, row 1 evaluates only, rows 2-3 register with a gate
    iters = jnp.asarray([params.reg_maximum_iterations, 0,
                         params.reg_maximum_iterations,
                         params.reg_maximum_iterations], jnp.int32)
    ranges = jnp.asarray([np.inf, np.inf, 1.0, 0.5], jnp.float32)

    packed = np.asarray(reg.align_pairs_packed(params, tgts, srcs, init,
                                               iters, ranges))
    res = reg.align_pairs(
        params,
        jnp.stack([t.points for t in tgts]),
        jnp.stack([t.mask for t in tgts]),
        jnp.stack([t.covs for t in tgts]),
        jnp.stack([s.points for s in srcs]),
        jnp.stack([s.mask for s in srcs]),
        jnp.stack([s.covs for s in srcs]),
        init, iters, ranges)
    assert packed.shape == (B, 12)
    np.testing.assert_allclose(packed[:, :7], np.asarray(res.pose),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(packed[:, 7] > 0.5,
                                  np.asarray(res.converged))
    np.testing.assert_array_equal(packed[:, 8].astype(np.int32),
                                  np.asarray(res.iterations))
    np.testing.assert_array_equal(packed[:, 9].astype(np.int32),
                                  np.asarray(res.num_inliers))
    np.testing.assert_allclose(packed[:, 10], np.asarray(res.fitness_inf),
                               rtol=1e-6)
    np.testing.assert_allclose(packed[:, 11], np.asarray(res.fitness_range),
                               rtol=1e-6)
    # evaluate-only row kept its initial pose
    np.testing.assert_allclose(packed[1, :7], np.asarray(init[1]))
    # the registered rows recovered the transform
    assert np.linalg.norm(packed[0, :3] - np.asarray(gt)[:3]) < 0.05


@pytest.mark.parametrize("method", ["SMALL_GICP", "FAST_VGICP"])
def test_coarse_to_fine_matches_full_resolution(rng, method):
    """Coarse-to-fine GN (stride-subsampled early iterations + full-res
    polish) must recover the same transform as the single-stage path —
    it's the tick's main wall lever at production cloud sizes."""
    pts = structured_scene(rng, n=1500)
    gt = true_pose()
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt),
                                        jnp.asarray(pts)))
    target = PointCloud.from_array(pts, capacity=2048)
    source = PointCloud.from_array(src_pts, capacity=2048)
    base = RegistrationConfig(registration_method=method,
                              reg_transformation_epsilon=1e-4,
                              reg_maximum_iterations=32,
                              reg_resolution=2.0,
                              reg_max_correspondence_distance=2.0)
    coarse = RegistrationConfig(**{**base.__dict__,
                                   "reg_coarse_stride": 4,
                                   "reg_coarse_iterations": 24})
    r_full = reg.align_clouds(base, source, target, se3.pose_identity())
    r_ctf = reg.align_clouds(coarse, source, target, se3.pose_identity())
    assert bool(r_ctf.converged)
    np.testing.assert_allclose(np.asarray(r_ctf.pose)[:3],
                               np.asarray(r_full.pose)[:3], atol=0.02)
    assert int(r_ctf.num_inliers) > 500
    # still accurate against ground truth
    assert np.linalg.norm(np.asarray(r_ctf.pose)[:3]
                          - np.asarray(gt)[:3]) < 0.1


def test_coarse_to_fine_never_starves_fine_stage(rng):
    """A budget <= the coarse allocation must still leave >=1 full-res
    iteration (else every row reads non-converged -> keep-last spiral)."""
    pts = structured_scene(rng, n=600)
    pc = PointCloud.from_array(pts, capacity=1024)
    params = RegistrationConfig(registration_method="SMALL_GICP",
                                reg_transformation_epsilon=1e-3,
                                reg_maximum_iterations=8,
                                reg_coarse_stride=4,
                                reg_coarse_iterations=8)
    res = reg.align_clouds(params, pc, pc, se3.pose_identity())
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.pose)[:3], 0, atol=1e-3)


@pytest.mark.parametrize("method", ["FAST_VGICP", "NDT"])
def test_pair_runner_voxel_methods(rng, method):
    """Voxel-target methods (VGICP/NDT) run through the same batched
    bucket program as the GICP family: registration rows recover the
    transform, evaluate-only rows keep their pose and report fitness."""
    from mrg_slam_tpu.models.keyframe import KeyFrame
    from mrg_slam_tpu.models.pair_runner import PairRequest, PairRunner

    pts = structured_scene(rng, n=900)
    gt = true_pose()
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt),
                                        jnp.asarray(pts)))
    params = RegistrationConfig(registration_method=method,
                                reg_resolution=2.0,
                                reg_transformation_epsilon=1e-4,
                                reg_maximum_iterations=64)

    def kf(p):
        k = KeyFrame.__new__(KeyFrame)
        k.cloud = PointCloud.from_array(p, capacity=1024)
        return k

    tgt_kf, src_kf = kf(pts), kf(src_pts)
    runner = PairRunner(params)
    assert runner.voxel_target
    ident = np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32)
    results = runner.run([
        PairRequest(target=tgt_kf, source=src_kf, init_pose=ident,
                    max_iters=params.reg_maximum_iterations,
                    fitness_max_range=2.0),
        PairRequest(target=tgt_kf, source=tgt_kf, init_pose=ident),
    ])
    reg_row, eval_row = results
    gt_np = np.asarray(gt)
    assert np.linalg.norm(reg_row.pose[:3] - gt_np[:3]) < 0.15
    assert reg_row.num_inliers > 500
    # evaluate-only: pose untouched, self-fitness ~0
    np.testing.assert_array_equal(eval_row.pose, ident)
    assert eval_row.iterations == 0
    assert eval_row.fitness_inf < 1e-6


def test_stall_exit_retires_hopeless_rows(rng):
    """reg_stall_epsilon: a non-overlapping pair stops iterating early
    (it can never satisfy the update-norm criterion, so without the stall
    exit it pins the whole batched pair program at the full budget —
    BENCH_r04 measured 531 ms/tick of exactly this), while a true pair's
    result is unchanged."""
    pts = structured_scene(rng)
    gt = true_pose()
    src_pts = np.asarray(se3.pose_apply(se3.pose_inverse(gt),
                                        jnp.asarray(pts)))
    garbage = pts + np.array([500.0, 0, 0], np.float32)  # disjoint scene
    base = RegistrationConfig(registration_method="SMALL_GICP",
                              reg_transformation_epsilon=1e-4,
                              reg_maximum_iterations=48)
    tgt = PointCloud.from_array(pts, capacity=2048)
    good = PointCloud.from_array(src_pts, capacity=2048)
    bad = PointCloud.from_array(garbage, capacity=2048)

    import dataclasses
    stall = dataclasses.replace(base, reg_stall_epsilon=0.01)

    # disjoint pair: zero correspondences -> dies after the first
    # iteration instead of burning the 48-iteration budget
    res_bad = reg.align_clouds(stall, bad, tgt, se3.pose_identity())
    assert not bool(res_bad.converged)
    assert int(res_bad.iterations) <= 3

    # overlapping-but-wrong pair (half the scene shifted off): stalls
    # out well under budget, still reports converged=False
    mixed = np.concatenate([pts[:700] + np.array([30.0, 17.0, 0],
                                                 np.float32),
                            garbage[700:1400]])
    res_mix = reg.align_clouds(
        stall, PointCloud.from_array(mixed, capacity=2048), tgt,
        se3.pose_identity())
    assert int(res_mix.iterations) < 48

    # the true pair converges to the same pose with and without stall
    res_off = reg.align_clouds(base, good, tgt, se3.pose_identity())
    res_on = reg.align_clouds(stall, good, tgt, se3.pose_identity())
    assert bool(res_on.converged)
    np.testing.assert_allclose(np.asarray(res_on.pose),
                               np.asarray(res_off.pose), atol=1e-4)
