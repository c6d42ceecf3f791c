"""Process-isolated multi-robot deployment + quantized cloud exchange.

The reference runs one SLAM process per robot and exchanges delta graphs
over the network (kitti_multirobot_processor.py:85-117,
mrg_slam_component.cpp:617-643); pipeline/multiprocess.py reproduces that
topology with real OS processes and TCP. Exchange payloads ship clouds in
uint16-quantized wire form (parallel/messages.quantize_cloud) — this file
also proves that quantization is registration/ATE-neutral."""

import numpy as np
import pytest

from mrg_slam_tpu.parallel.messages import (dequantize_cloud,
                                            quantize_cloud)
from mrg_slam_tpu.ops.cloud import PointCloud


def test_quantize_roundtrip_and_size(rng):
    pts = rng.uniform(-30, 30, (2000, 3)).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=4096)
    qc = quantize_cloud(pc)
    back = dequantize_cloud(qc)
    bp = np.asarray(back.points)[np.asarray(back.mask)]
    # order preserved for valid points; error bounded by half a step
    np.testing.assert_allclose(bp, pts, atol=qc.scale)
    raw_bytes = pc.points.nbytes + pc.mask.nbytes
    assert qc.nbytes * 3 < raw_bytes, (qc.nbytes, raw_bytes)


def test_quantization_is_registration_neutral(rng):
    """GICP against a dequantized cloud lands on the same pose: 4 mm
    quantization is far below the 0.3-0.4 m voxel / 2 m correspondence
    scales (the ATE-neutrality evidence for the wire format)."""
    import jax.numpy as jnp

    from mrg_slam_tpu.config import RegistrationConfig
    from mrg_slam_tpu.io.synthetic import SyntheticWorld
    from mrg_slam_tpu.ops import registration as reg
    from mrg_slam_tpu.utils import se3np

    world = SyntheticWorld.build(seed=5, extent=25.0, n_ground=20000,
                                 max_points_per_scan=4096, noise=0.01)
    p0 = np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32)
    p1 = np.asarray([0.4, 0.15, 0, 1, 0, 0, 0], np.float32)
    tgt = PointCloud.from_array(world.scan(p0, seed=1), capacity=4096)
    src_np = world.scan(p1, seed=2)
    src = PointCloud.from_array(src_np, capacity=4096)
    src_q = dequantize_cloud(quantize_cloud(src))
    params = RegistrationConfig(reg_transformation_epsilon=1e-4,
                                reg_maximum_iterations=48,
                                reg_correspondence_randomness=10)
    target = reg.make_target(tgt, params)
    guess = jnp.asarray(se3np.pose_identity())
    r_raw = reg.align(params, reg.make_source(src, params), target, guess)
    r_q = reg.align(params, reg.make_source(src_q, params), target, guess)
    assert bool(r_raw.converged) and bool(r_q.converged)
    np.testing.assert_allclose(np.asarray(r_q.pose)[:3],
                               np.asarray(r_raw.pose)[:3], atol=5e-3)


def test_two_process_tcp_exchange(tmp_path):
    """Two robot PROCESSES over real TCP: delta graphs merge, inter-robot
    loops close, trajectories land near ground truth, byte accounting
    reflects the quantized wire format."""
    from mrg_slam_tpu.pipeline.multiprocess import run_multiprocess

    results = run_multiprocess(n_robots=2, total_frames=60, tick_every=15,
                               out_dir=str(tmp_path))
    assert set(results) == {"alpha", "bravo"}
    for name, r in results.items():
        assert r["keyframes"] > 5, r
        assert r["remote_keyframes"] > 3, r      # delta graphs merged
        assert r["received_bytes"] > 1000, r     # wire accounting live
        assert r["ate_m"] is not None and r["ate_m"] < 0.5, r
        # quantized wire format: bytes per exchanged keyframe must be well
        # under the float form (1024-pt cloud = 13.3 kB f32 vs ~6 kB wire)
        per_kf = r["received_bytes"] / max(r["remote_keyframes"], 1)
        assert per_kf < 9000, per_kf
    # at least one robot closed an inter-robot loop
    assert sum(r["loops"] for r in results.values()) >= 1


def test_quantize_empty_and_padded_clouds():
    from mrg_slam_tpu.parallel.messages import QuantizedCloud

    empty = PointCloud.empty(128)
    qc = quantize_cloud(empty)
    assert qc.offsets.shape == (0, 3) and qc.capacity == 128
    back = dequantize_cloud(qc)
    assert int(np.asarray(back.mask).sum()) == 0
    assert back.capacity == 128
    # single point
    one = PointCloud.from_array(np.asarray([[1.5, -2.25, 3.0]], np.float32),
                                capacity=16)
    rt = dequantize_cloud(quantize_cloud(one))
    np.testing.assert_allclose(np.asarray(rt.points)[0], [1.5, -2.25, 3.0],
                               atol=1.0 / 256.0)
    assert isinstance(quantize_cloud(one), QuantizedCloud)
