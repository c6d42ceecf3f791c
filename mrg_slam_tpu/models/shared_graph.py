"""Shared-graph co-hosting: R robots, ONE pose graph, one tick.

The reference deploys one full SLAM process per robot and reconciles the
copies through the delta-graph exchange protocol
(apps/mrg_slam_component.cpp:517-643, graph_database.cpp:237-389). Running
that shape co-hosted on one TPU chip duplicates everything R times: each
robot merges every other robot's keyframes (O(R^2) keyframe copies), runs
loop detection over every remote keyframe AGAIN in its own store, and
solves one of R near-identical merged graphs per tick — measured on-chip,
aggregate throughput *decreased* with R (BENCH_r03: 41.8 scans/s at R=2,
19.7 at R=4).

This module is the TPU-native answer for co-hosted fleets: ONE
GraphDatabase holds every robot's keyframe chain (per-robot anchors,
odometry edges, counters — GraphDatabase grew native multi-chain support
for this), ONE loop detector matches each new keyframe exactly once
against the union store (inter-robot loop closures fall out of the
same-store search instead of an exchange protocol; same/other-robot
accum-distance gating still applies via per-robot slam_uuids,
loop_detector.cpp:60-89 semantics), and ONE LM solve per tick optimizes
the joint graph. Each robot keeps its own view: keyframe admission gate,
odom->map transform, status, sensor processors.

Exchange bytes between co-hosted robots: zero. The wire protocol
(parallel/messages.py + pipeline/multiprocess.py) remains the deployment
for robots on different hosts; a SharedGraphSlam group can talk to remote
peers through the same GraphMsg surface if needed (handle_publish_graph).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import SlamConfig
from ..ops.cloud import PointCloud
from ..parallel.messages import PoseWithName, SlamStatus
from ..utils import se3np
from .backend import TickStats
from .graph_database import GraphDatabase
from .keyframe import new_uuid
from .keyframe_updater import KeyframeUpdater
from .loop_detector import LoopDetector
from .map_cloud import MapCloudGenerator
from .pair_runner import PairRequest


class _RobotView:
    """Per-robot front-end state over the shared store."""

    def __init__(self, name: str, cfg: SlamConfig,
                 init_pose: Tuple[float, ...]):
        from .processors import (FloorCoeffsProcessor, GpsProcessor,
                                 ImuProcessor)

        self.name = name
        self.slam_uuid = new_uuid()
        self.keyframe_updater = KeyframeUpdater(cfg.keyframe_delta_trans,
                                                cfg.keyframe_delta_angle)
        x, y, z, yaw, pitch, roll = init_pose
        q = se3np.rpy_to_quat(roll, pitch, yaw)
        self.init_pose = np.concatenate(
            [np.asarray([x, y, z], np.float32), q]).astype(np.float32)
        self.trans_odom2map = se3np.pose_identity()
        self.init_done = False
        self.status = SlamStatus(robot_name=name)
        self.last_odom_pose: Optional[np.ndarray] = None
        self.gps_processor = GpsProcessor(cfg.gps)
        self.imu_processor = ImuProcessor(cfg.imu)
        self.floor_processor = FloorCoeffsProcessor(cfg.floor_coeffs)


class SharedGraphSlam:
    """R co-hosted robots over one shared pose graph (see module doc).

    `cfg.own_name` is the group's primary identity (persistence, result
    dirs); `robot_names` lists every hosted robot. `init_poses` maps
    robot name -> (x, y, z, yaw, pitch, roll) start pose, defaulting to
    `cfg.init_pose` for unlisted robots.
    """

    def __init__(self, cfg: SlamConfig, robot_names: Sequence[str],
                 init_poses: Optional[Dict[str, Tuple[float, ...]]] = None):
        assert robot_names, "need at least one robot"
        self.cfg = cfg
        self.db = GraphDatabase(cfg)
        self.loop_detector = LoopDetector(cfg.loop, cfg.registration)
        self.map_generator = MapCloudGenerator(
            cfg.map_cloud_resolution, cfg.map_cloud_min_points_per_voxel,
            cfg.map_cloud_distance_far_thresh)
        init_poses = init_poses or {}
        self.views: Dict[str, _RobotView] = {
            name: _RobotView(name, cfg,
                             init_poses.get(name, cfg.init_pose))
            for name in robot_names}
        self.tick_stats: List[TickStats] = []

    # ------------------------------------------------------------------
    # front-end entry (per robot)
    # ------------------------------------------------------------------
    def process_scan(self, robot_name: str, stamp: float,
                     odom_pose: np.ndarray,
                     cloud: PointCloud,
                     source_covs=None) -> Optional[PoseWithName]:
        """Keyframe admission for one robot's scan (cloud_callback,
        mrg_slam_component.cpp:358). Other-robot point removal uses the
        co-hosted views' live positions directly — no broadcast hop.

        `source_covs`: front-end GICP covariances over the same cloud —
        seeds the keyframe's pair-program cache exactly like
        MrgSlam.process_scan (covariance-compatibility is the caller's
        contract; dropped when point removal modified the cloud)."""
        view = self.views[robot_name]
        view.last_odom_pose = np.asarray(odom_pose, np.float32)
        accepted = view.keyframe_updater.update(odom_pose)
        accum = view.keyframe_updater.accum_distance
        broadcast = PoseWithName(robot_name=robot_name, stamp=stamp,
                                 pose=np.asarray(odom_pose, np.float32),
                                 accum_dist=accum)
        if not accepted:
            return broadcast

        cloud2 = self._remove_other_robot_points(view, odom_pose, cloud)
        kf = self.db.add_odom_keyframe(stamp, odom_pose, accum, cloud2,
                                       robot_name=robot_name,
                                       slam_uuid=view.slam_uuid)
        if source_covs is not None and cloud2 is cloud:
            from ..ops.covariance import GICPCloud
            kf._gicp_cache = GICPCloud(cloud.points, cloud.mask,
                                       source_covs)
        # otherwise covariances are batch-prefetched at the tick (one
        # vmapped dispatch per ~16 admissions across the whole fleet)
        return broadcast

    def _remove_other_robot_points(self, view: _RobotView,
                                   odom_pose: np.ndarray,
                                   cloud: PointCloud) -> PointCloud:
        """mrg_slam_component.cpp:375-443 semantics with co-hosted truth:
        every other view's current map-frame position is known directly."""
        import jax.numpy as jnp

        from .backend import MrgSlam, _remove_points_near
        from ..ops.cloud import PAD_VALUE

        r = self.cfg.robot_remove_points_radius
        if r <= 0:
            return cloud
        centers = np.zeros((MrgSlam.MAX_OTHER_ROBOTS, 3), np.float32)
        valid = np.zeros(MrgSlam.MAX_OTHER_ROBOTS, bool)
        own_map = se3np.pose_compose(view.trans_odom2map, odom_pose)
        map2base = se3np.pose_inverse(own_map)
        i = 0
        for other in self.views.values():
            if (other is view or other.last_odom_pose is None
                    or not other.init_done
                    or i >= MrgSlam.MAX_OTHER_ROBOTS):
                continue
            other_map = se3np.pose_compose(other.trans_odom2map,
                                           other.last_odom_pose)
            centers[i] = se3np.pose_apply(map2base, other_map[:3])
            valid[i] = True
            i += 1
        if not valid.any():
            return cloud
        mask = _remove_points_near(cloud.points, cloud.mask,
                                   jnp.asarray(centers), jnp.asarray(valid),
                                   jnp.float32(r))
        pts = jnp.where(mask[:, None], cloud.points, PAD_VALUE)
        return PointCloud(pts, mask)

    # ------------------------------------------------------------------
    # the main loop: ONE tick for the whole fleet
    # ------------------------------------------------------------------
    def optimization_tick(self, now: float = 0.0) -> Optional[TickStats]:
        """flush -> loops -> optimize, once for every hosted robot
        (optimization_timer_callback :802 collapsed across the fleet)."""
        pre = self._tick_begin(now)
        if pre is None:
            return None
        stats, deferred, edge_reqs = pre

        for v in self.views.values():
            v.status.in_loop_closure = True
        t0 = time.perf_counter()
        loops, edge_results = self.loop_detector.detect(self.db, edge_reqs)
        stats.loop_closure_us = (time.perf_counter() - t0) * 1e6
        for v in self.views.values():
            v.status.in_loop_closure = False
        self._tick_insert(stats, deferred, edge_results, loops)

        for v in self.views.values():
            v.status.in_optimization = True
        t0 = time.perf_counter()
        self.db.optimize()
        stats.optimization_us = (time.perf_counter() - t0) * 1e6
        for v in self.views.values():
            v.status.in_optimization = False
        self._tick_post(stats)
        return stats

    def _tick_begin(self, now: float):
        for view in self.views.values():
            if not view.init_done:
                # set_init_pose (:458) per robot, once its first keyframe
                # is queued
                queued = any(k.robot_name == view.name
                             for k in self.db.keyframe_queue)
                if queued:
                    view.trans_odom2map = view.init_pose.copy()
                    view.init_done = True
                    view.status.initialized = True
        stats = TickStats()
        odom2maps = {n: v.trans_odom2map for n, v in self.views.items()}
        pending_edges = self.db.flush_keyframe_queue(odom2maps,
                                                     defer_info=True)
        flushed = bool(pending_edges)
        flushed |= self.db.flush_static_keyframe_queue()
        flushed |= self.db.flush_graph_queue(self.loop_detector.loop_manager)
        flushed |= self.db.flush_loaded_graph(self.loop_detector.loop_manager)
        by_robot: Dict[str, List] = {}
        for k in self.db.keyframes + self.db.new_keyframes:
            if k.odom_counter >= 0:
                by_robot.setdefault(k.robot_name, []).append(k)
        for name, view in self.views.items():
            kfs = by_robot.get(name, [])
            flushed |= view.floor_processor.flush(self.db, kfs)
            flushed |= view.gps_processor.flush(self.db, kfs)
            flushed |= view.imu_processor.flush(self.db, kfs)
        if not flushed and not self.db.new_keyframes:
            return None
        self.loop_detector.runner.prefetch_batch(self.db.new_keyframes)

        deferred = [e for e in pending_edges if e.edge_id is None]
        edge_reqs = tuple(PairRequest(
            target=self.db.uuid_keyframe_map[e.from_uuid],
            source=self.db.uuid_keyframe_map[e.to_uuid],
            init_pose=e.relative_pose) for e in deferred)
        return stats, deferred, edge_reqs

    def _tick_insert(self, stats: TickStats, deferred, edge_results,
                     loops) -> None:
        stats.num_loops = len(loops)
        self.db.finalize_edges(deferred,
                               [r.fitness_inf for r in edge_results])
        self.db.insert_loops(loops)

    def _tick_post(self, stats: TickStats) -> None:
        stats.chi2_before = self.db.graph.chi2_initial
        stats.chi2_after = self.db.graph.chi2_final
        stats.iterations = self.db.graph.last_iterations
        # re-estimate EVERY robot's odom->map from its chain's latest
        # keyframe (:864-880, uniformly instead of own-vs-others)
        for name, view in self.views.items():
            prev = self.db.prev_keyframe_of(name)
            if prev is None or prev.node_id is None:
                continue
            est = prev.estimate(self.db.graph)
            view.trans_odom2map = se3np.pose_compose(
                est, se3np.pose_inverse(prev.odom))
        self.db.save_keyframe_poses()
        self.tick_stats.append(stats)

    # ------------------------------------------------------------------
    # outputs (per robot)
    # ------------------------------------------------------------------
    def robot_keyframes(self, robot_name: str) -> List:
        return [k for k in self.db.keyframes + self.db.new_keyframes
                if k.robot_name == robot_name and k.odom_counter >= 0]

    def trajectory(self, robot_name: str) -> np.ndarray:
        """(K, 7) optimized poses of one robot's chain, stamp order."""
        own = sorted(self.robot_keyframes(robot_name),
                     key=lambda k: k.stamp)
        if not own:
            return np.zeros((0, 7), np.float32)
        return np.stack([k.estimate(self.db.graph) for k in own])

    def slam_pose_broadcast(self, robot_name: str,
                            stamp: float) -> Optional[PoseWithName]:
        prev = self.db.prev_keyframe_of(robot_name)
        if prev is None or prev.node_id is None:
            return None
        return PoseWithName(robot_name=robot_name, stamp=stamp,
                            pose=prev.estimate(self.db.graph),
                            accum_dist=prev.accum_distance)

    def map_pose(self, robot_name: str, odom_pose: np.ndarray) -> np.ndarray:
        return se3np.pose_compose(self.views[robot_name].trans_odom2map,
                                  odom_pose)

    def generate_map(self, skip_first_cloud: bool = True) -> np.ndarray:
        """One joint map over every robot's keyframes."""
        kfs = [k for k in self.db.keyframes + self.db.new_keyframes
               if k.node_id is not None and k.odom_counter >= 0]
        if not kfs:
            return np.zeros((0, 3), np.float32)
        poses = np.stack([k.estimate(self.db.graph) for k in kfs])
        return self.map_generator.generate(
            [k.cloud for k in kfs], poses, skip_first=skip_first_cloud,
            first_flags=[k.first_keyframe for k in kfs])
