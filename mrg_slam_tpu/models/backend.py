"""The SLAM back-end node: keyframe admission, loop closure, optimization,
multi-robot graph exchange — the MrgSlamComponent re-designed without ROS.

apps/mrg_slam_component.cpp's timers/callbacks become explicit methods on
one host object per robot:

- `process_scan`            <- cloud_callback (:358)
- `optimization_tick`       <- optimization_timer_callback (:802)
- `on_slam_pose_broadcast`  <- slam_pose_broadcast_callback (:517)
- `on_odom_broadcast`       <- odom_broadcast_callback (:649)
- `handle_publish_graph`    <- publish_graph_service (:1153)
- `generate_map`            <- map_points_publish_timer (:764)

Determinism replaces mutexes: each robot's methods run on its own host
thread; the replay harness (pipeline/replay.py) gates playback on
SlamStatus like the reference's dataset processors do.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops.cloud import PAD_VALUE, PointCloud
from ..utils import se3np
from .graph_database import GraphDatabase
from .keyframe import EDGE_ANCHOR
from .keyframe_updater import KeyframeUpdater
from .loop_detector import LoopDetector
from .map_cloud import MapCloudGenerator
from ..parallel.messages import (EdgeMsg, GraphMsg, KeyFrameMsg,
                                 PoseWithName, PublishGraphRequest,
                                 SlamStatus)


@jax.jit
def _remove_points_near(points: jnp.ndarray, mask: jnp.ndarray,
                        centers: jnp.ndarray, center_valid: jnp.ndarray,
                        radius: jnp.ndarray) -> jnp.ndarray:
    """Mask out points within `radius` of any valid center
    (other-robot point removal, mrg_slam_component.cpp:375-443)."""
    d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(center_valid[None, :], d2, jnp.inf)
    near = jnp.any(d2 <= radius * radius, axis=-1)
    return mask & ~near


@dataclasses.dataclass
class TickStats:
    """Per-tick instrumentation mirroring timing_stats.txt
    (mrg_slam_component.cpp:1016-1045)."""

    loop_closure_us: float = 0.0
    optimization_us: float = 0.0
    num_loops: int = 0
    num_candidates: int = 0
    chi2_before: float = 0.0
    chi2_after: float = 0.0
    iterations: int = 0


class MrgSlam:
    """One robot's complete SLAM back-end."""

    MAX_OTHER_ROBOTS = 8
    MAX_STORED_SLAM_POSES = 1024  # PATH_PROXIMITY backlog cap per robot

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.own_name = cfg.own_name
        self.db = GraphDatabase(cfg)
        self.loop_detector = LoopDetector(cfg.loop, cfg.registration)
        self.keyframe_updater = KeyframeUpdater(cfg.keyframe_delta_trans,
                                                cfg.keyframe_delta_angle)
        self.map_generator = MapCloudGenerator(
            cfg.map_cloud_resolution, cfg.map_cloud_min_points_per_voxel,
            cfg.map_cloud_distance_far_thresh)
        self.status = SlamStatus(robot_name=cfg.own_name)
        # sensor processors (flushed each tick, :819-824)
        from .processors import (FloorCoeffsProcessor, GpsProcessor,
                                 ImuProcessor)
        self.gps_processor = GpsProcessor(cfg.gps)
        self.imu_processor = ImuProcessor(cfg.imu)
        self.floor_processor = FloorCoeffsProcessor(cfg.floor_coeffs)

        x, y, z, yaw, pitch, roll = cfg.init_pose
        q = se3np.rpy_to_quat(roll, pitch, yaw)
        self.init_pose = np.concatenate(
            [np.asarray([x, y, z], np.float32), q]).astype(np.float32)
        # odom->map transform, set on first keyframe then re-estimated after
        # every optimization (:864-880)
        self.trans_odom2map = se3np.pose_identity()
        self._init_done = False

        # multi-robot state
        self.others_odom_poses: Dict[str, PoseWithName] = {}
        # per-robot odom->own-map transform, re-estimated from that robot's
        # latest merged keyframe after every optimization (:864-880)
        self.others_odom2map: Dict[str, np.ndarray] = {}
        # other robots' current positions in OUR map frame (only known once
        # their graph has been merged at least once, :660-683)
        self.others_map_poses: Dict[str, np.ndarray] = {}
        self.others_slam_poses: Dict[str, List[PoseWithName]] = {}
        self.others_last_accum_dist: Dict[str, float] = {}
        self.others_last_exchange_time: Dict[str, float] = {}
        self.received_graph_bytes: List[int] = []
        self.sent_graph_bytes: List[int] = []
        # timing stats
        self.tick_stats: List[TickStats] = []
        self._tick_executor = None

    # ------------------------------------------------------------------
    # front-end entry
    # ------------------------------------------------------------------
    def process_scan(self, stamp: float, odom_pose: np.ndarray,
                     cloud: PointCloud,
                     source_covs=None) -> Optional[PoseWithName]:
        """Keyframe admission + other-robot point removal + enqueue.

        `odom_pose` is the scan-matching odometry estimate (odom frame);
        `cloud` is the prefiltered scan in the base frame. Returns our
        PoseWithName odom broadcast (sent every scan, :450-455).

        `source_covs` ((P,3,3) device array): this scan's GICP
        covariances, when the front-end already computed them over the
        SAME cloud with covariance-compatible registration settings
        (ops.registration.covariance_compatible; odometry_fused emits
        them as OdomStepOut.covs). Seeds the keyframe's pair-program
        cache so the tick's covariance prefetch dispatch vanishes —
        without it the batched prefetch was ~300 ms of the production
        tick's device wall. Ignored when point removal modified the
        cloud (the covariances would be stale).
        """
        accepted = self.keyframe_updater.update(odom_pose)
        accum = self.keyframe_updater.accum_distance
        broadcast = PoseWithName(robot_name=self.own_name, stamp=stamp,
                                 pose=np.asarray(odom_pose, np.float32),
                                 accum_dist=accum)
        if not accepted:
            return broadcast

        cloud2 = self._remove_other_robot_points(odom_pose, cloud)
        kf = self.db.add_odom_keyframe(stamp, odom_pose, accum, cloud2)
        if source_covs is not None and cloud2 is cloud:
            from ..ops.covariance import GICPCloud
            kf._gicp_cache = GICPCloud(cloud.points, cloud.mask,
                                       source_covs)
        # otherwise covariance preprocessing happens as ONE vmapped
        # dispatch at the next tick (PairRunner.prefetch_batch):
        # per-admission prefetch paid a full ~30 ms tunnel dispatch per
        # keyframe
        return broadcast

    def _remove_other_robot_points(self, odom_pose: np.ndarray,
                                   cloud: PointCloud) -> PointCloud:
        """Remove points near other robots (mrg_slam_component.cpp:375-443).

        Other robots' positions are only known in our map frame once their
        odom->map transform has been estimated from a merged keyframe
        (others_map_poses, :660-683); robots never merged are skipped, like
        the reference's others_odom_poses_ gated on others_odom2map_."""
        r = self.cfg.robot_remove_points_radius
        if r <= 0:
            return cloud
        centers = np.zeros((self.MAX_OTHER_ROBOTS, 3), np.float32)
        valid = np.zeros(self.MAX_OTHER_ROBOTS, bool)
        # own base->map transform at this scan
        own_map = se3np.pose_compose(self.trans_odom2map, odom_pose)
        map2base = se3np.pose_inverse(own_map)
        i = 0
        for name, map_pose in self.others_map_poses.items():
            if name == self.own_name or i >= self.MAX_OTHER_ROBOTS:
                continue
            other_base = se3np.pose_apply(map2base, map_pose[:3])
            centers[i] = other_base
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
    # the main loop (graph_update_interval timer)
    # ------------------------------------------------------------------
    def optimization_tick(self, now: float = 0.0) -> Optional[TickStats]:
        """optimization_timer_callback (:802): flush -> loops -> optimize.

        The device work of a tick is batched into TWO dispatches (vs. the
        reference's serial per-edge/per-candidate operations): one pair
        program (odometry-edge fitness + every loop-candidate registration
        + speculative consistency checks), and the jitted LM solve.
        """
        pre = self._tick_begin(now)
        if pre is None:
            return None
        stats, deferred, edge_reqs = pre

        self.status.in_loop_closure = True
        t0 = time.perf_counter()
        loops, edge_results = self.loop_detector.detect(self.db, edge_reqs)
        stats.loop_closure_us = (time.perf_counter() - t0) * 1e6
        self.status.in_loop_closure = False
        self._tick_insert(stats, deferred, edge_results, loops)

        self.status.in_optimization = True
        t0 = time.perf_counter()
        self.db.optimize()
        stats.optimization_us = (time.perf_counter() - t0) * 1e6
        self.status.in_optimization = False
        self._tick_post(stats)
        return stats

    # -- tick stages (shared with models/coordinator.py) ----------------
    def _tick_begin(self, now: float):
        """Init + queue flushes + the deferred-edge fitness requests.
        Returns (stats, deferred_edges, edge_requests), or None when the
        tick has nothing to do."""
        stats = TickStats()
        if not self._init_done and self.db.keyframe_queue:
            # set_init_pose (:458): odom2map starts at the configured pose
            self.trans_odom2map = self.init_pose.copy()
            self._init_done = True
            self.status.initialized = True

        pending_edges = self.db.flush_keyframe_queue(self.trans_odom2map,
                                                     defer_info=True)
        flushed = bool(pending_edges)
        flushed |= self.db.flush_static_keyframe_queue()
        flushed |= self.db.flush_graph_queue(self.loop_detector.loop_manager)
        flushed |= self.db.flush_loaded_graph(self.loop_detector.loop_manager)
        own_kfs = self.db.own_keyframes()
        flushed |= self.floor_processor.flush(self.db, own_kfs)
        flushed |= self.gps_processor.flush(self.db, own_kfs)
        flushed |= self.imu_processor.flush(self.db, own_kfs)
        if not flushed and not self.db.new_keyframes:
            return None
        # batch-compute GICP covariance caches for every new keyframe
        # (own, remote-merged, loaded) in ceil(K/16) vmapped dispatches
        self.loop_detector.runner.prefetch_batch(self.db.new_keyframes)

        # odometry edges whose information matrix needs a fitness pass ride
        # in the loop detector's phase-1 dispatch
        from .pair_runner import PairRequest
        deferred = [e for e in pending_edges if e.edge_id is None]
        edge_reqs = tuple(PairRequest(
            target=self.db.uuid_keyframe_map[e.from_uuid],
            source=self.db.uuid_keyframe_map[e.to_uuid],
            init_pose=e.relative_pose) for e in deferred)
        return stats, deferred, edge_reqs

    def _tick_insert(self, stats: TickStats, deferred, edge_results,
                     loops) -> None:
        """Weight + insert the tick's new edges and accepted loops."""
        stats.num_loops = len(loops)
        self.db.finalize_edges(deferred,
                               [r.fitness_inf for r in edge_results])
        self.db.insert_loops(loops)

    def _tick_post(self, stats: TickStats) -> None:
        """Post-solve bookkeeping: odom2map re-estimation, snapshots."""
        stats.chi2_before = self.db.graph.chi2_initial
        stats.chi2_after = self.db.graph.chi2_final
        stats.iterations = self.db.graph.last_iterations
        # re-estimate odom2map from our latest keyframe (:864-880)
        prev = self.db.prev_robot_keyframe
        if prev is not None and prev.node_id is not None:
            est = prev.estimate(self.db.graph)
            self.trans_odom2map = se3np.pose_compose(
                est, se3np.pose_inverse(prev.odom))
        # ... and every other robot's odom->map from its latest merged
        # keyframe (:871-880), refreshing their map-frame positions
        for name, (kf_uuid, kf_odom) in self.db.others_last_kf.items():
            kf = self.db.uuid_keyframe_map.get(kf_uuid)
            if kf is None or kf.node_id is None:
                continue
            est = kf.estimate(self.db.graph)
            o2m = se3np.pose_compose(est, se3np.pose_inverse(kf_odom))
            self.others_odom2map[name] = o2m
            odom_msg = self.others_odom_poses.get(name)
            if odom_msg is not None:
                self.others_map_poses[name] = se3np.pose_compose(
                    o2m, odom_msg.pose)
        # per-tick trajectory snapshot (:896 -> graph_database.cpp:599)
        self.db.save_keyframe_poses()
        self.tick_stats.append(stats)

    def optimization_tick_async(self, now: float = 0.0):
        """Run the tick on a single worker thread, concurrent with scan
        ingestion — the reference's deployment shape: the optimization
        timer (mrg_slam_component.cpp:802) fires alongside the streaming
        cloud callback. Scan ingestion only appends to the locked
        keyframe queue (GraphDatabase.queue_lock), so the tick's flush and
        the front-end never race; keyframes admitted while a tick is in
        flight are simply picked up by the next one.

        Returns a concurrent.futures.Future; ticks are serialized by the
        single worker. The deterministic replay harness keeps calling the
        synchronous `optimization_tick` (the reference's dataset
        processors likewise gate playback on SlamStatus)."""
        if self._tick_executor is None:
            from concurrent.futures import ThreadPoolExecutor
            self._tick_executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix=f"tick-{self.own_name}")
        return self._tick_executor.submit(self.optimization_tick, now)

    # ------------------------------------------------------------------
    # multi-robot
    # ------------------------------------------------------------------
    def on_odom_broadcast(self, msg: PoseWithName) -> None:
        """Track other robots' current positions (:649) for point removal
        and CURRENT_PROXIMITY triggering. The broadcast pose lives in the
        sender's odom frame; it is placed into OUR map frame through that
        robot's odom->map transform when known (:660-683)."""
        if msg.robot_name == self.own_name:
            return
        self.others_odom_poses[msg.robot_name] = msg
        o2m = self.others_odom2map.get(msg.robot_name)
        if o2m is not None:
            self.others_map_poses[msg.robot_name] = se3np.pose_compose(
                o2m, msg.pose)

    def others_poses_in_map(self, stamp: float) -> List[PoseWithName]:
        """PoseWithNameArray equivalent: every known other robot's current
        pose in OUR map frame (published per odom broadcast, :655-683)."""
        return [PoseWithName(robot_name=n, stamp=stamp, pose=p.copy(),
                             accum_dist=self.others_odom_poses[n].accum_dist
                             if n in self.others_odom_poses else 0.0)
                for n, p in self.others_map_poses.items()]

    def on_slam_pose_broadcast(
            self, msg: PoseWithName, now: float,
            request_fn: Callable[[str, PublishGraphRequest],
                                 Optional[GraphMsg]]) -> bool:
        """Decide whether to pull a delta graph from the sender (:517-643).

        `request_fn(robot_name, request)` performs the transport call and
        returns the GraphMsg (or None on timeout). Returns True if an
        exchange happened.
        """
        if (msg.robot_name == self.own_name
                or self.db.prev_robot_keyframe is None):
            return False
        if msg.robot_name not in self.cfg.multi_robot_names:
            return False
        name = msg.robot_name
        last_accum = self.others_last_accum_dist.get(name, -1.0)
        stored = self.others_slam_poses.setdefault(name, [])
        stored.append(msg)
        # bound PATH_PROXIMITY accumulation: a long non-overlapping run
        # would otherwise keep every broadcast until a trigger clears it
        if len(stored) > self.MAX_STORED_SLAM_POSES:
            del stored[: len(stored) - self.MAX_STORED_SLAM_POSES]
        exch_cfg = self.cfg.exchange
        if (last_accum >= 0 and abs(msg.accum_dist - last_accum)
                < exch_cfg.graph_request_min_accum_dist):
            return False
        last_t = self.others_last_exchange_time.get(name, -1.0)
        if (last_t >= 0
                and now - last_t < exch_cfg.graph_request_min_time_delay):
            return False

        max_d2 = exch_cfg.graph_request_max_robot_dist ** 2
        request = False
        if exch_cfg.graph_exchange_mode == "CURRENT_PROXIMITY":
            own = self.db.prev_robot_keyframe.estimate(self.db.graph)[:2]
            if float(np.sum((own - msg.pose[:2]) ** 2)) < max_d2:
                request = True
        elif exch_cfg.graph_exchange_mode == "PATH_PROXIMITY":
            own_xy = np.asarray(
                [k.estimate(self.db.graph)[:2] for k in self.db.keyframes]
            ) if self.db.keyframes else np.zeros((0, 2))
            for other_pose in self.others_slam_poses[name]:
                if own_xy.size and float(np.min(np.sum(
                        (own_xy - other_pose.pose[:2]) ** 2, axis=1))) < max_d2:
                    request = True
                    self.others_slam_poses[name].clear()
                    break
        if not request:
            return False

        self.others_last_exchange_time[name] = now
        self.status.in_graph_exchange = True
        req = PublishGraphRequest(
            robot_name=self.own_name,
            processed_keyframe_uuids=set(self.db.uuid_keyframe_map.keys()),
            processed_edge_uuids=set(self.db.edge_uuids))
        graph = request_fn(name, req)
        self.status.in_graph_exchange = False
        if graph is None:
            return False
        self.received_graph_bytes.append(graph.nbytes())
        self.db.add_graph_msg(graph)
        self.others_last_accum_dist[name] = msg.accum_dist
        return True

    def handle_publish_graph(self, req: PublishGraphRequest) -> GraphMsg:
        """Serve our delta graph: only keyframes/edges the requester hasn't
        processed (publish_graph_service, :1153-1246)."""
        kmsgs: List[KeyFrameMsg] = []
        for kf in self.db.keyframes + self.db.new_keyframes:
            if kf.uuid in req.processed_keyframe_uuids or kf.odom_counter < 0:
                continue
            kmsgs.append(KeyFrameMsg(
                robot_name=kf.robot_name, uuid=kf.uuid,
                slam_uuid=kf.slam_uuid, stamp=kf.stamp,
                odom_counter=kf.odom_counter,
                first_keyframe=kf.first_keyframe,
                static_keyframe=kf.static_keyframe,
                accum_distance=kf.accum_distance,
                estimate=kf.estimate(self.db.graph), cloud=kf.cloud))
        emsgs: List[EdgeMsg] = []
        for e in self.db.edges:
            if e.uuid in req.processed_edge_uuids or e.type == EDGE_ANCHOR:
                continue
            emsgs.append(EdgeMsg(type=e.type, uuid=e.uuid,
                                 from_uuid=e.from_uuid, to_uuid=e.to_uuid,
                                 relative_pose=e.relative_pose,
                                 information=e.information))
        prev = self.db.prev_robot_keyframe
        msg = GraphMsg(
            robot_name=self.own_name,
            latest_keyframe_uuid=prev.uuid if prev else "",
            latest_keyframe_odom=(np.asarray(prev.odom) if prev
                                  else se3np.pose_identity()),
            keyframes=kmsgs, edges=emsgs)
        self.sent_graph_bytes.append(msg.nbytes())
        return msg

    # ------------------------------------------------------------------
    # service-equivalents (apps/mrg_slam_component.cpp:184-217)
    # ------------------------------------------------------------------
    def set_init_pose(self, pose7: np.ndarray) -> None:
        """Runtime initial-pose override (init_pose_topic / init_odom_topic
        paths of :458-515); only effective before the first keyframe."""
        if self._init_done:
            return
        self.init_pose = np.asarray(pose7, np.float32)

    def get_graph_uuids(self) -> Tuple[List[str], List[str]]:
        """GetGraphUuids service: all keyframe and edge uuids."""
        return (list(self.db.uuid_keyframe_map.keys()),
                sorted(self.db.edge_uuids))

    def request_graphs(self, robot_names: List[str], now: float,
                       request_fn: Callable) -> int:
        """RequestGraphs service (:1249): pull delta graphs from the named
        peers unconditionally (used when joining late)."""
        n = 0
        for name in robot_names:
            if name == self.own_name:
                continue
            req = PublishGraphRequest(
                robot_name=self.own_name,
                processed_keyframe_uuids=set(self.db.uuid_keyframe_map),
                processed_edge_uuids=set(self.db.edge_uuids))
            graph = request_fn(name, req)
            if graph is not None:
                self.received_graph_bytes.append(graph.nbytes())
                self.db.add_graph_msg(graph)
                self.others_last_exchange_time[name] = now
                n += 1
        return n

    def save_map(self, file_path: str, resolution: Optional[float] = None,
                 min_points_per_voxel: Optional[int] = None,
                 distance_far_thresh: Optional[float] = None,
                 skip_first_cloud: bool = True) -> int:
        """SaveMap service (:1078-1098): assemble + write the map PCD with
        per-call overrides of the map generator parameters."""
        from ..io.pcd import save_pcd
        from .map_cloud import MapCloudGenerator

        gen = MapCloudGenerator(
            resolution or self.cfg.map_cloud_resolution,
            min_points_per_voxel or self.cfg.map_cloud_min_points_per_voxel,
            distance_far_thresh or self.cfg.map_cloud_distance_far_thresh)
        kfs = [k for k in self.db.keyframes + self.db.new_keyframes
               if k.node_id is not None and k.odom_counter >= 0]
        if not kfs:
            return 0
        poses = np.stack([k.estimate(self.db.graph) for k in kfs])
        pts = gen.generate([k.cloud for k in kfs], poses,
                           skip_first=skip_first_cloud,
                           first_flags=[k.first_keyframe for k in kfs])
        save_pcd(file_path, pts)
        return len(pts)

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------
    def slam_pose_broadcast(self, stamp: float) -> Optional[PoseWithName]:
        prev = self.db.prev_robot_keyframe
        if prev is None or prev.node_id is None:
            return None
        return PoseWithName(robot_name=self.own_name, stamp=stamp,
                            pose=prev.estimate(self.db.graph),
                            accum_dist=prev.accum_distance)

    def generate_map(self, skip_first_cloud: bool = True) -> np.ndarray:
        kfs = [k for k in self.db.keyframes + self.db.new_keyframes
               if k.node_id is not None and k.odom_counter >= 0]
        if not kfs:
            return np.zeros((0, 3), np.float32)
        poses = np.stack([k.estimate(self.db.graph) for k in kfs])
        return self.map_generator.generate(
            [k.cloud for k in kfs], poses, skip_first=skip_first_cloud,
            first_flags=[k.first_keyframe for k in kfs])

    def trajectory(self) -> np.ndarray:
        """(K,7) optimized keyframe poses of our own chain, in stamp order."""
        own = sorted(self.db.own_keyframes(), key=lambda k: k.stamp)
        if not own:
            return np.zeros((0, 7), np.float32)
        return np.stack([k.estimate(self.db.graph) for k in own])

    def map_pose(self, odom_pose: np.ndarray) -> np.ndarray:
        """Current map-frame pose of the robot given its odometry pose."""
        return se3np.pose_compose(self.trans_odom2map, odom_pose)
