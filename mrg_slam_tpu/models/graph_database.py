"""GraphDatabase: keyframe/edge store, ingest queues, uuid-dedup merge.

TPU re-design of src/mrg_slam/graph_database.cpp: owns all keyframes and
edges (uuid-keyed), four ingest queues (odometry keyframes, static
keyframes, received remote graphs, loaded graphs), the anchor-node
handling, and loop insertion. The g2o graph is the GraphSLAM builder; ROS
mutexes disappear because flushing happens on one host thread per robot.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import SlamConfig
from ..graph.builder import GraphSLAM
from ..ops.cloud import PointCloud
from ..utils import se3np
from .information_matrix import InformationMatrixCalculator
from .keyframe import (EDGE_ANCHOR, EDGE_LOOP, EDGE_ODOM, Edge, KeyFrame,
                       new_uuid)


@dataclasses.dataclass
class Loop:
    key1: KeyFrame            # the new keyframe
    key2: KeyFrame            # the matched candidate
    relative_pose: np.ndarray  # (7,) T_new^-1 T_candidate
    # ungated fitness at relative_pose, carried from the batched matching
    # pass so insert_loops can weight the edge without another device trip
    fitness: Optional[float] = None


class GraphDatabase:
    def __init__(self, cfg: SlamConfig, graph: Optional[GraphSLAM] = None):
        self.cfg = cfg
        self.own_name = cfg.own_name
        self.slam_uuid = new_uuid()  # per-run graph instance id
        # Aux-family capacities follow the enabled processors: a family
        # whose table has ZERO capacity contributes zero HLO per LM
        # iteration (graph/solve.py `_has`), so the common pose-only
        # deployment pays only for the SE3 sweep. Priors/planes arriving
        # anyway (e.g. a loaded .g2o with priors while GPS is off) are
        # covered by the stores' automatic doubling growth.
        use_priors = (cfg.gps.enable_gps or cfg.imu.enable_imu_orientation
                      or cfg.imu.enable_imu_acceleration)
        use_floor = cfg.floor_coeffs.enable_floor_coeffs
        self.graph = graph or GraphSLAM(
            cfg.optimizer, capacity_nodes=cfg.capacity_keyframes,
            capacity_edges=cfg.capacity_edges,
            # <=3 priors per keyframe (GPS xyz + IMU quat + IMU vec); the
            # floor pipeline attaches one global plane node and at most one
            # plane edge per keyframe (floor_coeffs_processor.cpp:68-78)
            capacity_priors=2 * cfg.capacity_keyframes if use_priors else 0,
            capacity_planes=2 if use_floor else 0,
            capacity_plane_edges=cfg.capacity_keyframes if use_floor else 0,
            # plane-prior / plane-plane edges are never created by the live
            # pipeline (reference registers but does not use them)
            capacity_plane_priors=0, capacity_plane_plane=0)
        self.inf_calculator = InformationMatrixCalculator(cfg.inf_matrix)

        self.keyframes: List[KeyFrame] = []       # flushed, loop-checked
        self.new_keyframes: List[KeyFrame] = []   # flushed, pending loop check
        self.edges: List[Edge] = []
        self.uuid_keyframe_map: Dict[str, KeyFrame] = {}
        self.edge_uuids: set[str] = set()
        self.edge_pairs: set[Tuple[str, str]] = set()  # (from,to) uuid pairs

        self.keyframe_queue: List[KeyFrame] = []
        self.static_keyframe_queue: List[KeyFrame] = []
        self.graph_queue: List[object] = []   # received GraphMsg
        self.loaded_graph_queue: List[object] = []
        # guards queue append/pop: the optimization tick may run on a
        # worker thread concurrently with scan ingestion, like the
        # reference's optimization timer vs. cloud callback (the reference
        # takes trans_odom2map_mutex / main_thread_mutex for the same
        # reason, mrg_slam_component.cpp:805-817)
        self.queue_lock = threading.Lock()

        # Per-robot chain state. The classic deployment holds ONE chain
        # (own_name); the shared-graph co-hosting mode
        # (models/shared_graph.py) ingests several robots' chains into one
        # store, each with its own previous keyframe, anchor, and counter.
        # The singular `prev_robot_keyframe` / `anchor_kf` / `anchor_edge`
        # / `odom_keyframe_counter` names remain as own-robot views.
        self._prev_kf: Dict[str, KeyFrame] = {}
        self._anchors: Dict[str, Tuple[KeyFrame, Edge]] = {}
        self._odom_counters: Dict[str, int] = {}
        self._save_counter = 0  # save_keyframe_poses file numbering
        # latest keyframe per other robot: name -> (uuid, odom pose)
        self.others_last_kf: Dict[str, Tuple[str, np.ndarray]] = {}

    # -- own-robot views of the per-chain state -------------------------
    @property
    def prev_robot_keyframe(self) -> Optional[KeyFrame]:
        return self._prev_kf.get(self.own_name)

    @prev_robot_keyframe.setter
    def prev_robot_keyframe(self, kf: Optional[KeyFrame]) -> None:
        if kf is None:
            self._prev_kf.pop(self.own_name, None)
        else:
            self._prev_kf[self.own_name] = kf

    def prev_keyframe_of(self, robot_name: str) -> Optional[KeyFrame]:
        return self._prev_kf.get(robot_name)

    @property
    def anchor_kf(self) -> Optional[KeyFrame]:
        pair = self._anchors.get(self.own_name)
        return pair[0] if pair else None

    @property
    def anchor_edge(self) -> Optional[Edge]:
        pair = self._anchors.get(self.own_name)
        return pair[1] if pair else None

    @property
    def odom_keyframe_counter(self) -> int:
        return self._odom_counters.get(self.own_name, 0)

    # ------------------------------------------------------------------
    # ingest
    # ------------------------------------------------------------------
    def add_odom_keyframe(self, stamp: float, odom: np.ndarray,
                          accum_distance: float, cloud: PointCloud,
                          robot_name: Optional[str] = None,
                          slam_uuid: Optional[str] = None) -> KeyFrame:
        """graph_database.cpp:35: assign uuid + counter, queue for flush.

        `robot_name`/`slam_uuid` override the defaults for the shared-graph
        co-hosting mode, where one store ingests several robots' chains."""
        name = robot_name or self.own_name
        counter = self._odom_counters.get(name, 0)
        kf = KeyFrame(robot_name=name, stamp=stamp,
                      odom=np.asarray(odom, np.float32),
                      accum_distance=accum_distance, cloud=cloud,
                      slam_uuid=slam_uuid or self.slam_uuid,
                      odom_counter=counter)
        self._odom_counters[name] = counter + 1
        with self.queue_lock:
            self.keyframe_queue.append(kf)
        return kf

    def add_static_keyframes(self, keyframes: Sequence[KeyFrame]) -> None:
        with self.queue_lock:
            self.static_keyframe_queue.extend(keyframes)

    def add_graph_msg(self, msg) -> None:
        with self.queue_lock:
            self.graph_queue.append(msg)

    # ------------------------------------------------------------------
    # flush: odometry keyframes
    # ------------------------------------------------------------------
    def flush_keyframe_queue(self, odom2map: np.ndarray,
                             defer_info: bool = False) -> List[Edge]:
        """graph_database.cpp:50: add SE3 node per keyframe + odometry edge
        to the previous keyframe; anchor handling on the very first one.

        Returns the newly created odometry edges. With `defer_info=True`
        (the back-end tick), fitness-weighted edges get `information=None`
        and no solver entry yet — the caller batches ALL edge fitness
        passes into one device dispatch and then calls `finalize_edges`
        (the reference runs one kd-tree pass per edge inline,
        graph_database.cpp:139-142). With the default, information is
        computed inline per edge, as in round 1.

        `odom2map` is either one 7-pose (the single-chain deployment) or a
        dict robot_name -> 7-pose (shared-graph co-hosting, where each
        robot's chain carries its own odom->map transform).
        """
        with self.queue_lock:
            if not self.keyframe_queue:
                return []
            n = min(len(self.keyframe_queue),
                    self.cfg.max_keyframes_per_update)
            batch = self.keyframe_queue[:n]
            del self.keyframe_queue[:n]
        pending: List[Edge] = []
        const_info = self.cfg.inf_matrix.use_const_inf_matrix
        for kf in batch:
            o2m = (odom2map[kf.robot_name] if isinstance(odom2map, dict)
                   else odom2map)
            est = se3np.pose_compose(o2m, kf.odom)
            kf.node_id = self.graph.add_se3_node(est)
            self.uuid_keyframe_map[kf.uuid] = kf
            self.new_keyframes.append(kf)

            if kf.robot_name not in self._prev_kf:
                self._handle_first_keyframe(kf, est)
                self._prev_kf[kf.robot_name] = kf
                continue

            prev = self._prev_kf[kf.robot_name]
            rel = se3np.pose_between(kf.odom, prev.odom)
            if const_info:
                info = self.inf_calculator.from_fitness(0.0)
            elif defer_info:
                info = None
            else:
                info = self.inf_calculator.calc_information_matrix(
                    kf.cloud, prev.cloud, rel)
            edge = Edge(type=EDGE_ODOM, from_uuid=kf.uuid, to_uuid=prev.uuid,
                        relative_pose=rel, information=info,
                        from_readable=kf.readable_id,
                        to_readable=prev.readable_id,
                        robust_kernel=self.cfg.odometry_edge_robust_kernel,
                        robust_kernel_size=self.cfg.odometry_edge_robust_kernel_size)
            if info is not None:
                edge.edge_id = self.graph.add_se3_edge(
                    kf.node_id, prev.node_id, rel, info,
                    kernel=self.cfg.odometry_edge_robust_kernel,
                    kernel_delta=self.cfg.odometry_edge_robust_kernel_size)
            self._register_edge(edge)
            pending.append(edge)
            kf.prev_edge = edge
            prev.next_edge = edge
            self._prev_kf[kf.robot_name] = kf
        return pending

    def finalize_edges(self, edges: Sequence[Edge],
                       fitness: Sequence[float]) -> None:
        """Attach fitness-derived information matrices to deferred odometry
        edges and enter them into the solver tables."""
        for edge, fit in zip(edges, fitness):
            if edge.edge_id is not None:
                continue  # const-info edges were finalized at flush
            edge.information = self.inf_calculator.from_fitness(
                self.inf_calculator.clamp_fitness(fit))
            kf_from = self.uuid_keyframe_map[edge.from_uuid]
            kf_to = self.uuid_keyframe_map[edge.to_uuid]
            edge.edge_id = self.graph.add_se3_edge(
                kf_from.node_id, kf_to.node_id, edge.relative_pose,
                edge.information, kernel=edge.robust_kernel,
                kernel_delta=edge.robust_kernel_size)

    def _handle_first_keyframe(self, kf: KeyFrame, est: np.ndarray) -> None:
        kf.first_keyframe = True
        if self.cfg.enable_fill_first_cloud:
            # synthesize ground under the first keyframe
            # (graph_database.cpp:114-129 -> src/pcl/fill_ground_plane.cpp)
            from ..ops import ground_fill
            if self.cfg.fill_first_cloud_simple:
                kf.cloud = ground_fill.fill_ground_plane_simple(
                    kf.cloud, est, self.cfg.fill_first_cloud_radius,
                    self.cfg.map_cloud_resolution)
            else:
                kf.cloud = ground_fill.fill_ground_plane_ransac(
                    kf.cloud, self.cfg.fill_first_cloud_radius,
                    self.cfg.map_cloud_resolution)
        if not self.cfg.use_custom_inf_matrix_first_node:
            return
        std = np.asarray(self.cfg.custom_inf_matrix_first_node_stddev)
        info = np.diag(1.0 / (std * std)).astype(np.float32)
        anchor_id = self.graph.add_se3_node(se3np.pose_identity(),
                                           fixed=True)
        anchor_kf = KeyFrame(
            robot_name=kf.robot_name, stamp=0.0,
            odom=se3np.pose_identity(), accum_distance=-1.0,
            cloud=PointCloud.empty(1), slam_uuid=kf.slam_uuid,
            odom_counter=-1)
        anchor_kf.node_id = anchor_id
        self.uuid_keyframe_map[anchor_kf.uuid] = anchor_kf
        edge = Edge(type=EDGE_ANCHOR, from_uuid=anchor_kf.uuid,
                    to_uuid=kf.uuid, relative_pose=est, information=info,
                    from_readable="anchor", to_readable=kf.readable_id)
        edge.edge_id = self.graph.add_se3_edge(anchor_id, kf.node_id, est,
                                               info)
        self._anchors[kf.robot_name] = (anchor_kf, edge)
        self._register_edge(edge)

    def _register_edge(self, edge: Edge) -> None:
        self.edges.append(edge)
        self.edge_uuids.add(edge.uuid)
        self.edge_pairs.add((edge.from_uuid, edge.to_uuid))

    # ------------------------------------------------------------------
    # flush: static keyframes (map-server provided, fixed nodes)
    # ------------------------------------------------------------------
    def flush_static_keyframe_queue(self) -> bool:
        """graph_database.cpp:199: fixed nodes, no odometry chain."""
        with self.queue_lock:
            if not self.static_keyframe_queue:
                return False
            batch, self.static_keyframe_queue = self.static_keyframe_queue, []
        for kf in batch:
            kf.static_keyframe = True
            kf.node_id = self.graph.add_se3_node(kf.odom, fixed=True)
            self.uuid_keyframe_map[kf.uuid] = kf
            self.new_keyframes.append(kf)
        return True

    # ------------------------------------------------------------------
    # flush: received remote graphs (uuid dedup merge)
    # ------------------------------------------------------------------
    def flush_graph_queue(self, loop_manager=None) -> bool:
        """graph_database.cpp:237: merge other robots' delta graphs.

        New remote keyframes become nodes at the sender's estimates; edges
        re-link by uuid; remote loop edges are registered with the
        LoopManager so local loop search is rate-limited consistently.
        """
        with self.queue_lock:
            if not self.graph_queue:
                return False
            msgs, self.graph_queue = self.graph_queue, []
        for msg in msgs:
            for kmsg in msg.keyframes:
                if kmsg.uuid in self.uuid_keyframe_map:
                    continue
                kf = KeyFrame(
                    robot_name=kmsg.robot_name, stamp=kmsg.stamp,
                    odom=np.asarray(kmsg.estimate, np.float32),
                    accum_distance=kmsg.accum_distance, cloud=kmsg.cloud,
                    uuid=kmsg.uuid, slam_uuid=kmsg.slam_uuid,
                    odom_counter=kmsg.odom_counter,
                    first_keyframe=kmsg.first_keyframe,
                    static_keyframe=kmsg.static_keyframe)
                kf.node_id = self.graph.add_se3_node(kf.odom)
                self.uuid_keyframe_map[kf.uuid] = kf
                self.new_keyframes.append(kf)
            for emsg in msg.edges:
                if emsg.uuid in self.edge_uuids:
                    continue
                kf_from = self.uuid_keyframe_map.get(emsg.from_uuid)
                kf_to = self.uuid_keyframe_map.get(emsg.to_uuid)
                if kf_from is None or kf_to is None:
                    continue  # counterpart not merged yet; next delta
                if emsg.type == EDGE_ANCHOR:
                    # remote anchors are skipped: each robot anchors itself
                    # (the remote anchor keyframe is not transmitted)
                    continue
                edge = Edge(type=emsg.type, from_uuid=emsg.from_uuid,
                            to_uuid=emsg.to_uuid,
                            relative_pose=np.asarray(emsg.relative_pose,
                                                     np.float32),
                            information=np.asarray(emsg.information,
                                                   np.float32).reshape(6, 6),
                            uuid=emsg.uuid,
                            from_readable=kf_from.readable_id,
                            to_readable=kf_to.readable_id)
                kernel = (self.cfg.loop.loop_closure_edge_robust_kernel
                          if emsg.type == EDGE_LOOP else "NONE")
                delta = self.cfg.loop.loop_closure_edge_robust_kernel_size
                edge.edge_id = self.graph.add_se3_edge(
                    kf_from.node_id, kf_to.node_id, edge.relative_pose,
                    edge.information, kernel=kernel, kernel_delta=delta)
                self._register_edge(edge)
                if edge.type == EDGE_ODOM:
                    kf_from.prev_edge = edge
                    kf_to.next_edge = edge
                if edge.type == EDGE_LOOP and loop_manager is not None:
                    loop_manager.add_loop(
                        Loop(key1=kf_from, key2=kf_to,
                             relative_pose=edge.relative_pose))
            self.others_last_kf[msg.robot_name] = (
                msg.latest_keyframe_uuid, np.asarray(msg.latest_keyframe_odom))
        return True

    # ------------------------------------------------------------------
    # flush: loaded graphs (checkpoint resume, multi-session continuation)
    # ------------------------------------------------------------------
    def add_loaded_graph(self, keyframes: Sequence[KeyFrame],
                         edges: Sequence[Edge]) -> None:
        """Queue a persisted graph read by models/persistence.load_graph
        (load_graph_service -> loaded queue, graph_database.cpp:393-483)."""
        self.loaded_graph_queue.append((list(keyframes), list(edges)))

    def flush_loaded_graph(self, loop_manager=None) -> bool:
        """graph_database.cpp:486-568: merge loaded keyframes/edges.

        Differences from the remote-exchange merge (`flush_graph_queue`):
        nodes are created at the saved ESTIMATES, static keyframes become
        fixed nodes and graduate directly, anchor edges re-attach to OUR
        anchor node (created on demand when loading into a fresh graph),
        and loaded loop edges register with accum-distance-keeps-newest
        semantics. Robust kernels come from the per-edge values persisted
        in data.txt (the reference reassigns them from config, :512-515 —
        restoring the saved kernel is strictly more faithful to the saved
        graph and identical under default configs).
        """
        if not self.loaded_graph_queue:
            return False
        batches, self.loaded_graph_queue = self.loaded_graph_queue, []
        for keyframes, edges in batches:
            for kf in keyframes:
                if kf.uuid in self.uuid_keyframe_map:
                    continue
                kf.node_id = self.graph.add_se3_node(
                    kf.odom if kf.estimate_loaded is None
                    else kf.estimate_loaded, fixed=kf.static_keyframe)
                self.uuid_keyframe_map[kf.uuid] = kf
                if kf.static_keyframe:
                    self.keyframes.append(kf)
                else:
                    self.new_keyframes.append(kf)
            for edge in edges:
                if edge.uuid in self.edge_uuids:
                    continue
                if edge.type == EDGE_ANCHOR:
                    kf_from = self._own_anchor_for_load(edge)
                else:
                    kf_from = self.uuid_keyframe_map.get(edge.from_uuid)
                kf_to = self.uuid_keyframe_map.get(edge.to_uuid)
                if kf_from is None or kf_to is None:
                    continue
                edge.edge_id = self.graph.add_se3_edge(
                    kf_from.node_id, kf_to.node_id, edge.relative_pose,
                    edge.information, kernel=edge.robust_kernel,
                    kernel_delta=edge.robust_kernel_size)
                self._register_edge(edge)
                if edge.type == EDGE_ODOM:
                    # reference guards prev-edge wiring on counter > 1
                    # (graph_database.cpp:545-552)
                    if kf_from.odom_counter > 1:
                        kf_from.prev_edge = edge
                    kf_to.next_edge = edge
                if edge.type == EDGE_LOOP and loop_manager is not None:
                    loop_manager.add_loop_accum_distance_check(
                        Loop(key1=kf_from, key2=kf_to,
                             relative_pose=edge.relative_pose))
        return True

    def _own_anchor_for_load(self, edge: Edge) -> KeyFrame:
        """Anchor edges in a loaded graph re-attach to OUR anchor node
        (graph_database.cpp:518-521); when loading into a fresh graph the
        anchor is created here, fixed at identity."""
        if self.anchor_kf is None:
            anchor_id = self.graph.add_se3_node(se3np.pose_identity(),
                                                fixed=True)
            anchor_kf = KeyFrame(
                robot_name=self.own_name, stamp=0.0,
                odom=se3np.pose_identity(), accum_distance=-1.0,
                cloud=PointCloud.empty(1), slam_uuid=self.slam_uuid,
                odom_counter=-1)
            anchor_kf.node_id = anchor_id
            self.uuid_keyframe_map[anchor_kf.uuid] = anchor_kf
            self._anchors[self.own_name] = (anchor_kf, edge)
        # alias the loaded anchor uuid to our anchor so re-saves and g2o
        # export resolve the edge without rewriting its stored uuids
        self.uuid_keyframe_map.setdefault(edge.from_uuid, self.anchor_kf)
        return self.anchor_kf

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def insert_loops(self, loops: Sequence[Loop]) -> None:
        """graph_database.cpp:571: loop edges with robust kernel; new
        keyframes graduate into the main keyframe list."""
        for loop in loops:
            if loop.fitness is not None:
                # fitness already measured by the batched matching pass
                info = self.inf_calculator.from_fitness(
                    self.inf_calculator.clamp_fitness(loop.fitness))
            else:
                info = self.inf_calculator.calc_information_matrix(
                    loop.key1.cloud, loop.key2.cloud, loop.relative_pose)
            edge = Edge(type=EDGE_LOOP, from_uuid=loop.key1.uuid,
                        to_uuid=loop.key2.uuid,
                        relative_pose=np.asarray(loop.relative_pose,
                                                 np.float32),
                        information=info,
                        from_readable=loop.key1.readable_id,
                        to_readable=loop.key2.readable_id,
                        robust_kernel=self.cfg.loop.loop_closure_edge_robust_kernel,
                        robust_kernel_size=self.cfg.loop.loop_closure_edge_robust_kernel_size)
            edge.edge_id = self.graph.add_se3_edge(
                loop.key1.node_id, loop.key2.node_id, edge.relative_pose,
                info, kernel=self.cfg.loop.loop_closure_edge_robust_kernel,
                kernel_delta=self.cfg.loop.loop_closure_edge_robust_kernel_size)
            self._register_edge(edge)
        self.keyframes.extend(self.new_keyframes)
        self.new_keyframes.clear()

    # ------------------------------------------------------------------
    def edge_exists(self, a: KeyFrame, b: KeyFrame) -> bool:
        return ((a.uuid, b.uuid) in self.edge_pairs
                or (b.uuid, a.uuid) in self.edge_pairs)

    def own_keyframes(self) -> List[KeyFrame]:
        return [k for k in self.keyframes + self.new_keyframes
                if k.robot_name == self.own_name and k.odom_counter >= 0]

    def optimize(self, num_iterations: Optional[int] = None) -> float:
        return self.graph.optimize(num_iterations)

    def save_keyframe_poses(self) -> Optional[str]:
        """Per-optimization TUM trajectory snapshot into
        `<result_dir>/<name>/<name>_NNNN.txt` (graph_database.cpp:599-639).
        No-op when result_dir is unset. Returns the written path."""
        if not self.cfg.result_dir:
            return None
        import pathlib

        name = self.own_name or "no_namespace"
        d = pathlib.Path(self.cfg.result_dir) / name
        d.mkdir(parents=True, exist_ok=True)
        path = d / f"{name}_{self._save_counter:04d}.txt"
        self._save_counter += 1
        with open(path, "w") as f:
            for kf in self.keyframes + self.new_keyframes:
                if kf.node_id is None or kf.robot_name != self.own_name:
                    continue
                t = kf.estimate(self.graph)
                # TUM: stamp tx ty tz qx qy qz qw (pose stores wxyz)
                f.write(f"{kf.stamp:.9f} {t[0]} {t[1]} {t[2]} "
                        f"{t[4]} {t[5]} {t[6]} {t[3]}\n")
        return str(path)

    def keyframe_estimates(self) -> np.ndarray:
        """(K, 7) optimized poses of all flushed keyframes, stable order."""
        ids = [k.node_id for k in self.keyframes + self.new_keyframes]
        return self.graph.poses[ids] if ids else np.zeros((0, 7), np.float32)
