"""Graph persistence: save_graph / load_graph (checkpoint & resume).

Mirrors the reference's directory layout (save_graph_service,
mrg_slam_component.cpp:930-1045; KeyFrame::save keyframe.cpp:53-110;
Edge::save edge.cpp:53-120; GraphSLAM::save graph_slam.cpp:428):

    <dir>/keyframes/NNNNNN/data.txt + cloud.pcd
    <dir>/edges/NNNNNN/data.txt
    <dir>/graph.g2o              (VERTEX_SE3:QUAT / EDGE_SE3:QUAT interop)
    <dir>/special_nodes.csv      (anchor bookkeeping)
    <dir>/network_stats.txt, timing_stats.txt

Loading merges keyframes/edges BY UUID into a running database
(load_graph/flush_loaded_graph, graph_database.cpp:393-568), enabling
multi-session mapping: previously saved graphs join as additional chains.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from ..io.pcd import load_pcd, save_pcd
from ..ops.cloud import PointCloud

from .backend import MrgSlam



def _fmt_pose(p: np.ndarray) -> str:
    return " ".join(f"{v:.9f}" for v in np.asarray(p).reshape(-1))


def save_graph(slam: MrgSlam, directory: str) -> int:
    """Persist the full graph; returns the number of keyframes written."""
    d = Path(directory)
    (d / "keyframes").mkdir(parents=True, exist_ok=True)
    (d / "edges").mkdir(parents=True, exist_ok=True)
    db = slam.db

    kfs = [k for k in db.keyframes + db.new_keyframes
           if k.node_id is not None]
    for i, kf in enumerate(kfs):
        kdir = d / "keyframes" / f"{i:06d}"
        kdir.mkdir(exist_ok=True)
        est = kf.estimate(db.graph)
        with open(kdir / "data.txt", "w") as f:
            f.write(f"robot_name {kf.robot_name}\n"
                    f"uuid_str {kf.uuid}\n"
                    f"slam_uuid_str {kf.slam_uuid}\n"
                    f"stamp {kf.stamp:.9f}\n"
                    f"odom_counter {kf.odom_counter}\n"
                    f"first_keyframe {int(kf.first_keyframe)}\n"
                    f"static_keyframe {int(kf.static_keyframe)}\n"
                    f"accum_distance {kf.accum_distance:.9f}\n"
                    f"estimate {_fmt_pose(est)}\n"
                    f"odom {_fmt_pose(kf.odom)}\n")
            # optional sensor attachments (keyframe.cpp:88-104)
            if kf.floor_coeffs is not None:
                f.write(f"floor_coeffs {_fmt_pose(kf.floor_coeffs)}\n")
            if kf.utm_coord is not None:
                f.write(f"utm_coord {_fmt_pose(kf.utm_coord)}\n")
            if kf.acceleration is not None:
                f.write(f"acceleration {_fmt_pose(kf.acceleration)}\n")
            if kf.orientation is not None:
                f.write(f"orientation {_fmt_pose(kf.orientation)}\n")
        save_pcd(kdir / "cloud.pcd", kf.cloud.to_numpy())

    for i, e in enumerate(db.edges):
        edir = d / "edges" / f"{i:06d}"
        edir.mkdir(exist_ok=True)
        with open(edir / "data.txt", "w") as f:
            f.write(f"type {e.type}\n"
                    f"uuid_str {e.uuid}\n"
                    f"from_uuid_str {e.from_uuid}\n"
                    f"to_uuid_str {e.to_uuid}\n"
                    f"relative_pose {_fmt_pose(e.relative_pose)}\n"
                    f"information {_fmt_pose(e.information)}\n"
                    f"robust_kernel {e.robust_kernel}\n"
                    f"robust_kernel_size {e.robust_kernel_size:.9f}\n")

    _save_g2o(db, d / "graph.g2o")
    # robust kernels sidecar (robust_kernel_io.cpp semantics: kernel name +
    # delta per edge, matched by vertex ids)
    uuid_to_node = {k.uuid: k.node_id
                    for k in db.keyframes + db.new_keyframes
                    if k.node_id is not None}
    with open(d / "graph.g2o.kernels", "w") as f:
        for e in db.edges:
            if e.robust_kernel == "NONE":
                continue
            a = uuid_to_node.get(e.from_uuid)
            b = uuid_to_node.get(e.to_uuid)
            if a is None or b is None:
                continue
            f.write(f"{a} {b} {e.robust_kernel} {e.robust_kernel_size}\n")

    with open(d / "special_nodes.csv", "w") as f:
        anchor_node = (db.anchor_kf.node_id if db.anchor_kf else -1)
        anchor_edge = (db.anchor_edge.edge_id
                       if db.anchor_edge is not None else -1)
        f.write(f"anchor_node,{anchor_node}\n")
        f.write(f"anchor_edge,{anchor_edge}\n")
        floor_node = slam.floor_processor.plane_node_id
        f.write(f"floor_node,{-1 if floor_node is None else floor_node}\n")

    zero_utm = slam.gps_processor.zero_utm
    if zero_utm is not None:
        np.savetxt(d / "zero_utm.txt", zero_utm[None])

    with open(d / "network_stats.txt", "w") as f:
        f.write(f"sent_graph_bytes {sum(slam.sent_graph_bytes)}\n"
                f"received_graph_bytes {sum(slam.received_graph_bytes)}\n")
    with open(d / "timing_stats.txt", "w") as f:
        lds = slam.loop_detector.loop_detection_times
        f.write(f"num_ticks {len(slam.tick_stats)}\n")
        f.write(f"loop_detection_count {len(lds)}\n")
        if lds:
            f.write(f"loop_detection_avg_us {np.mean(lds):.1f}\n")
        if slam.tick_stats:
            f.write("optimization_avg_us "
                    f"{np.mean([t.optimization_us for t in slam.tick_stats]):.1f}\n")
    return len(kfs)


def _save_g2o(db, path) -> None:
    """g2o text format for interop with the reference's tooling
    (g2o_to_pose_file.py reads VERTEX_SE3:QUAT lines)."""
    with open(path, "w") as f:
        kfs = [k for k in ([db.anchor_kf] if db.anchor_kf else [])
               + db.keyframes + db.new_keyframes if k and k.node_id is not None]
        for kf in sorted(kfs, key=lambda k: k.node_id):
            p = kf.estimate(db.graph)
            f.write(f"VERTEX_SE3:QUAT {kf.node_id} "
                    f"{p[0]:.9f} {p[1]:.9f} {p[2]:.9f} "
                    f"{p[4]:.9f} {p[5]:.9f} {p[6]:.9f} {p[3]:.9f}\n")
            if kf is db.anchor_kf:
                f.write(f"FIX {kf.node_id}\n")
        uuid_to_node = {k.uuid: k.node_id for k in kfs}
        for e in db.edges:
            a = uuid_to_node.get(e.from_uuid)
            b = uuid_to_node.get(e.to_uuid)
            if a is None or b is None:
                continue
            p = e.relative_pose
            info = np.asarray(e.information)
            upper = info[np.triu_indices(6)]
            f.write(f"EDGE_SE3:QUAT {a} {b} "
                    f"{p[0]:.9f} {p[1]:.9f} {p[2]:.9f} "
                    f"{p[4]:.9f} {p[5]:.9f} {p[6]:.9f} {p[3]:.9f} "
                    + " ".join(f"{v:.9f}" for v in upper) + "\n")


def _vec(text: str) -> np.ndarray:
    return np.asarray([float(v) for v in text.split()], np.float32)


def load_graph(slam: MrgSlam, directory: str,
               cloud_capacity: Optional[int] = None) -> int:
    """Read a saved graph and queue it for uuid-dedup merge on the next
    optimization tick (load_graph_service -> flush_loaded_graph,
    graph_database.cpp:393-568).

    Full fidelity restore: keyframe sensor attachments (floor/UTM/IMU),
    per-edge robust kernels, anchor-edge re-attachment, static-keyframe
    fixing. Returns the number of keyframes queued.
    """
    from .keyframe import Edge, KeyFrame

    d = Path(directory)
    cap = cloud_capacity or slam.cfg.capacity_keyframe_points
    kfs: List[KeyFrame] = []
    for kdir in sorted((d / "keyframes").iterdir()):
        meta = {}
        for line in (kdir / "data.txt").read_text().splitlines():
            key, _, val = line.partition(" ")
            meta[key] = val
        if meta["uuid_str"] in slam.db.uuid_keyframe_map:
            continue  # uuid dedup (graph_database.cpp:456-459)
        pts = load_pcd(kdir / "cloud.pcd")
        kf = KeyFrame(
            robot_name=meta["robot_name"], stamp=float(meta["stamp"]),
            odom=_vec(meta["odom"]),
            accum_distance=float(meta["accum_distance"]),
            cloud=PointCloud.from_array(pts, capacity=cap),
            uuid=meta["uuid_str"], slam_uuid=meta["slam_uuid_str"],
            odom_counter=int(meta["odom_counter"]),
            first_keyframe=bool(int(meta["first_keyframe"])),
            static_keyframe=bool(int(meta["static_keyframe"])))
        kf.estimate_loaded = _vec(meta["estimate"])
        if "floor_coeffs" in meta:
            kf.floor_coeffs = _vec(meta["floor_coeffs"])
        if "utm_coord" in meta:
            kf.utm_coord = _vec(meta["utm_coord"])
        if "acceleration" in meta:
            kf.acceleration = _vec(meta["acceleration"])
        if "orientation" in meta:
            kf.orientation = _vec(meta["orientation"])
        kfs.append(kf)
    edges: List[Edge] = []
    edges_dir = d / "edges"
    if edges_dir.exists():
        for edir in sorted(edges_dir.iterdir()):
            meta = {}
            for line in (edir / "data.txt").read_text().splitlines():
                key, _, val = line.partition(" ")
                meta[key] = val
            if meta["uuid_str"] in slam.db.edge_uuids:
                continue
            edges.append(Edge(
                type=meta["type"], uuid=meta["uuid_str"],
                from_uuid=meta["from_uuid_str"],
                to_uuid=meta["to_uuid_str"],
                relative_pose=_vec(meta["relative_pose"]),
                information=_vec(meta["information"]).reshape(6, 6),
                robust_kernel=meta.get("robust_kernel", "NONE"),
                robust_kernel_size=float(
                    meta.get("robust_kernel_size", 1.0))))
    if kfs or edges:
        slam.db.add_loaded_graph(kfs, edges)
    return len(kfs)


def load_g2o(path: str, kernels_path: Optional[str] = None):
    """Import a bare .g2o text file (+ optional robust-kernel sidecar) into
    a fresh GraphSLAM builder — GraphSLAM::load interop
    (graph_slam.cpp:445-457 + robust_kernel_io.cpp:44-151).

    Reads VERTEX_SE3:QUAT / EDGE_SE3:QUAT / FIX lines (g2o stores quats
    xyzw; the builder's pose layout is wxyz). Kernel sidecar rows are
    `from_id to_id kernel_name delta`, matched by vertex-id pair.
    """
    from ..graph.builder import GraphSLAM

    vertices = {}
    edges = []
    fixed = set()
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "VERTEX_SE3:QUAT":
            vid = int(parts[1])
            x, y, z, qx, qy, qz, qw = (float(v) for v in parts[2:9])
            vertices[vid] = np.asarray([x, y, z, qw, qx, qy, qz],
                                       np.float32)
        elif parts[0] == "FIX":
            fixed.add(int(parts[1]))
        elif parts[0] == "EDGE_SE3:QUAT":
            a, b = int(parts[1]), int(parts[2])
            x, y, z, qx, qy, qz, qw = (float(v) for v in parts[3:10])
            upper = np.asarray([float(v) for v in parts[10:31]])
            info = np.zeros((6, 6), np.float32)
            info[np.triu_indices(6)] = upper
            info = info + np.triu(info, 1).T
            edges.append((a, b,
                          np.asarray([x, y, z, qw, qx, qy, qz], np.float32),
                          info))
    kernels = {}
    if kernels_path and Path(kernels_path).exists():
        for line in Path(kernels_path).read_text().splitlines():
            parts = line.split()
            if len(parts) == 4:
                kernels[(int(parts[0]), int(parts[1]))] = (
                    parts[2], float(parts[3]))
    gs = GraphSLAM(capacity_nodes=max(64, len(vertices)),
                   capacity_edges=max(64, len(edges)))
    id_map = {}
    for vid in sorted(vertices):
        id_map[vid] = gs.add_se3_node(vertices[vid], fixed=vid in fixed)
    for a, b, meas, info in edges:
        kernel, delta = kernels.get((a, b), ("NONE", 1.0))
        gs.add_se3_edge(id_map[a], id_map[b], meas, info,
                        kernel=kernel, kernel_delta=delta)
    return gs
