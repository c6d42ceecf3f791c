"""Graph visualization export — the MarkersPublisher without RViz.

src/mrg_slam/markers_publisher.cpp renders node spheres, odometry/loop
edges, text labels, and 3-sigma covariance ellipsoids as RViz MarkerArrays.
Here the same content exports to portable artifacts:

- `graph_summary`:  a dict (JSON-able) with nodes, edges by type, labels,
  the loop-search radius circle, and per-node 3-sigma ellipsoid axes from
  the marginals eigendecomposition (:360,447-533).
- `export_ply`:     colored PLY point/line soup viewable in MeshLab/CloudCompare.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .backend import MrgSlam

_COLORS = {
    "node": (64, 128, 255),
    "odom": (230, 230, 230),
    "loop": (255, 64, 64),
    "anchor": (255, 200, 0),
}


def covariance_ellipsoids(cov_blocks: np.ndarray,
                          n_sigma: float = 3.0) -> List[Dict]:
    """Per-node ellipsoid {axes (3,), rotation (3,3)} from the translation
    block of each 6x6 covariance (markers_publisher.cpp:360)."""
    out = []
    for cov in cov_blocks:
        c3 = cov[:3, :3]
        w, v = np.linalg.eigh((c3 + c3.T) / 2)
        w = np.maximum(w, 0.0)
        out.append({"axes": (n_sigma * np.sqrt(w)).tolist(),
                    "rotation": v.tolist()})
    return out


def graph_summary(slam: MrgSlam, with_marginals: bool = False,
                  loop_radius: Optional[float] = None) -> Dict:
    db = slam.db
    kfs = [k for k in db.keyframes + db.new_keyframes
           if k.node_id is not None]
    uuid_to_pos = {}
    nodes = []
    for k in kfs:
        est = k.estimate(db.graph)
        uuid_to_pos[k.uuid] = est[:3].tolist()
        nodes.append({"uuid": k.uuid, "label": k.readable_id,
                      "robot": k.robot_name, "pose": est.tolist(),
                      "first": k.first_keyframe, "static": k.static_keyframe})
    edges = []
    for e in db.edges:
        a = uuid_to_pos.get(e.from_uuid)
        b = uuid_to_pos.get(e.to_uuid)
        if a is None or b is None:
            continue
        edges.append({"type": e.type, "from": a, "to": b,
                      "readable": e.readable_id})
    summary: Dict = {"robot": slam.own_name, "nodes": nodes, "edges": edges}
    if loop_radius is None:
        loop_radius = slam.cfg.loop.candidate_max_xy_distance
    prev = db.prev_robot_keyframe
    if prev is not None and prev.node_id is not None:
        center = prev.estimate(db.graph)[:3]
        summary["loop_radius_circle"] = {"center": center.tolist(),
                                         "radius": loop_radius}
    if with_marginals and kfs:
        # prefer the covariances computed by the last optimization tick
        # (mrg_slam_component.cpp:882-891 attaches marginals to every
        # KeyFrameSnapshot); fall back to an on-demand exact pass
        cov = db.graph.last_marginals
        if cov is None:
            cov = db.graph.compute_marginals(exact=True)
        ids = [k.node_id for k in kfs]
        summary["ellipsoids"] = covariance_ellipsoids(cov[ids])
    return summary


def export_ply(slam: MrgSlam, path: str, edge_segments: int = 8) -> None:
    """Colored PLY: node points + edge polylines (sampled as points)."""
    summary = graph_summary(slam)
    pts: List[np.ndarray] = []
    cols: List[np.ndarray] = []
    for n in summary["nodes"]:
        pts.append(np.asarray(n["pose"][:3]))
        cols.append(np.asarray(_COLORS["node"]))
    for e in summary["edges"]:
        a, b = np.asarray(e["from"]), np.asarray(e["to"])
        ts = np.linspace(0, 1, edge_segments)[:, None]
        seg = a[None, :] * (1 - ts) + b[None, :] * ts
        pts.extend(seg)
        cols.extend([np.asarray(_COLORS.get(e["type"], (200, 200, 200)))]
                    * edge_segments)
    pts_a = np.stack(pts) if pts else np.zeros((0, 3))
    cols_a = np.stack(cols) if cols else np.zeros((0, 3))
    with open(path, "wb") as f:
        f.write((f"ply\nformat binary_little_endian 1.0\n"
                 f"element vertex {len(pts_a)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property uchar red\nproperty uchar green\n"
                 "property uchar blue\nend_header\n").encode())
        rec = np.zeros(len(pts_a), dtype=[("xyz", np.float32, 3),
                                          ("rgb", np.uint8, 3)])
        rec["xyz"] = pts_a.astype(np.float32)
        rec["rgb"] = cols_a.astype(np.uint8)
        f.write(rec.tobytes())
