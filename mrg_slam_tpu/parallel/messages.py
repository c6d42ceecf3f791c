"""Inter-robot message contract (the mrg_slam_msgs equivalent).

Field-for-field mirror of the sibling ROS package's IDL as plain
dataclasses (usage evidence: apps/mrg_slam_component.cpp:1172-1232,
:450-455, :225-227). Transport is pluggable (in-process queue or sockets,
parallel/channel.py); payload clouds ride as numpy arrays so messages stay
picklable across processes/hosts.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..ops.cloud import PointCloud


@dataclasses.dataclass
class QuantizedCloud:
    """Wire form of a keyframe cloud: valid points only, uint16 offsets
    from the cloud's min corner at `scale` meters per step.

    The reference ships full float clouds per keyframe and they dominate
    exchange bytes (mrg_slam_component.cpp:631-637). 4 mm quantization is
    an order of magnitude below the working voxel sizes (0.1-0.3 m) and
    GICP correspondence radii, so registration against a dequantized cloud
    is ATE-neutral (tests/test_multiprocess.py) at ~4x fewer bytes
    (12 B/point f32 + pad rows -> 6 B/point valid-only)."""

    offsets: np.ndarray   # (n, 3) uint16
    origin: np.ndarray    # (3,) f32 min corner
    scale: float          # meters per quantization step
    capacity: int         # original padded capacity

    @property
    def nbytes(self) -> int:
        return int(self.offsets.nbytes + 16)


def quantize_cloud(cloud: PointCloud, scale: float = 1.0 / 256.0
                   ) -> QuantizedCloud:
    pts = np.asarray(cloud.points)
    mask = np.asarray(cloud.mask)
    valid = pts[mask]
    origin = (valid.min(axis=0) if len(valid)
              else np.zeros(3)).astype(np.float32)
    q = np.clip(np.round((valid - origin) / scale), 0, 65535).astype(
        np.uint16)
    return QuantizedCloud(offsets=q, origin=origin, scale=scale,
                          capacity=cloud.capacity)


def dequantize_cloud(qc: QuantizedCloud) -> PointCloud:
    pts = qc.origin[None, :] + qc.offsets.astype(np.float32) * qc.scale
    return PointCloud.from_array(pts, capacity=qc.capacity)


def quantize_graph_msg(msg: "GraphMsg") -> "GraphMsg":
    """GraphMsg with clouds in wire form (applied by socket transports;
    in-process exchange stays zero-copy)."""
    kfs = [dataclasses.replace(
        k, cloud=(k.cloud if isinstance(k.cloud, QuantizedCloud)
                  else quantize_cloud(k.cloud)),
        estimate=np.asarray(k.estimate)) for k in msg.keyframes]
    out = dataclasses.replace(msg, keyframes=kfs)
    out.wire_nbytes = dataclasses.replace(out, wire_nbytes=0).nbytes()
    return out


def dequantize_graph_msg(msg: "GraphMsg") -> "GraphMsg":
    kfs = [dataclasses.replace(
        k, cloud=(dequantize_cloud(k.cloud)
                  if isinstance(k.cloud, QuantizedCloud) else k.cloud))
        for k in msg.keyframes]
    return dataclasses.replace(msg, keyframes=kfs)


@dataclasses.dataclass
class KeyFrameMsg:
    robot_name: str
    uuid: str
    slam_uuid: str
    stamp: float
    odom_counter: int
    first_keyframe: bool
    static_keyframe: bool
    accum_distance: float
    estimate: np.ndarray          # (7,) current graph estimate
    cloud: PointCloud


@dataclasses.dataclass
class EdgeMsg:
    type: str                     # anchor | odom | loop
    uuid: str
    from_uuid: str
    to_uuid: str
    relative_pose: np.ndarray     # (7,)
    information: np.ndarray       # (6,6)


@dataclasses.dataclass
class GraphMsg:
    robot_name: str
    latest_keyframe_uuid: str
    latest_keyframe_odom: np.ndarray
    keyframes: List[KeyFrameMsg]
    edges: List[EdgeMsg]
    # actual bytes that crossed the wire (set by quantize_graph_msg,
    # preserved through dequantize) — 0 for in-process zero-copy exchange
    wire_nbytes: int = 0

    def nbytes(self) -> int:
        """Payload accounting (mrg_slam_component.cpp:631-637).

        Uses the shape-based `.nbytes` attribute (defined for both numpy and
        jax arrays) — `np.asarray(...)` here was a full ~26 ms tunnel fetch
        PER KEYFRAME CLOUD on sender and receiver, and was the single
        largest term in the two-robot tick (4.2 s of an 8.1 s run)."""
        if self.wire_nbytes:
            return self.wire_nbytes
        total = 0
        for k in self.keyframes:
            if isinstance(k.cloud, QuantizedCloud):
                total += k.cloud.nbytes + 7 * 4 + 64
            else:
                total += int(k.cloud.points.nbytes + k.cloud.mask.nbytes
                             + 7 * 4 + 64)
        total += len(self.edges) * (7 * 4 + 36 * 4 + 48)
        return total


@dataclasses.dataclass
class PoseWithName:
    robot_name: str
    stamp: float
    pose: np.ndarray              # (7,)
    accum_dist: float


@dataclasses.dataclass
class SlamStatus:
    """Heartbeat mirror of mrg_slam_msgs/SlamStatus."""

    robot_name: str = ""
    initialized: bool = False
    in_graph_exchange: bool = False
    in_loop_closure: bool = False
    in_optimization: bool = False


@dataclasses.dataclass
class PublishGraphRequest:
    """Delta-graph request: uuids the requester already has
    (srv PublishGraph, mrg_slam_component.cpp:1153-1246)."""

    robot_name: str
    processed_keyframe_uuids: set
    processed_edge_uuids: set
