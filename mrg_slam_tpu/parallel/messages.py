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

    def nbytes(self) -> int:
        """Payload accounting (mrg_slam_component.cpp:631-637).

        Uses the shape-based `.nbytes` attribute (defined for both numpy and
        jax arrays) — `np.asarray(...)` here was a full ~26 ms tunnel fetch
        PER KEYFRAME CLOUD on sender and receiver, and was the single
        largest term in the two-robot tick (4.2 s of an 8.1 s run)."""
        total = 0
        for k in self.keyframes:
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
