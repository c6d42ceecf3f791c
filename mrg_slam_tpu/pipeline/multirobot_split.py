"""Multi-robot splits of a single-robot sequence.

Equivalent of kitti_multirobot_processor.py (:64-66 min_times/max_times
windows) and kitti_multirobot_reversed_processor.py: carve one sequence
into overlapping per-robot frame windows — optionally reversing a robot's
window so the robots drive toward each other, forcing inter-robot loop
closures — then run the in-process multi-robot replay.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import EngineConfig
from .replay import ReplayResult, Robot, replay_multirobot

Frame = Tuple[float, np.ndarray]


def split_windows(n_frames: int, n_robots: int,
                  overlap_fraction: float = 0.25) -> List[Tuple[int, int]]:
    """Overlapping [start, end) frame windows per robot."""
    if n_robots == 1:
        return [(0, n_frames)]
    base = n_frames / n_robots
    half_ov = int(base * overlap_fraction / 2)
    windows = []
    for r in range(n_robots):
        s = max(0, int(r * base) - half_ov)
        e = min(n_frames, int((r + 1) * base) + half_ov)
        windows.append((s, e))
    return windows


def split_frames(frames: Sequence[Frame], n_robots: int,
                 overlap_fraction: float = 0.25,
                 reversed_robots: Sequence[int] = ()) -> List[List[Frame]]:
    """Per-robot frame lists; `reversed_robots` windows play backwards with
    re-monotonized stamps (the reversed-direction variant)."""
    windows = split_windows(len(frames), n_robots, overlap_fraction)
    out: List[List[Frame]] = []
    for r, (s, e) in enumerate(windows):
        chunk = list(frames[s:e])
        if r in reversed_robots:
            scans = [f[1] for f in reversed(chunk)]
            stamps = [f[0] for f in chunk]
            chunk = list(zip(stamps, scans))
        out.append(chunk)
    return out


def run_multirobot_split(base_cfg: EngineConfig, frames: Sequence[Frame],
                         robot_names: Sequence[str],
                         init_poses: Optional[Dict[str, tuple]] = None,
                         overlap_fraction: float = 0.25,
                         reversed_robots: Sequence[int] = (),
                         tick_every: int = 30) -> Dict[str, ReplayResult]:
    """Spawn one full SLAM stack per robot over the split windows and run
    the exchange-enabled replay (the subprocess fan-out of the reference's
    multirobot processors becomes in-process robots; parallel/channel.py
    sockets cover the multi-process case)."""
    names = list(robot_names)
    per_robot = split_frames(frames, len(names), overlap_fraction,
                             reversed_robots)
    robots: Dict[str, Robot] = {}
    for name, robot_frames in zip(names, per_robot):
        slam_cfg = dataclasses.replace(
            base_cfg.slam, own_name=name, multi_robot_names=tuple(names))
        if init_poses and name in init_poses:
            slam_cfg = dataclasses.replace(slam_cfg,
                                           init_pose=init_poses[name])
        robots[name] = Robot(dataclasses.replace(base_cfg, slam=slam_cfg))
    return replay_multirobot(robots, dict(zip(names, per_robot)),
                             tick_every=tick_every)
