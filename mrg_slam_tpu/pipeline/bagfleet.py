"""Multi-robot SLAM driven directly from a rosbag.

The no-ROS equivalent of the reference's Nebula fleet processor
(python_scripts/nebula_multirobot_processor.py:70-95): read each robot's
PointCloud2 stream out of one sqlite3 .db3 bag by topic name, stand up a
full SLAM instance per robot, and replay the fleet in lock-step with the
uuid-delta graph-exchange protocol between them (replay_multirobot — the
same merge semantics as the DDS PublishGraph service path).

Library:  run_fleet_from_bag(cfg, bag, names, ...)
CLI:      python -m mrg_slam_tpu.launch --dataset rosbag --bag fleet.db3 \
              --robots husky1,husky2 [--topic-template '/{robot}/points']
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def read_fleet_frames(bag_file: str, robot_names: Sequence[str],
                      topic_template: str = "/{robot}/velodyne_points",
                      max_frames: int = 0
                      ) -> Dict[str, List[Tuple[float, np.ndarray]]]:
    """Per-robot (stamp, xyz) frame lists from one multi-topic bag."""
    from ..io.rosbag import BagReader

    bag = BagReader(bag_file)
    try:
        out = {}
        for name in robot_names:
            topic = topic_template.format(robot=name)
            if topic not in bag.topic_id:
                raise KeyError(
                    f"bag has no topic {topic!r} (topics: "
                    f"{sorted(bag.topic_id)})")
            frames = list(bag.pointclouds(topic))
            if max_frames > 0:
                frames = frames[:max_frames]
            out[name] = frames
        return out
    finally:
        bag.close()


def run_fleet_from_bag(cfg, bag_file: str, robot_names: Sequence[str],
                       topic_template: str = "/{robot}/velodyne_points",
                       tick_every: int = 8,
                       init_poses: Optional[Dict[str, tuple]] = None,
                       max_frames: int = 0):
    """Full fleet SLAM from a bag: one Robot per topic, lock-step replay
    with graph exchange. Returns {robot: ReplayResult} (plus access to
    each Robot via the results' closure — the caller usually re-reads the
    merged databases through `robots`).

    `cfg` is an EngineConfig template; each robot gets it with own_name /
    multi_robot_names / init_pose specialized (the reference launches one
    namespaced component container per robot with x/y/z args,
    launch/mrg_slam.launch.py).
    """
    from .replay import Robot, replay_multirobot

    frames = read_fleet_frames(bag_file, robot_names, topic_template,
                               max_frames)
    robots = {}
    for name in robot_names:
        slam_cfg = dataclasses.replace(
            cfg.slam, own_name=name, multi_robot_names=tuple(robot_names),
            init_pose=(tuple(init_poses[name]) if init_poses
                       and name in init_poses else cfg.slam.init_pose))
        robots[name] = Robot(dataclasses.replace(cfg, slam=slam_cfg))
    results = replay_multirobot(robots, frames, tick_every=tick_every)
    return robots, results
