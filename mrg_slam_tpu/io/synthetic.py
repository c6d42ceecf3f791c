"""Synthetic LiDAR world for tests and benchmarks.

The reference validates against KITTI/Nebula replays
(python_scripts/kitti_*_processor.py); this container has no datasets, so we
provide a deterministic simulated world with persistent structure: a fixed
set of world surface points (ground + walls + pillars). A scan at pose T is
the set of world points within sensor range, expressed in the sensor frame,
with optional Gaussian noise. Revisiting a place reproduces the same
structure, so loop closure is exercised for real.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class SyntheticWorld:
    points: np.ndarray  # (M, 3) world surface points
    rng: np.random.Generator
    max_range: float = 35.0
    min_range: float = 0.5
    noise: float = 0.01
    max_points_per_scan: int = 8192

    @staticmethod
    def build(seed: int = 0, extent: float = 60.0, n_ground: int = 60000,
              n_pillars: int = 40, n_walls: int = 12,
              max_range: float = 35.0, noise: float = 0.01,
              max_points_per_scan: int = 8192,
              flat_ground: bool = False) -> "SyntheticWorld":
        rng = np.random.default_rng(seed)
        pts: List[np.ndarray] = []
        # ground: gently undulating by default, exactly planar for
        # floor-constraint scenarios (flat_ground=True)
        g = np.stack([
            rng.uniform(-extent, extent, n_ground),
            rng.uniform(-extent, extent, n_ground),
            np.zeros(n_ground),
        ], axis=1)
        if not flat_ground:
            g[:, 2] = 0.05 * np.sin(g[:, 0] * 0.15) * np.cos(g[:, 1] * 0.11)
        pts.append(g)
        # pillars (vertical cylinders)
        for _ in range(n_pillars):
            cx, cy = rng.uniform(-extent, extent, 2)
            r = rng.uniform(0.2, 0.8)
            h = rng.uniform(2.0, 6.0)
            n = 600
            th = rng.uniform(0, 2 * np.pi, n)
            z = rng.uniform(0, h, n)
            pts.append(np.stack([cx + r * np.cos(th), cy + r * np.sin(th), z],
                                axis=1))
        # walls (random vertical planes segments)
        for _ in range(n_walls):
            x0, y0 = rng.uniform(-extent, extent, 2)
            ang = rng.uniform(0, np.pi)
            length = rng.uniform(8, 25)
            n = 2500
            s = rng.uniform(0, length, n)
            z = rng.uniform(0, 3.0, n)
            pts.append(np.stack([x0 + s * np.cos(ang), y0 + s * np.sin(ang), z],
                                axis=1))
        world = np.concatenate(pts).astype(np.float32)
        return SyntheticWorld(points=world, rng=rng, max_range=max_range,
                              noise=noise,
                              max_points_per_scan=max_points_per_scan)

    def scan(self, pose: np.ndarray, seed: int = 0) -> np.ndarray:
        """LiDAR scan in the sensor frame at 7-vec pose [t, q(wxyz)]."""
        t = pose[:3]
        d = self.points - t[None, :]
        dist = np.linalg.norm(d, axis=1)
        sel = (dist < self.max_range) & (dist > self.min_range)
        local = d[sel]
        # world->sensor rotation: R^T
        R = _quat_to_mat_np(pose[3:7])
        local = local @ R  # == R.T @ d per point
        srng = np.random.default_rng(seed)
        if local.shape[0] > self.max_points_per_scan:
            idx = srng.choice(local.shape[0], self.max_points_per_scan,
                              replace=False)
            local = local[idx]
        if self.noise > 0:
            local = local + srng.normal(scale=self.noise, size=local.shape)
        return local.astype(np.float32)


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def _yaw_pose(x: float, y: float, z: float, yaw: float) -> np.ndarray:
    return np.array([x, y, z, np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)],
                    dtype=np.float32)


def circle_trajectory(n_frames: int, radius: float = 20.0,
                      z: float = 1.5, laps: float = 1.0) -> np.ndarray:
    """(N,7) poses around a circle, heading tangent — closes a loop."""
    poses = []
    for i in range(n_frames):
        th = 2 * np.pi * laps * i / n_frames
        x, y = radius * np.cos(th), radius * np.sin(th)
        yaw = th + np.pi / 2
        poses.append(_yaw_pose(x, y, z, yaw))
    return np.stack(poses)


def straight_trajectory(n_frames: int, speed: float = 1.0,
                        z: float = 1.5) -> np.ndarray:
    return np.stack([_yaw_pose(i * speed, 0.0, z, 0.0)
                     for i in range(n_frames)])


def figure8_trajectory(n_frames: int, radius: float = 18.0,
                       z: float = 1.5) -> np.ndarray:
    """(N,7) lemniscate poses — self-intersects, forcing loop closures."""
    poses = []
    ts = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    for th in ts:
        x = radius * np.sin(th)
        y = radius * np.sin(th) * np.cos(th)
        dx = radius * np.cos(th)
        dy = radius * np.cos(2 * th)
        poses.append(_yaw_pose(x, y, z, np.arctan2(dy, dx)))
    return np.stack(poses)
