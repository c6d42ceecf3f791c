"""CLI entry point — the `ros2 launch mrg_slam mrg_slam.launch.py` of this
framework.

Mirrors the reference launch surface (launch/mrg_slam.launch.py): a YAML
config (the reference's own mrg_slam.yaml parses directly) plus
`param:=value` CLI overrides (PARAM_MAPPING, launch:13-54), then runs a
full SLAM stack over a dataset:

    python -m mrg_slam_tpu.launch --dataset synthetic \
        model_namespace:=atlas x:=0.0 y:=0.0 registration_method:=SMALL_GICP
    python -m mrg_slam_tpu.launch --dataset kitti --kitti-root /data/kitti \
        --sequence 00 --config config/mrg_slam.yaml --output results/
    python -m mrg_slam_tpu.launch --dataset rosbag --bag run1.db3 \
        --topic /husky1/velodyne_points

Outputs: TUM trajectory, map PCD, graph save directory, evo-style report.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _parse_overrides(tokens):
    out = {}
    for t in tokens:
        if ":=" not in t:
            raise SystemExit(f"override '{t}' is not of the form key:=value")
        k, v = t.split(":=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


_SECTIONS = ("prefiltering_component", "scan_matching_odometry_component",
             "floor_detection_component", "mrg_slam_component")


def _apply_overrides(cfg_dict: dict, overrides: dict) -> dict:
    """Apply flat key:=value overrides into every component section (the
    reference's PARAM_MAPPING pushes one flat namespace into all component
    parameter sets; EngineConfig.from_yaml_dict filters by known fields)."""
    for section in _SECTIONS:
        params = cfg_dict.setdefault(section, {})
        inner = params.get("ros__parameters", params)
        for k, v in overrides.items():
            inner[k] = v
    return cfg_dict


def main(argv=None):
    # Honor an explicit JAX_PLATFORMS=cpu request: the axon sitecustomize
    # force-registers the remote TPU backend and overrides jax_platforms
    # via jax.config.update at import time, so the env var alone is not
    # enough (same guard as __graft_entry__.py).
    import os

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
        import jax

        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="YAML config (reference format ok)")
    ap.add_argument("--dataset", choices=["synthetic", "kitti", "rosbag"],
                    default="synthetic")
    ap.add_argument("--kitti-root")
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--bag")
    ap.add_argument("--topic", default="/velodyne_points")
    ap.add_argument("--robots",
                    help="comma-separated robot namespaces: multi-robot "
                         "fleet SLAM from one bag, one namespaced topic "
                         "per robot (the reference's Nebula fleet shape)")
    ap.add_argument("--topic-template", default="/{robot}/velodyne_points")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--radius", type=float, default=18.0,
                    help="synthetic circle radius (m)")
    ap.add_argument("--laps", type=float, default=1.2,
                    help="synthetic circle laps over --frames")
    ap.add_argument("--tick-every", type=int, default=30)
    ap.add_argument("--fused", action="store_true",
                    help="device-batched replay (one odometry dispatch per "
                         "tick block; falls back to per-frame replay when "
                         "floor detection / deskew / IMU frontends are on)")
    ap.add_argument("--output", default="results")
    ap.add_argument("overrides", nargs="*", help="param:=value overrides")
    args = ap.parse_args(argv)

    from .config import EngineConfig

    if args.config:
        import yaml

        with open(args.config) as f:
            d = yaml.safe_load(f)
        d = _apply_overrides(d, _parse_overrides(args.overrides))
        cfg = EngineConfig.from_yaml_dict(d)
    else:
        # same flat-namespace fan-out as the --config path: each override
        # lands in every component section and from_yaml_dict keeps the
        # fields each dataclass actually declares (without this, prefilter/
        # odometry overrides like capacity_raw_points were silently ignored)
        d = _apply_overrides({}, _parse_overrides(args.overrides))
        cfg = EngineConfig.from_yaml_dict(d)

    from .pipeline.replay import Robot, replay, replay_fused

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.dataset == "rosbag" and args.robots:
        # fleet-from-bag path (pipeline/bagfleet.py): one SLAM per robot
        # topic, lock-step replay with uuid-delta graph exchange
        from .models.persistence import save_graph
        from .pipeline.bagfleet import run_fleet_from_bag

        names = [n.strip() for n in args.robots.split(",") if n.strip()]
        robots, results = run_fleet_from_bag(
            cfg, args.bag, names, topic_template=args.topic_template,
            tick_every=args.tick_every,
            max_frames=args.frames if args.frames > 0 else 0)
        summary = {}
        for name in names:
            rdir = out_dir / name
            rdir.mkdir(parents=True, exist_ok=True)
            save_graph(robots[name].slam, rdir / "graph")
            db = robots[name].slam.db
            inter = sum(
                1 for e in db.edges if e.type == "loop"
                and db.uuid_keyframe_map[e.from_uuid].robot_name
                != db.uuid_keyframe_map[e.to_uuid].robot_name)
            summary[name] = {
                "frames": int(len(results[name].stamps)),
                "keyframes": int(len(db.keyframes) + len(db.new_keyframes)),
                "loops": results[name].num_loops,
                "inter_robot_loops": inter,
            }
        (out_dir / "summary.json").write_text(
            json.dumps(summary, indent=2))
        print(json.dumps(summary))
        return 0

    gt_xyz = None
    if args.dataset == "kitti":
        from .io.kitti import KittiSequence

        seq = KittiSequence.open(args.kitti_root, args.sequence)
        n = min(len(seq), args.frames) if args.frames > 0 else len(seq)
        frames = ((seq.times[i], seq.scan(i)) for i in range(n))
        if seq.gt_poses_velo is not None:
            gt_xyz = seq.gt_poses_velo[:n, :3, 3]
    elif args.dataset == "rosbag":
        from .io.rosbag import BagReader

        bag = BagReader(args.bag)
        frames = bag.pointclouds(args.topic)
    else:
        from .io.synthetic import SyntheticWorld, circle_trajectory

        world = SyntheticWorld.build(seed=0)
        traj = circle_trajectory(args.frames, radius=args.radius,
                                 laps=args.laps)
        frames = ((i * 0.1, world.scan(p, seed=i))
                  for i, p in enumerate(traj))
        gt_xyz = traj[:, :3]

    robot = Robot(cfg)
    run = replay_fused if args.fused else replay
    result = run(robot, frames, tick_every=args.tick_every, gt_xyz=gt_xyz,
                 tum_path=str(out_dir / "trajectory_tum.txt"))

    from .io.pcd import save_pcd
    from .models.markers import export_ply
    from .models.persistence import save_graph

    map_pts = robot.slam.generate_map()
    save_pcd(out_dir / "map.pcd", map_pts)
    save_graph(robot.slam, out_dir / "graph")
    export_ply(robot.slam, out_dir / "graph.ply")
    (out_dir / "summary.json").write_text(json.dumps({
        "frames": int(len(result.stamps)),
        "keyframes": int(len(robot.slam.db.keyframes)
                         + len(robot.slam.db.new_keyframes)),
        "loops": result.num_loops,
        "ate_rmse": result.ate,
        "rpe_rmse": result.rpe,
        "frames_per_s": result.frames_per_s,
        "map_points": int(len(map_pts)),
    }, indent=2))
    print(json.dumps(json.loads((out_dir / "summary.json").read_text())))
    return 0


if __name__ == "__main__":
    sys.exit(main())
