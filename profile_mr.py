"""Scratch profiler: attribute the R-robot co-hosted SLAM cost end-to-end.

Replicates bench.py's run_multirobot_scaling inner loop (shared-graph
co-hosting, fixed 240-scan survey) with phase timers so the 2/3/4-robot
scaling rows can be attributed: device odometry dispatch vs host ingest
(keyframe admission + covariance prefetch) vs the tick's pair program vs
the joint LM solve. Run on the TPU:

    python profile_mr.py            # all of R=2,3,4
    python profile_mr.py 3          # one fleet size

Writes one summary line per R to stdout; keep the output with the bench
artifact when publishing scaling rows (VERDICT r4 #4).
"""

import dataclasses
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

import bench


class Phases:
    def __init__(self):
        self.t = defaultdict(float)
        self.n = defaultdict(int)

    class _Timer:
        def __init__(self, ph, key):
            self.ph, self.key = ph, key

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            self.ph.t[self.key] += time.perf_counter() - self.t0
            self.ph.n[self.key] += 1

    def __call__(self, key):
        return self._Timer(self, key)


def run_profiled(R, reps=3):
    import jax
    import jax.numpy as jnp

    from mrg_slam_tpu.models import odometry_fused as fused
    from mrg_slam_tpu.models.shared_graph import SharedGraphSlam
    from mrg_slam_tpu.ops.cloud import PointCloud
    from mrg_slam_tpu.ops.prefilter import prefilter

    traj, scans = bench.build_world_and_scans()
    raw, rmask = bench.stack_scans(scans, bench.MR_RAW)
    raw_d, rmask_d = jnp.asarray(raw), jnp.asarray(rmask)
    stamps = jnp.arange(bench.MR_FRAMES, dtype=jnp.float32) * 0.1
    pre_cfg, odo_cfg, slam_cfg = bench.make_configs(bench.MR_RAW,
                                                    bench.MR_FILTERED)
    # the same MR retuning bench.run_multirobot_scaling applies
    odo_cfg = dataclasses.replace(
        odo_cfg, keyframe_delta_translation=2.0,
        registration=dataclasses.replace(odo_cfg.registration,
                                         reg_transformation_epsilon=1e-3))
    slam_cfg = dataclasses.replace(
        slam_cfg,
        loop=dataclasses.replace(slam_cfg.loop,
                                 accum_distance_thresh_other_robot=2.0,
                                 capacity_candidates=2),
        registration=dataclasses.replace(slam_cfg.registration,
                                         reg_maximum_iterations=12))

    @jax.jit
    def prefilter_batch(pts, masks):
        out = jax.vmap(lambda p, m: prefilter(PointCloud(p, m), pre_cfg)
                       )(pts, masks)
        return out.points, out.mask

    def init_pose_of(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    def windows_for(RR):
        names = ["alpha", "bravo", "charlie", "delta"][:RR]
        span = 240 // RR
        stride = (bench.MR_FRAMES - span) // (RR - 1)
        w = [(i * stride, i * stride + span) for i in range(RR - 1)]
        w.append((bench.MR_FRAMES - span, bench.MR_FRAMES))
        return dict(zip(names, w))

    def run(ph):
        windows = windows_for(R)
        names = list(windows)
        B = {2: 24, 3: 16, 4: 12}[R]
        group = SharedGraphSlam(
            dataclasses.replace(slam_cfg, own_name=names[0],
                                multi_robot_names=tuple(names)),
            names,
            {name: init_pose_of(np.asarray(traj[lo]))
             for name, (lo, _) in windows.items()})
        carries = jax.tree.map(
            lambda *x: jnp.stack(x),
            *[fused.init_carry(bench.MR_FILTERED) for _ in names])

        def ingest(name, s, fpts, fmask, poses):
            for i in range(poses.shape[0]):
                group.process_scan(name, (s + i) * 0.1, poses[i],
                                   PointCloud(fpts[i], fmask[i]))

        n_local = max(hi - lo for lo, hi in windows.values())
        for s in range(0, n_local, B):
            spans = {n: (windows[n][0] + s, windows[n][0] + s + B)
                     for n in names}
            with ph("odometry.device"):
                fpts, fmask = prefilter_batch(
                    jnp.concatenate([raw_d[a:b] for a, b in spans.values()]),
                    jnp.concatenate([rmask_d[a:b]
                                     for a, b in spans.values()]))
                fpts = fpts.reshape(R, B, *fpts.shape[1:])
                fmask = fmask.reshape(R, B, *fmask.shape[1:])
                st2 = jnp.broadcast_to(stamps[s:s + B], (R, B))
                carries2, outs = fused.run_batch_multi(odo_cfg, carries,
                                                       fpts, fmask, st2)
                all_poses = np.asarray(outs.pose)  # the one fetch
            carries = carries2
            with ph("ingest.host"):
                for r, name in enumerate(names):
                    ingest(name, s, fpts[r], fmask[r], all_poses[r])
            with ph("tick.total"):
                st = group.optimization_tick(now=(s + B) * 0.1)
            if st is not None:
                ph.t["tick.loop_closure"] += st.loop_closure_us / 1e6
                ph.n["tick.loop_closure"] += 1
                ph.t["tick.optimize"] += st.optimization_us / 1e6
                ph.n["tick.optimize"] += 1
        with ph("tick.total"):
            st = group.optimization_tick(now=n_local * 0.1)
        if st is not None:
            ph.t["tick.loop_closure"] += st.loop_closure_us / 1e6
            ph.t["tick.optimize"] += st.optimization_us / 1e6
        return group, windows

    run(Phases())  # warmup/compiles
    best = None
    for _ in range(reps):
        ph = Phases()
        t0 = time.perf_counter()
        group, windows = run(ph)
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, ph, group, windows)
    wall, ph, group, windows = best
    n_scans = sum(hi - lo for lo, hi in windows.values())
    inter = 0
    for e in group.db.edges:
        if e.type != "loop":
            continue
        a = group.db.uuid_keyframe_map[e.from_uuid]
        b = group.db.uuid_keyframe_map[e.to_uuid]
        inter += a.robot_name != b.robot_name
    other = wall - ph.t["odometry.device"] - ph.t["ingest.host"] \
        - ph.t["tick.total"]
    print(f"R={R}: {n_scans} scans in {wall:.2f}s "
          f"({n_scans / wall:.1f} scans/s aggregate); phases: "
          f"odometry.device {ph.t['odometry.device']:.2f}s "
          f"({ph.n['odometry.device']} blocks), "
          f"ingest.host {ph.t['ingest.host']:.2f}s, "
          f"tick.total {ph.t['tick.total']:.2f}s "
          f"(loop-closure {ph.t['tick.loop_closure']:.2f}s, "
          f"optimize {ph.t['tick.optimize']:.2f}s, "
          f"{ph.n['tick.optimize']} ticks), other {other:.2f}s; "
          f"{len(group.db.keyframes) + len(group.db.new_keyframes)} kf, "
          f"{inter} inter-robot loops", flush=True)
    return dict(R=R, wall=wall, scans_per_s=n_scans / wall,
                phases={k: round(v, 3) for k, v in ph.t.items()})


def main():
    import jax
    Rs = [int(sys.argv[1])] if len(sys.argv) > 1 else [2, 3, 4]
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    out = [run_profiled(R) for R in Rs]
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
