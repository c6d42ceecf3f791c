"""Scratch profiler: attribute the R-robot co-hosted SLAM cost end-to-end.

Replicates bench.py's run_multirobot_scaling inner loop with phase timers
so the 2/3/4-robot falloff can be attributed (host merge vs exchange vs
tick device work). Run on the TPU:
    python profile_mr.py [R]          # default R=3
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

RAW, FILTERED = bench.MR_RAW, bench.MR_FILTERED
N_FRAMES, BLOCK = bench.MR_FRAMES, bench.MR_BLOCK

T = defaultdict(float)
C = defaultdict(int)


class timer:
    def __init__(self, key):
        self.key = key

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        T[self.key] += time.perf_counter() - self.t0
        C[self.key] += 1


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax
    import jax.numpy as jnp

    from mrg_slam_tpu.models import odometry_fused as fused
    from mrg_slam_tpu.models.backend import MrgSlam
    from mrg_slam_tpu.models.coordinator import SharedTick
    from mrg_slam_tpu.ops.cloud import PointCloud
    from mrg_slam_tpu.ops.prefilter import prefilter

    dev = jax.devices()[0]
    print(f"# device: {dev}  R={R}", file=sys.stderr)

    traj, scans = bench.build_world_and_scans()
    raw, rmask = bench.stack_scans(scans, RAW)
    raw_d, rmask_d = jnp.asarray(raw), jnp.asarray(rmask)
    stamps = jnp.arange(N_FRAMES, dtype=jnp.float32) * 0.1
    pre_cfg, odo_cfg, slam_cfg = bench.make_configs(RAW, FILTERED)

    @jax.jit
    def prefilter_batch(pts, masks):
        out = jax.vmap(lambda p, m: prefilter(PointCloud(p, m), pre_cfg)
                       )(pts, masks)
        return out.points, out.mask

    def init_pose_of(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    def windows_for(R):
        names = ["alpha", "bravo", "charlie", "delta"][:R]
        if R == 2:
            w = [(0, int(0.6 * N_FRAMES)),
                 (int(0.45 * N_FRAMES), N_FRAMES)]
        else:
            span = N_FRAMES // 2
            step = (N_FRAMES - span) // (R - 1)
            w = [(i * step, min(i * step + span, N_FRAMES))
                 for i in range(R)]
        return dict(zip(names, w))

    windows = windows_for(R)
    names = list(windows)

    def run(record=False):
        slams = {}
        for name, (lo, _) in windows.items():
            cfg_r = dataclasses.replace(
                slam_cfg, own_name=name, multi_robot_names=tuple(names),
                init_pose=init_pose_of(np.asarray(traj[lo])))
            slams[name] = MrgSlam(cfg_r)
        ticker = SharedTick([slams[n] for n in names])
        carries = jax.tree.map(
            lambda *x: jnp.stack(x),
            *[fused.init_carry(FILTERED) for _ in names])

        def request_fn(peer_name, req):
            with timer("exchange.handle_publish_graph"):
                return slams[peer_name].handle_publish_graph(req)

        def ingest(name, s, fpts, fmask, poses):
            slam = slams[name]
            for i in range(poses.shape[0]):
                with timer("ingest.process_scan"):
                    bc = slam.process_scan((s + i) * 0.1, poses[i],
                                           PointCloud(fpts[i], fmask[i]))
                with timer("ingest.on_odom_broadcast"):
                    for other in names:
                        if other != name:
                            slams[other].on_odom_broadcast(bc)

        n_local = max(hi - lo for lo, hi in windows.values())
        for s in range(0, n_local, BLOCK):
            spans = {n: (windows[n][0] + s,
                         min(windows[n][0] + s + BLOCK, windows[n][1]))
                     for n in names if s < windows[n][1] - windows[n][0]}
            if (len(spans) == len(names)
                    and all(b - a == BLOCK for a, b in spans.values())):
                with timer("odometry.batched"):
                    fpts, fmask = prefilter_batch(
                        jnp.concatenate(
                            [raw_d[a:b] for a, b in spans.values()]),
                        jnp.concatenate(
                            [rmask_d[a:b] for a, b in spans.values()]))
                    fpts = fpts.reshape(R, BLOCK, *fpts.shape[1:])
                    fmask = fmask.reshape(R, BLOCK, *fmask.shape[1:])
                    st2 = jnp.broadcast_to(stamps[s:s + BLOCK], (R, BLOCK))
                    carries, outs = fused.run_batch_multi(
                        odo_cfg, carries, fpts, fmask, st2)
                    all_poses = np.asarray(outs.pose)
                for r, name in enumerate(names):
                    ingest(name, s, fpts[r], fmask[r], all_poses[r])
            else:
                for r, name in enumerate(names):
                    if name not in spans:
                        continue
                    a, b = spans[name]
                    with timer("odometry.ragged"):
                        fpts, fmask = prefilter_batch(raw_d[a:b],
                                                      rmask_d[a:b])
                        c_r = jax.tree.map(lambda x: x[r], carries)
                        c_r, outs = fused.run_batch(odo_cfg, c_r, fpts,
                                                    fmask,
                                                    stamps[s:s + (b - a)])
                        carries = jax.tree.map(lambda f, v: f.at[r].set(v),
                                               carries, c_r)
                        poses = np.asarray(outs.pose)
                    ingest(name, s, fpts, fmask, poses)
            now = (s + BLOCK) * 0.1
            with timer("tick_all"):
                stats = ticker.tick_all(now=now)
            if record:
                for n2, st in stats.items():
                    if st is not None:
                        T["tick.loop_closure"] += st.loop_closure_us / 1e6
                        T["tick.optimize"] += st.optimization_us / 1e6
            for name in names:
                with timer("broadcast.slam_pose"):
                    sp = slams[name].slam_pose_broadcast(now)
                if sp is None:
                    continue
                for other in names:
                    if other != name:
                        with timer("broadcast.on_slam_pose"):
                            slams[other].on_slam_pose_broadcast(
                                sp, now=now, request_fn=request_fn)
        with timer("tick_all"):
            ticker.tick_all(now=n_local * 0.1)
        return slams

    # fine-grained tick instrumentation via wrappers
    from mrg_slam_tpu.models.loop_detector import LoopDetector
    from mrg_slam_tpu.models.pair_runner import PairRunner
    from mrg_slam_tpu.models import coordinator as coord
    from mrg_slam_tpu.graph import builder as gb
    from mrg_slam_tpu.models.graph_database import GraphDatabase

    def wrap(cls, name, key):
        orig = getattr(cls, name)

        def timed(*a, **kw):
            with timer(key):
                return orig(*a, **kw)
        setattr(cls, name, timed)

    wrap(MrgSlam, "_tick_begin", "tickd.begin(flushes)")
    wrap(MrgSlam, "_tick_insert", "tickd.insert")
    wrap(MrgSlam, "_tick_post", "tickd.post")
    wrap(LoopDetector, "build_requests", "tickd.build_requests")
    wrap(LoopDetector, "resolve", "tickd.resolve")
    wrap(PairRunner, "run", "tickd.pair_run")
    wrap(GraphDatabase, "flush_graph_queue", "tickd.flush_graph_queue")
    orig_om = gb.optimize_many

    def timed_om(graphs):
        with timer("tickd.optimize_many"):
            return orig_om(graphs)
    gb.optimize_many = timed_om
    coord.optimize_many = timed_om

    t0 = time.perf_counter()
    run()  # warmup
    print(f"# warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    T.clear(); C.clear()
    t0 = time.perf_counter()
    run(record=True)
    total = time.perf_counter() - t0
    n_scans = sum(hi - lo for lo, hi in windows.values())
    print(f"# total {total:.3f}s ({n_scans / total:.1f} scans/s aggregate)")
    for k in sorted(T, key=lambda k: -T[k]):
        print(f"  {k:35s} {T[k] * 1e3:9.1f} ms  x{C[k]}")
    acc = sum(v for k, v in T.items() if not k.startswith("tick"))
    print(f"  {'(accounted, non-tick)':35s} {acc * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
