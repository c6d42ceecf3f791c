"""Process-isolated multi-robot deployment: one OS process per robot,
delta-graph exchange over real TCP.

The reference's deployment topology: one SLAM process per robot
(launch/mrg_slam.launch.py:212-221; kitti_multirobot_processor.py:85-117
spawns them via subprocess), peers exchanging delta graphs through the
PublishGraph service over DDS with a 20 s timeout
(apps/mrg_slam_component.cpp:617-625). Here each robot process runs the
full stack (pipeline/replay.Robot on CPU jax — one chip cannot be shared
by two processes; co-hosted robots on a chip use models/coordinator.py
instead) and serves three endpoints over parallel/channel.SocketServer:

- "publish_graph": delta-graph request/response. Responses ship clouds in
  QuantIZED wire form (uint16 voxel offsets + scale,
  parallel/messages.quantize_cloud) — ~4x fewer bytes than the
  reference's full-float clouds; dequantized on receipt.
- "odom" / "slam_pose": one-way PoseWithName broadcasts, enqueued and
  drained by the receiving robot's main loop (all MrgSlam mutation stays
  on one thread; the reference takes main_thread_mutex for the same
  races, mrg_slam_component.cpp:1369-1425).

ALL jax work runs on each robot's main thread: publish_graph requests are
queued by the handler thread and fulfilled at the main loop's service
points (XLA:CPU aborted when a handler thread fetched clouds concurrently
with main-thread compute). Requests therefore wait at most a frame or
two — far under the 20 s service timeout — and two robots requesting each
other's graphs simultaneously cannot deadlock.

CLI:
    python -m mrg_slam_tpu.pipeline.multiprocess --robots 2 --frames 80 \
        --out /tmp/mp_run
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import sys
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


def _worker_main(arg_blob: bytes) -> None:
    """Robot subprocess entry (spawned with its pickled job dict — a plain
    dict, not the dataclass, so `python -m` parents pickle classes that
    resolve in the worker)."""
    import types

    job = types.SimpleNamespace(**pickle.loads(arg_blob))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..utils.hostcache import cpu_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(
        os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")))

    from ..parallel.channel import SocketClient, SocketServer
    from ..parallel.messages import (dequantize_graph_msg,
                                     quantize_graph_msg)
    from ..utils.tum import save_tum
    from .replay import Robot

    robot = Robot(job.cfg)
    slam = robot.slam
    inbox: List[Tuple[str, object]] = []
    inbox_lock = threading.Lock()

    server = SocketServer(port=job.port)

    # publish_graph is served FROM THE MAIN THREAD: the handler enqueues
    # the request and blocks on an event that the main loop fulfills at
    # its next service point (frame boundary / drain / barrier poll).
    # Running jax work (cloud fetches for quantization) on the socket
    # handler thread concurrently with the main thread's XLA:CPU compute
    # aborted the process (C++ terminate in a worker thread); keeping all
    # jax single-threaded per process sidesteps it. Peers wait a frame or
    # two (well under the 20 s service timeout the reference also uses).
    pending: List[Tuple[object, threading.Event, dict]] = []
    pending_lock = threading.Lock()

    def publish_graph(req):
        ev, holder = threading.Event(), {}
        with pending_lock:
            pending.append((req, ev, holder))
        # requesters serve their own pending queue while blocked on us
        # (call_serving below), so this only expires if the peer process
        # died mid-run — the requester then fails loudly, not silently
        ev.wait(timeout=30.0)
        return holder.get("resp")

    def serve_pending() -> None:
        with pending_lock:
            todo, pending[:] = list(pending), []
        for req, ev, holder in todo:
            msg = slam.handle_publish_graph(req)
            wire = quantize_graph_msg(msg)
            if slam.sent_graph_bytes:
                # account what actually crosses the wire, not float form
                slam.sent_graph_bytes[-1] = wire.nbytes()
            holder["resp"] = wire
            ev.set()

    def enqueue(kind):
        def handler(msg):
            with inbox_lock:
                inbox.append((kind, msg))
        return handler

    server.advertise("publish_graph", publish_graph)
    server.advertise("odom", enqueue("odom"))
    server.advertise("slam_pose", enqueue("slam_pose"))
    # lock-step pacing: peers poll our global frame index so free-running
    # processes keep bounded skew (the reference gates playback on peer
    # SlamStatus the same way, kitti_multirobot_processor.py:95-99);
    # 10**9 = window finished, never block on us again
    progress = {"frame": -1}
    server.advertise("progress", lambda _: progress["frame"])
    final_done = {"done": False}
    server.advertise("final_done", lambda _: final_done["done"])

    # handshake: report our bound port, wait for peer addresses
    with open(job.handshake_path, "w") as f:
        json.dump({"name": job.name, "address": list(server.address)}, f)
    peers: Dict[str, SocketClient] = {}
    deadline = time.time() + 30.0
    peer_names = [n for n in job.all_names if n != job.name]
    while time.time() < deadline and len(peers) < len(peer_names):
        for name in peer_names:
            if name in peers:
                continue
            path = os.path.join(job.out_dir, f"{name}.addr")
            if os.path.exists(path):
                try:
                    with open(path) as f:
                        addr = json.load(f)["address"]
                    peers[name] = SocketClient(addr, timeout=20.0)
                except (json.JSONDecodeError, OSError):
                    pass
        time.sleep(0.05)
    assert len(peers) == len(peer_names), f"peers missing: {peers.keys()}"

    def call_serving(peer_name: str, endpoint: str, payload):
        """Blocking service call that keeps serving OUR publish_graph
        queue while the request is in flight.

        Two robots draining simultaneously used to deadlock-by-timeout:
        each main thread blocked inside the other's publish_graph call,
        neither reached serve_pending, both requests expired at the
        15 s handler timeout, and the exchange dropped SILENTLY — the
        round-3 flake (`remote_keyframes: 0` under -n 4 suite load).
        The socket wait moves to a helper thread (pure IO, no jax); the
        main thread services peers until the response lands."""
        out = {}
        done = threading.Event()

        def runner():
            try:
                out["resp"] = peers[peer_name].call(endpoint, payload)
            finally:
                done.set()

        t = threading.Thread(target=runner, daemon=True)
        t.start()
        while not done.wait(timeout=0.005):
            serve_pending()
        t.join()
        return out.get("resp")

    def request_fn(peer_name: str, req):
        graph = call_serving(peer_name, "publish_graph", req)
        if graph is None:
            # a dropped exchange is a LOUD failure in the harness: the
            # reference tolerates service timeouts because its robots are
            # long-lived and retry forever (mrg_slam_component.cpp:617-625);
            # a finite deterministic run must not "succeed" with zero
            # merged keyframes
            raise RuntimeError(
                f"{job.name}: publish_graph to {peer_name} dropped")
        return dequantize_graph_msg(graph)

    def drain(now: float) -> None:
        serve_pending()
        with inbox_lock:
            msgs, inbox[:] = list(inbox), []
        for kind, msg in msgs:
            if kind == "odom":
                slam.on_odom_broadcast(msg)
            else:
                slam.on_slam_pose_broadcast(msg, now=now,
                                            request_fn=request_fn)

    # deterministic frame source: regenerate the shared world from seed
    from ..io.synthetic import SyntheticWorld, circle_trajectory

    world = SyntheticWorld.build(seed=job.world_seed, extent=30.0,
                                 n_ground=25000, max_points_per_scan=8192,
                                 noise=0.02)
    traj = circle_trajectory(job.total_frames, radius=12.0, laps=1.1)
    lo, hi = job.window

    def wait_for_peers(i: int, max_skew: int) -> None:
        deadline = time.time() + 60.0
        while time.time() < deadline:
            serve_pending()   # a waiting peer may need OUR graph to move
            prog = [peers[n].call("progress", None) for n in peer_names]
            if all(p is None or p >= i - max_skew for p in prog):
                return
            time.sleep(0.02)

    t_run = time.perf_counter()
    for i in range(lo, hi):
        stamp = i * 0.1
        wait_for_peers(i, max_skew=job.tick_every)
        progress["frame"] = i
        serve_pending()
        _, bc = robot.step(stamp, world.scan(traj[i], seed=i))
        if bc is not None:
            for c in peers.values():
                c.call("odom", bc)
        if (i - lo + 1) % job.tick_every == 0:
            drain(stamp)
            slam.optimization_tick(now=stamp)
            sp = slam.slam_pose_broadcast(stamp)
            if sp is not None:
                for c in peers.values():
                    c.call("slam_pose", sp)
    progress["frame"] = 10**9  # window done: release any waiting peer
    # END-OF-RUN RENDEZVOUS — explicit three-phase protocol (the former
    # sleep/2-s-grace rendezvous dropped exchanges under CPU contention):
    #   B. barrier: every robot reaches end-of-window (serving all along);
    #   C. one deterministic final pull of every peer's delta graph
    #      (RequestGraphs semantics, mrg_slam_component.cpp:1249 — the
    #      reference's join-late flow), so the final merge no longer
    #      depends on a last slam-pose broadcast landing in time;
    #   D. serve until every peer reports its final pull done, so nobody
    #      closes while a peer's phase-C request is in flight.
    # Each wait raises on expiry instead of proceeding silently.
    def barrier(endpoint, ok, what):
        deadline = time.time() + 120.0
        while time.time() < deadline:
            serve_pending()
            vals = [call_serving(n, endpoint, None) for n in peer_names]
            if all(ok(v) for v in vals):
                return
            time.sleep(0.02)
        raise RuntimeError(f"{job.name}: barrier '{what}' timed out")

    barrier("progress", lambda p: p is not None and p >= 10**9,
            "end-of-window")
    n_pulled = slam.request_graphs(peer_names, now=hi * 0.1,
                                   request_fn=request_fn)
    assert n_pulled == len(peer_names), (n_pulled, peer_names)
    final_done["done"] = True
    barrier("final_done", bool, "final-pull")
    drain(hi * 0.1)
    slam.optimization_tick(now=hi * 0.1)
    wall = time.perf_counter() - t_run

    own = sorted(slam.db.own_keyframes(), key=lambda k: k.stamp)
    est = (np.stack([k.estimate(slam.db.graph) for k in own])
           if own else np.zeros((0, 7), np.float32))
    gt = traj[[int(round(k.stamp / 0.1)) for k in own]]
    from ..utils.metrics import ate_rmse

    result = {
        "name": job.name,
        "frames": hi - lo,
        "wall_s": wall,
        "keyframes": len(own),
        "remote_keyframes": sum(
            1 for k in slam.db.keyframes + slam.db.new_keyframes
            if k.robot_name != job.name),
        "loops": sum(1 for e in slam.db.edges if e.type == "loop"),
        "received_bytes": sum(slam.received_graph_bytes),
        "sent_bytes": sum(slam.sent_graph_bytes),
        "ate_m": float(ate_rmse(est[:, :3], np.asarray(gt)[:, :3]))
        if len(own) else None,
    }
    save_tum(os.path.join(job.out_dir, f"{job.name}.tum"),
             np.asarray([k.stamp for k in own]), est)
    with open(os.path.join(job.out_dir, f"{job.name}.result.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    server.close()
    for c in peers.values():
        c.close()


@dataclasses.dataclass
class RobotJob:
    name: str
    all_names: List[str]
    window: Tuple[int, int]
    total_frames: int
    world_seed: int
    tick_every: int
    port: int
    out_dir: str
    handshake_path: str
    cfg: object  # EngineConfig


def _default_cfg(name: str, names, init_pose) -> object:
    import dataclasses as dc

    from ..config import (EngineConfig, LoopClosureConfig, OptimizerConfig,
                          PrefilterConfig, RegistrationConfig, SlamConfig,
                          ScanMatchingOdometryConfig)

    reg = RegistrationConfig(reg_transformation_epsilon=1e-3,
                             reg_maximum_iterations=32,
                             reg_correspondence_randomness=10)
    return EngineConfig(
        prefilter=PrefilterConfig(downsample_resolution=0.4,
                                  capacity_raw_points=8192,
                                  capacity_filtered_points=1024,
                                  outlier_removal_method="NONE"),
        odometry=ScanMatchingOdometryConfig(keyframe_delta_translation=2.0,
                                            registration=reg),
        slam=SlamConfig(own_name=name, multi_robot_names=tuple(names),
                        keyframe_delta_trans=2.0, capacity_keyframes=128,
                        capacity_edges=512, capacity_keyframe_points=1024,
                        registration=reg, init_pose=init_pose,
                        optimizer=OptimizerConfig(solver_backend="dense",
                                                  g2o_solver_num_iterations=64),
                        loop=dc.replace(LoopClosureConfig(),
                                        capacity_candidates=4),
                        robot_remove_points_radius=0.0))


def run_multiprocess(n_robots: int = 2, total_frames: int = 80,
                     tick_every: int = 15, world_seed: int = 11,
                     out_dir: str = "/tmp/mrg_slam_mp",
                     timeout_s: float = 600.0) -> Dict[str, dict]:
    """Spawn one robot process per overlapping trajectory window, wait,
    return the per-robot result dicts (kitti_multirobot_processor.py's
    subprocess topology without ROS)."""
    import subprocess

    from ..io.synthetic import circle_trajectory

    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith((".addr", ".result.json", ".tum")):
            os.remove(os.path.join(out_dir, f))
    names = ["alpha", "bravo", "charlie", "delta"][:n_robots]
    span = total_frames * 2 // (n_robots + 1)
    step = (total_frames - span) // max(n_robots - 1, 1)
    windows = [(i * step, min(i * step + span, total_frames))
               for i in range(n_robots)]
    traj = circle_trajectory(total_frames, radius=12.0, laps=1.1)

    procs = []
    for name, window in zip(names, windows):
        p0 = traj[window[0]]
        yaw = 2.0 * float(np.arctan2(p0[6], p0[3]))
        job = dataclasses.asdict(RobotJob(
            name=name, all_names=names, window=window,
            total_frames=total_frames, world_seed=world_seed,
            tick_every=tick_every, port=0, out_dir=out_dir,
            handshake_path=os.path.join(out_dir, f"{name}.addr"),
            cfg=None))
        job["cfg"] = _default_cfg(name, names,
                                  (float(p0[0]), float(p0[1]), float(p0[2]),
                                   yaw, 0.0, 0.0))
        blob = pickle.dumps(job)
        code = ("import sys; from mrg_slam_tpu.pipeline.multiprocess "
                "import _worker_main; _worker_main(sys.stdin.buffer.read())")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        logf = open(os.path.join(out_dir, f"{name}.log"), "w")
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdin=subprocess.PIPE, stdout=logf,
                                stderr=subprocess.STDOUT, env=env)
        proc.stdin.write(blob)
        proc.stdin.close()
        procs.append((name, proc))

    deadline = time.time() + timeout_s
    results: Dict[str, dict] = {}
    try:
        for name, proc in procs:
            rc = proc.wait(timeout=max(deadline - time.time(), 1.0))
            assert rc == 0, f"robot {name} exited {rc}"
    finally:
        for _, proc in procs:   # exact PIDs we spawned, never patterns
            if proc.poll() is None:
                proc.kill()
    for name in names:
        with open(os.path.join(out_dir, f"{name}.result.json")) as f:
            results[name] = json.load(f)
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--robots", type=int, default=2)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--tick-every", type=int, default=15)
    ap.add_argument("--out", default="/tmp/mrg_slam_mp")
    args = ap.parse_args(argv)
    results = run_multiprocess(n_robots=args.robots,
                               total_frames=args.frames,
                               tick_every=args.tick_every,
                               out_dir=args.out)
    for name, r in results.items():
        print(f"{name}: {r['frames']} frames, {r['keyframes']} keyframes "
              f"(+{r['remote_keyframes']} remote), {r['loops']} loops, "
              f"ATE {r['ate_m']:.3f} m, rx {r['received_bytes'] / 1e3:.0f} kB"
              f" / tx {r['sent_bytes'] / 1e3:.0f} kB, {r['wall_s']:.1f}s")


if __name__ == "__main__":
    main()
