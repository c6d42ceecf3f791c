"""Cross-robot batching: every robot hosted on a chip shares each tick's
device dispatches.

The reference deploys one MrgSlamComponent process per robot, each with its
own CPU threads and optimization timer (apps/mrg_slam_component.cpp:802);
R robots cost R of everything. On a TPU behind a ~26 ms round-trip tunnel
the natural multi-robot unit is the *batch axis*: PairRequest rows are
robot-agnostic and the per-robot pose graphs are same-shaped programs, so
one coordinator can run R robots' optimization ticks in the SAME two
dispatches a single robot pays:

  pairs: every robot's loop-candidate registrations, speculative
         consistency checks, and deferred-edge fitness passes
         concatenated into one `align_pairs` batch
         (loop_detector.build_requests / resolve);
  solve: all R pose graphs stacked and LM-solved by one vmapped program
         (graph/builder.py `optimize_many`), one packed fetch.

The per-robot host logic (queue flushes, candidate filtering, selection,
loop insertion, odom2map bookkeeping) is exactly `MrgSlam.optimization_tick`
— the coordinator drives the same stage methods, only the device batching
changes. Timing note: each robot's TickStats records the *shared* phase
wall times (the dispatches serve all robots at once).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

from ..graph.builder import optimize_many
from .backend import MrgSlam, TickStats


class SharedTick:
    """Runs R co-hosted robots' optimization ticks through shared device
    dispatches. All robots must share a registration config (they share one
    PairRunner program); pose-graph capacities should match for the solve
    to batch (differing graphs fall back to per-robot solves)."""

    def __init__(self, slams: Sequence[MrgSlam]):
        self.slams = list(slams)
        assert self.slams, "need at least one robot"
        reg0 = self.slams[0].cfg.registration
        cap0 = self.slams[0].cfg.capacity_keyframe_points
        for s in self.slams[1:]:
            assert (s.cfg.registration == reg0
                    and s.cfg.capacity_keyframe_points == cap0), (
                "SharedTick robots must share a registration config and "
                f"keyframe cloud capacity ({s.own_name} differs)")
        # one runner serves every robot's pair program (same compiled
        # buckets; per-keyframe covariance caches live on the keyframes)
        self.runner = self.slams[0].loop_detector.runner
        for s in self.slams[1:]:
            s.loop_detector.runner = self.runner

    # ------------------------------------------------------------------
    def tick_all(self, now: float = 0.0) -> Dict[str, Optional[TickStats]]:
        """One coordinated optimization tick for every hosted robot.

        Semantically identical to calling each robot's
        `optimization_tick(now)` in sequence (same flushes, same candidate
        selection, same loop acceptance, same solve numerics) — only the
        device work is batched across robots.
        """
        out: Dict[str, Optional[TickStats]] = {
            s.own_name: None for s in self.slams}

        begun = []
        for slam in self.slams:
            pre = slam._tick_begin(now)
            if pre is not None:
                begun.append((slam, *pre))
        if not begun:
            return out

        # ---- ONE shared batch: every robot's candidate registrations,
        # speculative consistency checks, and edge-fitness rows ----------
        t0 = time.perf_counter()
        all_reqs, meta = [], []
        for slam, stats, deferred, edge_reqs in begun:
            slam.status.in_loop_closure = True
            reqs, jobs, slices = slam.loop_detector.build_requests(
                slam.db, edge_reqs)
            meta.append((slam, stats, deferred, edge_reqs, jobs, slices,
                         len(all_reqs), len(reqs)))
            all_reqs.extend(reqs)
        results = self.runner.run(all_reqs)

        loop_wall = (time.perf_counter() - t0) * 1e6
        graphs = []
        for (slam, stats, deferred, edge_reqs, jobs, slices, off,
             n) in meta:
            rs = results[off: off + n]
            edge_results = rs[: len(edge_reqs)]
            loops = slam.loop_detector.resolve(jobs, slices, rs,
                                               len(edge_reqs))
            if jobs:
                slam.loop_detector.loop_detection_times.append(loop_wall)
            stats.loop_closure_us = loop_wall
            slam.status.in_loop_closure = False
            slam._tick_insert(stats, deferred, edge_results, loops)
            slam.status.in_optimization = True
            graphs.append(slam.db.graph)

        # ---- solve: all graphs in one vmapped dispatch ------------------
        t0 = time.perf_counter()
        optimize_many(graphs)
        opt_wall = (time.perf_counter() - t0) * 1e6
        for slam, stats, *_ in meta:
            stats.optimization_us = opt_wall
            slam.status.in_optimization = False
            slam._tick_post(stats)
            out[slam.own_name] = stats
        return out
