"""Batched cloud-pair execution for the back-end tick.

The reference back-end performs many independent cloud-vs-cloud operations
per optimization tick, each a separate serial registration or kd-tree pass:

- fitness for each new graph edge's information matrix
  (information_matrix_calculator.cpp:46-81),
- one full registration per loop-closure candidate
  (loop_detector.cpp:97-188),
- two more registrations for the odom-chain consistency check (:190-303).

On a TPU behind a ~26 ms round-trip tunnel, dispatching those one by one
costs more in latency than in compute. This module collects every pair the
tick needs into ONE `ops.registration.align_pairs` dispatch:

- per-keyframe GICP preprocessing (kNN/radius covariances) is computed once
  per keyframe and cached on the keyframe (`PairRunner.gicp`), instead of
  re-running `make_target`/`make_source` per use;
- requests are padded to power-of-two buckets so the jitted program is
  compiled for a handful of batch shapes only.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import RegistrationConfig
from ..ops import registration as reg
from ..ops.cloud import PointCloud
from .keyframe import KeyFrame


@dataclasses.dataclass
class PairRequest:
    """One row of the tick's pair program.

    `max_iters = 0` means evaluate-only: no registration, just the fitness
    of `source` moved by `init_pose` into `target` (edge information
    weighting). `max_iters > 0` runs the batched Gauss-Newton first.
    """

    target: KeyFrame
    source: KeyFrame
    init_pose: np.ndarray
    max_iters: int = 0
    fitness_max_range: float = np.inf


@dataclasses.dataclass
class PairResult:
    pose: np.ndarray
    converged: bool
    iterations: int
    num_inliers: int
    fitness_inf: float
    fitness_range: float


class PairRunner:
    """Executes PairRequest batches through one jitted program."""

    MIN_BUCKET = 4
    # Requests beyond the bucket cap run as multiple dispatches. The align
    # program is iteration-bound below a points*rows knee (widening is
    # nearly free), then turns bandwidth-bound. Measured knees on-chip:
    # 4096-pt rows keep gaining through 256-wide buckets (r4: a busy
    # 203-row multi-robot tick ran 30% faster in one 256 bucket than
    # 128+75), while 8192-pt rows at width 128 were 43% SLOWER than 2x64
    # (r3). Budget the cap per capacity regime.
    ROW_POINTS_BUDGET = 524288           # >4096-pt rows (bandwidth-bound)
    ROW_POINTS_BUDGET_SMALL = 1 << 20    # <=4096-pt rows

    def max_bucket(self, capacity: int) -> int:
        budget = (self.ROW_POINTS_BUDGET_SMALL if capacity <= 4096
                  else self.ROW_POINTS_BUDGET)
        b = self.MIN_BUCKET
        while b * 2 * capacity <= budget:
            b *= 2
        return b

    # Row-work equivalent of one extra dispatch + tunnel fetch (~40 ms):
    # measured on-chip the pair program costs ~8-10 ms per 8192-pt
    # registration row (~1 ms per 1024-pt row), so speculative rows that
    # exceed this many point-rows cost more than the round trip they
    # save. Used by LoopDetector.detect to choose between the
    # speculative single-dispatch and the two-phase winners-only shape.
    FREE_ROW_POINTS = 64 * 1024

    def speculation_budget_rows(self, capacity: int) -> int:
        return max(self.FREE_ROW_POINTS // max(capacity, 1),
                   self.MIN_BUCKET)

    def __init__(self, reg_cfg: RegistrationConfig):
        # GICP-family targets are covariance clouds; VGICP/NDT targets are
        # Gaussian voxel maps — both families run the same packed
        # one-dispatch/one-fetch bucket program (align_pairs_packed /
        # align_pairs_voxel_packed)
        self.voxel_target = not reg.is_gicp_like(reg_cfg.registration_method)
        self.reg_cfg = reg_cfg

    # ------------------------------------------------------------------
    def gicp(self, kf: KeyFrame):
        """Per-keyframe GICP cloud (points+mask+covariances), cached.

        The covariance pass is the expensive half of `make_source`; caching
        it per keyframe removes the repeated `make_target` preprocessing
        the round-1 consistency check paid per registration.
        """
        cached = getattr(kf, "_gicp_cache", None)
        if cached is None:
            cached = reg.make_source(kf.cloud, self.reg_cfg)
            kf._gicp_cache = cached
        return cached

    def voxel_map(self, kf: KeyFrame):
        """Per-keyframe Gaussian voxel map (VGICP/NDT targets), cached —
        mirrors the per-target voxel grid VGICP/NDT rebuild per
        setInputTarget in the reference stack."""
        cached = getattr(kf, "_voxmap_cache", None)
        if cached is None:
            cached = reg.make_target(
                kf.cloud, self.reg_cfg,
                voxel_capacity=kf.cloud.capacity).voxels
            kf._voxmap_cache = cached
        return cached

    def prefetch(self, kf: KeyFrame) -> None:
        """Kick off (async) covariance / voxel-map preprocessing for a new
        keyframe, so admission amortizes the work outside the tick."""
        self.gicp(kf)
        if self.voxel_target:
            self.voxel_map(kf)

    # batch cap for the vmapped covariance program: the radius/kNN pass
    # materializes chunked distance panels per batch element, so an
    # unbounded vmap width would trade the dispatch-latency win for an
    # HBM blowup at production cloud capacities
    PREFETCH_BUCKET = 16

    def prefetch_batch(self, kfs: List[KeyFrame]) -> None:
        """One vmapped covariance dispatch for every uncached keyframe.

        Per-keyframe `prefetch` pays a full ~26-30 ms tunnel dispatch per
        admission (measured r04: 2.6 s of a 4.7 s four-robot run — more
        than half the non-compile wall was covariance dispatch latency).
        Admissions arrive in bursts at the tick, so the covariance pass
        vmaps over a padded keyframe bucket: ceil(K/16) dispatches per
        tick instead of K."""
        import jax

        todo = [k for k in kfs if getattr(k, "_gicp_cache", None) is None
                and k.cloud.capacity > 0]
        if not todo:
            return
        if self.voxel_target:
            for k in todo:
                self.voxel_map(k)
        for s in range(0, len(todo), self.PREFETCH_BUCKET):
            chunk = todo[s: s + self.PREFETCH_BUCKET]
            b = self.MIN_BUCKET
            while b < len(chunk):
                b *= 2
            pad = b - len(chunk)
            pts = jnp.stack([k.cloud.points for k in chunk]
                            + [chunk[0].cloud.points] * pad)
            msk = jnp.stack([k.cloud.mask for k in chunk]
                            + [chunk[0].cloud.mask] * pad)
            out = reg.make_source_batch(pts, msk, self.reg_cfg)
            for i, k in enumerate(chunk):
                k._gicp_cache = jax.tree.map(lambda x: x[i], out)

    # ------------------------------------------------------------------
    def run(self, requests: List[PairRequest]) -> List[PairResult]:
        if not requests:
            return []
        cap = requests[0].target.cloud.capacity
        max_bucket = self.max_bucket(cap)
        out: List[PairResult] = []
        for s in range(0, len(requests), max_bucket):
            out.extend(self._run_bucket(requests[s: s + max_bucket]))
        return out

    def _run_bucket(self, requests: List[PairRequest]) -> List[PairResult]:
        n = len(requests)
        # pow2 buckets only: multiple-of-32 buckets LOOK like less padding
        # waste (203 rows -> 224 vs 256) but measured 17% SLOWER on-chip —
        # XLA tiles pow2 leading batch dims better than odd multiples
        b = self.MIN_BUCKET
        while b < n:
            b *= 2
        cap = requests[0].target.cloud.capacity
        for r in requests:
            # mixed capacities would silently mis-pad the bucket program
            assert (r.target.cloud.capacity == cap
                    and r.source.cloud.capacity == cap), (
                "PairRunner bucket requires uniform keyframe cloud "
                f"capacities (got {r.target.cloud.capacity}/"
                f"{r.source.cloud.capacity}, expected {cap})")
        empty = empty_vox = empty_cloud = None
        tgts, srcs, tmaps, tclouds = [], [], [], []
        inits, iters, ranges = [], [], []
        for i in range(b):
            if i < n:
                r = requests[i]
                sg = self.gicp(r.source)
                init = np.asarray(r.init_pose, np.float32)
                mi, fr = r.max_iters, r.fitness_max_range
                if self.voxel_target:
                    tmaps.append(self.voxel_map(r.target))
                    tclouds.append(r.target.cloud)
                else:
                    tgts.append(self.gicp(r.target))
            else:
                if empty is None:
                    ec = PointCloud.empty(cap)
                    empty = reg.GICPCloud(
                        ec.points, ec.mask,
                        jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                         (cap, 3, 3)))
                    if self.voxel_target:
                        empty_cloud = ec
                        empty_vox = reg.make_target(
                            ec, self.reg_cfg, voxel_capacity=cap).voxels
                sg = empty
                if self.voxel_target:
                    tmaps.append(empty_vox)
                    tclouds.append(empty_cloud)
                else:
                    tgts.append(empty)
                init = np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32)
                mi, fr = 0, np.inf
            srcs.append(sg)
            inits.append(init); iters.append(mi); ranges.append(fr)

        # per-keyframe buffers ride in as jit args (stacked on-device inside
        # the program); results come back as one packed (B, 12) array —
        # ONE dispatch + ONE ~26 ms tunnel fetch for the whole bucket
        args = (jnp.asarray(np.stack(inits)),
                jnp.asarray(np.asarray(iters, np.int32)),
                jnp.asarray(np.asarray(ranges, np.float32)))
        if self.voxel_target:
            packed = np.asarray(reg.align_pairs_voxel_packed(
                self.reg_cfg, tmaps, tclouds, srcs, *args))
        else:
            packed = np.asarray(reg.align_pairs_packed(
                self.reg_cfg, tgts, srcs, *args))
        return [PairResult(pose=packed[i, :7],
                           converged=bool(packed[i, 7] > 0.5),
                           iterations=int(packed[i, 8]),
                           num_inliers=int(packed[i, 9]),
                           fitness_inf=float(packed[i, 10]),
                           fitness_range=float(packed[i, 11]))
                for i in range(n)]

