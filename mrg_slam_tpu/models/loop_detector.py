"""Loop detection: candidate filtering, batched matching, consistency check.

TPU re-design of src/mrg_slam/loop_detector.cpp. The reference registers
each candidate serially against the new keyframe (:97-188); here the
candidate set is padded to a static batch and matched in ONE vmapped
registration program — the per-candidate GICP iterations run as a single
batched Gauss-Newton on device. Candidate filtering (:40-95) stays on host
numpy (cheap pose scalars). The odom-chain consistency check (:190-303)
re-registers the best match's prev/next neighbors and requires
loop ∘ odom ∘ loop^-1 ≈ I.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LoopClosureConfig, RegistrationConfig
from ..ops import registration as reg
from ..ops.cloud import PointCloud
from ..ops.fitness import fitness_score
from ..utils import se3
from .graph_database import GraphDatabase, Loop
from .keyframe import KeyFrame


class LoopManager:
    """Most-recent-loop map per (slam_uuid_new, slam_uuid_candidate)
    (loop_detector.hpp:39-117), accum-distance-keeps-newest semantics."""

    def __init__(self):
        self._map: Dict[str, Dict[str, Loop]] = {}

    def get_loop(self, new_slam_uuid: str, cand_slam_uuid: str
                 ) -> Optional[Loop]:
        return self._map.get(new_slam_uuid, {}).get(cand_slam_uuid)

    def add_loop(self, loop: Loop) -> None:
        self._map.setdefault(loop.key1.slam_uuid, {})[
            loop.key2.slam_uuid] = loop

    def add_loop_accum_distance_check(self, loop: Loop) -> None:
        cur = self.get_loop(loop.key1.slam_uuid, loop.key2.slam_uuid)
        if cur is None or loop.key1.accum_distance > cur.key1.accum_distance:
            self.add_loop(loop)


def _stack_clouds(clouds: List[PointCloud]) -> PointCloud:
    return PointCloud(jnp.stack([c.points for c in clouds]),
                      jnp.stack([c.mask for c in clouds]))


class LoopDetector:
    def __init__(self, cfg: LoopClosureConfig, reg_cfg: RegistrationConfig):
        self.cfg = cfg
        self.reg_cfg = reg_cfg
        self.loop_manager = LoopManager()
        # stats mirroring loop_detector.hpp:140-141
        self.loop_detection_times: List[float] = []
        self.loop_candidates_sizes: List[int] = []

    # ------------------------------------------------------------------
    def detect(self, db: GraphDatabase) -> List[Loop]:
        """loop_detector.cpp:15: scan every pending new keyframe."""
        import time

        loops: List[Loop] = []
        for new_kf in db.new_keyframes:
            t0 = time.perf_counter()
            candidates = self.find_candidates(new_kf, db)
            if candidates:
                loop = self.matching(candidates, new_kf, db)
                if loop is not None:
                    loops.append(loop)
                self.loop_candidates_sizes.append(len(candidates))
                self.loop_detection_times.append(
                    (time.perf_counter() - t0) * 1e6)
        return loops

    # ------------------------------------------------------------------
    def find_candidates(self, new_kf: KeyFrame,
                        db: GraphDatabase) -> List[KeyFrame]:
        """Host-side filters (loop_detector.cpp:40-95)."""
        cfg = self.cfg
        out: List[Tuple[float, KeyFrame]] = []
        new_est = new_kf.estimate(db.graph)
        for cand in db.keyframes:
            if cand.node_id is None or cand.first_keyframe:
                continue
            if db.edge_exists(new_kf, cand):
                continue
            cand_est = cand.estimate(db.graph)
            d2 = float(np.sum((cand_est[:2] - new_est[:2]) ** 2))
            if d2 > cfg.candidate_max_xy_distance ** 2:
                continue
            same = new_kf.slam_uuid == cand.slam_uuid
            if same and (new_kf.accum_distance - cand.accum_distance
                         < cfg.accum_distance_thresh_same_robot):
                continue
            last = self.loop_manager.get_loop(new_kf.slam_uuid,
                                              cand.slam_uuid)
            if last is not None:
                gap = new_kf.accum_distance - last.key1.accum_distance
                thresh = (cfg.accum_distance_thresh_same_robot if same
                          else cfg.accum_distance_thresh_other_robot)
                if gap < thresh:
                    continue
            out.append((d2, cand))
        # static batch cap: keep the spatially closest candidates
        out.sort(key=lambda t: t[0])
        return [c for _, c in out[: self.cfg.capacity_candidates]]

    # ------------------------------------------------------------------
    def matching(self, candidates: List[KeyFrame], new_kf: KeyFrame,
                 db: GraphDatabase) -> Optional[Loop]:
        """Batched equivalent of loop_detector.cpp:97-188.

        target = new keyframe cloud; sources = candidate clouds; initial
        guess per candidate = new_est^-1 * cand_est (optionally planarized).
        Returns the best-fitness candidate under fitness_score_thresh that
        passes the consistency check.
        """
        K = self.cfg.capacity_candidates
        pads = K - len(candidates)
        cand_clouds = [c.cloud for c in candidates]
        cap = new_kf.cloud.capacity
        cand_clouds += [PointCloud.empty(cap)] * pads

        new_est = new_kf.estimate(db.graph)
        guesses = []
        for c in candidates:
            g = np.asarray(se3.pose_between(
                jnp.asarray(new_est), jnp.asarray(c.estimate(db.graph))),
                np.float32)
            if self.cfg.use_planar_registration_guess:
                g = g.copy()
                g[2] = 0.0
            guesses.append(g)
        guesses += [np.asarray(se3.pose_identity())] * pads

        fits, rels, convs = _batched_match(
            self.reg_cfg, new_kf.cloud, _stack_clouds(cand_clouds),
            jnp.asarray(np.stack(guesses)),
            self.cfg.fitness_score_max_range)
        fits = np.asarray(fits)
        rels = np.asarray(rels)
        convs = np.asarray(convs)

        best, best_score, best_rel = None, float("inf"), None
        for i, cand in enumerate(candidates):
            if not convs[i] or not np.isfinite(fits[i]):
                continue
            if fits[i] < best_score:
                best, best_score, best_rel = cand, float(fits[i]), rels[i]
        if best is None or best_score > self.cfg.fitness_score_thresh:
            return None

        if (self.cfg.enable_loop_closure_consistency_check
                and not best.first_keyframe and not best.static_keyframe):
            if not self._consistency_check(new_kf, best, best_rel, db):
                return None

        loop = Loop(key1=new_kf, key2=best, relative_pose=best_rel)
        self.loop_manager.add_loop(loop)
        return loop

    # ------------------------------------------------------------------
    def _consistency_check(self, new_kf: KeyFrame, best: KeyFrame,
                           rel_new_best: np.ndarray,
                           db: GraphDatabase) -> bool:
        """loop_detector.cpp:216-303: compose the loop with the candidate's
        odometry edge to its prev (or next) neighbor; the cycle must close
        to identity within max_delta_trans / max_delta_angle."""
        checks = []
        if best.prev_edge is not None:
            prev_kf = db.uuid_keyframe_map.get(best.prev_edge.to_uuid)
            if prev_kf is not None and prev_kf.node_id is not None:
                # prev_edge: from=best, to=prev; meas = T_best_prev
                checks.append((prev_kf, best.prev_edge.relative_pose, "prev"))
        if best.next_edge is not None:
            next_kf = db.uuid_keyframe_map.get(best.next_edge.from_uuid)
            if next_kf is not None and next_kf.node_id is not None:
                # next_edge: from=next, to=best; meas = T_next_best
                checks.append((next_kf, best.next_edge.relative_pose, "next"))
        if not checks:
            return False
        new_est = jnp.asarray(new_kf.estimate(db.graph))
        for nb_kf, odom_rel, kind in checks:
            guess = se3.pose_between(new_est,
                                     jnp.asarray(nb_kf.estimate(db.graph)))
            if self.cfg.use_planar_registration_guess:
                guess = guess.at[2].set(0.0)
            res = reg.align_clouds(self.reg_cfg, nb_kf.cloud, new_kf.cloud,
                                   guess)
            rel_new_nb = res.pose  # T_new_neighbor
            if kind == "prev":
                # T_new_prev^-1 * T_new_best * T_best_prev ≈ I
                cyc = se3.pose_compose(
                    se3.pose_compose(se3.pose_inverse(rel_new_nb),
                                     jnp.asarray(rel_new_best)),
                    jnp.asarray(odom_rel))
            else:
                # T_new_best^-1 * T_new_next * T_next_best ≈ I
                cyc = se3.pose_compose(
                    se3.pose_compose(
                        se3.pose_inverse(jnp.asarray(rel_new_best)),
                        rel_new_nb),
                    jnp.asarray(odom_rel))
            dt = float(np.linalg.norm(np.asarray(cyc)[:3]))
            da = float(se3.rotation_angle(cyc[3:7]))
            if (dt <= self.cfg.loop_closure_consistency_max_delta_trans
                    and da <= self.cfg.loop_closure_consistency_max_delta_angle):
                return True
        return False


@jax.jit
def _batched_fitness(target: PointCloud, sources: PointCloud, poses, max_range):
    return jax.vmap(fitness_score, in_axes=(None, 0, 0, None))(
        target, sources, poses, max_range)


def _batched_match(reg_cfg: RegistrationConfig, target_cloud: PointCloud,
                   cand_clouds: PointCloud, guesses: jnp.ndarray,
                   fitness_max_range: float):
    """One vmapped GICP program over the padded candidate batch."""
    target = reg.make_target(target_cloud, reg_cfg)
    sources = jax.vmap(lambda p, m: reg.make_source(PointCloud(p, m), reg_cfg)
                       )(cand_clouds.points, cand_clouds.mask)
    results = jax.vmap(reg.align, in_axes=(None, 0, None, 0))(
        reg_cfg, sources, target, guesses)
    max_r = (jnp.inf if fitness_max_range is None
             else jnp.float32(fitness_max_range))
    fits = _batched_fitness(target_cloud, cand_clouds, results.pose, max_r)
    return fits, results.pose, results.converged | (results.iterations > 0)
