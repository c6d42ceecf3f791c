"""Distributed pose-graph optimization over a device mesh.

The multi-host analog of the reference's single-process g2o solve: the edge
tables shard across the mesh's `edges` axis (the graph's natural data axis
— each "robot"/host contributes its own keyframe chains and loop edges),
node state replicates, and every Gauss-Newton reduction (gradient, Hessian
block diagonal, matrix-free H@v inside PCG) becomes one `psum` riding the
ICI. The LM outer loop runs replicated SPMD — identical control flow on
every device, so `lax.while_loop` + collectives compose.

Usage:
    mesh = make_mesh(n_devices)
    res  = optimize_distributed(graph_data, cfg, mesh)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimizerConfig
from ..graph import solve
from ..graph.types import PoseGraphData

AXIS = "edges"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def _edge_sharded_specs(mesh: Mesh) -> PoseGraphData:
    """in_specs pytree: edge tables sharded on dim 0, node state replicated."""
    rep = P()
    shard = P(AXIS)

    def table_spec(t):
        return type(t)(*[shard for _ in t])

    g = PoseGraphData.empty(1, 1)
    return PoseGraphData(
        poses=rep, node_mask=rep, node_fixed=rep,
        planes=rep, plane_mask=rep, plane_fixed=rep,
        se3=table_spec(g.se3), priors=table_spec(g.priors),
        plane_edges=table_spec(g.plane_edges),
        plane_priors=table_spec(g.plane_priors),
        plane_plane=table_spec(g.plane_plane))


def pad_edges_to(g: PoseGraphData, multiple: int) -> PoseGraphData:
    """Pad each edge table's capacity to a multiple of the mesh size."""
    def pad_table(t):
        cap = t.mask.shape[0]
        newcap = ((cap + multiple - 1) // multiple) * multiple
        if newcap == cap:
            return t
        extra = newcap - cap

        def padfield(x):
            pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)

        return type(t)(*[padfield(f) for f in t])

    return g._replace(se3=pad_table(g.se3), priors=pad_table(g.priors),
                      plane_edges=pad_table(g.plane_edges),
                      plane_priors=pad_table(g.plane_priors),
                      plane_plane=pad_table(g.plane_plane))


def optimize_distributed(g: PoseGraphData, cfg: OptimizerConfig,
                         mesh: Mesh) -> solve.OptimizeResult:
    """Distributed LM: identical semantics to graph.solve.optimize, with
    every reduction psum'd over the edge-shard axis. `cfg.solver_backend`
    picks the step solver: "cg" is fully matrix-free (memory O(D));
    "dense" assembles the Hessian from the edge shards via one psum and
    factorizes replicated — exact steps for graphs whose (6N+3P)^2 fits a
    chip (~2k nodes at f32).

    Like the single-device path, only program structure (is_lm, the mesh) is
    jit-static; iteration caps and tolerances ride as traced scalars so
    retuning never recompiles the SPMD program.
    """
    dyn = dict(max_outer=jnp.int32(cfg.g2o_solver_num_iterations),
               chi2_rel_tol=jnp.float32(cfg.chi2_rel_tol),
               lam0=jnp.float32(cfg.lm_initial_lambda),
               cg_max=jnp.int32(cfg.cg_max_iterations),
               cg_tol=jnp.float32(cfg.cg_tol))
    is_lm = cfg.g2o_solver_type.startswith("lm")
    return _optimize_distributed_split(is_lm, cfg.solver_backend, mesh, dyn,
                                       g)


@functools.partial(jax.jit, static_argnames=("is_lm", "backend", "mesh"))
def _optimize_distributed_split(is_lm, backend, mesh: Mesh, dyn,
                                g: PoseGraphData) -> solve.OptimizeResult:
    n_dev = mesh.shape[AXIS]
    g = pad_edges_to(g, n_dev)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_edge_sharded_specs(mesh),
                  jax.tree.map(lambda _: P(), dyn)),
        out_specs=jax.tree.map(lambda _: P(), solve.OptimizeResult(
            *[0] * len(solve.OptimizeResult._fields))),
        check_vma=False)
    def run(g_local: PoseGraphData, dyn) -> solve.OptimizeResult:
        chi2_0 = solve.chi2_only(g_local, axis_name=AXIS)

        def solve_delta(g_, lam):
            lin = solve.linearize(g_, axis_name=AXIS)
            if backend == "dense":
                # scaling-book split: O(E) linearization + assembly runs
                # on the edge shards, ONE psum replicates the (D,D)
                # Hessian, and the equilibrated Cholesky runs replicated
                # on every device — exact Newton steps (no block-Jacobi CG
                # diffusion limit across long graph diameters) for graphs
                # whose dense Hessian fits a chip
                H, b, free = solve.assemble_dense(g_, lin, axis_name=AXIS)
                x, _, _ = solve.dense_delta(H, b, free, lam)
                n = g_.poses.shape[0]
                dx_n = x[: 6 * n].reshape(n, 6)
                dx_p = x[6 * n:].reshape(-1, 3)
                return dx_n, dx_p
            D_n, D_p = solve.block_diagonal(g_, lin, axis_name=AXIS)
            d_n = jnp.diagonal(D_n, axis1=-2, axis2=-1)
            d_p = jnp.diagonal(D_p, axis1=-2, axis2=-1)
            g_n, g_p = solve.gradient(g_, lin, axis_name=AXIS)
            fn, fp = solve._free_masks(g_)
            eye6 = jnp.eye(6, dtype=jnp.float32)
            eye3 = jnp.eye(3, dtype=jnp.float32)
            damped_n = (D_n + (lam * d_n[..., None] + 1e-6) * eye6
                        + (1 - fn[..., None]) * eye6)
            damped_p = (D_p + (lam * d_p[..., None] + 1e-6) * eye3
                        + (1 - fp[..., None]) * eye3)
            M_n = solve._inv_sym(damped_n)
            M_p = solve._inv_sym(damped_p)
            hvp = solve.make_hvp(g_, lin, axis_name=AXIS)
            dx_n, dx_p = solve.pcg_solve(hvp, -g_n, -g_p, M_n, M_p, lam,
                                         d_n, d_p, dyn["cg_max"],
                                         dyn["cg_tol"])
            return dx_n, dx_p

        def cond(s):
            _, lam, chi2, it, done = s
            return (it < dyn["max_outer"]) & ~done

        def body(s):
            g_, lam, chi2, it, done = s
            dx_n, dx_p = solve_delta(g_, lam)
            g_new = solve._retract_all(g_, dx_n, dx_p)
            chi2_new = solve.chi2_only(g_new, axis_name=AXIS)
            accept = chi2_new <= chi2
            if is_lm:
                lam_next = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-12),
                                     jnp.minimum(lam * 4.0, 1e10))
            else:
                lam_next = lam
            g_out = g_._replace(
                poses=jnp.where(accept, g_new.poses, g_.poses),
                planes=jnp.where(accept, g_new.planes, g_.planes))
            rel = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
            done_now = ((accept & (rel < dyn["chi2_rel_tol"]))
                        | (lam_next > 1e8))
            return (g_out, lam_next, jnp.where(accept, chi2_new, chi2),
                    it + 1, done_now)

        lam0 = jnp.where(is_lm, dyn["lam0"], jnp.float32(1e-9))
        state = (g_local, lam0, chi2_0, jnp.int32(0), jnp.bool_(False))
        g_fin, lam_fin, chi2_fin, iters, _ = jax.lax.while_loop(
            cond, body, state)
        return solve.OptimizeResult(
            poses=g_fin.poses, planes=g_fin.planes, chi2_initial=chi2_0,
            chi2_final=chi2_fin, iterations=iters, lambda_final=lam_fin)

    # same bf16-matmul hazard as the single-device solver (graph/solve.py):
    # the einsum reductions and block inverses must run f32-highest on TPU
    with jax.default_matmul_precision("highest"):
        return run(g, dyn)


def shard_graph_inputs(g: PoseGraphData, mesh: Mesh) -> PoseGraphData:
    """Device_put the graph with edge tables sharded over the mesh
    (node arrays replicated) so optimize_distributed consumes pre-placed
    shards without a host round trip."""
    g = pad_edges_to(g, mesh.shape[AXIS])
    specs = _edge_sharded_specs(mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), g, specs)
