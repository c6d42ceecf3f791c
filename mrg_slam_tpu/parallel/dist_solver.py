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

import dataclasses
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
                         mesh: Mesh, aux=None) -> solve.OptimizeResult:
    """Distributed LM: identical semantics to graph.solve.optimize, with
    every reduction psum'd over the edge-shard axis. `cfg.solver_backend`
    picks the step solver: "cg" is fully matrix-free (memory O(D));
    "dense" assembles the Hessian from the edge shards via one psum and
    factorizes replicated — exact steps for graphs whose (6N+3P)^2 fits a
    chip (~2k nodes at f32); "chain" (the large-graph exact path, and the
    "auto" route past the dense envelope) shards the segmented
    block-tridiagonal factorization's panels over the mesh with a psum'd
    Schur complement onto a replicated reduced separator system.

    Like the single-device path, only program structure (is_lm, the mesh) is
    jit-static; iteration caps and tolerances ride as traced scalars so
    retuning never recompiles the SPMD program.
    """
    backend = solve.resolve_backend(cfg.solver_backend, g.poses.shape[0],
                                    g.planes.shape[0],
                                    cfg.auto_dense_max_dofs)
    if backend == "chain":
        # past the dense envelope `auto` routes to the distributed chain
        # factorization (segment panels sharded over the mesh, psum'd
        # Schur complement onto the replicated reduced separator system)
        # — the multi-device cholmod replacement. Graph inputs replicate.
        if aux is None:
            aux = solve.chain_aux_for(g)
        (_, is_lm, _), dyn = solve.split_optimizer(
            dataclasses.replace(cfg, solver_backend="cg"))
        K = _chain_K_dist(g.poses.shape[0], mesh.shape[AXIS])
        return _optimize_distributed_chain(is_lm, K, mesh, dyn, g, aux)
    (backend, is_lm, _), dyn = solve.split_optimizer(
        dataclasses.replace(cfg, solver_backend=backend))
    return _optimize_distributed_split(is_lm, backend, mesh, dyn, g)


def _chain_K_dist(n: int, n_dev: int) -> int:
    """Segment length for the distributed chain: like solve._chain_K but
    the segment count must also divide evenly across the mesh."""
    k = solve._chain_K(n)
    while k > 2 and (n // k) % n_dev:
        k //= 2
    assert (n // k) % n_dev == 0, (
        f"node capacity {n} cannot split {n // k} segments over "
        f"{n_dev} devices — use a power-of-two capacity")
    return k


@functools.partial(jax.jit, static_argnames=("is_lm", "K", "mesh"))
def _optimize_distributed_chain(is_lm, K: int, mesh: Mesh, dyn,
                                g: PoseGraphData,
                                aux) -> solve.OptimizeResult:
    """Distributed chain backend: graph REPLICATED over the mesh (no edge
    sharding — the O(E) linearization is cheap past the dense envelope),
    factorization segment panels sharded (chain_solver._factor_T)."""
    n_dev = mesh.shape[AXIS]
    rep = jax.tree.map(lambda _: P(), g)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rep, jax.tree.map(lambda _: P(), dyn),
                  jax.tree.map(lambda _: P(), aux)),
        out_specs=jax.tree.map(lambda _: P(), solve.OptimizeResult(
            *[0] * len(solve.OptimizeResult._fields))),
        check_vma=False)
    def run(g_rep: PoseGraphData, dyn, aux) -> solve.OptimizeResult:
        return solve._optimize_body(("chain", is_lm, K), dyn, g_rep,
                                    aux=aux, chain_axis=AXIS,
                                    chain_shards=n_dev)

    with jax.default_matmul_precision("highest"):
        return run(g, dyn, aux)


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
        # The single-device LM body, run SPMD: every reduction inside
        # (chi2, gradient, diag blocks, dense assembly, Hv) psums over the
        # edge axis, and all control-flow state (Nielsen gain-ratio lambda
        # schedule, Eisenstat-Walker CG forcing, accept/reject, early stop)
        # is replicated — numerics identical to graph.solve.optimize.
        # For "dense": the scaling-book split — O(E) linearization +
        # assembly on the edge shards, ONE psum replicates the (D,D)
        # Hessian, equilibrated Cholesky runs replicated on every device.
        return solve._optimize_body((backend, is_lm, 0), dyn, g_local,
                                    axis_name=AXIS)

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
