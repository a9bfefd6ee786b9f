"""Explicit-SPMD (shard_map) multichip path for the multistage solver.

The jit+GSPMD path (parallel/sharding.py) lets the compiler place
collectives; the round-4 HLO audit (tests/test_hlo_audit.py) measured it
moving ~6.4 MB per Newton iteration on the headline tree — chain-shaped
gathers and full-width reduction workspaces, ~85x the algorithm's minimal
boundary traffic. This module is the design answer: run the SAME solver
body under ``jax.shard_map`` with the chains sharded over the mesh axis
and the crown replicated, so the only cross-device traffic is the
explicit ``psum``s the solver inserts itself (TdunesOpts.axis_name):

* chain-root contributions into the crown gradients   [Ncrown, nz]
* chain Schur complements into the crown Hessian/RHS  [NpG, G, G]-sparse
* termination / dual-value / line-search scalars

— the quantities the communication model counts
(benchmarks/scaling_analysis.py). Reference analog: the OpenMP scenario
fork-join with shared-memory coupling, dual_Newton_scenarios.c:528-563.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from treeqp_tpu.solvers.tdunes import TdunesOpts
from treeqp_tpu.solvers.tdunes_multistage import (
    MultistageQP, tdunes_ms_solve)

__all__ = ["tdunes_ms_solve_shmap"]


def _ms_specs(ms: MultistageQP):
    """PartitionSpecs: chain arrays sharded over "scen" dim 0, crown +
    static replicated."""
    def spec(path, x):
        name = path[0].name if path else ""
        if name == "crown":
            return P()
        return P("scen")
    return jax.tree_util.tree_map_with_path(spec, ms)


def tdunes_ms_solve_shmap(ms: MultistageQP, lam0_crown, lam0_chain,
                          opts: TdunesOpts, mesh: Mesh):
    """tdunes_ms_solve under shard_map over mesh axis "scen".

    ``ms`` holds GLOBAL arrays (sharded or not — shard_map partitions by
    spec); returns global outputs with chain parts sharded. The solver
    runs with opts.axis_name="scen": every cross-device byte is an
    explicit psum/pmax. The mega-kernel / fused-system / df64 paths are
    per-device-global and bypassed under an axis (xla backend applies).
    """
    opts = dataclasses.replace(opts, axis_name="scen")
    meta = ms.meta
    if lam0_crown is None:
        lam0_crown = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm),
                               ms.q.dtype)
    if lam0_chain is None:
        lam0_chain = jnp.zeros_like(ms.q)

    in_specs = (_ms_specs(ms), P(), P("scen"))
    out_specs = (
        # crown outputs replicated; chain outputs sharded over scenarios
        jax.tree_util.tree_map(lambda _: P(), dict(
            x=0, u=0, lam=0, mu_x=0, mu_u=0)),
        jax.tree_util.tree_map(lambda _: P("scen"), dict(
            x=0, u=0, lam=0, mu_x=0, mu_u=0)),
        jax.tree_util.tree_map(lambda _: P(), dict(
            iter=0, status=0, error=0, ls_iter=0, iter_f32=0)),
    )

    def body(ms_l, lam0c, lam0h):
        return tdunes_ms_solve(ms_l, lam0c, lam0h, opts)

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(ms, lam0_crown, lam0_chain)
