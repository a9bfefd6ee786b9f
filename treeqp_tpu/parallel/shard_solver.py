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

__all__ = ["tdunes_ms_solve_shmap", "ipm_ms_solve_shmap",
           "sdunes_solve_shmap"]


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


def ipm_ms_solve_shmap(ms: MultistageQP, opts, mesh: Mesh, ws=None):
    """ipm_ms_solve under shard_map over mesh axis "scen" (round 5).

    Chains sharded over scenarios, crown replicated; all cross-device
    traffic is the explicit all-gathers of the chain-root Riccati
    contributions (W0 [S, nz, nz] per factorization, w0 [S, nz] per
    solve) plus scalar reductions — the minimal boundary bytes of the
    scenario decomposition (ipm_multistage._IpmShard). Reference analog:
    the HPMPC capability class (hpmpc_tree.c:395-398) with
    dual_Newton_scenarios.c:528-563's scenario fork-join."""
    import dataclasses as _dc

    from treeqp_tpu.solvers.ipm_multistage import ipm_ms_solve

    opts = _dc.replace(opts, axis_name="scen")
    in_specs = (_ms_specs(ms),)
    crown_spec = jax.tree_util.tree_map(lambda _: P(), dict(
        x=0, u=0, lam=0, mu_x=0, mu_u=0))
    chain_spec = jax.tree_util.tree_map(lambda _: P("scen"), dict(
        x=0, u=0, lam=0, mu_x=0, mu_u=0))
    if ms.C is not None:
        crown_spec["mu_d"] = P()
        chain_spec["mu_d"] = P("scen")
    out_specs = (crown_spec, chain_spec,
                 jax.tree_util.tree_map(lambda _: P(), dict(
                     iter=0, status=0, res4=0)))

    def body(ms_l):
        return ipm_ms_solve(ms_l, opts, ws=ws)

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(ms)


def sdunes_solve_shmap(sqp, lam0, mu0, opts, mesh: Mesh):
    """sdunes_solve under shard_map over mesh axis "scen" (round 5).

    Scenario arrays (mu, trajectories, banded systems) sharded; the
    non-anticipativity multipliers lambda and the block-tridiagonal Jay
    system replicated (tiny). Cross-device traffic: all-gathers of the
    Jay boundary blocks (Gram [Ns, nl, nl] per factorization; Kv / u /
    rt coupling rows per solve) + scalar reductions — the reference's
    OpenMP scenario fork-join (dual_Newton_scenarios.c:332-345, :528-563)
    made explicit."""
    import dataclasses as _dc

    from treeqp_tpu.solvers.sdunes import sdunes_solve

    opts = _dc.replace(opts, axis_name="scen")
    meta = sqp.meta
    dt = sqp.b.dtype
    if mu0 is None:
        mu0 = jnp.zeros((meta.Ns, meta.Nh, sqp.b.shape[-1]), dt)
    if lam0 is None:
        lam0 = jnp.zeros((max(meta.Ns - 1, 1), meta.Nr, sqp.r.shape[-1]), dt)
    sqp_specs = jax.tree_util.tree_map(lambda _: P("scen"), sqp)
    in_specs = (sqp_specs, P(), P("scen"))
    sol_spec = jax.tree_util.tree_map(lambda _: P("scen"), dict(
        qmod=0, rmod=0, x=0, u=0, xUnc=0, uUnc=0, qt=0, rt=0))
    out_specs = (sol_spec, P(), P("scen"),
                 jax.tree_util.tree_map(lambda _: P(), dict(
                     iter=0, status=0, error=0, ls_iter=0)))

    def body(sqp_l, lam0_l, mu0_l):
        return sdunes_solve(sqp_l, lam0_l, mu0_l, opts)

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(sqp, lam0, mu0)
