"""Per-operation profiling (reference PROFILE=3, profiling.h:38-68).

The reference tic/tocs inside the solve loop (stage QPs / dual build /
Newton direction / line search, dual_Newton_tree.c:1168-1227). Under jit
the whole solve is one fused program, so per-op host timers are
meaningless; instead ``profile_tdunes_ops`` times each phase as its own
jitted program on representative iterates — the per-op split at the same
granularity, measured honestly on the target backend.

PROFILE level map:
  1 — total time: utils.timing.min_time_over
  2 — per-iteration stats: TdunesOpts(record_history=True)
  3 — per-op split: profile_tdunes_ops below
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from treeqp_tpu.solvers import tdunes as td

__all__ = ["profile_tdunes_ops"]


def _time(f, *a, nrep=5):
    fj = jax.jit(f)
    jax.block_until_ready(fj(*a))
    ts = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        jax.block_until_ready(fj(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def profile_tdunes_ops(qp, opts=None, lam=None, nrep=5) -> dict:
    """Per-op times (seconds) for one dual-Newton iteration's phases:
    stage_qps / dual_build / newton_direction / line_search_eval.

    Mirrors treeqp_profiling_t's PROFILE=3 quantities
    (profiling.h:56-66)."""
    opts = opts or td.TdunesOpts()
    prep = td._get_prep(qp.topo)
    dt = qp.dtype
    if lam is None:
        lam = jnp.zeros((qp.topo.Nn, qp.topo.nxm), dt)
    data = td._stage_data(qp, opts)

    out = {}
    out["stage_qps"] = _time(
        lambda l: td._stage_solve(qp, l, data, opts, prep)["x"], lam, nrep=nrep)

    sol = td._stage_solve(qp, lam, data, opts, prep)

    def dual_build(l):
        s = td._stage_solve(qp, l, data, opts, prep)
        res = td._dual_residual(qp, s, prep)
        W, Ut = td._build_dual_hessian(qp, s, data, opts, prep)
        return W, res

    t_build_tot = _time(lambda l: dual_build(l)[0], lam, nrep=nrep)
    out["dual_build"] = max(t_build_tot - out["stage_qps"], 0.0)

    res = td._dual_residual(qp, sol, prep)
    W, Ut = td._build_dual_hessian(qp, sol, data, opts, prep)
    rg = td._nodes_to_group(res, prep)
    out["newton_direction"] = _time(
        lambda W, Ut, rg: td._newton_direction(W, Ut, rg, opts, prep),
        W, Ut, rg, nrep=nrep)

    dlam_g = td._newton_direction(W, Ut, rg, opts, prep)
    dlam = td._group_to_nodes(dlam_g, prep, dt)

    def ls_eval(l, d):
        lt = l + 0.5 * d
        s = td._stage_solve(qp, lt, data, opts, prep)
        return td._dual_value(qp, lt, s, data, opts)

    out["line_search_eval"] = _time(ls_eval, lam, dlam, nrep=nrep)
    out["iteration_estimate"] = (out["stage_qps"] + out["dual_build"]
                                 + out["newton_direction"]
                                 + 2 * out["line_search_eval"])
    return out
