"""Diagnostic: the exact headline-bench chain with TdunesOpts overrides.

Usage: TREEQP_PROF_OPTS='{"refine_steps":0}' python scripts/prof_chain.py
Prints one JSON line with cold/warm iter/s, per-solve iteration stats and
TOTAL line-search iteration counts (the piece bench.py does not report).
Each run must be its own process (axon: one big program per process).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import bench


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve

    qp, ms = bench.build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    opts = bench.bench_opts(jax.default_backend() in ("tpu", "axon"))
    overrides = json.loads(os.environ.get("TREEQP_PROF_OPTS", "{}"))
    if overrides:
        opts = dataclasses.replace(opts, **overrides)

    meta = ms.meta
    lam0c = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm), ms.q.dtype)
    lam0h = jnp.zeros_like(ms.q)
    CHAIN_R = bench.CHAIN_R

    @jax.jit
    def run_chain(warm, seed):
        def body(carry, k):
            lc_prev, lh_prev = carry
            ms_k = bench.perturb_ms(ms, bench.perturb_factor(k, seed))
            cro, cho, inf = tdunes_ms_solve(ms_k, lc_prev * warm,
                                            lh_prev * warm, opts)
            return (cro["lam"], cho["lam"]), \
                (inf["iter"], inf["error"], inf["status"], inf["ls_iter"])
        _, outs = jax.lax.scan(body, (lam0c, lam0h),
                               jnp.arange(CHAIN_R, dtype=ms.q.dtype))
        return outs

    def timed_mode(warm):
        out = jax.block_until_ready(run_chain(np.float64(warm), np.float64(0)))
        times = []
        for k in range(bench.NREP):
            t0 = time.perf_counter()
            out = jax.block_until_ready(
                run_chain(np.float64(warm), np.float64(k + 1)))
            times.append(time.perf_counter() - t0)
        iters, errs, stats, ls = (np.asarray(v) for v in out)
        t = min(times)
        return dict(iters_per_sec=round(float(iters.sum()) / t, 1),
                    solves_per_sec=round(CHAIN_R / t, 2),
                    iters_mean=round(float(iters.mean()), 2),
                    ls_last_mean=round(float(ls.mean()), 2),
                    n_bad=int(np.sum(stats != 0)),
                    max_error=float(errs.max()))

    res = dict(overrides=overrides, device=str(dev),
               cold=timed_mode(0.0), warm=timed_mode(1.0))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
