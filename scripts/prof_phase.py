"""Phase-split measurement for the headline cold chain.

Variants (TREEQP_PROF_VARIANT):
  full    — the bench configuration (coarse f32 phase + df64 phase)
  coarse  — tol clamped to the phase boundary (1e-4): coarse phase only
  ptolX   — full solve with f32_phase_tol = X (operating-point sweep)

Each variant runs in its own process (axon: one big program per process).
Prints per-solve iter / iter_f32 and the chain timing, cold mode only.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

CHAIN_R = int(os.environ.get("TREEQP_BENCH_CHAIN", "96"))
NREP = 3


def main():
    variant = os.environ.get("TREEQP_PROF_VARIANT", "full")
    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve
    import dataclasses

    qp, ms = bench.build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    opts = bench.bench_opts(jax.default_backend() in ("tpu", "axon"))
    if variant == "coarse":
        opts = dataclasses.replace(opts, tol=1e-4)
    elif variant == "fixed":
        # tol so large both phase loops exit after their initial
        # evaluation: measures the per-solve FIXED skeleton (phase setup,
        # data prep, handover, export)
        opts = dataclasses.replace(opts, tol=1e30, f32_phase_tol=1e30)
    elif variant == "nodf":
        # f32 phase only (no df64 phase): fixed + f32 iterations
        opts = dataclasses.replace(opts, df64_phase=False, tol=1e-4,
                                   f32_phase_tol=0.0,
                                   factor_dtype="float32")
    elif variant.startswith("ptol"):
        opts = dataclasses.replace(opts, f32_phase_tol=float(variant[4:]))

    meta = ms.meta
    lam0c = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm), ms.q.dtype)
    lam0h = jnp.zeros_like(ms.q)

    @jax.jit
    def run_chain(seed):
        def body(carry, k):
            ms_k = bench.perturb_ms(ms, bench.perturb_factor(k, seed))
            cro, cho, inf = tdunes_ms_solve(ms_k, lam0c, lam0h, opts)
            return 0.0, (inf["iter"], inf["iter_f32"], inf["error"],
                         inf["status"])
        _, (iters, it32, errs, stats) = jax.lax.scan(
            body, 0.0, jnp.arange(CHAIN_R, dtype=ms.q.dtype))
        return iters, it32, errs, stats

    out = jax.block_until_ready(run_chain(np.float64(0)))
    times = []
    for k in range(NREP):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run_chain(np.float64(k + 1)))
        times.append(time.perf_counter() - t0)
    iters, it32, errs, stats = (np.asarray(v) for v in out)
    t = min(times)
    print(json.dumps(dict(
        variant=variant, chain=CHAIN_R, time_s=round(t, 4),
        ms_per_solve=round(t / CHAIN_R * 1e3, 3),
        iters_mean=round(float(iters.mean()), 2),
        iter_f32_mean=round(float(it32.mean()), 2),
        iters_per_sec=round(float(iters.sum()) / t, 1),
        max_err=float(errs.max()), all_optimal=bool((stats == 0).all()))))


if __name__ == "__main__":
    main()
