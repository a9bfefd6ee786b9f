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

Axon-backend constraint: the remote-TPU session reliably supports ONE large
compiled program per process — loading a second big executable makes every
subsequent RPC fail with INVALID_ARGUMENT (measured; small programs are
unaffected). So the correctness check (cold solve + KKT oracle) runs in a
child process, and the timing program is the only big program the parent
ever compiles. Post-compile interactions are calls of that one executable
with plain-scalar arguments (fresh eager dispatches also break the session).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured single-core treeQP+BLASFEO dual-Newton iteration rate on the
# 256-scenario quadcopter-class tree: 189 it/s measured by the plain-C
# kernel-sequence replica (benchmarks/c_baseline/, best of 6 runs) times a
# reference-favorable 2.1x BLASFEO-headroom factor. See BENCH_NOTES.md.
BASELINE_ITERS_PER_SEC = 400.0

# quadcopter-class workload (BASELINE.md north star): 256 scenarios
MD, NR, NH, NM = 4, 4, 20, 4  # md^Nr = 256 scenarios, nx = 8, Nh = 20
NREP = 5
# solves chained inside one jit per timed dispatch (env-overridable for
# protocol experiments)
CHAIN_R = int(os.environ.get("TREEQP_BENCH_CHAIN", "96"))


def build_problem():
    """Build on CPU (eager ops are RPCs on the remote-TPU backend)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        from treeqp_tpu.solvers.tdunes_multistage import split_multistage

        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        ms = split_multistage(qp)
    return qp, ms


def bench_opts(on_tpu):
    from treeqp_tpu.solvers.tdunes import TdunesOpts

    # protocol-experiment overrides (documented in BENCH_NOTES.md)
    refine = int(os.environ.get("TREEQP_BENCH_REFINE", "1"))
    ptol = float(os.environ.get("TREEQP_BENCH_PTOL", "1e-4"))

    return TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=120,
                      # TPU speed path: f32 factorization + pallas chain
                      # kernels + 1 refinement -> f64 accuracy. Single
                      # always-on LM shift (meaningful vs the equilibrated
                      # unit diagonal) instead of the 4-attempt on-the-fly
                      # cascade: ~25% faster, robust at 1e-6.
                      factor_dtype="float32" if on_tpu else "same",
                      refine_steps=refine if on_tpu else 0,
                      # unsafeguarded refinement: 1 solve + 1 M-apply per
                      # direction (the safeguard's residual-norm compare
                      # costs an extra apply; equilibration makes the
                      # correction reliably contractive — BENCH_NOTES.md)
                      refine_safeguard=False,
                      chain_backend="pallas" if on_tpu else "xla",
                      reg_type="always" if on_tpu else "on_the_fly",
                      reg_value=1e-6,
                      # two-phase precision: coarse f32 iterations to 1e-4,
                      # then high-precision + refinement to 1e-8 (emulated
                      # f64 is the dominant per-op cost; the final phase
                      # needs ~2 iters)
                      f32_phase_tol=ptol if on_tpu else 0.0,
                      # run that final phase in df64 (two-f32 double-float)
                      # arithmetic instead of XLA-emulated f64: same Newton
                      # semantics at f32 op cost (solvers/ms_df64.py)
                      df64_phase=on_tpu)


def check_main():
    """Correctness check (child process): cold solve + KKT oracle, one
    fused jit program. Prints one JSON line."""
    import jax

    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve, merge_output
    from treeqp_tpu.core.kkt import max_kkt_residual

    qp, ms = build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    qp_dev = jax.device_put(qp, dev)
    opts = bench_opts(jax.default_backend() in ("tpu", "axon"))

    @jax.jit
    def check():
        cro, cho, info = tdunes_ms_solve(ms, None, None, opts)
        out = merge_output(ms, cro, cho, info)
        return max_kkt_residual(qp_dev, out), info["iter"], info["status"]

    kkt, n_iter, status = jax.block_until_ready(check())
    print(json.dumps({"kkt": float(kkt), "newton_iters": int(n_iter),
                      "status": int(status)}))


def main():
    # 1. correctness in a child process (its big program dies with it);
    # one retry — the remote tunnel's compile latency is wildly variable
    # and occasionally drops a session (BENCH_NOTES.md)
    env = dict(os.environ, TREEQP_BENCH_MODE="check")
    check = None
    for attempt in range(2):
        try:
            chk = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 timeout=1500)
        except subprocess.TimeoutExpired:
            continue
        for line in chk.stdout.splitlines():
            try:
                check = json.loads(line)
            except json.JSONDecodeError:
                continue
        if check is not None:
            break
        sys.stderr.write(chk.stdout + chk.stderr)
    if check is None:
        raise RuntimeError("correctness-check subprocess produced no JSON")

    # 2. timing in this process: ONE compiled program, called repeatedly
    import jax
    import jax.numpy as jnp
    import numpy as np

    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve

    qp, ms = build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    opts = bench_opts(jax.default_backend() in ("tpu", "axon"))

    # Timing: chain CHAIN_R solves inside ONE jit so (a) the ~40 ms
    # dispatch overhead of the remote backend (a tunnel property, not a
    # solver property) is amortized, and (b) each solve's warm start
    # depends on the previous solve's result, which serializes the chain
    # and defeats any result caching. The per-rep inputs also vary
    # (BENCH_NOTES.md protocol), via the scalar `seed` jit argument.
    meta = ms.meta
    lam0c = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm), ms.q.dtype)
    lam0h = jnp.zeros_like(ms.q)

    @jax.jit
    def run_chain(lam0c, lam0h, seed):
        def body(carry, k):
            lc, tot = carry
            _, _, inf = tdunes_ms_solve(ms, lc, lam0h, opts)
            eps = (inf["error"] * 0.0 + 1.0) * 1e-13 * (k + 1) + seed * 1e-15
            return (lam0c + eps, tot + inf["iter"]), inf["iter"]
        (_, tot), iters = jax.lax.scan(
            body, (lam0c + seed * 1e-15, jnp.zeros((), jnp.int32)),
            jnp.arange(CHAIN_R))
        return tot, iters

    tot, iters = jax.block_until_ready(run_chain(lam0c, lam0h, np.float64(0)))
    times = []
    for k in range(NREP):
        t0 = time.perf_counter()
        tot, iters = jax.block_until_ready(
            run_chain(lam0c, lam0h, np.float64(k + 1)))
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
            "newton_iters": check["newton_iters"],
            "status": check["status"],
            "kkt_residual": check["kkt"],
            "solve_time_s": round(t / CHAIN_R, 4),
            "chained_solves": CHAIN_R,
            "chained_iters": total_iters,
            "nrep": NREP,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("TREEQP_BENCH_MODE") == "check":
        check_main()
    else:
        main()
