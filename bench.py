"""Headline benchmark: dual-Newton iterations/s on a quadcopter-class
scenario-tree QP (256 scenarios), solved to 1e-8 KKT.

Protocol mirrors the reference (min wall-time over NREP repeats,
Makefile.rule:78-79 / treeqp_main.m:29). Prints ONE JSON line.

Chain protocol (round 3, hardened): CHAIN_R solves are chained inside one
jit per timed dispatch to amortize the ~40 ms remote-tunnel dispatch
overhead (a harness property, not a solver property). Each chained solve
gets a DIFFERENT problem instance — the pinned initial state x0 is scaled
by a per-solve factor derived from the solve index and a per-rep seed
argument (the closed-loop MPC variation, treeqp_main.m:266-268) — so no
factorization or solve is loop-invariant and XLA cannot hoist or cache
any per-solve work. Two modes of the same compiled executable (scalar
`warm` argument):

* cold (headline): every solve starts from the exact-zero dual point —
  the same start the out-of-chain certified solve uses;
* warm (secondary): each solve starts from the previous solve's final
  multipliers — the MPC deployment pattern (treeqp_solve.m:6-8).

Per-solve (iter, error, status) are recorded inside the chain and asserted
on the host: every chained solve must report status OPTIMAL with
stationarity error < tol. The full KKT oracle certification runs in the
child process on the base instance AND on a perturbed chain instance.

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

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured single-core treeQP+BLASFEO dual-Newton iteration rates on the
# 256-scenario trees, by the plain-C kernel-sequence replica
# (benchmarks/c_baseline/, best of 6 runs) times a reference-favorable
# 2.1x BLASFEO-headroom factor. See BENCH_NOTES.md ("Baseline
# measurement") for the sensitivity of vs_baseline to that factor.
#   quadcopter (nx=6, nu=4): 264.1 it/s replica (make run_quad) -> 554.6
#   spring-mass proxy (nx=8, nu=1): 189.2 it/s replica -> 400.0
_BASELINES = {"quadcopter": 554.6, "spring_mass": 400.0}

# workload: the TRUE quadcopter (nx=6, nu=4 — BASELINE.md north star) is
# the round-5 headline; the round-1..4 spring-mass proxy stays selectable
# for cross-round comparability (TREEQP_BENCH_WORKLOAD=spring_mass)
WORKLOAD = os.environ.get("TREEQP_BENCH_WORKLOAD", "quadcopter")
BASELINE_ITERS_PER_SEC = _BASELINES[WORKLOAD]

# 256-scenario robust-MPC tree (BASELINE.md north star)
MD, NR, NH, NM = 4, 4, 20, 4  # md^Nr = 256 scenarios, Nh = 20
NREP = 5
# solves chained inside one jit per timed dispatch (env-overridable for
# protocol experiments)
CHAIN_R = int(os.environ.get("TREEQP_BENCH_CHAIN", "192"))
TOL = 1e-8
# per-solve multiplicative perturbation amplitude of the dynamics offsets
PERT = 0.02


def build_problem():
    """Build on CPU (eager ops are RPCs on the remote-TPU backend)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from treeqp_tpu.solvers.tdunes_multistage import split_multistage

        if WORKLOAD == "quadcopter":
            from benchmarks.models import quadcopter
            qp = quadcopter(md=MD, Nr=NR, Nh=NH).qp
        else:
            from benchmarks.models import spring_mass_chain
            qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        ms = split_multistage(qp)
    return qp, ms


def perturb_factor(k, seed):
    """Per-solve data scale: 1 + PERT*sin(seed + 1.7(k+1)). Depends on the
    chain index AND the per-rep seed, so no chained instance repeats."""
    import jax.numpy as jnp

    return 1.0 + PERT * jnp.sin(seed + 1.7 * (k + 1.0))


def perturb_ms(ms, fac):
    """Scale the pinned root state x0 (root bound rows) by `fac` — the
    closed-loop MPC variation: every chained solve sees a different
    initial condition (treeqp_main.m:266-268 embeds the new x0 as
    equality bounds each step)."""
    cr = ms.crown
    cr2 = cr.replace(xmin=cr.xmin.at[0].multiply(fac),
                     xmax=cr.xmax.at[0].multiply(fac))
    return dataclasses.replace(ms, crown=cr2)


def perturb_qp(qp, fac):
    """The identical perturbation on the full-tree QP (oracle side)."""
    return qp.replace(xmin=qp.xmin.at[0].multiply(fac),
                      xmax=qp.xmax.at[0].multiply(fac))


def bench_opts(on_tpu):
    from treeqp_tpu.solvers.tdunes import TdunesOpts

    # protocol-experiment overrides (documented in BENCH_NOTES.md).
    # refine_steps=2: one refinement leaves a direction-quality floor just
    # above 1e-8 on ~4% of perturbed instances (seed-3 chain: 2/48 hit
    # max_iter at err 1.2e-8/3.5e-8); the second refinement restores
    # 1e-12-quality convergence in ~12 iters at ~2% per-solve cost.
    refine = int(os.environ.get("TREEQP_BENCH_REFINE", "2"))
    ptol = float(os.environ.get("TREEQP_BENCH_PTOL", "1e-4"))
    patience = int(os.environ.get("TREEQP_BENCH_PATIENCE", "3"))

    return TdunesOpts(stage_solver="clipping", tol=TOL, max_iter=120,
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
                      f32_patience=patience,
                      # run that final phase in df64 (two-f32 double-float)
                      # arithmetic instead of XLA-emulated f64: same Newton
                      # semantics at f32 op cost (solvers/ms_df64.py)
                      df64_phase=on_tpu)


def check_main():
    """Correctness check (child process): cold solve + KKT oracle on the
    base instance AND on a perturbed chain instance, one fused jit
    program. Prints one JSON line."""
    import jax
    import numpy as np

    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve, merge_output
    from treeqp_tpu.core.kkt import max_kkt_residual

    qp, ms = build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    qp_dev = jax.device_put(qp, dev)
    opts = bench_opts(jax.default_backend() in ("tpu", "axon"))

    @jax.jit
    def check(seed):
        cro, cho, info = tdunes_ms_solve(ms, None, None, opts)
        out = merge_output(ms, cro, cho, info)
        kkt0 = max_kkt_residual(qp_dev, out)
        # one perturbed chain instance (k=0), certified by the oracle on
        # the identically-perturbed full-tree QP
        fac = perturb_factor(0.0, seed)
        ms_p = perturb_ms(ms, fac)
        qp_p = perturb_qp(qp_dev, fac)
        cro_p, cho_p, info_p = tdunes_ms_solve(ms_p, None, None, opts)
        out_p = merge_output(ms_p, cro_p, cho_p, info_p)
        kkt_p = max_kkt_residual(qp_p, out_p)
        return (kkt0, info["iter"], info["status"],
                kkt_p, info_p["iter"], info_p["status"])

    kkt, n_iter, status, kkt_p, n_iter_p, status_p = jax.block_until_ready(
        check(np.float64(1.0)))
    print(json.dumps({
        "kkt": float(kkt), "newton_iters": int(n_iter), "status": int(status),
        "kkt_perturbed": float(kkt_p), "newton_iters_perturbed": int(n_iter_p),
        "status_perturbed": int(status_p)}))


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
                                 timeout=1800)
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
    assert check["status"] == 0 and check["kkt"] < TOL, check
    assert check["status_perturbed"] == 0 and check["kkt_perturbed"] < TOL, check

    # 2. timing in this process: ONE compiled program, called repeatedly
    # with plain-scalar (warm, seed) arguments
    import jax
    import jax.numpy as jnp
    import numpy as np

    from treeqp_tpu.solvers.tdunes_multistage import tdunes_ms_solve

    qp, ms = build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    opts = bench_opts(jax.default_backend() in ("tpu", "axon"))

    meta = ms.meta
    lam0c = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm), ms.q.dtype)
    lam0h = jnp.zeros_like(ms.q)

    @jax.jit
    def run_chain(warm, seed):
        """CHAIN_R solves of per-solve-perturbed instances.

        warm = 0.0: every solve from the exact-zero dual start (cold,
        headline). warm = 1.0: each solve warm-started from the previous
        solve's final multipliers (MPC pattern). Returns per-solve
        (iters, errors, statuses)."""
        def body(carry, k):
            lc_prev, lh_prev = carry
            ms_k = perturb_ms(ms, perturb_factor(k, seed))
            cro, cho, inf = tdunes_ms_solve(ms_k, lc_prev * warm,
                                            lh_prev * warm, opts)
            return (cro["lam"], cho["lam"]), \
                (inf["iter"], inf["error"], inf["status"])
        _, (iters, errs, stats) = jax.lax.scan(
            body, (lam0c, lam0h), jnp.arange(CHAIN_R, dtype=ms.q.dtype))
        return iters, errs, stats

    # plausibility floor for one timed chain dispatch: no solver on this
    # hardware completes a CHAIN_R-solve chain in under ~0.03 ms/solve —
    # times below it are the axon executable-dispatch anomaly (the call
    # returns without executing; BENCH_NOTES "round 5: general C/D"),
    # which would otherwise record a nonsense headline
    T_FLOOR = CHAIN_R * 0.03e-3

    def timed_mode(warm):
        # warmup call compiles (first call) / touches the executable
        out = jax.block_until_ready(run_chain(np.float64(warm), np.float64(0)))
        times = []
        anomalies = 0
        k = 0
        while len(times) < NREP:
            k += 1
            t0 = time.perf_counter()
            out = jax.block_until_ready(
                run_chain(np.float64(warm), np.float64(k)))
            t1 = time.perf_counter() - t0
            if t1 < T_FLOOR:
                anomalies += 1
                assert anomalies <= 3 * NREP, \
                    f"persistent dispatch anomaly: {t1 * 1e3:.3f} ms chain"
                continue  # drop the anomalous sample and re-dispatch
            times.append(t1)
        iters, errs, stats = (np.asarray(v) for v in out)
        # per-solve convergence asserts (VERDICT r2: certify the TIMED
        # computation, not just an out-of-chain proxy)
        assert np.all(stats == 0), f"non-optimal chained solves: {stats}"
        assert np.all(errs < TOL), f"chained solve above tol: {errs.max()}"
        t = min(times)
        return dict(time_s=t, iters=iters, errs=errs,
                    solves_per_sec=CHAIN_R / t,
                    iters_per_sec=float(iters.sum()) / t)

    cold = timed_mode(0.0)
    warm = timed_mode(1.0)

    iters_per_sec = cold["iters_per_sec"]
    metric = ("tdunes_iters_per_sec_quadcopter_256scen"
              if WORKLOAD == "quadcopter" else
              "tdunes_iters_per_sec_quadcopter_class_256scen")
    result = {
        "metric": metric,
        "value": round(iters_per_sec, 1),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
        "detail": {
            "workload": WORKLOAD,
            "baseline_iters_per_sec": BASELINE_ITERS_PER_SEC,
            "baseline_note": ("matched-dims single-core C replica of the "
                              "reference per-iteration kernel sequence "
                              "(benchmarks/c_baseline, best of 6) x 2.1 "
                              "BLASFEO headroom"),
            "device": str(dev),
            "scenarios": MD**NR,
            "nodes": qp.topo.Nn,
            "nx": int(qp.topo.nx[0]),
            "nu": int(qp.topo.nu[0]),
            "horizon": NH,
            "protocol": ("cold chain: CHAIN_R per-solve-perturbed instances, "
                         "each from the exact-zero dual start; per-solve "
                         "status/error asserted < tol; KKT oracle certified "
                         "in a child process (base + perturbed instance)"),
            "certified_kkt": check["kkt"],
            "certified_iters": check["newton_iters"],
            "certified_kkt_perturbed": check["kkt_perturbed"],
            "chained_solves": CHAIN_R,
            "nrep": NREP,
            "tol": TOL,
            "cold": {
                "iters_per_sec": round(cold["iters_per_sec"], 1),
                "solves_per_sec": round(cold["solves_per_sec"], 2),
                "solve_time_s": round(cold["time_s"] / CHAIN_R, 5),
                "iters_per_solve_min": int(cold["iters"].min()),
                "iters_per_solve_max": int(cold["iters"].max()),
                "iters_per_solve_mean": round(float(cold["iters"].mean()), 2),
                "max_error": float(cold["errs"].max()),
            },
            "roofline": {
                # per-iteration work measured by XLA cost analysis of the
                # component programs (BENCH_NOTES round 4): the workload
                # is bound by serial sweep structure, not MXU/HBM
                "flops_per_iter_reuse_hit": 4.1e6,
                "flops_per_iter_refactorize": 15.1e6,
                "achieved_gflops_cold": round(
                    4.1e6 * iters_per_sec / 1e9, 1),
                "v5e_mxu_bf16_peak_tflops": 197.0,
                "hbm_gbps_estimate": 28.0,
                "hbm_peak_gbps": 819.0,
                "bound": "common-path iteration is one mega-kernel "
                         "launch (~27 us) + refactorize (~98 us when the "
                         "active set changed) + glue; the former "
                         "scatter bottleneck (BENCH_NOTES 'the scatter "
                         "was the floor') is replaced by static slot "
                         "matmuls",
            },
            "warm": {
                "iters_per_sec": round(warm["iters_per_sec"], 1),
                "solves_per_sec": round(warm["solves_per_sec"], 2),
                "solve_time_s": round(warm["time_s"] / CHAIN_R, 5),
                "iters_per_solve_min": int(warm["iters"].min()),
                "iters_per_solve_max": int(warm["iters"].max()),
                "iters_per_solve_mean": round(float(warm["iters"].mean()), 2),
                "max_error": float(warm["errs"].max()),
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("TREEQP_BENCH_MODE") == "check":
        check_main()
    else:
        main()
