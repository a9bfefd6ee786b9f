"""sdunes TPU speed-path benchmark (VERDICT r2 #5 done-criterion).

Measures sdunes per-iteration cost on the 256-scenario quadcopter-class
workload (the headline tree) against the multistage dual Newton
(tdunes_ms) on the same instance. Chain protocol as bench.py: CHAIN_R
per-solve-perturbed instances inside one jit, per-solve status/error
asserted.

Axon constraint: ONE big program per process — each mode runs in a child
process (TREEQP_SDUNES_MODE), the parent aggregates JSON lines.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MD, NR, NH, NM = 4, 4, 20, 4  # 256 scenarios, nx = 8 (bench.py workload)
CHAIN_R = int(os.environ.get("TREEQP_SDUNES_CHAIN", "48"))
NREP = 3
TOL = 1e-8

MODES = ("sdunes", "tdunes_ms")


def build():
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
    return qp


def run_mode(mode):
    import jax
    import jax.numpy as jnp
    import numpy as np

    qp = build()
    dev = jax.devices()[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")

    if mode == "sdunes":
        from treeqp_tpu.solvers.sdunes import (
            scenario_data, sdunes_solve, SdunesOpts)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            sqp = scenario_data(qp)
        sqp = jax.device_put(sqp, dev)
        opts = SdunesOpts(tol=TOL, max_iter=150,
                          factor_dtype="float32" if on_tpu else "same",
                          refine_steps=1 if on_tpu else 0,
                          f32_phase_tol=1e-4 if on_tpu else 0.0,
                          chain_backend="pallas" if on_tpu else "xla",
                          reg_type="always", reg_value=1e-6)

        import dataclasses as dc

        def solve(fac, lam0, mu0):
            s2 = dc.replace(sqp, xmin=sqp.xmin.at[:, 0].multiply(fac),
                            xmax=sqp.xmax.at[:, 0].multiply(fac))
            sol, lam, mu, info = sdunes_solve(s2, lam0, mu0, opts)
            return (lam, mu), (info["iter"], info["error"], info["status"])


        lam00 = jnp.zeros((sqp.meta.Ns - 1, sqp.meta.Nr, 1), sqp.b.dtype)
        mu00 = jnp.zeros((sqp.meta.Ns, sqp.meta.Nh, 2 * NM), sqp.b.dtype)
        carry0 = (lam00, mu00)
        nodes = qp.topo.Nn
    else:
        from treeqp_tpu.solvers.tdunes import TdunesOpts
        from treeqp_tpu.solvers.tdunes_multistage import (
            split_multistage, tdunes_ms_solve)
        import dataclasses as dc
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ms = split_multistage(qp)
        ms = jax.device_put(ms, dev)
        opts = TdunesOpts(stage_solver="clipping", tol=TOL, max_iter=120,
                          factor_dtype="float32" if on_tpu else "same",
                          refine_steps=2 if on_tpu else 0,
                          refine_safeguard=False,
                          chain_backend="pallas" if on_tpu else "xla",
                          reg_type="always", reg_value=1e-6,
                          f32_phase_tol=1e-4 if on_tpu else 0.0,
                          df64_phase=on_tpu)

        def solve(fac, lamc, lamh):
            cr = ms.crown
            ms2 = dc.replace(ms, crown=cr.replace(
                xmin=cr.xmin.at[0].multiply(fac),
                xmax=cr.xmax.at[0].multiply(fac)))
            cro, cho, info = tdunes_ms_solve(ms2, lamc, lamh, opts)
            return (cro["lam"], cho["lam"]), \
                (info["iter"], info["error"], info["status"])

        meta = ms.meta
        carry0 = (jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm),
                            ms.q.dtype), jnp.zeros_like(ms.q))
        nodes = qp.topo.Nn

    # WARM chain protocol: each solve warm-starts from the previous
    # solve's multipliers — the reference's own sdunes usage (it ships
    # warm-start files, spring_mass.c:69-83, and the MATLAB harness
    # persists multipliers across MPC steps, treeqp_solve.m:6-8); sdunes
    # cold-starts hit the known piecewise-singular plateau on ~15% of
    # perturbed instances (both here and in the reference). Both modes
    # run the same protocol, so the per-iteration cost comparison is
    # like-for-like.
    @jax.jit
    def run_chain(seed):
        def body(carry, k):
            fac = 1.0 + 0.02 * jnp.sin(seed + 1.7 * (k + 1.0))
            carry2, out = solve(fac, *carry)
            return carry2, out
        _, outs = jax.lax.scan(body, carry0,
                               jnp.arange(CHAIN_R, dtype=jnp.float64))
        return outs

    out = jax.block_until_ready(run_chain(np.float64(0)))
    times = []
    for k in range(NREP):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run_chain(np.float64(k + 1)))
        times.append(time.perf_counter() - t0)
    iters, errs, stats = (np.asarray(v) for v in out)
    assert np.all(stats == 0), f"{mode}: bad statuses {stats}"
    assert np.all(errs < TOL), f"{mode}: errors above tol {errs.max()}"
    t = min(times)
    print(json.dumps({
        "mode": mode, "device": str(dev), "nodes": int(nodes),
        "scenarios": MD**NR, "chained_solves": CHAIN_R,
        "total_iters": int(iters.sum()),
        "iters_per_solve_mean": round(float(iters.mean()), 2),
        "ms_per_iter": round(1e3 * t / max(int(iters.sum()), 1), 4),
        "ms_per_solve": round(1e3 * t / CHAIN_R, 3),
        "iters_per_sec": round(float(iters.sum()) / t, 1),
        "max_error": float(errs.max())}))


def main():
    for mode in MODES:
        env = dict(os.environ, TREEQP_SDUNES_MODE=mode)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=2400)
        for line in r.stdout.splitlines():
            try:
                json.loads(line)
                print(line, flush=True)
            except json.JSONDecodeError:
                continue
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])


if __name__ == "__main__":
    mode = os.environ.get("TREEQP_SDUNES_MODE")
    if mode:
        run_mode(mode)
    else:
        main()
