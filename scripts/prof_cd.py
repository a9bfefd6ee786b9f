"""Component timing of the general-C/D (qpgen) f64-phase Newton iteration
on the 256-scenario / 4437-node tree — attributes the ~114 ms/iter of the
round-5 single-solve measurement (general_cd_r5).

One variant per process (axon: one big program per process), looped
inside one jit with per-step input perturbation so nothing hoists:

  TREEQP_PROF_VARIANT =
    stage    — qpgen _stage_solve at the f64 data dtype
    stage32  — qpgen _stage_solve on the f32-cast problem
    build    — _build_dual_hessian (f32 build path)
    newton   — _newton_direction (f32 factor + solve + 1 refinement)
    factor   — _newton_factor only
    solve    — _newton_solve only (factor hoisted)
    dualval  — _dual_value (per line-search trial)
    resid    — _dual_residual + error
    mgrad    — _modified_gradient
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from treeqp_tpu.solvers import tdunes as td

LOOP_N = int(os.environ.get("TREEQP_PROF_LOOP", "32"))
NREP = int(os.environ.get("TREEQP_PROF_NREP", "4"))
VARIANT = os.environ.get("TREEQP_PROF_VARIANT", "stage")


def main():
    from benchmarks.models import spring_mass_chain, with_general_rows

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        qp0, _ = spring_mass_chain(nm=4, md=4, Nr=4, Nh=20)
        qp = with_general_rows(qp0, cmax=0.6)
    dev = jax.devices()[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    qp = jax.device_put(qp, dev)
    opts = td.TdunesOpts(
        stage_solver="qpgen", tol=2.5e-9, max_iter=150,
        factor_dtype="float32" if on_tpu else "same",
        refine_steps=1 if on_tpu else 0, refine_safeguard=False,
        qpgen_factor_dtype="float32" if on_tpu else "same",
        reg_type="always" if on_tpu else "on_the_fly", reg_value=1e-6,
        f32_phase_tol=1e-4 if on_tpu else 0.0, f32_patience=3)
    prep = td._get_prep(qp.topo)
    dt = qp.dtype
    if VARIANT == "stage32":
        qp = td._cast_qp(qp, jnp.float32)
        dt = jnp.float32
    data = td._stage_data(qp, opts)
    xm, um, nrxm = td._masks(qp)
    rng = np.random.default_rng(0)
    lam_base = jnp.asarray(
        0.1 * rng.standard_normal((qp.topo.Nn, qp.topo.nxm)), dt) * nrxm

    @jax.jit
    def prog(seed):
        def body(carry, k):
            eps = 1e-6 * (k + 1.0) * seed
            lam = lam_base * (1.0 + eps)
            sol = td._stage_solve(qp, lam, data, opts, prep)
            if VARIANT in ("stage", "stage32"):
                out = sol["x"]
            elif VARIANT == "mgrad":
                qmod, rmod = td._modified_gradient(qp, lam, prep)
                out = qmod
            elif VARIANT == "dualval":
                out = td._dual_value(qp, lam, sol, data, opts)
            elif VARIANT == "resid":
                res = td._dual_residual(qp, sol, prep)
                out = td._residual_error(res, opts)
            else:
                res = td._dual_residual(qp, sol, prep)
                rg = td._nodes_to_group_mm(res, prep)
                W, Ut = td._build_dual_hessian(
                    qp, sol, data, opts, prep,
                    dtype=jnp.float32 if opts.factor_dtype == "float32"
                    else None)
                if VARIANT == "build":
                    out = W
                elif VARIANT == "factor":
                    sW, fact = td._newton_factor(W, Ut, opts, prep)
                    out = fact["CholW"]
                elif VARIANT == "solve":
                    sW, fact = td._newton_factor(W, Ut, opts, prep)
                    dl = td._newton_solve(sW, fact, rg, opts, prep)
                    out = dl
                else:  # newton
                    dl = td._newton_direction(W, Ut, rg, opts, prep,
                                              qp=qp, sol=sol, data=data)
                    out = dl
            return carry + jnp.sum(out).astype(jnp.float64), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float64),
                              jnp.arange(LOOP_N, dtype=jnp.float64))
        return acc

    t0 = time.time()
    jax.block_until_ready(prog(np.float64(1.0)))
    compile_s = time.time() - t0
    times = []
    for k in range(NREP):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(np.float64(k + 2.0)))
        times.append(time.perf_counter() - t0)
    t = min(times) / LOOP_N
    # note: every variant includes one _stage_solve; subtract the `stage`
    # variant's time to get the component alone
    print(f"{VARIANT}: {t * 1e3:.3f} ms/step (incl. stage solve), "
          f"compile {compile_s:.0f}s, loop {LOOP_N}, nrep {NREP}")


if __name__ == "__main__":
    main()
