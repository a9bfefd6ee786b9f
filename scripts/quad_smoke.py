"""TPU smoke for the true-quadcopter headline (round 5): cold solve + KKT
oracle + a 32-solve chain timing on the nx=6/nu=4 tree, ONE jit program.

Run on the axon TPU in a dedicated process (one big program per process).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = int(os.environ.get("QS_CHAIN", "32"))
PERT = 0.02


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from treeqp_tpu.solvers.tdunes_multistage import (
        split_multistage, tdunes_ms_solve, merge_output)
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.core.kkt import max_kkt_residual

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import quadcopter
        m = quadcopter(md=4, Nr=4, Nh=20)
        qp = m.qp
        ms = split_multistage(qp)
    dev = jax.devices()[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    ms = jax.device_put(ms, dev)
    qp_dev = jax.device_put(qp, dev)

    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=120,
                      factor_dtype="float32" if on_tpu else "same",
                      refine_steps=2 if on_tpu else 0,
                      refine_safeguard=False,
                      chain_backend="pallas" if on_tpu else "xla",
                      reg_type="always" if on_tpu else "on_the_fly",
                      reg_value=1e-6,
                      f32_phase_tol=1e-4 if on_tpu else 0.0,
                      f32_patience=3,
                      df64_phase=on_tpu)

    meta = ms.meta
    lam0c = jnp.zeros((meta.crown_topo.Nn, meta.crown_topo.nxm), ms.q.dtype)
    lam0h = jnp.zeros_like(ms.q)

    def perturb_ms(ms_, fac):
        cr = ms_.crown
        cr2 = cr.replace(xmin=cr.xmin.at[0].multiply(fac),
                         xmax=cr.xmax.at[0].multiply(fac))
        return dataclasses.replace(ms_, crown=cr2)

    def perturb_qp(qp_, fac):
        return qp_.replace(xmin=qp_.xmin.at[0].multiply(fac),
                           xmax=qp_.xmax.at[0].multiply(fac))

    @jax.jit
    def program(seed):
        # 1. certified cold solve on the base instance
        cro, cho, info = tdunes_ms_solve(ms, None, None, opts)
        out = merge_output(ms, cro, cho, info)
        kkt0 = max_kkt_residual(qp_dev, out)
        # 2. certified cold solve on one perturbed instance
        fac = 1.0 + PERT * jnp.sin(seed + 1.7)
        ms_p = perturb_ms(ms, fac)
        cro_p, cho_p, info_p = tdunes_ms_solve(ms_p, None, None, opts)
        out_p = merge_output(ms_p, cro_p, cho_p, info_p)
        kkt_p = max_kkt_residual(perturb_qp(qp_dev, fac), out_p)
        # 3. timed chain (cold starts, per-solve perturbations)
        def body(carry, k):
            lc, lh = carry
            fack = 1.0 + PERT * jnp.sin(seed + 1.7 * (k + 1.0))
            ms_k = perturb_ms(ms, fack)
            cro_k, cho_k, inf = tdunes_ms_solve(ms_k, lc * 0.0, lh * 0.0, opts)
            return (cro_k["lam"], cho_k["lam"]), \
                (inf["iter"], inf["error"], inf["status"])
        _, (iters, errs, stats) = jax.lax.scan(
            body, (lam0c, lam0h), jnp.arange(CHAIN, dtype=ms.q.dtype))
        return (kkt0, info["iter"], info["status"],
                kkt_p, info_p["iter"], info_p["status"],
                iters, errs, stats)

    t0 = time.time()
    r = jax.block_until_ready(program(np.float64(1.0)))
    compile_s = time.time() - t0
    times = []
    for k in range(4):
        t0 = time.perf_counter()
        r = jax.block_until_ready(program(np.float64(k + 2.0)))
        times.append(time.perf_counter() - t0)
    kkt0, it0, st0, kktp, itp, stp, iters, errs, stats = (
        np.asarray(v) for v in r)
    t = min(times)
    print(json.dumps({
        "device": str(dev), "compile_s": round(compile_s, 1),
        "kkt": float(kkt0), "iters": int(it0), "status": int(st0),
        "kkt_pert": float(kktp), "iters_pert": int(itp), "status_pert": int(stp),
        "chain": CHAIN, "min_time_s": round(t, 4),
        "note": "chain time includes the two certified solves + oracle",
        "chain_iters_min": int(iters.min()), "chain_iters_max": int(iters.max()),
        "chain_iters_mean": round(float(iters.mean()), 2),
        "chain_err_max": float(errs.max()),
        "chain_all_optimal": bool((stats == 0).all()),
        "est_iters_per_sec": round(float(iters.sum()) / t, 1),
    }))


if __name__ == "__main__":
    main()
