"""Time the batched general stage-QP solver (_qpgen_batch) on the current
backend: warm (correct working-set hotstart) vs cold (ADMM identification),
f64 factors vs qpgen_factor_dtype=float32 (+refinement).

Mirrors the round-3 hotstart measurement in BENCH_NOTES.md (128 nodes,
nz=9, ng=12). Verifies the f32-factor solution against the f64 one before
timing. Prints one JSON line per configuration.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from treeqp_tpu.solvers.tdunes import (  # noqa: E402
    TdunesOpts, _qpgen_batch, _batched_inverse_spd)

N, NZ, NG = 128, 9, 12
REPS = 20


def build():
    rng = np.random.default_rng(7)
    Hr = rng.standard_normal((N, NZ, NZ))
    H = jnp.asarray(Hr @ Hr.transpose(0, 2, 1) / NZ + 2 * np.eye(NZ))
    G = jnp.asarray(rng.standard_normal((N, NG, NZ)))
    lo = jnp.asarray(-0.5 * np.ones((N, NG)))
    hi = jnp.asarray(0.5 * np.ones((N, NG)))
    ones = jnp.ones((N, NG))
    hmod = jnp.asarray(rng.standard_normal((N, NZ)) * 2)
    Hinv = _batched_inverse_spd(H)
    rho = jnp.ones((N, NG))
    GH = G @ Hinv
    GHG = GH @ G.swapaxes(1, 2)
    return H, Hinv, G, lo, hi, ones, hmod, rho, GH, GHG


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        H, Hinv, G, lo, hi, ones, hmod, rho, GH, GHG = build()
    dev = jax.devices()[0]
    args = jax.device_put((H, Hinv, G, lo, hi, ones, hmod, rho, GH, GHG), dev)
    H, Hinv, G, lo, hi, ones, hmod, rho, GH, GHG = args

    z_ref = None
    for fdt in ("same", "float32"):
        opts = TdunesOpts(qpgen_iters=100, qpgen_factor_dtype=fdt)
        L_admm = jnp.linalg.cholesky(
            ((H + (G * rho[:, :, None]).swapaxes(1, 2) @ G)
             ).astype(jnp.float32 if fdt == "float32" else H.dtype))

        @jax.jit
        def run(h, ws=None, _opts=opts, _L=L_admm):
            z, P, mu, res, ws_out = _qpgen_batch(
                h, H, Hinv, G, lo, hi, ones, ones, rho, _L, _opts,
                ws=ws, GH=GH, GHG=GHG)
            return z, P, res, ws_out

        # cold solve -> reference + working set for the warm mode
        z, P, res, ws = jax.block_until_ready(run(hmod))
        if z_ref is None:
            z_ref = z
        zdiff = float(jnp.max(jnp.abs(z - z_ref)))

        @jax.jit
        def run_warm(h, ws_in, _opts=opts, _L=L_admm):
            z, P, mu, res, ws_out = _qpgen_batch(
                h, H, Hinv, G, lo, hi, ones, ones, rho, _L, _opts,
                ws=ws_in, GH=GH, GHG=GHG)
            return z, res

        zw, resw = jax.block_until_ready(run_warm(hmod, ws))

        def timeit(f, *a):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(f(*a))
                ts.append(time.perf_counter() - t0)
            return min(ts) * 1e3

        t_cold = timeit(run, hmod)
        t_warm = timeit(run_warm, hmod, ws)
        print(json.dumps({
            "backend": jax.default_backend(), "factor_dtype": fdt,
            "cold_ms": round(t_cold, 3), "warm_ms": round(t_warm, 3),
            "res_cold": float(res), "res_warm": float(resw),
            "z_vs_f64": zdiff,
        }))


if __name__ == "__main__":
    main()
