"""TPU microbenchmark: serial banded chain sweeps vs the cyclic-reduction
(parallel-scan) variants (ops/chain_cr.py) at the headline shape — the
accept/reject measurement for the round-4 roofline's named lever
(BENCH_NOTES "MFU/roofline": the f32 phase is bound by the serial VPU
dependency chains of the L-level sweeps).

Loops LOOP_N solve pairs (bwd+fwd) inside one jit with per-step RHS
variation; prints both timings and the speedup. Run on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from treeqp_tpu.ops import chain_kernels as ck
from treeqp_tpu.ops.chain_cr import (
    chain_cr_precompute, chain_solve_bwd_cr, chain_forward_cr)

S = int(os.environ.get("CR_S", "256"))
L = int(os.environ.get("CR_L", "16"))
N = int(os.environ.get("CR_N", "8"))
LOOP_N = int(os.environ.get("CR_LOOP", "256"))
NREP = 4


def main():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((S, L, N, N))
    Wc = jnp.asarray((A @ A.transpose(0, 1, 3, 2)
                      + 3.0 * np.eye(N)).astype(np.float32))
    Utc = jnp.asarray(0.3 * rng.standard_normal((S, L, N, N))
                      .astype(np.float32))
    Lt, CUt, _ = ck.chain_factor(Wc, Utc)
    Abwd, Bfwd = chain_cr_precompute(Lt, CUt)
    res0 = jnp.asarray(rng.standard_normal((S, L, N)).astype(np.float32))
    dr0 = jnp.asarray(rng.standard_normal((S, N)).astype(np.float32))

    @jax.jit
    def serial(seed):
        def body(acc, k):
            r = res0 * (1.0 + 1e-4 * k * seed)
            ys, radd = ck.chain_solve_bwd(Lt, CUt, r)
            dls = ck.chain_forward(Lt, CUt, ys, dr0 + radd)
            return acc + jnp.sum(dls), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(LOOP_N, dtype=jnp.float32))
        return acc

    @jax.jit
    def cr(seed):
        def body(acc, k):
            r = res0 * (1.0 + 1e-4 * k * seed)
            ys, radd = chain_solve_bwd_cr(Lt, CUt, Abwd, r)
            dls = chain_forward_cr(Lt, CUt, Bfwd, ys, dr0 + radd)
            return acc + jnp.sum(dls), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(LOOP_N, dtype=jnp.float32))
        return acc

    out = {}
    for name, fn in (("serial", serial), ("cr", cr)):
        jax.block_until_ready(fn(np.float32(1.0)))
        ts = []
        for k in range(NREP):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(np.float32(k + 2.0)))
            ts.append(time.perf_counter() - t0)
        out[name] = min(ts) / LOOP_N * 1e6
        print(f"{name}: {out[name]:.1f} us per bwd+fwd pair "
              f"(S={S}, L={L}, n={N}, loop {LOOP_N})")
    print(f"speedup serial/cr: {out['serial'] / out['cr']:.2f}x")


if __name__ == "__main__":
    main()
