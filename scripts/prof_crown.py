"""Micro-profile of crown-factor sub-ops on the TPU: library cholesky vs
unrolled, triangular_solve vs unrolled, scatter-add."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

LOOP_N = 64
NREP = 3

def loop_time(name, fn, args):
    def chained(n_static, *args):
        def body(carry, _):
            eps, a0 = carry
            leaves, treedef = jax.tree_util.tree_flatten(a0)
            leaves = [leaves[0] + eps.astype(leaves[0].dtype)] + leaves[1:]
            out = fn(*jax.tree_util.tree_unflatten(treedef, leaves))
            s = sum(jnp.sum(jnp.abs(l)).astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return (s * 1e-30, a0), None
        (eps, _), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), args),
                                   None, length=n_static)
        return eps
    f1 = jax.jit(lambda *a: chained(1, *a))
    fN = jax.jit(lambda *a: chained(LOOP_N, *a))
    jax.block_until_ready(f1(*args)); jax.block_until_ready(fN(*args))
    t1s, tNs = [], []
    for _ in range(NREP):
        t0 = time.perf_counter(); jax.block_until_ready(f1(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); jax.block_until_ready(fN(*args))
        tNs.append(time.perf_counter() - t0)
    per = (min(tNs) - min(t1s)) / (LOOP_N - 1)
    print(f"{name:40s} {per*1e3:8.3f} ms/call")

def unrolled_chol(W):
    """Batched [B, n, n] lower Cholesky, fully unrolled columns."""
    B, n, _ = W.shape
    cols = []
    for k in range(n):
        a = W[:, :, k]
        for m in range(k):
            a = a - cols[m] * cols[m][:, k:k+1]
        d = jnp.maximum(a[:, k], 1e-12)
        dinv = jax.lax.rsqrt(d)
        col = a * dinv[:, None]
        col = col * (jnp.arange(n) >= k)[None, :]
        col = col.at[:, k].set(jnp.sqrt(d))
        cols.append(col)
    return jnp.stack(cols, axis=2)

def unrolled_rtrsm_t(L, Bmat):
    """X L' = B, batched; L [B,n,n] lower, Bmat [B,m,n]."""
    n = L.shape[-1]
    cols = []
    for j in range(n):
        acc = Bmat[:, :, j]
        for c in range(j):
            acc = acc - cols[c] * L[:, j, c][:, None]
        cols.append(acc / L[:, j, j][:, None])
    return jnp.stack(cols, axis=2)

def main():
    dev = jax.devices()[0]
    print("device:", dev)
    key = jax.random.PRNGKey(0)
    B, G, nxm = 86, 32, 8
    Wr = jax.random.normal(key, (B, G, G), jnp.float32)
    W = Wr @ Wr.swapaxes(1, 2) + 10 * jnp.eye(G)
    Ut = jax.random.normal(key, (B, nxm, G), jnp.float32)
    rhs = jax.random.normal(key, (B, G), jnp.float32)
    W, Ut, rhs = jax.device_put((W, Ut, rhs), dev)

    loop_time("lib cholesky [86,32,32]", lambda W: jnp.linalg.cholesky(W), (W,))
    loop_time("unrolled cholesky [86,32,32]", unrolled_chol, (W,))
    L = jax.jit(jnp.linalg.cholesky)(W)
    loop_time("lib triangular_solve mat [86,8,32]",
              lambda L, Ut: jax.lax.linalg.triangular_solve(
                  L, Ut, left_side=False, lower=True, transpose_a=True), (L, Ut))
    loop_time("unrolled rtrsm_t [86,8,32]", unrolled_rtrsm_t, (L, Ut))
    loop_time("lib triangular_solve vec [86,32]",
              lambda L, r: jax.lax.linalg.triangular_solve(
                  L, r[..., None], left_side=True, lower=True)[..., 0], (L, rhs))
    CU = jax.jit(lambda L, Ut: jax.lax.linalg.triangular_solve(
        L, Ut, left_side=False, lower=True, transpose_a=True))(L, Ut)
    loop_time("syrk [86,8,32]@", lambda CU: CU @ CU.swapaxes(1, 2), (CU,))
    idx = np.random.randint(0, B, (64,))
    rows = np.random.randint(0, G - nxm, (64,))[:, None] + np.arange(nxm)[None, :]
    Sb = jax.random.normal(key, (64, nxm, nxm), jnp.float32)
    loop_time("scatter-add W.at[tgt,rows,rows]",
              lambda W, Sb: W.at[idx[:, None, None], rows[:, :, None],
                                 rows[:, None, :]].add(-Sb), (W, Sb))
    # 4-step scan over the above combo (mimic _tree_chol_factor shape)
    def factor_like(W, Ut):
        def bwd(Wc, _):
            Lb = jnp.linalg.cholesky(Wc)
            CU = jax.lax.linalg.triangular_solve(
                Lb, Ut, left_side=False, lower=True, transpose_a=True)
            Sb = CU @ CU.swapaxes(1, 2)
            Wc = Wc.at[idx[:, None, None], rows[:, :, None], rows[:, None, :]].add(-Sb)
            return Wc, None
        Wf, _ = jax.lax.scan(bwd, W, None, length=4)
        return Wf
    loop_time("4-step scan chol+trsm+syrk+scatter", factor_like, (W, Ut))

if __name__ == "__main__":
    main()
