"""Bisect _tree_chol_factor cost on TPU."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers.tdunes import TdunesOpts
from treeqp_tpu.utils.tree import TreeStructure

LOOP_N = 16
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
    print(f"{name:44s} {per*1e3:8.3f} ms/call")

def main():
    dev = jax.devices()[0]
    print("device:", dev)
    # crown topology of the bench problem: md=4, Nr=4 -> Nh=Nr crown
    topo = TreeStructure.multistage(md=4, Nr=4, Nh=4, nx=8, nu=1)
    prep = td._get_prep(topo)
    print("NpG:", prep.NpG, "G:", prep.G, "n_sweep:", prep.n_sweep,
          "sweep widths:", [int(v.sum()) for v in prep.bwd_valid])
    key = jax.random.PRNGKey(0)
    Wr = jax.random.normal(key, (prep.NpG, prep.G, prep.G), jnp.float64)
    W = Wr @ Wr.swapaxes(1, 2) + 10 * jnp.eye(prep.G)
    Ut = jax.random.normal(key, (prep.NpG, prep.nxm, prep.G), jnp.float64)
    rg = jax.random.normal(key, (prep.NpG, prep.G), jnp.float64)
    W, Ut, rg = jax.device_put((W, Ut, rg), dev)

    opts = TdunesOpts(factor_dtype="float32", reg_type="always", reg_value=1e-6)
    loop_time("_tree_chol_factor (always-reg, f32)",
              lambda W, Ut: td._tree_chol_factor(W, Ut, opts, prep), (W, Ut))
    fact = jax.jit(lambda W, Ut: td._tree_chol_factor(W, Ut, opts, prep))(W, Ut)
    loop_time("_tree_chol_solve",
              lambda rg: td._tree_chol_solve(fact, rg, opts, prep), (rg,))

    # variant: no scan (unrolled python loop over levels)
    def factor_unrolled(W, Ut):
        W32, Ut32 = W.astype(jnp.float32), Ut.astype(jnp.float32)
        dt = jnp.float32
        nxm, G, NpG = prep.nxm, prep.G, prep.NpG
        ar = jnp.arange(nxm)
        Wx = jnp.concatenate([W32, jnp.eye(G, dtype=dt)[None]], axis=0)
        Utx = jnp.concatenate([Ut32, jnp.zeros((1, nxm, G), dt)], axis=0)
        CholW = jnp.zeros((NpG + 1, G, G), dt)
        CholUt = jnp.zeros((NpG + 1, nxm, G), dt)
        for r in range(prep.n_sweep):
            idx = prep.bwd_idx[r]; dad = prep.bwd_dad[r]
            slot = prep.bwd_slot[r]; valid = prep.bwd_valid[r]
            idx = idx[valid]; dad = dad[valid]; slot = slot[valid]
            Lb = td._reg_cholesky(Wx[idx], opts)
            CUb = jax.lax.linalg.triangular_solve(
                Lb, Utx[idx], left_side=False, lower=True, transpose_a=True)
            Sb = CUb @ CUb.swapaxes(1, 2)
            rows = slot[:, None] * nxm + np.arange(nxm)[None, :]
            Wx = Wx.at[dad[:, None, None], rows[:, :, None], rows[:, None, :]].add(-Sb)
            CholW = CholW.at[idx].set(Lb)
            CholUt = CholUt.at[idx].set(CUb)
        L0 = td._reg_cholesky(Wx[0], opts)
        CholW = CholW.at[0].set(L0)
        return CholW, CholUt
    loop_time("factor UNROLLED static idx", factor_unrolled, (W, Ut))

    # variant: unrolled without CholW/CholUt accumulation (store per level)
    def factor_unrolled_list(W, Ut):
        W32, Ut32 = W.astype(jnp.float32), Ut.astype(jnp.float32)
        dt = jnp.float32
        nxm, G, NpG = prep.nxm, prep.G, prep.NpG
        Wx = jnp.concatenate([W32, jnp.eye(G, dtype=dt)[None]], axis=0)
        outs = []
        for r in range(prep.n_sweep):
            idx = prep.bwd_idx[r]; dad = prep.bwd_dad[r]
            slot = prep.bwd_slot[r]; valid = prep.bwd_valid[r]
            idx = idx[valid]; dad = dad[valid]; slot = slot[valid]
            Lb = td._reg_cholesky(Wx[idx], opts)
            CUb = jax.lax.linalg.triangular_solve(
                Lb, Ut.astype(dt)[idx], left_side=False, lower=True, transpose_a=True)
            Sb = CUb @ CUb.swapaxes(1, 2)
            rows = slot[:, None] * nxm + np.arange(nxm)[None, :]
            Wx = Wx.at[dad[:, None, None], rows[:, :, None], rows[:, None, :]].add(-Sb)
            outs.append((Lb, CUb))
        L0 = td._reg_cholesky(Wx[0], opts)
        outs.append((L0,))
        return outs
    loop_time("factor UNROLLED list outputs", factor_unrolled_list, (W, Ut))

def scatter_test():
    dev = jax.devices()[0]
    topo = TreeStructure.multistage(md=4, Nr=4, Nh=4, nx=8, nu=1)
    prep = td._get_prep(topo)
    key = jax.random.PRNGKey(0)
    # chain-root scatter as in tdunes_ms_solve: 256 roots -> 64 stage-3 groups
    rid = np.arange(topo.stage_start[4], topo.stage_start[5])
    g_of = prep.group_of_node[rid]
    slot = prep.slot_of_node[rid]
    nxm = prep.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]
    for dt in (jnp.float64, jnp.float32):
        W = jax.device_put(jax.random.normal(key, (prep.NpG, prep.G, prep.G), dt), dev)
        schur0 = jax.device_put(jax.random.normal(key, (len(rid), nxm, nxm), dt), dev)
        loop_time(f"scatter-add schur0 ({dt.__name__})",
                  lambda W, s: W.at[g_of[:, None, None], rows[:, :, None],
                                    rows[:, None, :]].add(-s), (W, schur0))
        # alternative: reshape-based block-diag add (indices are g-major
        # contiguous: each group gets exactly md=4 consecutive roots)
        def blockdiag_add(W, s):
            md = 4
            B = s.shape[0] // md
            sb = s.reshape(B, md, nxm, nxm)
            # build [B, G, G] block-diag of the md blocks
            eye = np.arange(md)
            bd = jnp.zeros((B, prep.G, prep.G), s.dtype)
            for k in range(md):
                bd = bd.at[:, k*nxm:(k+1)*nxm, k*nxm:(k+1)*nxm].set(sb[:, k])
            return W.at[np.unique(g_of)].add(-bd)
        loop_time(f"blockdiag-add schur0 ({dt.__name__})", blockdiag_add, (W, schur0))

if __name__ == "__main__":
    scatter_test()
