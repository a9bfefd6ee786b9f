"""Per-op TPU profile of the multistage tdunes bench solve.

The axon tunnel has a ~26 ms per-dispatch floor, so each phase is run
LOOP_N times inside one jit (serialized via a carry-dependency that also
defeats CSE / the result cache) and the marginal per-call time is
(t(LOOP_N) - t(1)) / (LOOP_N - 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm
from treeqp_tpu.solvers.tdunes import TdunesOpts

MD, NR, NH, NM = 4, 4, 20, 4
LOOP_N = 32
NREP = 3


def loop_time(name, fn, args):
    """fn(*args) -> pytree. Times LOOP_N chained invocations inside one jit."""

    def chained(n_static, *args):
        def body(carry, _):
            eps, a0 = carry
            # perturb the first float leaf by eps (serializes iterations)
            leaves, treedef = jax.tree_util.tree_flatten(a0)
            leaves = [leaves[0] + eps.astype(leaves[0].dtype)] + leaves[1:]
            out = fn(*jax.tree_util.tree_unflatten(treedef, leaves))
            s = sum(jnp.sum(jnp.abs(l)).astype(jnp.float64)
                    for l in jax.tree_util.tree_leaves(out)
                    if hasattr(l, "dtype")
                    and jnp.issubdtype(l.dtype, jnp.floating))
            return (s * 1e-30, a0), None
        (eps, _), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float64), args),
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
    print(f"{name:34s} {per*1e3:8.3f} ms/call   (1x={min(t1s)*1e3:.1f} ms, {LOOP_N}x={min(tNs)*1e3:.1f} ms)")
    return per


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        ms = tm.split_multistage(qp)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    print("device:", dev)

    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=120,
                      factor_dtype="float32", refine_steps=1,
                      chain_backend="pallas", reg_type="always",
                      reg_value=1e-6)
    meta = ms.meta
    prep_cr = td._get_prep(meta.crown_topo)
    dt = ms.q.dtype
    crown_data = jax.jit(lambda: td._stage_data(ms.crown, opts))()

    key = jax.random.PRNGKey(0)
    lam_cr = 0.01 * jax.random.normal(key, (meta.crown_topo.Nn, meta.crown_topo.nxm), dt)
    lam_ch = 0.01 * jax.random.normal(key, ms.q.shape, dt)
    lam_cr, lam_ch = jax.device_put((lam_cr, lam_ch), dev)

    rid = np.asarray(meta.root_ids)
    g_of = prep_cr.group_of_node[rid]
    slot = prep_cr.slot_of_node[rid]
    nxm = meta.crown_topo.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]
    nrxm_cr = jnp.asarray(meta.crown_topo.nonroot_x_mask, dt)

    def stage(lam_cr, lam_ch):
        cr, ch = tm._ms_stage_solve(ms, crown_data, lam_cr, lam_ch, opts, prep_cr)
        res_cr = td._dual_residual(ms.crown, cr, prep_cr)
        res_ch = tm._chain_residual(ms, ch, cr["x"], cr["u"])
        err = jnp.maximum(jnp.max(jnp.abs(res_cr)), jnp.max(jnp.abs(res_ch)))
        return cr, ch, res_cr, res_ch, err

    loop_time("stage_solve+residual+err", stage, (lam_cr, lam_ch))

    cr, ch, res_cr, res_ch, err = jax.jit(stage)(lam_cr, lam_ch)

    def hess(cr, ch):
        W, Ut = td._build_dual_hessian(ms.crown, cr, crown_data, opts, prep_cr)
        Wc, Utc = tm._chain_blocks(ms, ch, cr["qtilde"], cr["rtilde"],
                                   dtype=jnp.float32)
        return W, Ut, Wc, Utc
    loop_time("hessian blocks (crown+chain)", hess, (cr, ch))
    loop_time("  crown hessian only",
              lambda cr: td._build_dual_hessian(ms.crown, cr, crown_data, opts, prep_cr),
              (cr,))
    W, Ut, Wc, Utc = jax.jit(hess)(cr, ch)

    def equil(W, Ut, Wc, Utc):
        sW = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(W, axis1=1, axis2=2), 1e-12))
        sc = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Wc, axis1=2, axis2=3), 1e-12))
        ar = np.arange(nxm)
        rows_all = prep_cr.gslot[:, None] * nxm + ar[None, :]
        dad_safe = np.maximum(prep_cr.gdad, 0)
        sUt_rows = sW[dad_safe[:, None], rows_all]
        W2 = W * sW[:, :, None] * sW[:, None, :]
        Ut2 = Ut * sUt_rows[:, :, None] * sW[:, None, :]
        s_root = sW[g_of[:, None], rows].astype(sc.dtype)
        scp = jnp.concatenate([s_root[:, None], sc[:, :-1]], axis=1)
        Wc2 = Wc * sc[..., :, None] * sc[..., None, :]
        Utc2 = Utc * scp[..., :, None] * sc[..., None, :]
        return W2, Ut2, Wc2, Utc2, sW, sc
    loop_time("equilibration", equil, (W, Ut, Wc, Utc))
    W2, Ut2, Wc2, Utc2, sW, sc = jax.jit(equil)(W, Ut, Wc, Utc)

    loop_time("chain factor (pallas)",
              lambda Wc, Utc: tm._chain_factor(Wc, Utc, opts), (Wc2, Utc2))
    Ls, CUs, schur0 = jax.jit(lambda a, b: tm._chain_factor(a, b, opts))(Wc2, Utc2)

    def crown_factor(W, Ut, schur0):
        W = W.at[g_of[:, None, None], rows[:, :, None], rows[:, None, :]].add(-schur0)
        return td._tree_chol_factor(W, Ut, opts, prep_cr)
    def crown_factor_arrays(W, Ut, schur0):
        f = crown_factor(W, Ut, schur0)
        return {k: v for k, v in f.items() if hasattr(v, "dtype")}
    loop_time("crown factor", crown_factor_arrays, (W2, Ut2, schur0))
    cf = dict(jax.jit(crown_factor_arrays)(W2, Ut2, schur0))
    if "kind" not in cf:
        cf["kind"] = "pallas" if opts.chain_backend == "pallas" else "xla"

    def solve(rcr, rch, Ls, CUs, sW, sc):
        s_node = td._group_to_nodes(sW, prep_cr, dt) * nrxm_cr
        rcr_s, rch_s = rcr * s_node, rch * sc
        ys, radd0 = tm._chain_solve_bwd(Ls, CUs, rch_s, opts)
        rg2 = td._nodes_to_group(rcr_s, prep_cr)
        rg2 = rg2.at[g_of[:, None], rows].add(-radd0)
        dg = td._tree_chol_solve(cf, rg2, opts, prep_cr)
        dcr_s = td._group_to_nodes(dg, prep_cr, dt) * nrxm_cr
        dch_s = tm._chain_forward(Ls, CUs, ys, dcr_s[rid], opts)
        return dcr_s * s_node, dch_s * sc
    loop_time("triangular solve (full)", solve, (res_cr, res_ch, Ls, CUs, sW, sc))
    dcr, dch = jax.jit(solve)(res_cr, res_ch, Ls, CUs, sW, sc)

    loop_time("  chain bwd only",
              lambda rch, Ls, CUs: tm._chain_solve_bwd(Ls, CUs, rch, opts),
              (res_ch, Ls, CUs))
    loop_time("  crown solve only",
              lambda rg: td._tree_chol_solve(cf, rg, opts, prep_cr),
              (td._nodes_to_group(res_cr, prep_cr),))
    loop_time("  chain fwd only",
              lambda ys, Ls, CUs, dr: tm._chain_forward(Ls, CUs, ys, dr, opts),
              (jax.jit(lambda r, L, C: tm._chain_solve_bwd(L, C, r, opts))(res_ch, Ls, CUs)[0],
               Ls, CUs, dcr[rid]))

    loop_time("apply M (f64)",
              lambda dcr, dch: tm._ms_apply_M(ms, cr, ch, dcr, dch, prep_cr),
              (dcr, dch))

    def f_at(lam_cr, lam_ch, dcr, dch):
        lc = lam_cr + 0.5 * dcr
        lh = lam_ch + 0.5 * dch
        cr2, ch2 = tm._ms_stage_solve(ms, crown_data, lc, lh, opts, prep_cr)
        return tm._ms_dual_value(ms, crown_data, lc, lh, cr2, ch2, opts)
    loop_time("line-search eval (f_at)", f_at, (lam_cr, lam_ch, dcr, dch))

    def full(lam_cr, lam_ch):
        cro, cho, info = tm.tdunes_ms_solve(ms, lam_cr, lam_ch, opts)
        return info["error"]
    # full solve: time directly (can't chain — returns different shape)
    f = jax.jit(full)
    jax.block_until_ready(f(lam_cr, lam_ch))
    ts = []
    for k in range(NREP):
        lc = lam_cr + k * 1e-9
        t0 = time.perf_counter(); jax.block_until_ready(f(lc, lam_ch))
        ts.append(time.perf_counter() - t0)
    print(f"{'FULL tdunes_ms_solve':34s} {min(ts)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
