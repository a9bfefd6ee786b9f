"""Focused re-measurement of suspect phases from prof_ms (crown factor,
apply M, f_at) with the real bench problem."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm
from treeqp_tpu.solvers.tdunes import TdunesOpts

MD, NR, NH, NM = 4, 4, 20, 4
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
    print(f"{name:40s} {per*1e3:8.3f} ms/call")

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
                      chain_backend="pallas", reg_type="always", reg_value=1e-6)
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

    def pipeline_to_factors(lam_cr, lam_ch):
        cr, ch = tm._ms_stage_solve(ms, crown_data, lam_cr, lam_ch, opts, prep_cr)
        res_cr = td._dual_residual(ms.crown, cr, prep_cr)
        res_ch = tm._chain_residual(ms, ch, cr["x"], cr["u"])
        W, Ut = td._build_dual_hessian(ms.crown, cr, crown_data, opts, prep_cr)
        Wc, Utc = tm._chain_blocks(ms, ch, cr["qtilde"], cr["rtilde"], dtype=jnp.float32)
        return cr, ch, res_cr, res_ch, W, Ut, Wc, Utc

    cr, ch, res_cr, res_ch, W, Ut, Wc, Utc = jax.jit(pipeline_to_factors)(lam_cr, lam_ch)
    Ls, CUs, schur0 = jax.jit(lambda a, b: tm._chain_factor(a, b, opts))(Wc, Utc)

    def crown_factor(W, Ut, schur0):
        W = W.at[g_of[:, None, None], rows[:, :, None], rows[:, None, :]].add(-schur0)
        return td._tree_chol_factor(W, Ut, opts, prep_cr)
    loop_time("crown factor (real, f64 W + f32 schur)", crown_factor, (W, Ut, schur0))
    loop_time("crown factor (pre-f32 W)",
              lambda W, Ut, s: crown_factor(W.astype(jnp.float32),
                                            Ut.astype(jnp.float32), s),
              (W, Ut, schur0))
    loop_time("crown factor (no scatter)",
              lambda W, Ut: td._tree_chol_factor(W, Ut, opts, prep_cr), (W, Ut))

    fact = jax.jit(crown_factor)(W, Ut, schur0)
    dcr = jax.random.normal(key, res_cr.shape, dt)
    dch = jax.random.normal(key, res_ch.shape, dt)
    loop_time("apply M (f64)",
              lambda dcr, dch: tm._ms_apply_M(ms, cr, ch, dcr, dch, prep_cr),
              (dcr, dch))
    def f_at(lam_cr, lam_ch):
        cr2, ch2 = tm._ms_stage_solve(ms, crown_data, lam_cr, lam_ch, opts, prep_cr)
        return tm._ms_dual_value(ms, crown_data, lam_cr, lam_ch, cr2, ch2, opts)
    loop_time("f_at (LS eval, f64)", f_at, (lam_cr, lam_ch))

if __name__ == "__main__":
    main()
