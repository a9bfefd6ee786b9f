"""Per-op profile of the CURRENT hot path (post fused-solve + f0-carry):
df64-phase pieces (stage solve, residuals, dual value, apply M, fused
system solve, factorize) and f32-phase pieces, on the real bench problem.
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm
from treeqp_tpu.solvers import ms_df64 as md
from treeqp_tpu.ops import df64 as df
from treeqp_tpu.solvers.tdunes import TdunesOpts

MD, NR, NH, NM = 4, 4, 20, 4
# loop-difference timing: per-call cost = (t(LOOP_N) - t(1)) / (LOOP_N - 1).
# On the remote-TPU tunnel the dispatch noise is ~ms-scale, so LOOP_N must
# be large enough that LOOP_N * per-op-cost >> noise (ops here are ~0.1 ms).
LOOP_N = int(os.environ.get("PROF_LOOP_N", "256"))
NREP = int(os.environ.get("PROF_NREP", "5"))
f32 = jnp.float32


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
    print(f"{name:44s} {per*1e3:8.3f} ms/call", flush=True)


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        ms = tm.split_multistage(qp)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    print("device:", dev, flush=True)

    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=120,
                      factor_dtype="float32", refine_steps=1,
                      refine_safeguard=False, chain_backend="pallas",
                      reg_type="always", reg_value=1e-6,
                      f32_phase_tol=1e-4, df64_phase=True)
    meta = ms.meta
    prep_cr = td._get_prep(meta.crown_topo)
    dd, dmeta = jax.jit(lambda: md.make_dd(ms, opts, prep_cr))()
    nrxm = dd["nrxm"]

    rid = dmeta["rid"]
    g_of = prep_cr.group_of_node[rid]
    slot = prep_cr.slot_of_node[rid]
    nxm = meta.crown_topo.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]

    key = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        lam_cr_h = 0.01 * jax.random.normal(key, (meta.crown_topo.Nn, nxm), f32)
        lam_ch_h = 0.01 * jax.random.normal(key, ms.q.shape, f32)
    lam_cr = df.Df(jax.device_put(lam_cr_h, dev), jnp.zeros_like(jax.device_put(lam_cr_h, dev)))
    lam_ch = df.Df(jax.device_put(lam_ch_h, dev), jnp.zeros_like(jax.device_put(lam_ch_h, dev)))

    # pipeline to stage solution / residuals / factors (df64 phase)
    def pipe(lc, lh):
        cr, ch = md.df_stage_solve(dd, dmeta, prep_cr, lc, lh)
        rc, rh = md.df_residuals(dd, dmeta, prep_cr, cr, ch)
        return cr, ch, rc, rh
    cr, ch, rc, rh = jax.jit(pipe)(lam_cr, lam_ch)

    loop_time("df stage solve", lambda lc, lh: md.df_stage_solve(dd, dmeta, prep_cr, lc, lh), (lam_cr, lam_ch))
    loop_time("df stage solve + residuals", pipe, (lam_cr, lam_ch))
    loop_time("df residuals", lambda cr, ch: md.df_residuals(dd, dmeta, prep_cr, cr, ch), (cr, ch))
    loop_time("df dual value", lambda lc, lh: md.df_dual_value(dd, lc, lh, cr, ch), (lam_cr, lam_ch))
    loop_time("df apply M", lambda d1, d2: md.df_apply_M(dd, dmeta, prep_cr, cr, ch, d1, d2), (rc.hi, rh.hi))

    # factorize as in ms_df64
    def factorize(cr, ch):
        W, Ut = td._build_dual_hessian(
            ms.crown, {"qtilde": cr["qtilde"].hi, "rtilde": cr["rtilde"].hi},
            None, opts, prep_cr, dtype=f32)
        Wc, Utc = tm._chain_blocks(
            ms, {"qt": ch["qt"].hi, "rt": ch["rt"].hi},
            cr["qtilde"].hi, cr["rtilde"].hi, dtype=f32)
        sW = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(W, axis1=1, axis2=2), 1e-12))
        sc = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Wc, axis1=2, axis2=3), 1e-12))
        ar = np.arange(nxm)
        rows_all = prep_cr.gslot[:, None] * nxm + ar[None, :]
        dad_safe = np.maximum(prep_cr.gdad, 0)
        sUt_rows = sW[dad_safe[:, None], rows_all]
        W = W * sW[:, :, None] * sW[:, None, :]
        Ut = Ut * sUt_rows[:, :, None] * sW[:, None, :]
        s_root = sW[g_of[:, None], rows]
        scp = jnp.concatenate([s_root[:, None], sc[:, :-1]], axis=1)
        Wc = Wc * sc[..., :, None] * sc[..., None, :]
        Utc = Utc * scp[..., :, None] * sc[..., None, :]
        s_node = td._group_to_nodes(sW, prep_cr, f32) * nrxm
        Ls, CUs, schur0 = tm._chain_factor(Wc, Utc, opts)
        W = W.at[g_of[:, None, None], rows[:, :, None], rows[:, None, :]].add(-schur0)
        crown_fact = td._tree_chol_factor(W, Ut, opts, prep_cr)
        return dict(Ls=Ls, CUs=CUs, CholW=crown_fact["CholW"],
                    CholUt=crown_fact["CholUt"], s_node=s_node, sc=sc)

    fact = jax.jit(factorize)(cr, ch)
    loop_time("factorize (blocks+equil+chain+crown)", factorize, (cr, ch))

    crown_kind, fused = tm._solve_backends(prep_cr, meta, opts)
    print("backends:", crown_kind, fused, flush=True)
    solve = tm._make_ms_solve(fact, meta, prep_cr, opts, f32, nrxm,
                              g_of, rows, rid, crown_kind, fused)
    loop_time("fused system solve", solve, (rc.hi, rh.hi))

    # f32-phase pieces
    ms32 = tm._cast_ms(ms, f32)
    crown_data32 = jax.jit(lambda: td._stage_data(ms32.crown, opts))()
    lam32_cr, lam32_ch = lam_cr.hi, lam_ch.hi

    def f32_stage_res(lc, lh):
        cr2, ch2 = tm._ms_stage_solve(ms32, crown_data32, lc, lh, opts, prep_cr)
        rc2 = td._dual_residual(ms32.crown, cr2, prep_cr)
        rh2 = tm._chain_residual(ms32, ch2, cr2["x"], cr2["u"])
        return cr2, ch2, rc2, rh2
    cr32, ch32, rc32, rh32 = jax.jit(f32_stage_res)(lam32_cr, lam32_ch)
    loop_time("f32 stage solve + residuals", f32_stage_res, (lam32_cr, lam32_ch))
    loop_time("f32 dual value",
              lambda lc, lh: tm._ms_dual_value(ms32, crown_data32, lc, lh, cr32, ch32, opts),
              (lam32_cr, lam32_ch))


if __name__ == "__main__":
    main()
