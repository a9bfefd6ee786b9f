"""Glue-cost attribution for the f32 coarse-phase Newton loop.

prof_iter.py measured the mega-kernel launch at ~26 us while the solver's
phase-A iteration costs ~280 us — this script rebuilds the while-loop body
in stages to attribute the difference:

  k     — kernel only (scan, state threaded)            [baseline]
  kr    — + partial reductions, acceptance scalars
  krq   — + lax.cond(acc1, quick, batch-line-search)
  krqs  — + restart/keep tree-selects
  full  — + sig_equal + lax.cond factorize-reuse        [= solver body]

Each variant runs as a while_loop with a fixed trip count (iteration
counter only), LOOP_N vs LOOP_B trips, min over NREP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm

LOOP_N = int(os.environ.get("TREEQP_PROF_LOOP", "1024"))
LOOP_B = int(os.environ.get("TREEQP_PROF_LOOP_BASE", "128"))
NREP = int(os.environ.get("TREEQP_PROF_NREP", "5"))


def main():
    from treeqp_tpu.ops import chain_kernels as ck
    from treeqp_tpu.ops import crown_kernels as ckr
    from treeqp_tpu.ops import iter_kernel as ik

    variant = os.environ.get("TREEQP_PROF_VARIANT", "k")

    qp, ms = bench.build_problem()
    ms = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    meta = ms.meta
    prep_cr = td._get_prep(meta.crown_topo)
    f32 = jnp.float32
    opts = bench.bench_opts(True)
    import dataclasses
    optsA = dataclasses.replace(
        opts, refine_steps=0, tol=max(opts.f32_phase_tol, opts.tol),
        ls_batch=opts.ls_batch if opts.ls_batch > 0 else 4)

    xm_cr, um_cr, nrxm_cr = td._masks(ms.crown)
    rid = np.asarray(meta.root_ids)
    g_of = prep_cr.group_of_node[rid]
    slot = prep_cr.slot_of_node[rid]
    nxm = meta.crown_topo.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]

    data_l = ck.chain_eval_data(ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd,
                                ms.xmin, ms.xmax, ms.umin, ms.umax, ms.b)
    crown_ed = ckr.crown_eval_data(ms.crown, prep_cr, xm_cr, um_cr, nrxm_cr)
    NPc, _ = ckr._get_eval_sched(prep_cr)
    SP = data_l["ABt"].shape[-1]
    Nn = meta.crown_topo.Nn
    L = ms.b.shape[1]
    nx = ms.A.shape[-1]

    lane_cr = lambda v: jnp.pad(v.T, ((0, 0), (0, NPc - Nn)))
    lane_ch = lambda v: ck._pad_s(jnp.transpose(v, (1, 2, 0)), SP)
    un_cr = lambda v: v[:, :Nn].T

    def kcall(fact_l, lam_cr, lam_ch, res_cr, res_ch, mode):
        state = dict(lam_cr=lam_cr, lam_ch=lam_ch,
                     res_cr=res_cr, res_ch=res_ch)
        return ik.newton_iter(data_l, crown_ed, fact_l, state, prep_cr,
                              meta.root_ids, meta, mode=mode)

    def factorize_l(qtilde_l, rtilde_l, qt_l, rt_l):
        fact = tm._ms_factorize(ms, un_cr(qtilde_l), un_cr(rtilde_l), qt_l,
                                rt_l, optsA, prep_cr, g_of, rows, nrxm_cr,
                                f32, chain_lanes=data_l)
        return dict(Lt=fact["Ls"], CUt=fact["CUs"], CholW=fact["CholW"],
                    CholUt=fact["CholUt"], s_node_l=lane_cr(fact["s_node"]),
                    sc_l=lane_ch(fact["sc"]))

    NPg = ckr._get_sched(prep_cr).NPg
    zero_fact = dict(
        Lt=jnp.zeros((L, nx, nx, SP), f32),
        CUt=jnp.zeros((L, nx, nx, SP), f32),
        CholW=jnp.zeros((prep_cr.G, prep_cr.G, NPg), f32),
        CholUt=jnp.zeros((nxm, prep_cr.G, NPg), f32),
        s_node_l=jnp.zeros((nxm, NPc), f32),
        sc_l=jnp.zeros((L, nx, SP), f32))

    lam_cr_l = jnp.zeros((nxm, NPc), f32)
    lam_ch_l = jnp.zeros((L, nx, SP), f32)

    @jax.jit
    def setup():
        out0 = kcall(zero_fact, lam_cr_l, lam_ch_l,
                     jnp.zeros((nxm, NPc), f32),
                     jnp.zeros((L, nx, SP), f32), "eval")
        fact = factorize_l(out0["qtilde"], out0["rtilde"],
                           out0["qt"], out0["rt"])
        return out0, fact

    out0, fact0 = jax.block_until_ready(setup())
    sets0 = (out0["qtilde"], out0["rtilde"], out0["qt"], out0["rt"])

    scal = lambda p: jnp.sum(p[0]) + jnp.sum(p[1])
    errof = lambda p: jnp.maximum(jnp.max(p[0]), jnp.max(p[1]))
    T = 4
    one = jnp.ones((), f32)

    def sig_equal(a, b):
        eq = [jnp.all(x == y) for x, y in zip(a, b)]
        out = eq[0]
        for e in eq[1:]:
            out = out & e
        return out

    def make_prog(n_iters):
        def body(carry):
            (lam_cr, lam_ch, res_cr, res_ch, sets, f0, fact_l, sig, it,
             restart) = carry
            out = kcall(fact_l, lam_cr, lam_ch, res_cr, res_ch, "iter")
            if variant == "k":
                return (out["lam2_cr"], out["lam2_ch"], out["res2_cr"],
                        out["res2_ch"], sets, f0, fact_l, sig, it + 1,
                        restart)
            f1 = scal(out["f1p"])
            dot = scal(out["dotp"])
            err1 = errof(out["errp"])
            descent_ok = dot < 1e-10
            eta = jnp.asarray(2.0 ** -45, f32) * jnp.abs(f0)
            accepts = lambda f2, tau: f2 <= f0 + optsA.ls_gamma * tau * dot + eta
            acc1 = accepts(f1, one)
            cand1 = (out["lam2_cr"], out["lam2_ch"], out["res2_cr"],
                     out["res2_ch"],
                     (out["qtilde"], out["rtilde"], out["qt"], out["rt"]),
                     f1, err1)
            if variant == "kr":
                # fold the scalars into the state so they are not dead
                f_t = jnp.where(acc1 & descent_ok, f1, f0)
                return (cand1[0], cand1[1], cand1[2], cand1[3], cand1[4],
                        f_t, fact_l, sig, it + 1, restart)

            def f_at(tau):
                return kcall(fact_l, lam_cr + tau * out["dcr"],
                             lam_ch + tau * out["dch"], res_cr, res_ch,
                             "eval")

            def quick_path():
                return cand1 + (jnp.ones((), jnp.int32), jnp.ones((), bool))

            def batch_path():
                taus = optsA.ls_beta ** jnp.arange(1, T + 1, dtype=f32)
                outs = jax.vmap(f_at)(taus)
                fs = jnp.sum(outs["f1p"][0], axis=(1, 2)) \
                    + jnp.sum(outs["f1p"][1], axis=(1, 2))
                errs = jnp.maximum(jnp.max(outs["errp"][0], axis=(1, 2)),
                                   jnp.max(outs["errp"][1], axis=(1, 2)))
                accs = accepts(fs, taus)
                idx = jnp.argmax(accs)
                at = lambda a: a[idx]
                return (lam_cr + taus[idx] * out["dcr"],
                        lam_ch + taus[idx] * out["dch"],
                        at(outs["res2_cr"]), at(outs["res2_ch"]),
                        (at(outs["qtilde"]), at(outs["rtilde"]),
                         at(outs["qt"]), at(outs["rt"])),
                        fs[idx], errs[idx],
                        (idx + 2).astype(jnp.int32), jnp.any(accs))

            if variant == "ls":
                force_ls = jnp.zeros((), bool)
            elif variant == "factor":
                force_ls = jnp.ones((), bool)
            else:
                force_ls = acc1
            lam2c, lam2h, rc2, rh2, sets2, f_t, err2, ls2, acc = \
                jax.lax.cond(force_ls, quick_path, batch_path)
            if variant == "krq":
                return (lam2c, lam2h, rc2, rh2, sets2, f_t, fact_l, sig,
                        it + 1, restart)

            maxed = ~acc
            restart2 = jnp.where(maxed, restart + 1, 0)
            full_step = restart2 >= 5
            restart2 = jnp.where(full_step, 0, restart2)
            sel_fs = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(full_step, x, y), a, b)
            lam2c, lam2h = sel_fs((cand1[0], cand1[1]), (lam2c, lam2h))
            rc2, rh2 = sel_fs((cand1[2], cand1[3]), (rc2, rh2))
            sets2 = sel_fs(cand1[4], sets2)
            f_t = jnp.where(full_step, cand1[5], f_t)
            keep = descent_ok
            selk = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(keep, x, y), a, b)
            lam2c, lam2h = selk((lam2c, lam2h), (lam_cr, lam_ch))
            rc2, rh2 = selk((rc2, rh2), (res_cr, res_ch))
            sets2 = selk(sets2, sets)
            f_t = jnp.where(keep, f_t, f0)
            if variant == "krqs":
                return (lam2c, lam2h, rc2, rh2, sets2, f_t, fact_l, sig,
                        it + 1, restart2)

            sig2 = sets2
            if variant == "factor":
                # force a refactorize every iteration
                factorize_gate = jnp.zeros((), bool)
            else:
                factorize_gate = sig_equal(sig2, sig)
            fact2 = jax.lax.cond(factorize_gate,
                                 lambda: fact_l, lambda: factorize_l(*sig2))
            return (lam2c, lam2h, rc2, rh2, sets2, f_t, fact2, sig2,
                    it + 1, restart2)

        def cond(carry):
            return carry[-2] < n_iters

        def prog(lam_cr, lam_ch, res_cr, res_ch, f0):
            init = (lam_cr, lam_ch, res_cr, res_ch, sets0, f0, fact0,
                    sets0, jnp.zeros((), jnp.int32),
                    jnp.zeros((), jnp.int32))
            fin = jax.lax.while_loop(cond, body, init)
            return fin[0], fin[1], fin[2], fin[3], fin[5]
        return jax.jit(prog)

    args = (lam_cr_l, lam_ch_l, out0["res2_cr"], out0["res2_ch"],
            scal(out0["f1p"]))
    f1 = make_prog(LOOP_B)
    fN = make_prog(LOOP_N)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(fN(*args))
    t1s, tNs = [], []
    for _ in range(NREP):
        t0 = time.perf_counter()
        jax.block_until_ready(f1(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fN(*args))
        tNs.append(time.perf_counter() - t0)
    per = (min(tNs) - min(t1s)) / (LOOP_N - LOOP_B)
    print(f"variant={variant:6s} {per * 1e6:8.2f} us/iter")


if __name__ == "__main__":
    main()
