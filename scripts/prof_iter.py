"""Per-launch timing of the whole-iteration mega-kernel (ops/iter_kernel)
on the headline tree — the instrument for kernel-variant experiments.

Times three programs, each a scan of LOOP_N launches with a data
dependency threaded through (so XLA cannot elide or overlap launches):

  iter  — full common-path iteration (solve + trial + eval)
  eval  — evaluation half only (mode="eval")
  fact  — the factorize program (_ms_factorize), for reference

Prints ms/launch for each. TREEQP_PROF_* env knobs as usual.
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

LOOP_N = int(os.environ.get("TREEQP_PROF_LOOP", "2048"))
LOOP_B = int(os.environ.get("TREEQP_PROF_LOOP_BASE", "256"))
NREP = int(os.environ.get("TREEQP_PROF_NREP", "5"))


def main():
    from treeqp_tpu.ops import chain_kernels as ck
    from treeqp_tpu.ops import crown_kernels as ckr
    from treeqp_tpu.ops import iter_kernel as ik

    qp, ms = bench.build_problem()
    # all-f32 copy: keeps the harness programs free of f64 HLOs (the axon
    # X64-rewrite pass rejects programs mixing f64 ops with pallas calls)
    ms = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    meta = ms.meta
    prep_cr = td._get_prep(meta.crown_topo)
    sched = ckr._get_sched(prep_cr)
    NPc, _ = ckr._get_eval_sched(prep_cr)
    print(f"G={sched.G} nxm={sched.nxm} n_lev={sched.n_lev} K={sched.K} "
          f"NpG={prep_cr.NpG} NPg={sched.NPg} NPc={NPc} "
          f"L={ms.b.shape[1]} nx={ms.A.shape[-1]} S={meta.S}")

    opts = bench.bench_opts(True)
    f32 = jnp.float32
    xm_cr, um_cr, nrxm_cr = td._masks(ms.crown)
    rid = np.asarray(meta.root_ids)
    g_of = prep_cr.group_of_node[rid]
    slot = prep_cr.slot_of_node[rid]
    nxm = meta.crown_topo.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]

    data_l = ck.chain_eval_data(ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd,
                                ms.xmin, ms.xmax, ms.umin, ms.umax, ms.b)
    crown_ed = ckr.crown_eval_data(ms.crown, prep_cr, xm_cr, um_cr, nrxm_cr)
    SP = data_l["ABt"].shape[-1]
    Nn = meta.crown_topo.Nn
    L = ms.b.shape[1]
    nx = ms.A.shape[-1]

    lane_cr = lambda v: jnp.pad(v.T, ((0, 0), (0, NPc - Nn)))
    lane_ch = lambda v: ck._pad_s(jnp.transpose(v, (1, 2, 0)), SP)
    un_cr = lambda v: v[:, :Nn].T

    lam_cr_l = lane_cr(jnp.zeros((Nn, nxm), f32))
    lam_ch_l = lane_ch(jnp.zeros(ms.q.shape, f32))

    def kcall(fact_l, lam_cr, lam_ch, res_cr, res_ch, mode):
        state = dict(lam_cr=lam_cr, lam_ch=lam_ch,
                     res_cr=res_cr, res_ch=res_ch)
        return ik.newton_iter(data_l, crown_ed, fact_l, state, prep_cr,
                              meta.root_ids, meta, mode=mode)

    def factorize_l(qtilde_l, rtilde_l, qt_l, rt_l):
        fact = tm._ms_factorize(ms, un_cr(qtilde_l), un_cr(rtilde_l), qt_l,
                                rt_l, opts, prep_cr, g_of, rows, nrxm_cr,
                                f32, chain_lanes=data_l)
        return dict(Lt=fact["Ls"], CUt=fact["CUs"], CholW=fact["CholW"],
                    CholUt=fact["CholUt"], s_node_l=lane_cr(fact["s_node"]),
                    sc_l=lane_ch(fact["sc"]))

    # ---- build a real state: eval at zero, then factorize
    NPg = sched.NPg
    zero_fact = dict(
        Lt=jnp.zeros((L, nx, nx, SP), f32),
        CUt=jnp.zeros((L, nx, nx, SP), f32),
        CholW=jnp.zeros((prep_cr.G, prep_cr.G, NPg), f32),
        CholUt=jnp.zeros((nxm, prep_cr.G, NPg), f32),
        s_node_l=jnp.zeros((nxm, NPc), f32),
        sc_l=jnp.zeros((L, nx, SP), f32))

    @jax.jit
    def setup():
        out0 = kcall(zero_fact, lam_cr_l, lam_ch_l,
                     jnp.zeros((nxm, NPc), f32),
                     jnp.zeros((L, nx, SP), f32), "eval")
        fact = factorize_l(out0["qtilde"], out0["rtilde"],
                           out0["qt"], out0["rt"])
        return out0, fact

    out0, fact = jax.block_until_ready(setup())
    res_cr, res_ch = out0["res2_cr"], out0["res2_ch"]

    def chain_prog(mode, n):
        def prog(lc, lh, rc, rh):
            def body(carry, _):
                lc, lh, rc, rh = carry
                o = kcall(fact, lc, lh, rc, rh, mode)
                return (o["lam2_cr"], o["lam2_ch"],
                        o["res2_cr"], o["res2_ch"]), None
            carry, _ = jax.lax.scan(body, (lc, lh, rc, rh), None, length=n)
            return carry
        return jax.jit(prog)

    def fact_prog(n):
        def prog(qt_l, rt_l, qtl, rtl):
            def body(carry, _):
                qt_l, rt_l, qtl, rtl = carry
                f = factorize_l(qtl, rtl, qt_l, rt_l)
                eps = jnp.sum(f["Lt"][0, 0, 0, :1]) * 1e-30
                return (qt_l + eps, rt_l, qtl, rtl), None
            carry, _ = jax.lax.scan(body, (qt_l, rt_l, qtl, rtl), None,
                                    length=n)
            return carry
        return jax.jit(prog)

    def timeit(name, f1, fN, args):
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
        print(f"{name:20s} {per * 1e3:8.4f} ms/launch")
        return per

    args = (lam_cr_l, lam_ch_l, res_cr, res_ch)
    timeit("iter (solve+eval)", chain_prog("iter", LOOP_B),
           chain_prog("iter", LOOP_N), args)
    timeit("eval only", chain_prog("eval", LOOP_B),
           chain_prog("eval", LOOP_N), args)
    fargs = (out0["qt"], out0["rt"], out0["qtilde"], out0["rtilde"])
    timeit("factorize", fact_prog(LOOP_B), fact_prog(LOOP_N), fargs)


if __name__ == "__main__":
    main()
