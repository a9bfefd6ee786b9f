"""Factorize-program breakdown on the headline tree.

prof_iter2 showed a refactorize iteration costs ~244 us vs 61 us for the
common path — the factorize program, not the Newton kernel, is the f32
phase's dominant cost. This script times the factorize and its subparts
with ALL outputs consumed (threaded through the scan carry), LOOP_N vs
LOOP_B trips:

  full     — factorize_l as the solver runs it (lane wrappers included)
  chain    — chain_blocks_factor_lanes kernel alone
  crown    — crown_blocks_factor kernel alone (inputs precomputed)
  glue     — diagW einsum + sW + s_node/s_root + Wadd scatter (no kernels)
  scatter  — the Wadd .at[].add scatter alone
  lanes    — the lane_cr/lane_ch output conversions alone
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import bench
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm

LOOP_N = int(os.environ.get("TREEQP_PROF_LOOP", "512"))
LOOP_B = int(os.environ.get("TREEQP_PROF_LOOP_BASE", "64"))
NREP = int(os.environ.get("TREEQP_PROF_NREP", "5"))


def main():
    from treeqp_tpu.ops import chain_kernels as ck
    from treeqp_tpu.ops import crown_kernels as ckr
    from treeqp_tpu.ops import iter_kernel as ik

    variant = os.environ.get("TREEQP_PROF_VARIANT", "full")

    qp, ms = bench.build_problem()
    ms = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    meta = ms.meta
    prep = td._get_prep(meta.crown_topo)
    f32 = jnp.float32
    opts = bench.bench_opts(True)
    optsA = dataclasses.replace(
        opts, refine_steps=0, tol=max(opts.f32_phase_tol, opts.tol),
        ls_batch=4)

    xm_cr, um_cr, nrxm_cr = td._masks(ms.crown)
    rid = np.asarray(meta.root_ids)
    g_of = prep.group_of_node[rid]
    slot = prep.slot_of_node[rid]
    nxm = meta.crown_topo.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]

    data_l = ck.chain_eval_data(ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd,
                                ms.xmin, ms.xmax, ms.umin, ms.umax, ms.b)
    crown_ed = ckr.crown_eval_data(ms.crown, prep, xm_cr, um_cr, nrxm_cr)
    NPc, _ = ckr._get_eval_sched(prep)
    SP = data_l["ABt"].shape[-1]
    Nn = meta.crown_topo.Nn
    L = ms.b.shape[1]
    nx = ms.A.shape[-1]

    lane_cr = lambda v: jnp.pad(v.T, ((0, 0), (0, NPc - Nn)))
    lane_ch = lambda v: ck._pad_s(jnp.transpose(v, (1, 2, 0)), SP)
    un_cr = lambda v: v[:, :Nn].T

    NPg = ckr._get_sched(prep).NPg
    zero_fact = dict(
        Lt=jnp.zeros((L, nx, nx, SP), f32),
        CUt=jnp.zeros((L, nx, nx, SP), f32),
        CholW=jnp.zeros((prep.G, prep.G, NPg), f32),
        CholUt=jnp.zeros((nxm, prep.G, NPg), f32),
        s_node_l=jnp.zeros((nxm, NPc), f32),
        sc_l=jnp.zeros((L, nx, SP), f32))

    def kcall_eval():
        state = dict(lam_cr=jnp.zeros((nxm, NPc), f32),
                     lam_ch=jnp.zeros((L, nx, SP), f32),
                     res_cr=jnp.zeros((nxm, NPc), f32),
                     res_ch=jnp.zeros((L, nx, SP), f32))
        return ik.newton_iter(data_l, crown_ed, zero_fact, state, prep,
                              meta.root_ids, meta, mode="eval")

    out0 = jax.block_until_ready(jax.jit(kcall_eval)())

    # ---- shared precomputed pieces (host-side, static)
    kidsP, kv = prep.kidsP, jnp.asarray(prep.kvalid, f32)
    ar = np.arange(nxm)
    rows_all = prep.gslot[:, None] * nxm + ar[None, :]
    dad_safe = np.maximum(prep.gdad, 0)
    A32 = ms.crown.A.astype(f32)
    B32 = ms.crown.B.astype(f32)

    def timed(name, build):
        """build(n) -> jitted prog(args) with n inner trips."""
        f1, fN, args = build(LOOP_B), build(LOOP_N), ()
        jax.block_until_ready(f1())
        jax.block_until_ready(fN())
        t1s, tNs = [], []
        for _ in range(NREP):
            t0 = time.perf_counter()
            jax.block_until_ready(f1())
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(fN())
            tNs.append(time.perf_counter() - t0)
        per = (min(tNs) - min(t1s)) / (LOOP_N - LOOP_B)
        print(f"{name:10s} {per * 1e6:8.2f} us/call")

    qtl0, rtl0 = out0["qtilde"], out0["rtilde"]
    qt0, rt0 = out0["qt"], out0["rt"]

    def consume(tree):
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype"))

    if variant == "full":
        def build(n):
            def body(carry, _):
                qtl, rtl, qt, rt = carry
                fact = tm._ms_factorize(ms, un_cr(qtl), un_cr(rtl), qt, rt,
                                        optsA, prep, g_of, rows, nrxm_cr,
                                        f32, chain_lanes=data_l)
                full = dict(fact, s_node_l=lane_cr(fact["s_node"]),
                            sc_l=lane_ch(fact["sc"]))
                eps = consume(full) * 1e-30
                return (qtl + eps, rtl, qt, rt), None
            def prog():
                carry, _ = jax.lax.scan(body, (qtl0, rtl0, qt0, rt0), None,
                                        length=n)
                return carry[0]
            return jax.jit(prog)
        timed("full", build)

    elif variant == "chain":
        ztp_root = jnp.concatenate([un_cr(qtl0)[rid], un_cr(rtl0)[rid]],
                                   axis=-1).astype(f32)
        s_root = jnp.ones((meta.S, nx), f32)
        def build(n):
            def body(carry, _):
                qt, rt = carry
                Ls, CUs, schur0, sc = ck.chain_blocks_factor_lanes(
                    data_l["ABt"], qt, rt, ztp_root, s_root)
                eps = (consume((Ls, CUs, schur0, sc))) * 1e-30
                return (qt + eps, rt), None
            def prog():
                carry, _ = jax.lax.scan(body, (qt0, rt0), None, length=n)
                return carry[0]
            return jax.jit(prog)
        timed("chain", build)

    elif variant in ("crown", "glue", "scatter"):
        qtilde_cr = un_cr(qtl0)
        rtilde_cr = un_cr(rtl0)
        schur0 = jnp.zeros((meta.S, nx, nx), f32) + 1e-3

        def glue_part(qtilde32, with_scatter=True, with_einsum=True):
            ABk = jnp.concatenate([A32[kidsP], B32[kidsP]],
                                  axis=-1) * kv[:, :, None, None]
            ztp = jnp.concatenate([qtilde32, rtilde_cr.astype(f32)],
                                  axis=-1)[prep.gnodes]
            dvals = jnp.where(kv[:, :, None] > 0, qtilde32[kidsP],
                              jnp.ones((), f32)).reshape(prep.NpG, prep.G)
            if with_einsum:
                diagW = (jnp.einsum("gkin,gn,gkin->gki", ABk, ztp, ABk)
                         .reshape(prep.NpG, prep.G) + dvals)
            else:
                diagW = dvals
            sW = jax.lax.rsqrt(jnp.maximum(diagW, 1e-12))
            sUt_rows = sW[dad_safe[:, None], rows_all]
            s_root = sW[g_of[:, None], rows]
            s_node = td._group_to_nodes(sW, prep, f32) * nrxm_cr
            Wadd = jnp.zeros((prep.NpG, prep.G, prep.G), f32)
            if with_scatter:
                Wadd = Wadd.at[g_of[:, None, None], rows[:, :, None],
                               rows[:, None, :]].add(-schur0)
            return ABk, ztp, dvals, sW, sUt_rows, s_root, s_node, Wadd

        if variant == "crown":
            parts0 = jax.jit(lambda: glue_part(qtilde_cr))()
            parts0 = jax.block_until_ready(parts0)
            ABk0, ztp0, dvals0, sW0, sUt0, _, _, Wadd0 = parts0
            def build(n):
                def body(carry, _):
                    ztp = carry
                    CholW, CholUt = ckr.crown_blocks_factor(
                        ABk0, ztp, dvals0, sW0, sUt0, Wadd0, prep,
                        reg=optsA.reg_value)
                    eps = consume((CholW, CholUt)) * 1e-30
                    return ztp + eps, None
                def prog():
                    carry, _ = jax.lax.scan(body, ztp0, None, length=n)
                    return carry
                return jax.jit(prog)
            timed("crown", build)
        else:
            ws = variant == "scatter"
            def build(n):
                def body(carry, _):
                    qtilde32 = carry
                    outs = glue_part(qtilde32, with_scatter=True,
                                     with_einsum=not ws)
                    eps = consume(outs) * 1e-30
                    return qtilde32 + eps, None
                def prog():
                    carry, _ = jax.lax.scan(body, qtilde_cr, None, length=n)
                    return carry
                return jax.jit(prog)
            timed(variant, build)

    elif variant == "lanes":
        s_node0 = jnp.ones((Nn, nxm), f32)
        sc0 = jnp.ones((meta.S, L, nx), f32)
        def build(n):
            def body(carry, _):
                s_node, sc = carry
                a = lane_cr(s_node)
                b = lane_ch(sc)
                eps = (jnp.sum(jnp.abs(a)) + jnp.sum(jnp.abs(b))) * 1e-30
                return (s_node + eps, sc), None
            def prog():
                carry, _ = jax.lax.scan(body, (s_node0, sc0), None, length=n)
                return carry[0]
            return jax.jit(prog)
        timed("lanes", build)


if __name__ == "__main__":
    main()
