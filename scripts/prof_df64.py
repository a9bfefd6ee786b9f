"""Component timing of the df64-phase Newton iteration on the headline
tree (per-iteration cost ~0.43 ms measured; this attributes it).

Variants (TREEQP_PROF_VARIANT):
  eval    — fused_stage_solve (chain_eval_df + crown_eval_df + scatter)
  resid   — fused_residuals from eval outputs
  solve   — _make_ms_solve solve() call (fused system kernel + glue)
  apply   — apply_M_of (chain_apply_df + crown_apply_df + glue)
  reduce  — _sum_terms (df_reduce) of a dual-value-sized operand set
  trans   — 6x node<->lane transposes of [S, L, nx] (the wrapper tax)
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
from treeqp_tpu.ops import df64 as df
from treeqp_tpu.ops.df64 import Df
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm
from treeqp_tpu.solvers import ms_df64 as md

LOOP_N = int(os.environ.get("TREEQP_PROF_LOOP", "512"))
LOOP_B = int(os.environ.get("TREEQP_PROF_LOOP_BASE", "64"))
NREP = int(os.environ.get("TREEQP_PROF_NREP", "5"))
f32 = jnp.float32


def main():
    from treeqp_tpu.ops import df_eval_kernels as dek

    variant = os.environ.get("TREEQP_PROF_VARIANT", "eval")

    qp, ms = bench.build_problem()
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    meta_ms = ms.meta
    prep_cr = td._get_prep(meta_ms.crown_topo)
    opts = bench.bench_opts(True)

    rid = np.asarray(meta_ms.root_ids)
    g_of = prep_cr.group_of_node[rid]
    slot = prep_cr.slot_of_node[rid]
    nxm = meta_ms.crown_topo.nxm
    rows = slot[:, None] * nxm + np.arange(nxm)[None, :]
    xm_cr, um_cr, nrxm_cr = td._masks(ms.crown)
    nrxm = nrxm_cr.astype(f32)

    data_ch = dek.chain_eval_df_data(
        ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd, ms.xmin, ms.xmax,
        ms.umin, ms.umax, ms.b)
    data_cr = dek.crown_eval_df_data(ms.crown, prep_cr, xm_cr, um_cr,
                                     nrxm_cr)
    NPc = data_cr["ABt"][0].shape[2]
    nz_ch = ms.A.shape[-1] + ms.B.shape[-1]
    S = ms.b.shape[0]
    L = ms.b.shape[1]
    nx = ms.A.shape[-1]
    Nn = meta_ms.crown_topo.Nn

    Rsc = np.zeros((S, NPc), np.float32)
    Rsc[np.arange(S), rid] = 1.0
    Rs_cols = jnp.asarray(Rsc)
    Rg = np.zeros((S, Nn), np.float32)
    Rg[np.arange(S), rid] = 1.0
    Rg_rows = jnp.asarray(Rg)

    lam_cr0 = Df(jnp.zeros((Nn, nxm), f32), jnp.zeros((Nn, nxm), f32))
    lam_ch0 = Df(jnp.zeros((S, L, nx), f32), jnp.zeros((S, L, nx), f32))

    def scat_cols(v):
        return Df(v.hi.T @ Rs_cols, v.lo.T @ Rs_cols)

    def gather_rows(v):
        return Df(Rg_rows @ v.hi, Rg_rows @ v.lo)

    def stage_solve(lam_cr, lam_ch):
        ch = dek.chain_eval_df(data_ch, lam_ch)
        extra = scat_cols(ch["cqr"])
        cr = dek.crown_eval_df(data_cr, lam_cr, extra)
        return cr, ch

    ab0t = df.from_f64(jnp.concatenate(
        [ms.A.swapaxes(2, 3), ms.B.swapaxes(2, 3)], axis=2)[:, 0])

    def cat2(xs, axis):
        return Df(jnp.concatenate([x.hi for x in xs], axis),
                  jnp.concatenate([x.lo for x in xs], axis))

    def residuals(cr, ch):
        res_cr = cr["res"]
        zr = cat2([gather_rows(cr["x"]), gather_rows(cr["u"])], 1)
        a0z = md._contract(ab0t, zr, axis=1)
        row0 = df.add(ch["res_part"][:, 0], a0z)
        res_ch = Df(
            jnp.concatenate([row0.hi[:, None], ch["res_part"].hi[:, 1:]], 1),
            jnp.concatenate([row0.lo[:, None], ch["res_part"].lo[:, 1:]], 1))
        return res_cr, res_ch

    # concrete eval outputs + factorization for downstream pieces
    @jax.jit
    def setup():
        cr, ch = stage_solve(lam_cr0, lam_ch0)
        res_cr, res_ch = residuals(cr, ch)
        fact = tm._ms_factorize(
            ms, cr["qtilde"].hi, cr["rtilde"].hi, ch["qt"].hi,
            ch["rt"].hi, opts, prep_cr, g_of, rows, nrxm, f32,
            chain_lanes={"ABt": data_ch["ABt"][0]})
        return cr, ch, res_cr, res_ch, fact

    cr0, ch0, res_cr0, res_ch0, fact0 = jax.block_until_ready(setup())
    crown_kind, fused = tm._solve_backends(prep_cr, meta_ms, opts)

    def timed(build):
        f1, fN = build(LOOP_B), build(LOOP_N)
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
        print(f"{variant:8s} {per * 1e6:8.2f} us/call")

    def consume(tree):
        return sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype"))

    def scan_over(body, x0):
        def build(n):
            def prog():
                carry, _ = jax.lax.scan(
                    lambda c, _: (body(c), None), x0, None, length=n)
                return carry
            return jax.jit(prog)
        return build

    if variant == "eval":
        def body(lam):
            cr, ch = stage_solve(Df(lam[0], lam[1]),
                                 Df(lam[2], lam[3]))
            eps = consume((cr, ch)) * 1e-30
            return (lam[0] + eps, lam[1], lam[2], lam[3])
        timed(scan_over(body, (lam_cr0.hi, lam_cr0.lo,
                               lam_ch0.hi, lam_ch0.lo)))
    elif variant == "resid":
        def body(x):
            res_cr, res_ch = residuals(cr0, ch0)
            eps = consume((res_cr, res_ch)) * 1e-30 + x * 1e-30
            return eps
        # note: cr0/ch0 constant — add x-dependence via a perturbed copy
        cr_x = dict(cr0)
        def body2(x):
            cr_p = dict(cr0, x=Df(cr0["x"].hi + x * 1e-30, cr0["x"].lo))
            res_cr, res_ch = residuals(cr_p, ch0)
            return consume((res_cr, res_ch)) * 1e-30
        timed(scan_over(body2, jnp.zeros((), f32)))
    elif variant == "solve":
        solve = tm._make_ms_solve(fact0, meta_ms, prep_cr, opts, f32,
                                  nrxm, g_of, rows, rid, crown_kind, fused)
        def body(c):
            rc, rh = c
            dcr, dch = solve(rc, rh)
            eps = (jnp.sum(jnp.abs(dcr)) + jnp.sum(jnp.abs(dch))) * 1e-30
            return (rc + eps, rh)
        timed(scan_over(body, (res_cr0.hi, res_ch0.hi)))
    elif variant == "apply":
        def to_lane_cr(v):
            pad = NPc - v.hi.shape[0]
            t = lambda w: jnp.pad(jnp.transpose(w, (1, 0)),
                                  ((0, 0), (0, pad)))
            return Df(t(v.hi), t(v.lo))
        def body(c):
            dcr, dch = c
            cha = dek.chain_apply_df(data_ch, ch0["qt"], ch0["rt"], dch)
            extra = scat_cols(cha["cqr"])
            cra = dek.crown_apply_df(data_cr, to_lane_cr(cr0["qtilde"]),
                                     to_lane_cr(cr0["rtilde"]), dcr, extra)
            zr = cat2([gather_rows(cra["xl"]), gather_rows(cra["ul"])], 1)
            a0z = md._contract(ab0t, zr, axis=1)
            eps = consume((cra["res"], a0z, cha["res_part"])) * 1e-30
            return (dcr + eps, dch)
        timed(scan_over(body, (jnp.ones((Nn, nxm), f32),
                               jnp.ones((S, L, nx), f32))))
    elif variant == "reduce":
        def body(x):
            t1 = Df(res_cr0.hi + x * 1e-30, res_cr0.lo)
            s = md._sum_terms([df.mul_f32(t1, res_cr0.hi),
                               df.mul_f32(res_ch0, res_ch0.hi)])
            return s.hi * 1e-30
        timed(scan_over(body, jnp.zeros((), f32)))
    elif variant == "trans":
        def body(v):
            a = jnp.transpose(v, (1, 2, 0))        # [L, nx, S]
            b = jnp.transpose(a, (2, 0, 1))        # back
            c = jnp.transpose(b, (1, 2, 0))
            d = jnp.transpose(c, (2, 0, 1))
            e = jnp.transpose(d, (1, 2, 0))
            f_ = jnp.transpose(e, (2, 0, 1))
            return f_ + 1e-30
        timed(scan_over(body, jnp.ones((S, L, nx), f32)))


if __name__ == "__main__":
    main()
