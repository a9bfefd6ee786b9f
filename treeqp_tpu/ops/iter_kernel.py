"""Whole-Newton-iteration mega-kernel for the f32 coarse phase.

After the round-3/4 fusion ladder the f32 Newton iteration still executes
as ~5 Pallas launches (solve, chain/crown eval, factorize pair) plus
~20-30 XLA glue fusions (layout conversions, equilibration scaling,
reductions, scalar logic) — at ~5-9 us/launch the iteration stays
LAUNCH-bound (~0.30 ms vs ~0.1 ms of op throughput). This kernel fuses
the entire common-path iteration into ONE launch:

    system solve (chain bwd -> crown tree solve -> chain fwd, stored
    factors)  ->  Armijo directional derivative  ->  tau=1 trial point
    ->  chain + crown stage evaluation at the trial point (clipping
    solves, active sets, dual residuals, dual-value partials)  ->
    residual completion + error partials

All cross-layout traffic (scenario<->crown-lane, node-lane<->group-lane)
rides static 0/1 MXU matmuls, and every intermediate stays in VMEM.
Scalar reductions leave the kernel as per-lane partials (the pattern the
eval kernels already use); acceptance, patience/restart bookkeeping, the
reject-only batched line search, and factorize-on-active-set-change stay
OUTSIDE as scalar XLA / conditional launches — the kernel computes the
trial quantities they need (direction, trial lambda/residuals/active
sets, dual-value/derivative/error partials).

Reference scope: one iteration of the dual-Newton loop,
dual_Newton_tree.c:218-330 (solve + line search first trial) with
clipping stage QPs — the hot loop of the headline benchmark.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops.chain_kernels import _TS, _interpret
from treeqp_tpu.ops.crown_kernels import (
    _NP, _PARAMS, _get_sched, _get_eval_sched, _ltrsv, _uttrsv, _lane_mm,
    _lane_mm_t)
from treeqp_tpu.ops.system_kernels import ms_sched

__all__ = ["iter_sched", "iter_supported", "newton_iter"]


def iter_sched(prep, root_ids, S):
    """Static cross-layout matrices for the mega-kernel, cached on prep:
    N2G [K, NPc, NP] node-lane -> group-lane (slot blocks) and
    R_inj [SP, NPc] chain-root scenario lanes -> crown node lanes."""
    key = ("_iter_sched", tuple(root_ids), S)
    cached = getattr(prep, "_iter_sched_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    NPc, _ = _get_eval_sched(prep)
    K, NpG = prep.K, prep.NpG
    NPg = _get_sched(prep).NPg
    SP = max(_TS, ((S + _TS - 1) // _TS) * _TS)
    N2G = np.zeros((K, NPc, NPg), np.float32)
    for g in range(NpG):
        for k in range(K):
            if prep.kvalid[g, k]:
                N2G[k, prep.kidsP[g, k], g] = 1.0
    R = np.zeros((SP, NPc), np.float32)
    for s, n in enumerate(np.asarray(root_ids)):
        R[s, n] = 1.0
    sched = (N2G, R)
    prep._iter_sched_cache = (key, sched)
    return sched


def iter_supported(prep, meta, opts) -> bool:
    from treeqp_tpu.ops.crown_kernels import crown_eval_supported
    from treeqp_tpu.ops.system_kernels import system_supported
    return (system_supported(prep, meta, opts)
            and crown_eval_supported(prep))


def newton_iter(data_ch, data_cr, fact_l, state, prep, root_ids, meta,
                mode="iter"):
    """One fused Newton iteration (common path, tau = 1 trial).

    data_ch: chain_kernels.chain_eval_data dict (lane layout).
    data_cr: crown_kernels.crown_eval_data dict (node-lane layout).
    fact_l: dict(Lt, CUt, CholW, CholUt, s_node_l [nxm, NPc],
            sc_l [L, n, SP]) — stored factors + lane-layout scales.
    state: dict(lam_cr [nxm, NPc], lam_ch [L, nx, SP],
            res_cr [nxm, NPc], res_ch [L, nx, SP]).
    Returns dict of trial quantities; f1/dot/err arrive as lane partials
    ``f1p/dotp/errp`` = ([1, SP], [1, NPc]) pairs reduced by the caller.

    ``mode="eval"`` skips the solve: ``state``'s lam IS the trial point
    and only the evaluation half runs — the building block of the
    reject-only batched line search (vmapped over trial step sizes).
    """
    sched = _get_sched(prep)
    G, nxm, n_lev, K = sched.G, sched.nxm, sched.n_lev, sched.K
    NPg = sched.NPg
    ABt = data_ch["ABt"]
    L, nx, nz, SP = ABt.shape
    nu = nz - nx
    NPc, _ = _get_eval_sched(prep)
    ncr = data_cr["ABt"].shape[0]   # crown nxm
    nzc = data_cr["ABt"].shape[1]
    nuc = nzc - ncr
    S = meta.S
    N2G, R = (jnp.asarray(v) for v in iter_sched(prep, root_ids, S))
    J = jnp.asarray(ms_sched(prep, root_ids, S))
    Pm = jnp.asarray(sched.P)
    Mm = jnp.asarray(sched.masks)

    def kernel(cABt, cq, cr_, cQd, cRd, cQi, cRi, cxlo, cxhi, culo, cuhi,
               cb,
               kABt, kPp, kq, kr, kb, kQd, kRd, kQi, kRi, kxlo, kxhi,
               kulo, kuhi, kxm, kum, knr,
               Lt_ref, CUt_ref, CW_ref, CUc_ref, sN_ref, sc_ref,
               Pm_ref, Mm_ref, J_ref, N2G_ref, R_ref,
               lamc_ref, lamh_ref, resc_ref, resh_ref,
               dcr_o, dch_o, lam2c_o, lam2h_o, res2c_o, res2h_o,
               qt_o, rt_o, qtl_o, rtl_o, x_o, u_o, cx_o, cu_o,
               f1s_o, f1c_o, dots_o, dotc_o, errs_o, errc_o, ys_scr):
        def _eval_half(lam2c):
            # ---- 6. chain stage evaluation at the trial point
            facc = jnp.zeros((1, SP), jnp.float32)
            errs = jnp.zeros((1, SP), jnp.float32)
            x_prev = u_prev = None
            res0_part = None
            for j in range(L):
                lam_j = lam2h_o[j]
                qmod = -cq[j] + lam_j
                rmod = -cr_[j]
                if j < L - 1:
                    ABn = cABt[j + 1]
                    lam_n = lam2h_o[j + 1]
                    up = sum(ABn[row] * lam_n[row:row + 1] for row in range(nx))
                    qmod = qmod - up[:nx]
                    rmod = rmod - up[nx:]
                xU = cQi[j] * qmod
                uU = cRi[j] * rmod
                xlo, xhi = cxlo[j], cxhi[j]
                ulo, uhi = culo[j], cuhi[j]
                x = jnp.minimum(jnp.maximum(xU, xlo), xhi)
                u = jnp.minimum(jnp.maximum(uU, ulo), uhi)
                qt = jnp.where((xU > xhi) | (xU < xlo), 0.0, cQi[j])
                rt = jnp.where((uU > uhi) | (uU < ulo), 0.0, cRi[j])
                x_o[j] = x
                u_o[j] = u
                qt_o[j] = qt
                rt_o[j] = rt
                res_j = cb[j] - x
                if j > 0:
                    ABj = cABt[j]
                    res_j = res_j \
                        + sum(ABj[:, i] * x_prev[i:i + 1] for i in range(nx)) \
                        + sum(ABj[:, nx + i] * u_prev[i:i + 1] for i in range(nu))
                    res2h_o[j] = res_j
                    for i in range(nx):
                        errs = jnp.maximum(errs, jnp.abs(res_j[i:i + 1]))
                else:
                    res0_part = res_j
                x_prev, u_prev = x, u
                tx = x * (qmod - 0.5 * cQd[j] * x) - cb[j] * lam_j
                tu = u * (rmod - 0.5 * cRd[j] * u)
                facc = facc + sum(tx[i:i + 1] for i in range(nx)) \
                    + sum(tu[i:i + 1] for i in range(nu))
            AB0 = cABt[0]
            lam_0 = lam2h_o[0]
            cqr = sum(AB0[row] * lam_0[row:row + 1] for row in range(nx))
            f1s_o[...] = facc
            # ---- 7. crown stage evaluation (chain contributions injected)
            extra = _lane_mm(cqr, R_ref[...])               # [nz, NPc]
            kAB = kABt[...]
            lam_m = lam2c
            xmk = kxm[...]
            umk = kum[...]
            nrk = knr[...]
            AtBtL = jnp.concatenate(
                [sum(kAB[j, i][None] * lam_m[j:j + 1] for j in range(ncr))
                 for i in range(nzc)], axis=0)
            sum_AB = _lane_mm_t(AtBtL, kPp[...]) + extra
            qmodc = (-kq[...] + lam_m - sum_AB[:ncr]) * xmk
            rmodc = (-kr[...] - sum_AB[ncr:]) * umk
            xUc = kQi[...] * qmodc
            uUc = kRi[...] * rmodc
            xc = jnp.minimum(jnp.maximum(xUc, kxlo[...]), kxhi[...]) * xmk
            uc = jnp.minimum(jnp.maximum(uUc, kulo[...]), kuhi[...]) * umk
            qtl = jnp.where((xUc > kxhi[...]) | (xUc < kxlo[...]), 0.0, kQi[...])
            rtl = jnp.where((uUc > kuhi[...]) | (uUc < kulo[...]), 0.0, kRi[...])
            cx_o[...] = xc
            cu_o[...] = uc
            qtl_o[...] = qtl
            rtl_o[...] = rtl
            zp = _lane_mm(jnp.concatenate([xc, uc], axis=0), kPp[...])
            resc = jnp.concatenate(
                [sum(kAB[i, c][None] * zp[c:c + 1] for c in range(nzc))
                 for i in range(ncr)], axis=0)
            resc = (resc + kb[...] - xc) * nrk
            res2c_o[...] = resc
            txc = xc * (qmodc - 0.5 * kQd[...] * xc) - kb[...] * lam_m * nrk
            tuc = uc * (rmodc - 0.5 * kRd[...] * uc)
            f1c_o[...] = (sum(txc[i:i + 1] for i in range(ncr))
                          + sum(tuc[i:i + 1] for i in range(nuc)))
            errc = jnp.zeros((1, NPc), jnp.float32)
            for i in range(ncr):
                errc = jnp.maximum(errc, jnp.abs(resc[i:i + 1]))
            errc_o[...] = errc
            # ---- 8. chain residual j=0 completion (crown z at the roots)
            zr = _lane_mm_t(jnp.concatenate([xc, uc], axis=0), R_ref[...])
            res0 = res0_part + sum(AB0[:, c] * zr[c:c + 1] for c in range(nz))
            res2h_o[0] = res0
            for i in range(nx):
                errs = jnp.maximum(errs, jnp.abs(res0[i:i + 1]))
            errs_o[...] = errs

        if mode == "eval":
            # trial point given: evaluation half only
            lam2c = lamc_ref[...]
            lam2c_o[...] = lam2c
            for j in range(L):
                lam2h_o[j] = lamh_ref[j]
            dcr_o[...] = jnp.zeros((ncr, NPc), jnp.float32)
            dotc_o[...] = jnp.zeros((1, NPc), jnp.float32)
            dots_o[...] = jnp.zeros((1, SP), jnp.float32)
            for j in range(L):
                dch_o[j] = jnp.zeros((nx, SP), jnp.float32)
            _eval_half(lam2c)
            return
        sN = sN_ref[...]
        # ---- 1. equilibrated RHS in solver layouts
        rcr_s = resc_ref[...] * sN                      # [ncr, NPc]
        rg = jnp.concatenate(
            [_lane_mm(rcr_s, N2G_ref[k]) for k in range(K)], axis=0)
        # ---- 2. chain backward sweep
        radd = jnp.zeros((nx, SP), rcr_s.dtype)
        for j in range(L - 1, -1, -1):
            y = _ltrsv(Lt_ref[j], resh_ref[j] * sc_ref[j] - radd, nx)
            ys_scr[j] = y
            CU = CUt_ref[j]
            radd = sum(CU[:, k] * y[k:k + 1] for k in range(nx))
        rv = rg - jnp.concatenate(
            [_lane_mm(radd, J_ref[k]) for k in range(K)], axis=0)
        # ---- 3. crown tree solve (cf. system_kernels.system_solve)
        Lv = CW_ref[...]
        CUv = CUc_ref[...]
        ysv = jnp.zeros((G, NPg), rv.dtype)
        for r_lev in range(n_lev):
            yc = _ltrsv(Lv, rv, G)
            m = Mm_ref[r_lev]
            ysv = jnp.where(m, yc, ysv)
            ym = yc * m
            ra = sum(CUv[:, g] * ym[g:g + 1] for g in range(G))
            rv = rv - jnp.concatenate(
                [_lane_mm(ra, Pm_ref[s]) for s in range(K)], axis=0)
        y0 = _ltrsv(Lv, rv, G)
        ysv = jnp.where(Mm_ref[n_lev], y0, ysv)
        dlv = jnp.where(Mm_ref[n_lev], _uttrsv(Lv, ysv, G), 0.0)
        for r_lev in range(n_lev - 1, -1, -1):
            dp = sum(_lane_mm_t(dlv[s * nxm:(s + 1) * nxm], Pm_ref[s])
                     for s in range(K))
            d = ysv - sum(CUv[i] * dp[i:i + 1] for i in range(nxm))
            dlc = _uttrsv(Lv, d, G)
            dlv = jnp.where(Mm_ref[r_lev], dlc, dlv)
        # ---- 4. crown solution back to node lanes (+ scaling)
        dn = sum(_lane_mm_t(dlv[k * nxm:(k + 1) * nxm], N2G_ref[k])
                 for k in range(K))                     # [ncr, NPc]
        dcr = dn * sN
        dcr_o[...] = dcr
        lam2c = lamc_ref[...] + dcr
        lam2c_o[...] = lam2c
        dotc_o[...] = -sum((resc_ref[...] * dcr)[i:i + 1]
                           for i in range(ncr))         # [1, NPc]
        # ---- 5. chain forward substitution (+ scaling) + dot partials
        dp = sum(_lane_mm_t(dlv[k * nx:(k + 1) * nx], J_ref[k])
                 for k in range(K))                     # [nx, SP]
        dots = jnp.zeros((1, SP), rcr_s.dtype)
        for j in range(L):
            yj = ys_scr[j]
            CU = CUt_ref[j]
            d = yj - sum(CU[k] * dp[k:k + 1] for k in range(nx))
            dl = _uttrsv(Lt_ref[j], d, nx)
            dchj = dl * sc_ref[j]
            dch_o[j] = dchj
            lam2h_o[j] = lamh_ref[j] + dchj
            prod = resh_ref[j] * dchj
            dots = dots + sum(prod[i:i + 1] for i in range(nx))
            dp = dl
        dots_o[...] = -dots
        _eval_half(lam2c)



    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    c3 = lambda n: spec((L, n, SP))
    kv = lambda rows: spec((rows, NPc))
    sl = spec((1, SP))
    cl = spec((1, NPc))
    in_specs = [
        spec((L, nx, nz, SP)), c3(nx), c3(nu), c3(nx), c3(nu), c3(nx),
        c3(nu), c3(nx), c3(nx), c3(nu), c3(nu), c3(nx),
        spec((ncr, nzc, NPc)), spec((NPc, NPc)), kv(ncr), kv(nuc), kv(ncr),
        kv(ncr), kv(nuc), kv(ncr), kv(nuc), kv(ncr), kv(ncr), kv(nuc),
        kv(nuc), kv(ncr), kv(nuc), kv(ncr),
        spec(fact_l["Lt"].shape), spec(fact_l["CUt"].shape),
        spec(fact_l["CholW"].shape), spec(fact_l["CholUt"].shape),
        kv(ncr), c3(nx),
        spec(Pm.shape), spec(Mm.shape), spec(J.shape), spec(N2G.shape),
        spec((SP, NPc)),
        kv(ncr), c3(nx), kv(ncr), c3(nx),
    ]
    out_specs = (kv(ncr), c3(nx), kv(ncr), c3(nx), kv(ncr), c3(nx),
                 c3(nx), c3(nu), kv(ncr), kv(nuc), c3(nx), c3(nu),
                 kv(ncr), kv(nuc),
                 sl, cl, sl, cl, sl, cl)
    out_shape = tuple(
        jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
        ((ncr, NPc), (L, nx, SP), (ncr, NPc), (L, nx, SP), (ncr, NPc),
         (L, nx, SP), (L, nx, SP), (L, nu, SP), (ncr, NPc), (nuc, NPc),
         (L, nx, SP), (L, nu, SP), (ncr, NPc), (nuc, NPc),
         (1, SP), (1, NPc), (1, SP), (1, NPc), (1, SP), (1, NPc)))
    args = (
        ABt, data_ch["q"], data_ch["r"], data_ch["Qd"], data_ch["Rd"],
        data_ch["Qinv"], data_ch["Rinv"], data_ch["xmin"], data_ch["xmax"],
        data_ch["umin"], data_ch["umax"], data_ch["b"],
        data_cr["ABt"], data_cr["P_par"], data_cr["q"], data_cr["r"],
        data_cr["b"], data_cr["Qd"], data_cr["Rd"], data_cr["Qinv"],
        data_cr["Rinv"], data_cr["xmin"], data_cr["xmax"], data_cr["umin"],
        data_cr["umax"], data_cr["xm"], data_cr["um"], data_cr["nrxm"],
        fact_l["Lt"], fact_l["CUt"], fact_l["CholW"], fact_l["CholUt"],
        fact_l["s_node_l"], fact_l["sc_l"],
        Pm, Mm, J, N2G, R,
        state["lam_cr"], state["lam_ch"], state["res_cr"], state["res_ch"],
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((L, nx, SP), jnp.float32)],
            interpret=_interpret(), compiler_params=_PARAMS,
        )(*args)
    (dcr, dch, lam2c, lam2h, res2c, res2h, qt, rt, qtl, rtl,
     x, u, cx, cu, f1s, f1c, dots, dotc, errs, errc) = outs
    return dict(dcr=dcr, dch=dch, lam2_cr=lam2c, lam2_ch=lam2h,
                res2_cr=res2c, res2_ch=res2h, qt=qt, rt=rt,
                qtilde=qtl, rtilde=rtl, x=x, u=u, cx=cx, cu=cu,
                f1p=(f1s, f1c), dotp=(dots, dotc), errp=(errs, errc))
