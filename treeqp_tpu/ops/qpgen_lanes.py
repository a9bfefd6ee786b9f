"""Lane-major batched general stage-QP solver (the qpOASES capability).

The node-major `_qpgen_batch` path (solvers/tdunes.py) operates on
[N, ng, ng] arrays: on TPU those put the tiny ng<=16 dims on the
sublane/lane axes (~8% lane utilization) and every f64 op runs doubled
through the X64 emulation — one masked-GHG build alone measured 24 ms at
N = 4437, a full polish 41 ms, the ADMM identification ~115 ms
(BENCH_NOTES round 4). This module re-lays the whole pipeline
lane-major ([ng, ng, NL] with nodes on the lane axis, the layout of the
rest of the kernel suite):

* the ADMM active-set identification runs as ONE Pallas launch with the
  entire iteration loop in-kernel (``admm_identify``);
* the PDAS sweeps + keep-best run as pure-f32 lane-major XLA (the sets
  and their ranking only — exact quantities are recomputed);
* the final polish and the elimination matrix P run lane-major with
  df64 (two-f32) arithmetic for every accuracy-critical quantity —
  same double-float schedule as the multistage df64 phase
  (solvers/ms_df64.py), reaching f64-quality complementarity without
  emulated-f64 tensor ops.

Reference scope: the qpOASES stage-QP plugin
(dual_Newton_tree_qpoases.c:153-214 elimination matrix, :218-356
init/hotstart); semantics mirror _qpgen_batch (same phases, same
guards, same hotstart contract).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops import df64 as df
from treeqp_tpu.ops.df64 import Df
from treeqp_tpu.core.qp_data import TREEQP_INF
from treeqp_tpu.ops.crown_kernels import _ltrsv, _uttrsv

__all__ = ["qpgen_lanes_enabled", "qpgen_solve_lanes"]

_TL = 128
_PIVOT_FLOOR = 1e-12
f32 = jnp.float32


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def qpgen_lanes_enabled(opts, dtype) -> bool:
    if os.environ.get("TREEQP_QPGEN_LANES") == "0":
        return False
    if os.environ.get("TREEQP_QPGEN_LANES") == "1":
        return True
    # round 5: f32 data rides the same pipeline (from_f64 of an f32
    # array is (x, 0) — the df64 internals just carry zero low words),
    # so the two-phase schedule's coarse phase no longer falls back to
    # the node-major batched path (~3x the per-iteration cost at 4437
    # nodes, measured round 5)
    return (opts.qpgen_factor_dtype == "float32"
            and dtype in (jnp.dtype(jnp.float64), jnp.dtype(jnp.float32))
            and jax.default_backend() in ("tpu", "axon"))


# ---------------------------------------------------------------------------
# layout helpers


def _pad_l(x, NL, fill=0.0):
    pad = NL - x.shape[-1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg, constant_values=fill)


def _t2(v, NL, fill=0.0):
    """[N, a] -> [a, NL]."""
    return _pad_l(jnp.transpose(v, (1, 0)), NL, fill)


def _t3(v, NL, fill=0.0):
    """[N, a, b] -> [a, b, NL]."""
    return _pad_l(jnp.transpose(v, (1, 2, 0)), NL, fill)


def _df2(v, NL, fill=0.0):
    return df.from_f64(_t2(v, NL, fill))


def _df3(v, NL, fill=0.0):
    return df.from_f64(_t3(v, NL, fill))


# ---------------------------------------------------------------------------
# lane linear algebra (pure jnp on [.., NL]; usable inside Pallas)


def _chol_lane(W, n, reg_row):
    """Lower Cholesky of [n, n, NL] f32 with per-lane diagonal shift
    ``reg_row`` [1, NL] (0 disables) and clamped pivots."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = []
    for k in range(n):
        a = W[:, k]
        if reg_row is not None:
            a = a + jnp.where(rowi == k, reg_row, 0.0)
        for m in range(k):
            a = a - cols[m] * cols[m][k:k + 1]
        d = jnp.maximum(a[k:k + 1], _PIVOT_FLOOR)
        dinv = jax.lax.rsqrt(d)
        col = jnp.where(rowi > k, a * dinv, 0.0) + \
            jnp.where(rowi == k, d * dinv, 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=1)


def _solve_lane(Lm, v, n):
    return _uttrsv(Lm, _ltrsv(Lm, v, n), n)


def _mv(A, x, k):
    """[m, k, NL] @ [k, NL] -> [m, NL] (f32)."""
    return sum(A[:, j] * x[j:j + 1] for j in range(k))


def _mv_t(A, x, m):
    """A' x: [m, k, NL], [m, NL] -> [k, NL] (f32)."""
    return sum(A[j] * x[j:j + 1] for j in range(m))


def _df_mv(A: Df, x: Df, k) -> Df:
    acc = None
    for j in range(k):
        t = df.mul(Df(A.hi[:, j], A.lo[:, j]),
                   Df(x.hi[j:j + 1], x.lo[j:j + 1]))
        acc = t if acc is None else df.add(acc, t)
    return acc


def _df_mv_t(A: Df, x: Df, m) -> Df:
    acc = None
    for j in range(m):
        t = df.mul(Df(A.hi[j], A.lo[j]),
                   Df(x.hi[j:j + 1], x.lo[j:j + 1]))
        acc = t if acc is None else df.add(acc, t)
    return acc


def _df_mm(A: Df, B: Df, k) -> Df:
    """[m, k, NL] @ [k, p, NL] -> [m, p, NL] df64."""
    acc = None
    for j in range(k):
        t = df.mul(Df(A.hi[:, j][:, None], A.lo[:, j][:, None]),
                   Df(B.hi[j][None], B.lo[j][None]))
        acc = t if acc is None else df.add(acc, t)
    return acc


def _df_mm_f32(A: Df, B32, k) -> Df:
    acc = None
    for j in range(k):
        t = df.mul_f32(Df(A.hi[:, j][:, None], A.lo[:, j][:, None]),
                       B32[j][None])
        acc = t if acc is None else df.add(acc, t)
    return acc


def _inv_lane(M, n, reg_row):
    """Per-lane SPD inverse via Cholesky, [n, n, NL] f32."""
    Lm = _chol_lane(M, n, reg_row)
    eye_cols = []
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for c in range(n):
        e = jnp.where(rowi == c, 1.0, 0.0) * jnp.ones_like(M[:, 0])
        eye_cols.append(_solve_lane(Lm, e, n))
    X = jnp.stack(eye_cols, axis=1)
    return 0.5 * (X + jnp.swapaxes(X, 0, 1))


# ---------------------------------------------------------------------------
# ADMM identification kernel (one launch, full loop)


def admm_identify(G_l, L_l, rho_l, lo_l, hi_l, h_l, z0_l, iters: int):
    """Scaled ADMM for all nodes, the whole loop in one Pallas launch.

    All operands [.., NL] f32. Returns lm [ng, NL] (the scaled residual
    multipliers; mu_admm = rho * lm)."""
    ng, nz, NL = G_l.shape

    def kernel(G_ref, L_ref, rho_ref, lo_ref, hi_ref, h_ref, z0_ref,
               lm_o):
        G = G_ref[...]
        Lm = L_ref[...]
        rho = rho_ref[...]
        lo = lo_ref[...]
        hi = hi_ref[...]
        h = h_ref[...]

        t0 = jnp.concatenate(
            [jnp.sum(G[g] * z0_ref[...], axis=0, keepdims=True)
             for g in range(ng)], axis=0)
        y0 = jnp.minimum(jnp.maximum(t0, lo), hi)

        def body(_, carry):
            y, lm = carry
            u = rho * (y - lm)
            rhs = h + sum(G[g] * u[g:g + 1] for g in range(ng))
            z = _solve_lane(Lm, rhs, nz)
            t = jnp.concatenate(
                [jnp.sum(G[g] * z, axis=0, keepdims=True)
                 for g in range(ng)], axis=0) + lm
            y = jnp.minimum(jnp.maximum(t, lo), hi)
            return (y, t - y)

        _, lm = jax.lax.fori_loop(0, iters, body,
                                  (y0, jnp.zeros_like(y0)))
        lm_o[...] = lm

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        lm = pl.pallas_call(
            kernel,
            in_specs=[spec(G_l.shape), spec(L_l.shape), spec(rho_l.shape),
                      spec(lo_l.shape), spec(hi_l.shape), spec(h_l.shape),
                      spec(z0_l.shape)],
            out_specs=spec((ng, NL)),
            out_shape=jax.ShapeDtypeStruct((ng, NL), f32),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(G_l, L_l, rho_l, lo_l, hi_l, h_l, z0_l)
    return lm


# ---------------------------------------------------------------------------
# the solver


def qpgen_solve_lanes(hmod, H, Hinv, G, lo, hi, m_lo, m_hi, rho_row,
                      L_admm, opts, ws=None, GH=None, GHG=None):
    """Drop-in replacement for _qpgen_batch on the f32-factored TPU path.

    Same arguments/returns (node-major in/out); see _qpgen_batch."""
    dt = hmod.dtype
    N, nz = hmod.shape
    ng = G.shape[1]
    NL = ((N + _TL - 1) // _TL) * _TL

    # ---- lane-major static data (loop-invariant given the QP data; XLA
    # hoists these out of Newton loops)
    if GH is None:
        GH = G @ Hinv
    if GHG is None:
        GHG = GH @ G.swapaxes(1, 2)
    lo_c = jnp.where(m_lo > 0, lo, -TREEQP_INF)
    hi_c = jnp.where(m_hi > 0, hi, TREEQP_INF)
    m_eq_n = ((hi_c - lo_c <= 1e-14) & (m_lo > 0) & (m_hi > 0))

    G_df = _df3(G, NL)
    GH_df = _df3(GH, NL)
    GHG_df = _df3(GHG, NL)
    Hinv_df = _df3(Hinv, NL)
    H_df = _df3(H, NL)
    lo_df = _df2(lo_c, NL, fill=-TREEQP_INF)
    hi_df = _df2(hi_c, NL, fill=TREEQP_INF)
    G32 = G_df.hi
    GHG32 = GHG_df.hi
    lo32, hi32 = lo_df.hi, hi_df.hi
    mlo = _t2(m_lo.astype(f32), NL)
    mhi = _t2(m_hi.astype(f32), NL)
    meq = _t2(m_eq_n.astype(f32), NL)
    mask = jnp.minimum(mlo + mhi, 1.0)
    h_df = _df2(hmod, NL)
    h32 = h_df.hi
    rho32 = _t2(rho_row.astype(f32), NL)
    L32 = _t3(L_admm.astype(f32), NL)
    # identity padding for the factor lanes
    if NL > N:
        eye_l = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (nz, nz, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (nz, nz, 1), 1), 1.0, 0.0)
        lane_pad = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, NL), 2) >= N)
        L32 = jnp.where(lane_pad, eye_l, L32)

    diagGHG = jnp.concatenate([GHG32[g, g:g + 1] for g in range(ng)], axis=0)
    c_pd = 1.0 / jnp.maximum(diagGHG, 1e-12)
    regM = 1e-13 * jnp.maximum(jnp.mean(diagGHG, axis=0, keepdims=True),
                               1e-30)

    # w = G H^-1 hmod in df64
    w_df = _df_mv(GH_df, h_df, nz)

    def _mfull32(m_act):
        M = m_act[:, None] * GHG32 * m_act[None, :]
        diag_fix = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (ng, ng, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (ng, ng, 1), 1),
            (1.0 - m_act)[:, None] + regM[None], 0.0)
        return M + diag_fix

    def mres_df_of(m_act):
        def mres_df(mu_df: Df) -> Df:
            """Unshifted working-set operator applied to a df64 mu."""
            inner = df.mul_f32(mu_df, m_act)
            t = df.mul_f32(_df_mv(GHG_df, inner, ng), m_act)
            # + (I - diag(m_act)) mu
            return df.add(t, df.mul_f32(mu_df, 1.0 - m_act))
        return mres_df

    def polish_df(m_up, m_dn):
        """Exact working-set solve: f32 factor (preconditioner) + df64
        residual refinement — same schedule as the node path's
        f32-factor + f64-residual passes. mu/t/res carry df64 accuracy
        so the PDAS classification and keep-best ranking match the f64
        semantics (an all-f32 polish stalls the Newton loop at the f32
        noise floor, ~7e-8 measured)."""
        m_act = jnp.minimum(m_up + m_dn + meq, 1.0)
        d_act_df = df.mul_f32(
            df.add(df.add(df.mul_f32(hi_df, m_up), df.mul_f32(lo_df, m_dn)),
                   df.mul_f32(lo_df, meq)), m_act)
        rhs_df = df.mul_f32(df.sub(w_df, d_act_df), m_act)
        Lm = _chol_lane(_mfull32(m_act), ng, regM)
        mres = mres_df_of(m_act)
        mu_df = df.from_f32(m_act * _solve_lane(Lm, rhs_df.hi, ng))
        for _ in range(3):
            r = df.sub(rhs_df, mres(mu_df))
            mu_df = df.add(mu_df, df.from_f32(_solve_lane(Lm, r.hi, ng)))
        mu_df = df.mul_f32(mu_df, m_act)
        z_df = _df_mv(Hinv_df, df.sub(h_df, _df_mv_t(G_df, mu_df, ng)), nz)
        t_df = _df_mv(G_df, z_df, nz)
        t_hi = t_df.hi + t_df.lo
        mu_hi = mu_df.hi + mu_df.lo
        viol = jnp.maximum(jnp.maximum(t_hi - hi32, lo32 - t_hi), 0.0) * mask
        bad_mu = (jnp.maximum(-mu_hi * m_up, 0.0)
                  + jnp.maximum(mu_hi * m_dn, 0.0))
        slack_df = df.mul_f32(df.sub(t_df, d_act_df), m_act * mask)
        slack = jnp.abs(slack_df.hi + slack_df.lo)
        res_node = jnp.maximum(
            jnp.max(viol, axis=0, keepdims=True),
            jnp.maximum(jnp.max(bad_mu, axis=0, keepdims=True),
                        jnp.max(slack, axis=0, keepdims=True)))
        res_node = jnp.where(jnp.isfinite(res_node), res_node, jnp.inf)
        return dict(mu=mu_df, z=z_df, t=t_df, res_node=res_node,
                    m_up=m_up, m_dn=m_dn, m_act=m_act, d_act=d_act_df)

    def _sel(better, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(better, x, y), a, b)

    def pdas_from(m_up, m_dn, n_sweeps):
        pol = polish_df(m_up, m_dn)
        best = pol
        for _ in range(n_sweeps):
            # classification arguments in df64: near-zero margins must
            # not flip on f32 noise
            up_arg = df.add(pol["mu"], df.mul_f32(
                df.sub(pol["t"], hi_df), c_pd))
            dn_arg = df.add(pol["mu"], df.mul_f32(
                df.sub(pol["t"], lo_df), c_pd))
            m_up = (((up_arg.hi + up_arg.lo) > 0) & (mhi > 0)).astype(f32) \
                * (1.0 - meq)
            m_dn = (((dn_arg.hi + dn_arg.lo) < 0) & (mlo > 0)).astype(f32) \
                * (1.0 - meq)
            pol = polish_df(m_up, m_dn)
            better = pol["res_node"] < best["res_node"]
            best = _sel(better, pol, best)
        return best

    def identify():
        z0 = _mv(Hinv_df.hi, h32, nz)
        lm = admm_identify(G32, L32, rho32, lo32, hi32, h32, z0,
                           opts.qpgen_iters)
        mu_admm = rho32 * lm
        tol_act = 1e-5 * jnp.maximum(
            1.0, jnp.max(jnp.abs(mu_admm), axis=0, keepdims=True))
        m_up = ((mu_admm > tol_act) & (mhi > 0)).astype(f32) * (1.0 - meq)
        m_dn = ((mu_admm < -tol_act) & (mlo > 0)).astype(f32) * (1.0 - meq)
        return m_up, m_dn

    def cold_start():
        m_up, m_dn = identify()
        return pdas_from(m_up, m_dn, 3)

    if ws is None:
        best = cold_start()
    else:
        ws_up = _t2(ws[0].astype(f32), NL) * (1.0 - meq)
        ws_dn = _t2(ws[1].astype(f32), NL) * (1.0 - meq)
        warm = pdas_from(ws_up, ws_dn, 2)
        lane_ok_w = (jax.lax.broadcasted_iota(jnp.int32, (1, NL), 1) < N)
        ok = jnp.max(warm["res_node"] * lane_ok_w) < 1e-9
        best = jax.lax.cond(ok, lambda: warm, cold_start)

    m_up, m_dn = best["m_up"], best["m_dn"]
    m_act = best["m_act"]
    mu_df = best["mu"]
    z_df = best["z"]
    res_node = best["res_node"]

    # ---- elimination matrix P = Hinv - HG_act Minv HG_act' (df64)
    Minv32 = _inv_lane(_mfull32(m_act), ng, regM)
    Minv_df = df.from_f32(Minv32)
    eye_ng = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (ng, ng, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (ng, ng, 1), 1), 1.0, 0.0)

    def mfull_df_mm(X: Df) -> Df:
        """Mfull(df, unshifted) @ X in df64."""
        mX = df.mul_f32(X, m_act[:, None])
        t = _df_mm(GHG_df, mX, ng)
        t = df.mul_f32(t, m_act[:, None])
        return df.add(t, df.mul_f32(X, (1.0 - m_act)[:, None]))

    for _ in range(2):
        R = df.sub(Df(eye_ng * jnp.ones((1, 1, NL), f32), jnp.zeros(
            (ng, ng, NL), f32)), mfull_df_mm(Minv_df))
        Minv_df = df.add(Minv_df, _df_mm(Minv_df, R, ng))
    # symmetrize
    Minv_df = Df(0.5 * (Minv_df.hi + jnp.swapaxes(Minv_df.hi, 0, 1)),
                 0.5 * (Minv_df.lo + jnp.swapaxes(Minv_df.lo, 0, 1)))
    ns_res = jnp.max(jnp.abs(
        df.sub(Df(eye_ng * jnp.ones((1, 1, NL), f32),
                  jnp.zeros((ng, ng, NL), f32)),
               mfull_df_mm(Minv_df)).hi))

    # HG_act = Hinv G' * m_act  -> [nz, ng, NL]
    Gt_df = Df(jnp.swapaxes(G_df.hi, 0, 1), jnp.swapaxes(G_df.lo, 0, 1))
    HG_df = _df_mm(Hinv_df, Gt_df, nz)
    HG_df = df.mul_f32(HG_df, m_act[None, :])
    PM = _df_mm(HG_df, Minv_df, ng)
    HGt_df = Df(jnp.swapaxes(HG_df.hi, 0, 1), jnp.swapaxes(HG_df.lo, 0, 1))
    P_df = df.sub(Hinv_df, _df_mm(PM, HGt_df, ng))

    def p_lane():
        return (P_df.hi.astype(dt) + P_df.lo.astype(dt))

    def p_fallback():
        # Newton-Schulz diverges when kappa(Mfull) ~ 1/eps_f32 (ADVICE
        # r3): recompute P through the node-major f64 inverse (rare)
        from treeqp_tpu.solvers.tdunes import _batched_inverse_spd
        m_act_n = _t2back(m_act, N, dt)
        eye_n = jnp.eye(ng, dtype=dt)[None]
        regM_n = _t2back(regM, N, dt)[:, :, None]
        Mfull_n = (m_act_n[:, :, None] * GHG * m_act_n[:, None, :]
                   + eye_n * (1.0 - m_act_n)[:, :, None] + regM_n * eye_n)
        Minv_n = _batched_inverse_spd(Mfull_n)
        HG_n = (Hinv @ G.swapaxes(1, 2)) * m_act_n[:, None, :]
        P_n = Hinv - HG_n @ Minv_n @ HG_n.swapaxes(1, 2)
        return _pad_l(jnp.transpose(P_n, (1, 2, 0)), NL)

    stat_df = df.add(df.sub(_df_mv(H_df, z_df, nz), h_df),
                     _df_mv_t(G_df, mu_df, ng))
    lane_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, NL), 1) < N)
    res = jnp.maximum(
        jnp.max(jnp.where(lane_ok, res_node, 0.0)),
        jnp.max(jnp.abs(stat_df.hi + stat_df.lo) * lane_ok)).astype(dt)

    # ---- back to node-major f64
    def un2(v_df):
        return (v_df.hi.astype(dt) + v_df.lo.astype(dt)).T[:N]

    z_out = un2(z_df)
    mu_out = un2(mu_df)
    ns_ok = jnp.isfinite(ns_res) & (ns_res < 1e-6)
    P_lanes = jax.lax.cond(ns_ok, p_lane, p_fallback)
    P_out = jnp.transpose(P_lanes, (2, 0, 1))[:N]
    ws_out = (_t2back(m_up, N, dt), _t2back(m_dn, N, dt))
    return z_out, P_out, mu_out, res, ws_out


def _t2back(v, N, dt):
    return jnp.transpose(v, (1, 0))[:N].astype(dt)
