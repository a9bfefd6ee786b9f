"""Fused df64 (double-float) evaluation kernels for the high-precision
dual-Newton phase.

The df64 phase (solvers/ms_df64.py) re-runs the Newton evaluation — chain
+ crown clipping stage solves, dual residuals, dual-value terms — in
two-f32 double-float arithmetic. Left to XLA those df op sequences
compile to ~30-50 fusions per Newton iteration and the phase becomes
LAUNCH-bound on TPU, exactly like the f32 phase was before its fusion
ladder (BENCH_NOTES round 3). These kernels fuse each side into ONE
Pallas launch, mirroring the f32 pair chain_kernels.chain_eval /
crown_kernels.crown_eval:

* ``chain_eval_df`` — per-scenario chains on the 128-lane dimension:
  stage solve + chain-edge residuals + crown-root contributions + the
  chains' dual-value partials, all in (hi, lo) pairs;
* ``crown_eval_df`` — crown nodes on the lane dimension: modified
  gradients (error-free kid-sums via per-kid-slot 0/1 matmuls — a plain
  f32 matmul kid-sum would round the hi words and destroy the df64
  accuracy), clip solve, dual residual, dual-value partials.

The double-float arithmetic inside the kernels IS ops/df64 — its
functions are plain f32 jnp sequences and trace into Pallas unchanged,
so the numerical semantics are identical to the unfused path
(tests/test_df_eval_kernels.py pins both sides to ~df64 ulps).

Reference scope: the f64 evaluation path of dual_Newton_tree.c:446-637
(gradient / dual value) + :218-330 (stage solves) — the part of the
reference that genuinely needs f64, here at f32 op cost in one launch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops import df64 as df
from treeqp_tpu.ops.df64 import Df

from treeqp_tpu.ops.chain_kernels import _TS, _pad_s, _interpret

# raised scoped-VMEM limit (default 16 MB): the crown df kernels hold
# (K+1) [NPc, NPc] one-hot matrices plus ~60 hi/lo row tensors
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

__all__ = ["chain_eval_df", "chain_eval_df_data",
           "crown_eval_df", "crown_eval_df_data", "crown_eval_df_supported"]

_NP = 128  # node-lane tile for the crown kernel


def _dclip(xU, lo_h, lo_l, hi_h, hi_l):
    """df64 clip on (hi, lo) pairs (df.clip on raw words)."""
    return df.clip(Df(xU.hi, xU.lo), Df(lo_h, lo_l), Df(hi_h, hi_l))


# ---------------------------------------------------------------------------
# chain side


def chain_eval_df_data(A, B, q, r, Qd, Rd, xmin, xmax, umin, umax, b):
    """Lane-layout df64 problem data for chain_eval_df.

    Inputs are the f64 ``[S, L, ...]`` chain arrays of MultistageQP;
    outputs are (hi, lo) f32 lane tensors ``[L, n, S_pad]`` (+ packed
    dynamics ``[L, nx, nz, S_pad]``). Loop-invariant — built once per
    solve, hoisted by XLA."""
    S = q.shape[0]
    S_pad = max(_TS, ((S + _TS - 1) // _TS) * _TS)

    def t3(v, fill=0.0):
        d = df.from_f64(v)
        out = []
        for w, fw in ((d.hi, fill), (d.lo, 0.0)):
            out.append(_pad_s(jnp.transpose(w, (1, 2, 0)), S_pad, fill=fw))
        return tuple(out)

    AB = jnp.concatenate([A, B], axis=3)
    d = df.from_f64(AB)
    ABt = tuple(_pad_s(jnp.transpose(w, (1, 2, 3, 0)), S_pad)
                for w in (d.hi, d.lo))
    Qinv = 1.0 / Qd
    Rinv = 1.0 / Rd
    return dict(
        ABt=ABt, q=t3(q), r=t3(r), Qd=t3(Qd, 1.0), Rd=t3(Rd, 1.0),
        Qinv=t3(Qinv, 1.0), Rinv=t3(Rinv, 1.0),
        xmin=t3(xmin, -1.0), xmax=t3(xmax, 1.0),
        umin=t3(umin, -1.0), umax=t3(umax, 1.0), b=t3(b))


def chain_eval_df(data_l, lam: Df):
    """Fused df64 chain evaluation (mirror of chain_kernels.chain_eval).

    ``lam``: Df ``[S, L, nx]``. Returns dict with Df values:
    x, u, res_part ``[S, L, n]`` (node layout; res_part's j=0 row misses
    the crown term A_0 z_crown — caller adds it), xUnc/uUnc/qt/rt in
    KERNEL lane layout ``[L, n, S_pad]`` (qt/rt feed the f32 factorize
    via .hi and apply_M after a fused transpose), cqr ``[S, nz]`` (root
    contributions) and fch (per-chain dual-value partials, summed by the
    caller's df tree-sum)."""
    ABh, ABl = data_l["ABt"]
    L, nx, nz, S_pad = ABh.shape
    S = lam.hi.shape[0]
    nu = nz - nx
    lam_h = _pad_s(jnp.transpose(lam.hi, (1, 2, 0)), S_pad)
    lam_l = _pad_s(jnp.transpose(lam.lo, (1, 2, 0)), S_pad)

    def kernel(ABh_ref, ABl_ref, qh, ql, rh, rl, Qdh, Qdl, Rdh, Rdl,
               Qih, Qil, Rih, Ril, xloh, xlol, xhih, xhil,
               uloh, ulol, uhih, uhil, bh, bl, lamh_ref, laml_ref,
               xh_o, xl_o, uh_o, ul_o, qth_o, qtl_o, rth_o, rtl_o,
               xUh_o, xUl_o, uUh_o, uUl_o, resh_o, resl_o,
               cqrh_o, cqrl_o, fh_o, fl_o):
        facc = Df(jnp.zeros((1, _TS), jnp.float32),
                  jnp.zeros((1, _TS), jnp.float32))
        x_prev = u_prev = None
        for j in range(L):
            lam_j = Df(lamh_ref[j], laml_ref[j])          # [nx, T]
            b_j = Df(bh[j], bl[j])
            qmod = df.add(df.neg(Df(qh[j], ql[j])), lam_j)
            rmod = df.neg(Df(rh[j], rl[j]))
            if j < L - 1:
                ABn = Df(ABh_ref[j + 1], ABl_ref[j + 1])  # [nx, nz, T]
                lam_n = Df(lamh_ref[j + 1], laml_ref[j + 1])
                up = df.mul(ABn[0], Df(lam_n.hi[0:1], lam_n.lo[0:1]))
                for row in range(1, nx):
                    up = df.add(up, df.mul(
                        ABn[row], Df(lam_n.hi[row:row + 1],
                                     lam_n.lo[row:row + 1])))
                qmod = df.sub(qmod, up[:nx])
                rmod = df.sub(rmod, up[nx:])
            xU = df.mul(Df(Qih[j], Qil[j]), qmod)
            uU = df.mul(Df(Rih[j], Ril[j]), rmod)
            x = _dclip(xU, xloh[j], xlol[j], xhih[j], xhil[j])
            u = _dclip(uU, uloh[j], ulol[j], uhih[j], uhil[j])
            x_act = df.less(xU, Df(xloh[j], xlol[j])) \
                | df.less(Df(xhih[j], xhil[j]), xU)
            u_act = df.less(uU, Df(uloh[j], ulol[j])) \
                | df.less(Df(uhih[j], uhil[j]), uU)
            z32 = jnp.zeros_like(xU.hi)
            qt = df.where(x_act, Df(z32, z32), Df(Qih[j], Qil[j]))
            z32u = jnp.zeros_like(uU.hi)
            rt = df.where(u_act, Df(z32u, z32u), Df(Rih[j], Ril[j]))
            xh_o[j], xl_o[j] = x.hi, x.lo
            uh_o[j], ul_o[j] = u.hi, u.lo
            qth_o[j], qtl_o[j] = qt.hi, qt.lo
            rth_o[j], rtl_o[j] = rt.hi, rt.lo
            xUh_o[j], xUl_o[j] = xU.hi, xU.lo
            uUh_o[j], uUl_o[j] = uU.hi, uU.lo
            # chain-edge dual residual res_j = A_j z_{j-1} + b_j - x_j
            res_j = df.sub(b_j, x)
            if j > 0:
                ABj = Df(ABh_ref[j], ABl_ref[j])
                for i in range(nx):
                    res_j = df.add(res_j, df.mul(
                        Df(ABj.hi[:, i], ABj.lo[:, i]),
                        Df(x_prev.hi[i:i + 1], x_prev.lo[i:i + 1])))
                for i in range(nu):
                    res_j = df.add(res_j, df.mul(
                        Df(ABj.hi[:, nx + i], ABj.lo[:, nx + i]),
                        Df(u_prev.hi[i:i + 1], u_prev.lo[i:i + 1])))
            resh_o[j], resl_o[j] = res_j.hi, res_j.lo
            x_prev, u_prev = x, u
            # dual-value terms x(qmod - Qd x/2) + u(rmod - Rd u/2) - b lam
            tx = df.sub(
                df.mul(x, df.sub(qmod, df.scale_pow2(
                    df.mul(Df(Qdh[j], Qdl[j]), x), np.float32(0.5)))),
                df.mul(b_j, lam_j))
            tu = df.mul(u, df.sub(rmod, df.scale_pow2(
                df.mul(Df(Rdh[j], Rdl[j]), u), np.float32(0.5))))
            for i in range(nx):
                facc = df.add(facc, Df(tx.hi[i:i + 1], tx.lo[i:i + 1]))
            for i in range(nu):
                facc = df.add(facc, Df(tu.hi[i:i + 1], tu.lo[i:i + 1]))
        AB0 = Df(ABh_ref[0], ABl_ref[0])
        lam_0 = Df(lamh_ref[0], laml_ref[0])
        cqr = df.mul(AB0[0], Df(lam_0.hi[0:1], lam_0.lo[0:1]))
        for row in range(1, nx):
            cqr = df.add(cqr, df.mul(
                AB0[row], Df(lam_0.hi[row:row + 1], lam_0.lo[row:row + 1])))
        cqrh_o[...], cqrl_o[...] = cqr.hi, cqr.lo
        fh_o[...], fl_o[...] = facc.hi, facc.lo

    sAB = pl.BlockSpec((L, nx, nz, _TS), lambda i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)
    s3 = lambda n: pl.BlockSpec((L, n, _TS), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    scq = pl.BlockSpec((nz, _TS), lambda i: (0, i), memory_space=pltpu.VMEM)
    sf = pl.BlockSpec((1, _TS), lambda i: (0, i), memory_space=pltpu.VMEM)

    def pair(spec):
        return [spec, spec]

    in_specs = (pair(sAB) + pair(s3(nx)) + pair(s3(nu)) + pair(s3(nx))
                + pair(s3(nu)) + pair(s3(nx)) + pair(s3(nu))
                + pair(s3(nx)) + pair(s3(nx)) + pair(s3(nu)) + pair(s3(nu))
                + pair(s3(nx)) + pair(s3(nx)))
    out_specs = tuple(pair(s3(nx)) + pair(s3(nu)) + pair(s3(nx))
                      + pair(s3(nu)) + pair(s3(nx)) + pair(s3(nu))
                      + pair(s3(nx)) + pair(scq) + pair(sf))
    out_shape = tuple(
        jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
        ((L, nx, S_pad),) * 2 + ((L, nu, S_pad),) * 2
        + ((L, nx, S_pad),) * 2 + ((L, nu, S_pad),) * 2
        + ((L, nx, S_pad),) * 2 + ((L, nu, S_pad),) * 2
        + ((L, nx, S_pad),) * 2 + ((nz, S_pad),) * 2 + ((1, S_pad),) * 2)
    args = (data_l["ABt"] + data_l["q"] + data_l["r"] + data_l["Qd"]
            + data_l["Rd"] + data_l["Qinv"] + data_l["Rinv"]
            + data_l["xmin"] + data_l["xmax"] + data_l["umin"]
            + data_l["umax"] + data_l["b"] + (lam_h, lam_l))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, grid=(S_pad // _TS,),
            in_specs=list(in_specs), out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret(), compiler_params=_PARAMS,
        )(*args)
    (xh, xl, uh, ul, qth, qtl, rth, rtl, xUh, xUl, uUh, uUl,
     resh, resl, cqh, cql, fh, fl) = outs
    tr = lambda h, l: Df(jnp.transpose(h[..., :S], (2, 0, 1)),
                         jnp.transpose(l[..., :S], (2, 0, 1)))
    return dict(
        x=tr(xh, xl), u=tr(uh, ul),
        qt=Df(qth, qtl), rt=Df(rth, rtl),
        xUnc=Df(xUh, xUl), uUnc=Df(uUh, uUl),
        res_part=tr(resh, resl),
        cqr=Df(jnp.transpose(cqh[..., :S], (1, 0)),
               jnp.transpose(cql[..., :S], (1, 0))),
        fch=Df(fh[0, :S], fl[0, :S]))


# ---------------------------------------------------------------------------
# chain side: Hessian action (iterative-refinement apply)


def chain_apply_df(data_l, qt: Df, rt: Df, dch):
    """Fused df64 chain part of the dual-Hessian action M d
    (mirror of ms_df64.df_apply_M's chain half): linear stage response
    xl = qt (d - A'd_up), ul = rt (-B'd_up), its linearized chain
    residual (j=0 row missing the crown term, like chain_eval_df), and
    the root contributions of d into the crown.

    ``qt``/``rt``: Df in kernel lane layout (straight from
    chain_eval_df). ``dch``: plain f32 ``[S, L, nx]``. Returns
    res_part ``[S, L, nx]`` node-layout Df, cqr Df ``[S, nz]``, and
    xl/ul (lane layout Df) for the caller's root completion."""
    ABh, ABl = data_l["ABt"]
    L, nx, nz, S_pad = ABh.shape
    S = dch.shape[0]
    nu = nz - nx
    d_l = _pad_s(jnp.transpose(dch.astype(jnp.float32), (1, 2, 0)), S_pad)

    def kernel(ABh_ref, ABl_ref, qth, qtl, rth, rtl, d_ref,
               xlh_o, xll_o, ulh_o, ull_o, resh_o, resl_o,
               cqrh_o, cqrl_o):
        xl_prev = ul_prev = None
        for j in range(L):
            d_j = d_ref[j]                                # [nx, T] f32
            qml = Df(d_j, jnp.zeros_like(d_j))
            rml = Df(jnp.zeros((nu, d_j.shape[-1]), jnp.float32),
                     jnp.zeros((nu, d_j.shape[-1]), jnp.float32))
            if j < L - 1:
                ABn = Df(ABh_ref[j + 1], ABl_ref[j + 1])
                d_n = d_ref[j + 1]
                up = df.mul_f32(ABn[0], d_n[0:1])
                for row in range(1, nx):
                    up = df.add(up, df.mul_f32(ABn[row], d_n[row:row + 1]))
                qml = df.sub(qml, up[:nx])
                rml = df.sub(rml, up[nx:])
            xl = df.mul(Df(qth[j], qtl[j]), qml)
            ul = df.mul(Df(rth[j], rtl[j]), rml)
            xlh_o[j], xll_o[j] = xl.hi, xl.lo
            ulh_o[j], ull_o[j] = ul.hi, ul.lo
            res_j = df.neg(xl)
            if j > 0:
                ABj = Df(ABh_ref[j], ABl_ref[j])
                for i in range(nx):
                    res_j = df.add(res_j, df.mul(
                        Df(ABj.hi[:, i], ABj.lo[:, i]),
                        Df(xl_prev.hi[i:i + 1], xl_prev.lo[i:i + 1])))
                for i in range(nu):
                    res_j = df.add(res_j, df.mul(
                        Df(ABj.hi[:, nx + i], ABj.lo[:, nx + i]),
                        Df(ul_prev.hi[i:i + 1], ul_prev.lo[i:i + 1])))
            resh_o[j], resl_o[j] = res_j.hi, res_j.lo
            xl_prev, ul_prev = xl, ul
        AB0 = Df(ABh_ref[0], ABl_ref[0])
        cqr = df.mul_f32(AB0[0], d_ref[0][0:1])
        for row in range(1, nx):
            cqr = df.add(cqr, df.mul_f32(AB0[row], d_ref[0][row:row + 1]))
        cqrh_o[...], cqrl_o[...] = cqr.hi, cqr.lo

    sAB = pl.BlockSpec((L, nx, nz, _TS), lambda i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)
    s3 = lambda n: pl.BlockSpec((L, n, _TS), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    scq = pl.BlockSpec((nz, _TS), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [sAB, sAB, s3(nx), s3(nx), s3(nu), s3(nu), s3(nx)]
    out_specs = (s3(nx), s3(nx), s3(nu), s3(nu), s3(nx), s3(nx), scq, scq)
    out_shape = tuple(
        jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
        ((L, nx, S_pad),) * 2 + ((L, nu, S_pad),) * 2
        + ((L, nx, S_pad),) * 2 + ((nz, S_pad),) * 2)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, grid=(S_pad // _TS,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            interpret=_interpret(), compiler_params=_PARAMS,
        )(ABh, ABl, qt.hi, qt.lo, rt.hi, rt.lo, d_l)
    xlh, xll, ulh, ull, resh, resl, cqh, cql = outs
    tr = lambda h, l: Df(jnp.transpose(h[..., :S], (2, 0, 1)),
                         jnp.transpose(l[..., :S], (2, 0, 1)))
    return dict(
        xl=Df(xlh, xll), ul=Df(ulh, ull),
        res_part=tr(resh, resl),
        cqr=Df(jnp.transpose(cqh[..., :S], (1, 0)),
               jnp.transpose(cql[..., :S], (1, 0))))


# ---------------------------------------------------------------------------
# crown side


def _get_df_sched(prep):
    """Static schedule: parent-gather matrix + per-kid-slot gather
    matrices (error-free df kid-sum: each slot matmul copies exactly one
    value per column, then the K slot results combine with df adds)."""
    sched = getattr(prep, "_crown_df_sched", None)
    if sched is not None:
        return sched
    Nn = prep.Nn
    NPc = max(_NP, ((Nn + _NP - 1) // _NP) * _NP)
    par = prep.par
    kids: list[list[int]] = [[] for _ in range(Nn)]
    for n in range(1, Nn):
        kids[int(par[n])].append(n)
    K = max((len(k) for k in kids), default=0)
    P_par = np.zeros((NPc, NPc), np.float32)
    for n in range(1, Nn):
        P_par[par[n], n] = 1.0  # gather: out[:, n] = in[:, par(n)]
    P_kid = np.zeros((K, NPc, NPc), np.float32)
    for n in range(Nn):
        for k, c in enumerate(kids[n]):
            P_kid[k, c, n] = 1.0  # slot-k kid-sum: out[:, n] = in[:, c]
    sched = (NPc, K, P_par, P_kid)
    prep._crown_df_sched = sched
    return sched


def crown_eval_df_supported(prep) -> bool:
    # P matrices are [NPc, NPc]; (K+1) of them dominate the kernel's
    # scoped-VMEM stack. Measured on v5e (round 5): ACTUAL stack = ~2.6x
    # this P-matrix estimate (102 MB at NPc=1408 / est 39.6 MB), so the
    # budget keeps est <= 28 MB -> actual <~75 MB under the raised 100 MB
    # limit. The 1024-scenario tree's 1365-node crown stays on the
    # unfused df64 path; its f32 kernels (crown_eval cap 2048) are fused.
    NPc, K, _, _ = _get_df_sched(prep)
    return NPc * NPc * (K + 1) * 4 <= 28 * 2**20


def crown_eval_df_data(qp, prep, xm, um, nrxm):
    """Lane-layout df64 crown data for crown_eval_df (loop-invariant)."""
    NPc, K, P_par, P_kid = _get_df_sched(prep)

    def t(v, fill=0.0):
        d = df.from_f64(v)
        pad = NPc - v.shape[0]
        return tuple(jnp.pad(jnp.transpose(w, (1, 0)), ((0, 0), (0, pad)),
                             constant_values=fw)
                     for w, fw in ((d.hi, fill), (d.lo, 0.0)))

    def tmask(v, fill=0.0):
        pad = NPc - v.shape[0]
        return jnp.pad(jnp.transpose(v.astype(jnp.float32), (1, 0)),
                       ((0, 0), (0, pad)), constant_values=fill)

    AB = jnp.concatenate([qp.A, qp.B], axis=2)       # [Nn, nxm, nz]
    d = df.from_f64(AB)
    ABt = tuple(jnp.pad(jnp.transpose(w, (1, 2, 0)),
                        ((0, 0), (0, 0), (0, NPc - AB.shape[0])))
                for w in (d.hi, d.lo))
    Qd = jnp.diagonal(qp.Q, axis1=1, axis2=2)
    Rd = jnp.diagonal(qp.R, axis1=1, axis2=2)
    xmf = xm.astype(qp.q.dtype)
    umf = um.astype(qp.q.dtype)
    Qd_m = Qd * xmf + (1.0 - xmf)
    Rd_m = Rd * umf + (1.0 - umf)
    return dict(
        ABt=ABt, P_par=jnp.asarray(P_par), P_kid=jnp.asarray(P_kid),
        q=t(qp.q), r=t(qp.r), b=t(qp.b),
        Qd=t(Qd_m, 1.0), Rd=t(Rd_m, 1.0),
        Qinv=t(1.0 / Qd_m, 1.0), Rinv=t(1.0 / Rd_m, 1.0),
        xmin=t(qp.xmin, -1.0), xmax=t(qp.xmax, 1.0),
        umin=t(qp.umin, -1.0), umax=t(qp.umax, 1.0),
        xm=tmask(xm), um=tmask(um), nrxm=tmask(nrxm))


def crown_eval_df(data, lam: Df, extra: Df):
    """Fused df64 crown evaluation (mirror of crown_kernels.crown_eval).

    ``lam``: Df [Nn, nxm] (pre-masked); ``extra``: Df [nz, NPc] lane
    chain contributions. Returns node-layout Df x/u/qtilde/rtilde/res,
    lane-layout xUnc/uUnc, and fcr (dual-value partials [NPc])."""
    ABh, ABl = data["ABt"]
    nxm, nz, NPc = ABh.shape
    num = nz - nxm
    Nn = lam.hi.shape[0]
    K = data["P_kid"].shape[0]
    pad = lambda w: jnp.pad(jnp.transpose(w, (1, 0)),
                            ((0, 0), (0, NPc - Nn)))
    lam_h, lam_l = pad(lam.hi), pad(lam.lo)

    def kernel(ABh_ref, ABl_ref, Pp_ref, Pk_ref, qh, ql, rh, rl,
               bh, bl, Qdh, Qdl, Rdh, Rdl, Qih, Qil, Rih, Ril,
               xloh, xlol, xhih, xhil, uloh, ulol, uhih, uhil,
               xm_ref, um_ref, nr_ref, lamh_ref, laml_ref, exh, exl,
               xh_o, xl_o, uh_o, ul_o, qth_o, qtl_o, rth_o, rtl_o,
               xUh_o, xUl_o, uUh_o, uUl_o, resh_o, resl_o, fh_o, fl_o):
        ABd = Df(ABh_ref[...], ABl_ref[...])
        lam_m = Df(lamh_ref[...], laml_ref[...])
        xmk = xm_ref[...]
        umk = um_ref[...]
        nr = nr_ref[...]
        # AtBtL_n = AB_n' lam_n  [nz, NPc] (df row loops)
        rows = []
        for i in range(nz):
            acc = df.mul(Df(ABd.hi[0, i][None], ABd.lo[0, i][None]),
                         Df(lam_m.hi[0:1], lam_m.lo[0:1]))
            for j in range(1, nxm):
                acc = df.add(acc, df.mul(
                    Df(ABd.hi[j, i][None], ABd.lo[j, i][None]),
                    Df(lam_m.hi[j:j + 1], lam_m.lo[j:j + 1])))
            rows.append(acc)
        AtBtL = Df(jnp.concatenate([a.hi for a in rows], axis=0),
                   jnp.concatenate([a.lo for a in rows], axis=0))
        # error-free kid-sum: K slot gathers (exact matmul copies) + df adds
        sum_AB = Df(exh[...], exl[...])
        for k in range(K):
            Pk = Pk_ref[k]
            gk = Df(jax.lax.dot(AtBtL.hi, Pk,
                                precision=jax.lax.Precision.HIGHEST),
                    jax.lax.dot(AtBtL.lo, Pk,
                                precision=jax.lax.Precision.HIGHEST))
            sum_AB = df.add(sum_AB, gk)
        mA = lambda v: Df(v.hi * xmk, v.lo * xmk)
        mB = lambda v: Df(v.hi * umk, v.lo * umk)
        qmod = mA(df.sub(df.add(df.neg(Df(qh[...], ql[...])), lam_m),
                         sum_AB[:nxm]))
        rmod = mB(df.sub(df.neg(Df(rh[...], rl[...])), sum_AB[nxm:]))
        xU = df.mul(Df(Qih[...], Qil[...]), qmod)
        uU = df.mul(Df(Rih[...], Ril[...]), rmod)
        x = mA(_dclip(xU, xloh[...], xlol[...], xhih[...], xhil[...]))
        u = mB(_dclip(uU, uloh[...], ulol[...], uhih[...], uhil[...]))
        x_act = df.less(xU, Df(xloh[...], xlol[...])) \
            | df.less(Df(xhih[...], xhil[...]), xU)
        u_act = df.less(uU, Df(uloh[...], ulol[...])) \
            | df.less(Df(uhih[...], uhil[...]), uU)
        z32 = jnp.zeros_like(xU.hi)
        z32u = jnp.zeros_like(uU.hi)
        qt = df.where(x_act, Df(z32, z32), Df(Qih[...], Qil[...]))
        rt = df.where(u_act, Df(z32u, z32u), Df(Rih[...], Ril[...]))
        xh_o[...], xl_o[...] = x.hi, x.lo
        uh_o[...], ul_o[...] = u.hi, u.lo
        qth_o[...], qtl_o[...] = qt.hi, qt.lo
        rth_o[...], rtl_o[...] = rt.hi, rt.lo
        xUh_o[...], xUl_o[...] = xU.hi, xU.lo
        uUh_o[...], uUl_o[...] = uU.hi, uU.lo
        # residual: res_n = AB_n [x; u]_par + b_n - x_n (non-root), via the
        # exact parent gather (one 1 per column -> matmul copies)
        Pp = Pp_ref[...]
        zh = jnp.concatenate([x.hi, u.hi], axis=0)
        zl = jnp.concatenate([x.lo, u.lo], axis=0)
        zp = Df(jax.lax.dot(zh, Pp, precision=jax.lax.Precision.HIGHEST),
                jax.lax.dot(zl, Pp, precision=jax.lax.Precision.HIGHEST))
        res_rows = []
        for i in range(nxm):
            acc = df.mul(Df(ABd.hi[i, 0][None], ABd.lo[i, 0][None]),
                         Df(zp.hi[0:1], zp.lo[0:1]))
            for c in range(1, nz):
                acc = df.add(acc, df.mul(
                    Df(ABd.hi[i, c][None], ABd.lo[i, c][None]),
                    Df(zp.hi[c:c + 1], zp.lo[c:c + 1])))
            res_rows.append(acc)
        res = Df(jnp.concatenate([a.hi for a in res_rows], axis=0),
                 jnp.concatenate([a.lo for a in res_rows], axis=0))
        res = df.add(res, df.sub(Df(bh[...], bl[...]), x))
        res = Df(res.hi * nr, res.lo * nr)
        resh_o[...], resl_o[...] = res.hi, res.lo
        # dual-value terms (per-lane partials; caller tree-sums)
        blam = df.mul(Df(bh[...], bl[...]), lam_m)
        blam = Df(blam.hi * nr, blam.lo * nr)
        tx = df.sub(
            df.mul(x, df.sub(qmod, df.scale_pow2(
                df.mul(Df(Qdh[...], Qdl[...]), x), np.float32(0.5)))),
            blam)
        tu = df.mul(u, df.sub(rmod, df.scale_pow2(
            df.mul(Df(Rdh[...], Rdl[...]), u), np.float32(0.5))))
        facc = Df(tx.hi[0:1], tx.lo[0:1])
        for i in range(1, nxm):
            facc = df.add(facc, Df(tx.hi[i:i + 1], tx.lo[i:i + 1]))
        for i in range(num):
            facc = df.add(facc, Df(tu.hi[i:i + 1], tu.lo[i:i + 1]))
        fh_o[...], fl_o[...] = facc.hi, facc.lo

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    sv = lambda rows: spec((rows, NPc))

    def pair(s):
        return [s, s]

    in_specs = ([spec((nxm, nz, NPc))] * 2
                + [spec((NPc, NPc)), spec((K, NPc, NPc))]
                + pair(sv(nxm)) + pair(sv(num)) + pair(sv(nxm))
                + pair(sv(nxm)) + pair(sv(num)) + pair(sv(nxm))
                + pair(sv(num)) + pair(sv(nxm)) + pair(sv(nxm))
                + pair(sv(num)) + pair(sv(num))
                + [sv(nxm), sv(num), sv(nxm)]
                + pair(sv(nxm)) + pair(sv(nz)))
    out_specs = tuple(pair(sv(nxm)) + pair(sv(num)) + pair(sv(nxm))
                      + pair(sv(num)) + pair(sv(nxm)) + pair(sv(num))
                      + pair(sv(nxm)) + pair(sv(1)))
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, NPc), jnp.float32) for rows in
        (nxm, nxm, num, num, nxm, nxm, num, num, nxm, nxm, num, num,
         nxm, nxm, 1, 1))
    args = (data["ABt"] + (data["P_par"], data["P_kid"]) + data["q"]
            + data["r"] + data["b"] + data["Qd"] + data["Rd"]
            + data["Qinv"] + data["Rinv"] + data["xmin"] + data["xmax"]
            + data["umin"] + data["umax"]
            + (data["xm"], data["um"], data["nrxm"])
            + (lam_h, lam_l) + (extra.hi, extra.lo))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, in_specs=list(in_specs), out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret(), compiler_params=_PARAMS,
        )(*args)
    (xh, xl, uh, ul, qth, qtl, rth, rtl, xUh, xUl, uUh, uUl,
     resh, resl, fh, fl) = outs
    tr = lambda h, l: Df(jnp.transpose(h[:, :Nn], (1, 0)),
                         jnp.transpose(l[:, :Nn], (1, 0)))
    return dict(
        x=tr(xh, xl), u=tr(uh, ul),
        qtilde=tr(qth, qtl), rtilde=tr(rth, rtl),
        xUnc=Df(xUh, xUl), uUnc=Df(uUh, uUl),
        res=tr(resh, resl),
        fcr=Df(fh[0], fl[0]))


# ---------------------------------------------------------------------------
# crown side: Hessian action


def crown_apply_df(data, qtilde: Df, rtilde: Df, dcr, extra: Df):
    """Fused df64 crown part of M d (ms_df64.df_apply_M's crown half).

    ``qtilde``/``rtilde``: Df lane layout ``[rows, NPc]`` (transpose of
    crown_eval_df's node-layout outputs — the transposes fuse into this
    call's operand preparation). ``dcr``: plain f32 ``[Nn, nxm]``
    (pre-masked). ``extra``: Df ``[nz, NPc]`` chain root contributions of
    the chain direction. Returns node-layout Df res (the linearized
    masked residual) and xl/ul (node layout, for the chains' j=0
    completion)."""
    ABh, ABl = data["ABt"]
    nxm, nz, NPc = ABh.shape
    num = nz - nxm
    Nn = dcr.shape[0]
    K = data["P_kid"].shape[0]
    d_l = jnp.pad(jnp.transpose(dcr.astype(jnp.float32), (1, 0)),
                  ((0, 0), (0, NPc - Nn)))

    def kernel(ABh_ref, ABl_ref, Pp_ref, Pk_ref, qth, qtl, rth, rtl,
               xm_ref, um_ref, nr_ref, d_ref, exh, exl,
               xlh_o, xll_o, ulh_o, ull_o, resh_o, resl_o):
        ABd = Df(ABh_ref[...], ABl_ref[...])
        d_m = d_ref[...]
        xmk = xm_ref[...]
        umk = um_ref[...]
        nr = nr_ref[...]
        rows = []
        for i in range(nz):
            acc = df.mul_f32(Df(ABd.hi[0, i][None], ABd.lo[0, i][None]),
                             d_m[0:1])
            for j in range(1, nxm):
                acc = df.add(acc, df.mul_f32(
                    Df(ABd.hi[j, i][None], ABd.lo[j, i][None]),
                    d_m[j:j + 1]))
            rows.append(acc)
        AtBtL = Df(jnp.concatenate([a.hi for a in rows], axis=0),
                   jnp.concatenate([a.lo for a in rows], axis=0))
        sum_AB = Df(exh[...], exl[...])
        for k in range(K):
            Pk = Pk_ref[k]
            gk = Df(jax.lax.dot(AtBtL.hi, Pk,
                                precision=jax.lax.Precision.HIGHEST),
                    jax.lax.dot(AtBtL.lo, Pk,
                                precision=jax.lax.Precision.HIGHEST))
            sum_AB = df.add(sum_AB, gk)
        mA = lambda v: Df(v.hi * xmk, v.lo * xmk)
        mB = lambda v: Df(v.hi * umk, v.lo * umk)
        qml = df.sub(Df(d_m, jnp.zeros_like(d_m)), sum_AB[:nxm])
        xl = mA(df.mul(Df(qth[...], qtl[...]), qml))
        ul = mB(df.mul(Df(rth[...], rtl[...]), df.neg(sum_AB[nxm:])))
        xlh_o[...], xll_o[...] = xl.hi, xl.lo
        ulh_o[...], ull_o[...] = ul.hi, ul.lo
        Pp = Pp_ref[...]
        zh = jnp.concatenate([xl.hi, ul.hi], axis=0)
        zl = jnp.concatenate([xl.lo, ul.lo], axis=0)
        zp = Df(jax.lax.dot(zh, Pp, precision=jax.lax.Precision.HIGHEST),
                jax.lax.dot(zl, Pp, precision=jax.lax.Precision.HIGHEST))
        res_rows = []
        for i in range(nxm):
            acc = df.mul(Df(ABd.hi[i, 0][None], ABd.lo[i, 0][None]),
                         Df(zp.hi[0:1], zp.lo[0:1]))
            for c in range(1, nz):
                acc = df.add(acc, df.mul(
                    Df(ABd.hi[i, c][None], ABd.lo[i, c][None]),
                    Df(zp.hi[c:c + 1], zp.lo[c:c + 1])))
            res_rows.append(acc)
        res = Df(jnp.concatenate([a.hi for a in res_rows], axis=0),
                 jnp.concatenate([a.lo for a in res_rows], axis=0))
        res = df.sub(res, xl)
        resh_o[...], resl_o[...] = res.hi * nr, res.lo * nr

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    sv = lambda rows: spec((rows, NPc))
    in_specs = ([spec((nxm, nz, NPc))] * 2
                + [spec((NPc, NPc)), spec((K, NPc, NPc))]
                + [sv(nxm), sv(nxm), sv(num), sv(num)]
                + [sv(nxm), sv(num), sv(nxm), sv(nxm)]
                + [sv(nz), sv(nz)])
    out_specs = (sv(nxm), sv(nxm), sv(num), sv(num), sv(nxm), sv(nxm))
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, NPc), jnp.float32) for rows in
        (nxm, nxm, num, num, nxm, nxm))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret(), compiler_params=_PARAMS,
        )(ABh, ABl, data["P_par"], data["P_kid"], qtilde.hi, qtilde.lo,
          rtilde.hi, rtilde.lo, data["xm"], data["um"], data["nrxm"],
          d_l, extra.hi, extra.lo)
    xlh, xll, ulh, ull, resh, resl = outs
    tr = lambda h, l: Df(jnp.transpose(h[:, :Nn], (1, 0)),
                         jnp.transpose(l[:, :Nn], (1, 0)))
    return dict(xl=tr(xlh, xll), ul=tr(ulh, ull), res=tr(resh, resl))
