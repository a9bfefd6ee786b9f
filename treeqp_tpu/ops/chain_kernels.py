"""Pallas TPU kernels for the banded chain sweeps of the multistage solver.

The reference's hot loop is BLASFEO's per-node panel-major Cholesky/trsm
(dual_Newton_tree.c:668-735, dual_Newton_scenarios.c:590-689). On TPU the
same work is thousands of tiny (nx x nx, nx <= 16) factorizations — far too
small for the MXU, and XLA executes each scan step as separate kernels with
~0.5-1 ms overhead. These kernels restore speed-of-light by:

* laying scenarios out on the 128-wide lane dimension ([L, nx, nx, S] after
  a cheap transpose), so every scalar of the factorization becomes one VPU
  op processing 128+ chains at once;
* fusing the entire length-L backward/forward sweep into a single kernel
  (one launch instead of ~3L), with the per-step 8x8 Cholesky / triangular
  solves fully unrolled as masked vector arithmetic;
* pivot clamping (diag >= pivot_floor) as the in-kernel equivalent of the
  Levenberg-Marquardt regularization — valid because the blocks are Jacobi-
  equilibrated (unit diagonal) before factorization.

All kernels are f32 (TPU Pallas has no f64); the solver wraps them in the
mixed-precision iterative-refinement scheme, so end-to-end accuracy is f64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chain_factor", "chain_solve_bwd", "chain_forward"]

_TS = 128  # lane tile: scenarios per grid step
_PIVOT_FLOOR = 1e-8
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# NOTE: all intermediates are kept >= 2D ([1, T] for "scalars") — Mosaic
# cannot legalize 1-D vector values.


def _chol(W, n):
    """Batched lower Cholesky of [n, n, T] with clamped pivots."""
    cols = []
    for k in range(n):
        a = W[:, k]  # [n, T]
        for m in range(k):
            a = a - cols[m] * cols[m][k:k + 1]
        d = jnp.maximum(a[k:k + 1], _PIVOT_FLOOR)  # [1, T]
        dinv = jax.lax.rsqrt(d)
        # rows above the diagonal are structurally zero
        col = jnp.concatenate(
            [a[i:i + 1] * dinv if i >= k else jnp.zeros_like(d)
             for i in range(n)], axis=0)
        cols.append(col)
    return jnp.stack(cols, axis=1)  # [n(row), n(col), T]


def _rtrsm_t(L, B, n):
    """Solve X L' = B for X, L lower [n,n,T], B [n,n,T] (trsm_rltn):
    X[:,j] = (B[:,j] - sum_{c<j} X[:,c] L[j,c]) / L[j,j]."""
    cols = []
    for j in range(n):
        acc = B[:, j]
        for c in range(j):
            acc = acc - cols[c] * L[j:j + 1, c]
        cols.append(acc / L[j:j + 1, j])
    return jnp.stack(cols, axis=1)


def _ltrsv(L, r, n):
    """Solve L y = r, r [n, T]."""
    ys = []
    for i in range(n):
        acc = r[i:i + 1]
        for m in range(i):
            acc = acc - L[i:i + 1, m] * ys[m]
        ys.append(acc / L[i:i + 1, i])
    return jnp.concatenate(ys, axis=0)


def _uttrsv(L, d, n):
    """Solve L' z = d, d [n, T]."""
    zs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = d[i:i + 1]
        for m in range(i + 1, n):
            acc = acc - L[m:m + 1, i] * zs[m]
        zs[i] = acc / L[i:i + 1, i]
    return jnp.concatenate(zs, axis=0)


def _spec4(Lh, n):
    return pl.BlockSpec((Lh, n, n, _TS), lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM)


def _spec3(Lh, n):
    return pl.BlockSpec((Lh, n, _TS), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


def _spec_s(n):
    return pl.BlockSpec((n, n, _TS), lambda i: (0, 0, i), memory_space=pltpu.VMEM)


def _spec_v(n):
    return pl.BlockSpec((n, _TS), lambda i: (0, i), memory_space=pltpu.VMEM)


def _pad_s(x, S_pad, axis=-1, fill=0.0):
    pad = S_pad - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=fill)


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=())
def chain_factor(Wc, Utc):
    """Fused banded backward factorization.

    Wc, Utc: [S, L, n, n] f32 (equilibrated). Returns (Ls, CUs, schur0) with
    the factors in KERNEL layout [L, n, n, S_pad] (scenarios on the lane
    dim, identity on padded lanes) so the per-iteration solve sweeps consume
    them without re-transposing/re-padding; schur0 is [S, n, n]. The kernel
    layout is an opaque handle: only chain_solve_bwd / chain_forward (and
    the fused system solve) read it.
    """
    S, L, n, _ = Wc.shape
    S_pad = max(_TS, ((S + _TS - 1) // _TS) * _TS)
    # [L, n, n, S]
    Wt = _pad_s(jnp.transpose(Wc, (1, 2, 3, 0)), S_pad)
    # identity on padded lanes so the factorization stays finite
    eye = jnp.eye(n, dtype=Wc.dtype)[:, :, None]
    lane_pad = (jnp.arange(S_pad) >= S)[None, None, :]
    Wt = Wt + jnp.where(lane_pad, eye, 0.0)[None]
    Ut_t = _pad_s(jnp.transpose(Utc, (1, 2, 3, 0)), S_pad)

    def kernel(W_ref, Ut_ref, L_ref, CU_ref, schur_ref):
        schur = jnp.zeros((n, n, _TS), W_ref.dtype)
        for j in range(L - 1, -1, -1):
            Lf = _chol(W_ref[j] - schur, n)
            CU = _rtrsm_t(Lf, Ut_ref[j], n)
            L_ref[j] = Lf
            CU_ref[j] = CU
            # schur[i,j] = sum_k CU[i,k] CU[j,k], unrolled (Mosaic has no
            # batch-last dot)
            schur = sum(CU[:, k][:, None, :] * CU[:, k][None, :, :]
                        for k in range(n))  # outer products, 3D broadcasts
        schur_ref[...] = schur

    with jax.enable_x64(False):  # Mosaic needs i32 index maps
        Ls, CUs, schur0 = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[_spec4(L, n), _spec4(L, n)],
            out_specs=(_spec4(L, n), _spec4(L, n), _spec_s(n)),
            out_shape=(jax.ShapeDtypeStruct((L, n, n, S_pad), Wc.dtype),
                       jax.ShapeDtypeStruct((L, n, n, S_pad), Wc.dtype),
                       jax.ShapeDtypeStruct((n, n, S_pad), Wc.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Wt, Ut_t)
    schur0 = jnp.transpose(schur0[..., :S], (2, 0, 1))
    return Ls, CUs, schur0


def chain_solve_bwd(Lt, CUt, res):
    """Fused RHS backward sweep: y_j = L_j^-1 (r_j - CU_{j+1} y_{j+1}).

    Lt/CUt are chain_factor's kernel-layout factors [L, n, n, S_pad].
    Returns (ys in kernel layout [L, n, S_pad] — feed it straight to
    chain_forward — and radd0 [S, n])."""
    L, n, _, S_pad = Lt.shape
    S = res.shape[0]
    rt = _pad_s(jnp.transpose(res, (1, 2, 0)), S_pad)

    def kernel(L_ref, CU_ref, r_ref, y_ref, radd_ref):
        radd = jnp.zeros((n, _TS), L_ref.dtype)
        for j in range(L - 1, -1, -1):
            y = _ltrsv(L_ref[j], r_ref[j] - radd, n)
            y_ref[j] = y
            CU = CU_ref[j]
            radd = sum(CU[:, k] * y[k:k + 1] for k in range(n))
        radd_ref[...] = radd

    with jax.enable_x64(False):
        ys, radd0 = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[_spec4(L, n), _spec4(L, n), _spec3(L, n)],
            out_specs=(_spec3(L, n), _spec_v(n)),
            out_shape=(jax.ShapeDtypeStruct((L, n, S_pad), Lt.dtype),
                       jax.ShapeDtypeStruct((n, S_pad), Lt.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt, rt)
    return ys, jnp.transpose(radd0[..., :S], (1, 0))


def chain_forward(Lt, CUt, ys, droot):
    """Fused forward substitution: dl_j = L_j^-T (y_j - CU_j' dl_{j-1}).

    Lt/CUt: kernel-layout factors; ys: chain_solve_bwd's kernel-layout
    output [L, n, S_pad]; droot [S, n]. Returns dls [S, L, n]."""
    L, n, _, S_pad = Lt.shape
    S = droot.shape[0]
    yt = ys
    dr = _pad_s(jnp.transpose(droot, (1, 0)), S_pad)

    def kernel(L_ref, CU_ref, y_ref, dr_ref, dl_ref):
        dp = dr_ref[...]
        for j in range(L):
            CU = CU_ref[j]
            d = y_ref[j] - sum(CU[k] * dp[k:k + 1] for k in range(n))
            dl = _uttrsv(L_ref[j], d, n)
            dl_ref[j] = dl
            dp = dl

    with jax.enable_x64(False):
        dls = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[_spec4(L, n), _spec4(L, n), _spec3(L, n), _spec_v(n)],
            out_specs=_spec3(L, n),
            out_shape=jax.ShapeDtypeStruct((L, n, S_pad), Lt.dtype),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt, yt, dr)
    return jnp.transpose(dls[..., :S], (2, 0, 1))



def _ltrsv_mat(L, R, n, m):
    """Solve L Y = R, R [n, m, T] (m static small columns)."""
    ys = []
    for i in range(n):
        acc = R[i]  # [m, T]
        for k in range(i):
            acc = acc - L[i:i + 1, k] * ys[k]
        ys.append(acc / L[i:i + 1, i])
    return jnp.stack(ys, axis=0)  # [n, m, T]


def _uttrsv_mat(L, D, n, m):
    """Solve L' Z = D, D [n, m, T]."""
    zs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = D[i]
        for k in range(i + 1, n):
            acc = acc - L[k:k + 1, i] * zs[k]
        zs[i] = acc / L[i:i + 1, i]
    return jnp.stack(zs, axis=0)


def chain_full_solve_mat(Lt, CUt, rhs):
    """Fused multi-RHS FULL solve of self-contained chains (Ut_0 = 0):
    backward sweep y_j = L_j^-1 (r_j - CU_{j+1} y_{j+1}) then forward
    z_j = L_j^-T (y_j - CU_j' z_{j-1}), both inside ONE kernel.

    Lt/CUt: chain_factor's kernel-layout factors [L, n, n, S_pad] of a
    chain whose node 0 has NO parent coupling (CU_0 must be zero — the
    sdunes per-scenario banded systems, dual_Newton_scenarios.c:590-689,
    mapped in reversed stage order). rhs [S, L, n, m] -> z [S, L, n, m].
    """
    L, n, _, S_pad = Lt.shape
    S, _, _, m = rhs.shape
    rt = _pad_s(jnp.transpose(rhs, (1, 2, 3, 0)), S_pad)  # [L, n, m, S_pad]

    def kernel(L_ref, CU_ref, r_ref, z_ref, y_ref):
        acc = jnp.zeros((n, m, _TS), L_ref.dtype)
        for j in range(L - 1, -1, -1):
            y = _ltrsv_mat(L_ref[j], r_ref[j] - acc, n, m)
            y_ref[j] = y
            CU = CU_ref[j]
            # acc_{j-1} = CU_j y_j : [n, m, T]
            acc = sum(CU[:, k][:, None, :] * y[k][None, :, :]
                      for k in range(n))
        zp = jnp.zeros((n, m, _TS), L_ref.dtype)
        for j in range(L):
            CU = CU_ref[j]
            # d = y_j - CU_j' z_{j-1}: d[i] = y[i] - sum_k CU[k, i] zp[k]
            d = y_ref[j] - sum(CU[k][:, None, :] * zp[k][None, :, :]
                               for k in range(n))
            z = _uttrsv_mat(L_ref[j], d, n, m)
            z_ref[j] = z
            zp = z

    def _spec_m(Lh):
        return pl.BlockSpec((Lh, n, m, _TS), lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        z, _ = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[_spec4(L, n), _spec4(L, n), _spec_m(L)],
            out_specs=(_spec_m(L), _spec_m(L)),
            out_shape=(jax.ShapeDtypeStruct((L, n, m, S_pad), Lt.dtype),
                       jax.ShapeDtypeStruct((L, n, m, S_pad), Lt.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt, rt)
    return jnp.transpose(z[..., :S], (3, 0, 1, 2))


def chain_blocks_factor(ABt, ztp, qtc, s_root):
    """Fused chain-side factorize: dual-Hessian block build + Jacobi
    equilibration + banded backward factorization in ONE launch.

    Per chain node j (tdunes_multistage._chain_blocks math):
        Wc_j  = AB_j diag(ztp_j) AB_j' + diag(qtc_j)
        Utc_j = -(ztp_j[:nx]) * A_j'          (A = AB[:, :nx])
    then the Jacobi scales sc_j = rsqrt(diag Wc_j), the scaled system
    S M S, and the backward factorization of chain_factor.

    ABt [S, L, nx, nz] edge dynamics INTO node j; ztp [S, L, nz] parent
    masked inverses (crown root at j=0); qtc [S, L, nx] child x masked
    inverses; s_root [S, nx] crown-side row scale of each chain's crown
    parent (rows of Ut_0 / schur0 live in the crown's scale).

    Returns (Ls, CUs kernel-layout factors, schur0 [S, nx, nx] in crown
    scale, sc [S, L, nx]).
    """
    S, L, nx, nz = ABt.shape
    S_pad = max(_TS, ((S + _TS - 1) // _TS) * _TS)
    AB_k = _pad_s(jnp.transpose(ABt, (1, 2, 3, 0)), S_pad)   # [L,nx,nz,SP]
    ztp_k = _pad_s(jnp.transpose(ztp, (1, 2, 0)), S_pad)     # [L,nz,SP]
    qtc_k = _pad_s(jnp.transpose(qtc, (1, 2, 0)), S_pad, fill=1.0)
    sr_k = _pad_s(jnp.transpose(s_root, (1, 0)), S_pad, fill=1.0)

    def kernel(AB_ref, ztp_ref, qtc_ref, sr_ref, L_ref, CU_ref, schur_ref,
               sc_ref, W_s, Ut_s):
        # pass 1 (forward): build blocks + scales into scratch
        for j in range(L):
            AB = AB_ref[j]                      # [nx, nz, T]
            zt = ztp_ref[j]                     # [nz, T]
            W = sum((AB[:, n] * zt[n:n + 1])[:, None, :] * AB[:, n][None]
                    for n in range(nz))         # [nx, nx, T]
            qc = qtc_ref[j]                     # [nx, T]
            rowi = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1), 0)
            coli = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1), 1)
            diag = jnp.where(rowi == coli, 1.0, 0.0)
            W = W + diag * qc[:, None, :]
            idx = jax.lax.broadcasted_iota(jnp.int32, (nx, 1), 0)
            d = sum((W[i, i])[None] * jnp.where(idx == i, 1.0, 0.0)
                    for i in range(nx))         # diag extract [nx, T]
            sc = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
            sc_ref[j] = sc
            W = W * sc[:, None, :] * sc[None, :, :]
            W_s[j] = W
            # Ut[i, c] = -zt[i] * AB[c, i] (A part), scaled rows by parent
            # scale, cols by sc
            Ut = -jnp.stack([zt[i] * AB[:, i] for i in range(nx)], axis=0)
            scp = sr_ref[...] if j == 0 else sc_ref[j - 1]
            Ut_s[j] = Ut * scp[:, None, :] * sc[None, :, :]
        # pass 2 (backward): factorization, as chain_factor (padded lanes
        # hold identity blocks by construction: qtc pads with 1, data with 0)
        schur = jnp.zeros((nx, nx, _TS), jnp.float32)
        for j in range(L - 1, -1, -1):
            Lf = _chol(W_s[j] - schur, nx)
            CU = _rtrsm_t(Lf, Ut_s[j], nx)
            L_ref[j] = Lf
            CU_ref[j] = CU
            schur = sum(CU[:, k][:, None, :] * CU[:, k][None, :, :]
                        for k in range(nx))
        schur_ref[...] = schur

    def _spec_ab(Lh):
        return pl.BlockSpec((Lh, nx, nz, _TS), lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)

    def _spec_z(Lh):
        return pl.BlockSpec((Lh, nz, _TS), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        Ls, CUs, schur0, sc = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[_spec_ab(L), _spec_z(L), _spec3(L, nx), _spec_v(nx)],
            out_specs=(_spec4(L, nx), _spec4(L, nx), _spec_s(nx),
                       _spec3(L, nx)),
            out_shape=(jax.ShapeDtypeStruct((L, nx, nx, S_pad), jnp.float32),
                       jax.ShapeDtypeStruct((L, nx, nx, S_pad), jnp.float32),
                       jax.ShapeDtypeStruct((nx, nx, S_pad), jnp.float32),
                       jax.ShapeDtypeStruct((L, nx, S_pad), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((L, nx, nx, _TS), jnp.float32),
                            pltpu.VMEM((L, nx, nx, _TS), jnp.float32)],
            interpret=_interpret(), compiler_params=_PARAMS,
        )(AB_k.astype(jnp.float32), ztp_k.astype(jnp.float32),
          qtc_k.astype(jnp.float32), sr_k.astype(jnp.float32))
    schur0 = jnp.transpose(schur0[..., :S], (2, 0, 1))
    sc = jnp.transpose(sc[..., :S], (2, 0, 1))
    return Ls, CUs, schur0, sc


def chain_eval(data_l, lam):
    """Fused chain stage EVALUATION: clipping stage solve + crown-root
    contributions + the chains' dual-value terms, one launch
    (_chain_stage_solve + _chain_root_contrib + _chain_dual_terms).

    ``data_l``: lane-layout problem data dict (chain_eval_data) — loop-
    invariant, hoisted out of solver loops by XLA. ``lam`` [S, L, nx].

    Returns dict(x, u [S, L, ...] for residuals/line search; qt, rt,
    xUnc, uUnc in KERNEL lane layout [L, n, S_pad] — qt/rt feed
    chain_blocks_factor_lanes without re-transposing, xUnc/uUnc only
    matter at the final export), cqr [S, nz] (root contributions),
    fch [S] (per-chain dual-value partial sums), and res_part [S, L, nx]:
    the chain-edge dual residuals A_j z_{j-1} + b_j - x_j, with the root
    row j=0 holding only b_0 - x_0 (the caller adds A_0 z_crown from the
    crown evaluation — _chain_residual's rid row).
    """
    ABt = data_l["ABt"]
    L, nx, nz, S_pad = ABt.shape
    S = lam.shape[0]
    nu = nz - nx
    lam_t = _pad_s(jnp.transpose(lam, (1, 2, 0)), S_pad)

    def kernel(AB_ref, q_ref, r_ref, Qd_ref, Rd_ref, Qi_ref, Ri_ref,
               xlo_ref, xhi_ref, ulo_ref, uhi_ref, b_ref, lam_ref,
               x_ref, u_ref, qt_ref, rt_ref, xU_ref, uU_ref,
               res_ref, cqr_ref, f_ref):
        facc = jnp.zeros((1, _TS), jnp.float32)
        x_prev = u_prev = None
        for j in range(L):
            lam_j = lam_ref[j]                       # [nx, T]
            qmod = -q_ref[j] + lam_j
            rmod = -r_ref[j]
            if j < L - 1:
                ABn = AB_ref[j + 1]                  # [nx, nz, T]
                lam_n = lam_ref[j + 1]
                up = sum(ABn[row] * lam_n[row:row + 1] for row in range(nx))
                qmod = qmod - up[:nx]
                rmod = rmod - up[nx:]
            xU = Qi_ref[j] * qmod
            uU = Ri_ref[j] * rmod
            xlo, xhi = xlo_ref[j], xhi_ref[j]
            ulo, uhi = ulo_ref[j], uhi_ref[j]
            x = jnp.minimum(jnp.maximum(xU, xlo), xhi)
            u = jnp.minimum(jnp.maximum(uU, ulo), uhi)
            qt = jnp.where((xU > xhi) | (xU < xlo), 0.0, Qi_ref[j])
            rt = jnp.where((uU > uhi) | (uU < ulo), 0.0, Ri_ref[j])
            x_ref[j] = x
            u_ref[j] = u
            qt_ref[j] = qt
            rt_ref[j] = rt
            xU_ref[j] = xU
            uU_ref[j] = uU
            # chain-edge dual residual res_j = A_j z_{j-1} + b_j - x_j
            # (z_{j-1} from the previous loop stage; the j=0 row's
            # A_0 z_crown term is added outside from the crown solution)
            res_j = b_ref[j] - x
            if j > 0:
                ABj = AB_ref[j]                      # [nx, nz, T]
                res_j = res_j \
                    + sum(ABj[:, i] * x_prev[i:i + 1] for i in range(nx)) \
                    + sum(ABj[:, nx + i] * u_prev[i:i + 1]
                          for i in range(nu))
            res_ref[j] = res_j
            x_prev, u_prev = x, u
            tx = x * (qmod - 0.5 * Qd_ref[j] * x) - b_ref[j] * lam_j
            tu = u * (rmod - 0.5 * Rd_ref[j] * u)
            facc = facc + sum(tx[i:i + 1] for i in range(nx)) \
                + sum(tu[i:i + 1] for i in range(nu))
        AB0 = AB_ref[0]
        lam_0 = lam_ref[0]
        cqr = sum(AB0[row] * lam_0[row:row + 1] for row in range(nx))
        cqr_ref[...] = cqr
        f_ref[...] = facc

    specs = dict(
        AB=pl.BlockSpec((L, nx, nz, _TS), lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM),
        Lnx=_spec3(L, nx), Lnu=_spec3(L, nu),
        cqr=pl.BlockSpec((nz, _TS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        f=pl.BlockSpec((1, _TS), lambda i: (0, i), memory_space=pltpu.VMEM))
    with jax.enable_x64(False):
        x, u, qt, rt, xU, uU, res, cqr, fch = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[specs["AB"], specs["Lnx"], specs["Lnu"], specs["Lnx"],
                      specs["Lnu"], specs["Lnx"], specs["Lnu"],
                      specs["Lnx"], specs["Lnx"], specs["Lnu"], specs["Lnu"],
                      specs["Lnx"], specs["Lnx"]],
            out_specs=(specs["Lnx"], specs["Lnu"], specs["Lnx"],
                       specs["Lnu"], specs["Lnx"], specs["Lnu"],
                       specs["Lnx"], specs["cqr"], specs["f"]),
            out_shape=tuple(
                jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                ((L, nx, S_pad), (L, nu, S_pad), (L, nx, S_pad),
                 (L, nu, S_pad), (L, nx, S_pad), (L, nu, S_pad),
                 (L, nx, S_pad), (nz, S_pad), (1, S_pad))),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(ABt, data_l["q"], data_l["r"], data_l["Qd"], data_l["Rd"],
          data_l["Qinv"], data_l["Rinv"], data_l["xmin"], data_l["xmax"],
          data_l["umin"], data_l["umax"], data_l["b"], lam_t)
    return dict(
        x=jnp.transpose(x[..., :S], (2, 0, 1)),
        u=jnp.transpose(u[..., :S], (2, 0, 1)),
        qt=qt, rt=rt, xUnc=xU, uUnc=uU,
        res_part=jnp.transpose(res[..., :S], (2, 0, 1)),
        cqr=jnp.transpose(cqr[..., :S], (1, 0)),
        fch=jnp.sum(fch[0, :S]))


def chain_eval_data(ms_A, ms_B, q, r, Qd, Rd, xmin, xmax, umin, umax, b):
    """Lane-layout problem data for chain_eval ([S, L, ...] f64/f32 in,
    f32 lane tensors out). Loop-invariant: call once per solve; XLA
    hoists it out of Newton loops."""
    f32 = jnp.float32
    S = q.shape[0]
    S_pad = max(_TS, ((S + _TS - 1) // _TS) * _TS)

    def t3(v, fill=0.0):
        return _pad_s(jnp.transpose(v.astype(f32), (1, 2, 0)), S_pad,
                      fill=fill)

    AB = jnp.concatenate([ms_A, ms_B], axis=3).astype(f32)
    return dict(
        ABt=_pad_s(jnp.transpose(AB, (1, 2, 3, 0)), S_pad),
        q=t3(q), r=t3(r), Qd=t3(Qd, 1.0), Rd=t3(Rd, 1.0),
        Qinv=t3(1.0 / Qd, 1.0), Rinv=t3(1.0 / Rd, 1.0),
        xmin=t3(xmin, -1.0), xmax=t3(xmax, 1.0),
        umin=t3(umin, -1.0), umax=t3(umax, 1.0), b=t3(b))


def chain_blocks_factor_lanes(ABt_l, qt_l, rt_l, ztp_root, s_root):
    """chain_blocks_factor consuming chain_eval's LANE-layout stage data
    directly (no re-transposes): ztp_j is [root ztp at j=0, (qt, rt)_{j-1}
    for j >= 1], assembled INSIDE the kernel.

    ABt_l [L, nx, nz, S_pad] (chain_eval_data's ABt); qt_l [L, nx, S_pad],
    rt_l [L, nu, S_pad] (chain_eval outputs); ztp_root [S, nz] crown-root
    masked inverses; s_root [S, nx] crown-side row scales.
    Returns (Ls, CUs, schur0 [S, nx, nx], sc [S, L, nx]) as
    chain_blocks_factor.
    """
    L, nx, nz, S_pad = ABt_l.shape
    S = ztp_root.shape[0]
    ztpr = _pad_s(jnp.transpose(ztp_root, (1, 0)).astype(jnp.float32), S_pad)
    sr_k = _pad_s(jnp.transpose(s_root, (1, 0)).astype(jnp.float32), S_pad,
                  fill=1.0)

    def kernel(AB_ref, qt_ref, rt_ref, ztpr_ref, sr_ref,
               L_ref, CU_ref, schur_ref, sc_ref, W_s, Ut_s):
        for j in range(L):
            AB = AB_ref[j]
            if j == 0:
                zt = ztpr_ref[...]
            else:
                zt = jnp.concatenate([qt_ref[j - 1], rt_ref[j - 1]], axis=0)
            W = sum((AB[:, n] * zt[n:n + 1])[:, None, :] * AB[:, n][None]
                    for n in range(nz))
            qc = qt_ref[j]
            rowi = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1), 0)
            coli = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1), 1)
            W = W + jnp.where(rowi == coli, 1.0, 0.0) * qc[:, None, :]
            idx = jax.lax.broadcasted_iota(jnp.int32, (nx, 1), 0)
            d = sum((W[i, i])[None] * jnp.where(idx == i, 1.0, 0.0)
                    for i in range(nx))
            sc = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
            sc_ref[j] = sc
            W_s[j] = W * sc[:, None, :] * sc[None, :, :]
            Ut = -jnp.stack([zt[i] * AB[:, i] for i in range(nx)], axis=0)
            scp = sr_ref[...] if j == 0 else sc_ref[j - 1]
            Ut_s[j] = Ut * scp[:, None, :] * sc[None, :, :]
        schur = jnp.zeros((nx, nx, _TS), jnp.float32)
        for j in range(L - 1, -1, -1):
            Lf = _chol(W_s[j] - schur, nx)
            CU = _rtrsm_t(Lf, Ut_s[j], nx)
            L_ref[j] = Lf
            CU_ref[j] = CU
            schur = sum(CU[:, k][:, None, :] * CU[:, k][None, :, :]
                        for k in range(nx))
        schur_ref[...] = schur

    nu = nz - nx

    def _spec_ab(Lh):
        return pl.BlockSpec((Lh, nx, nz, _TS), lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        Ls, CUs, schur0, sc = pl.pallas_call(
            kernel,
            grid=(S_pad // _TS,),
            in_specs=[_spec_ab(L), _spec3(L, nx), _spec3(L, nu),
                      pl.BlockSpec((nz, _TS), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      _spec_v(nx)],
            out_specs=(_spec4(L, nx), _spec4(L, nx), _spec_s(nx),
                       _spec3(L, nx)),
            out_shape=(jax.ShapeDtypeStruct((L, nx, nx, S_pad), jnp.float32),
                       jax.ShapeDtypeStruct((L, nx, nx, S_pad), jnp.float32),
                       jax.ShapeDtypeStruct((nx, nx, S_pad), jnp.float32),
                       jax.ShapeDtypeStruct((L, nx, S_pad), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((L, nx, nx, _TS), jnp.float32),
                            pltpu.VMEM((L, nx, nx, _TS), jnp.float32)],
            interpret=_interpret(), compiler_params=_PARAMS,
        )(ABt_l, qt_l, rt_l, ztpr, sr_k)
    schur0 = jnp.transpose(schur0[..., :S], (2, 0, 1))
    sc = jnp.transpose(sc[..., :S], (2, 0, 1))
    return Ls, CUs, schur0, sc
