"""Pallas TPU kernels for the crown (generic-tree) block Cholesky.

The level-synchronous tree Cholesky (reference dual_Newton_tree.c:668-775)
on the crown of a multistage tree — or any tree with <= 128 λ-groups — is
a few dozen tiny (G x G, G <= 64) factorizations per level. The XLA path
(`_tree_chol_factor`) spends ~1 ms/call in op overhead: XLA's cholesky /
triangular_solve lower to while-loops of [B, G]-shaped steps.

These kernels fuse the ENTIRE factorization (all levels + root) into one
Pallas launch:

* one λ-group per lane: arrays live as [G, G, 128] with the group index on
  the 128-wide lane dimension, so each scalar step of the factorization is
  one VPU op over all groups at once;
* every level computes on ALL lanes (idle lanes are free) and commits only
  its own lane range via masks — level count is small (tree depth), so the
  redundant work is negligible;
* the child->parent Schur scatter (a cross-lane reduction with slot
  placement) becomes K small MXU matmuls against static 0/1 permutation
  matrices P[level, slot][child_lane, parent_lane];
* pivot clamping (diag >= pivot floor) + a static Levenberg-Marquardt shift
  replace the reg-Cholesky cascade — valid because the blocks are Jacobi-
  equilibrated (unit diagonal) before factorization.

Kernels are f32 (TPU Pallas has no f64); the solvers wrap them in the
mixed-precision iterative-refinement scheme for f64 end-to-end accuracy.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["crown_supported", "crown_factor", "crown_solve"]

_NP = 128          # lane width: max λ-groups per tree
_PIVOT_FLOOR = 1e-8


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# schedule (host-side, static per topology)


@dataclasses.dataclass(frozen=True)
class _CrownSched:
    n_lev: int            # backward levels (deepest parent stage .. stage 1)
    K: int
    G: int
    nxm: int
    NpG: int
    NPg: int              # group-lane width (multiple of 128, >= NpG)
    # [K, NPg, NPg] f32 child->parent permutations, ONE per kid slot for
    # ALL levels: the level loops mask their inputs/commits with `masks`,
    # so off-level entries scatter/gather zeros (or masked-away values)
    # and the per-level matrices of the original design collapse — that
    # removes the n_lev memory factor and lifts the 128-lambda-group cap
    # (VERDICT r3 #8) to a VMEM-budget bound.
    P: np.ndarray
    masks: np.ndarray     # [n_lev + 1, 1, NPg] f32 commit masks (last = root)


def _get_sched(prep) -> _CrownSched:
    """Build / fetch the per-topology kernel schedule from a tdunes _Prep."""
    sched = getattr(prep, "_crown_sched", None)
    if sched is not None:
        return sched
    NpG, K, G, nxm = prep.NpG, prep.K, prep.G, prep.nxm
    NPg = max(_NP, ((NpG + _NP - 1) // _NP) * _NP)
    n_lev = prep.n_sweep
    P = np.zeros((K, NPg, NPg), np.float32)
    masks = np.zeros((n_lev + 1, 1, NPg), np.float32)
    for r in range(n_lev):
        idx = prep.bwd_idx[r]
        dad = prep.bwd_dad[r]
        slot = prep.bwd_slot[r]
        valid = prep.bwd_valid[r]
        for g, d, s, v in zip(idx, dad, slot, valid):
            if not v:
                continue
            P[s, g, d] = 1.0
            masks[r, 0, g] = 1.0
    masks[n_lev, 0, 0] = 1.0  # root group
    sched = _CrownSched(n_lev=n_lev, K=K, G=G, nxm=nxm, NpG=NpG, NPg=NPg,
                        P=P, masks=masks)
    prep._crown_sched = sched
    return sched


_VMEM_LIMIT = 100 * 1024 * 1024   # v5e has 128 MB VMEM; the default
# scoped limit is 16 MB — these kernels request more via CompilerParams
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def crown_supported(prep, opts) -> bool:
    """Kernel applicability: the scoped-VMEM footprint of the factor
    kernels — slot scatter matrices K*NPg^2 plus ~9 W-shaped working
    copies G^2*NPg plus the blocks/coupling operands — must fit the
    raised scoped-VMEM limit (vmem_limit_bytes=100 MB vs the 16 MB
    default; actual usage measured ~1.4x the estimate, so budget 64 MB).
    Plus moderate block dim, f32 path, static regularization."""
    NPg = max(_NP, ((prep.NpG + _NP - 1) // _NP) * _NP)
    nz = prep.nxm + 8  # conservative stand-in for nxm+num operands
    est = (prep.K * NPg * NPg + 9 * prep.G * prep.G * NPg
           + prep.K * prep.nxm * nz * NPg + 4 * prep.nxm * prep.G * NPg) * 4
    return (est <= 64_000_000 and prep.G <= 64
            and opts.factor_dtype == "float32"
            and opts.reg_type in ("always", "none"))


# ---------------------------------------------------------------------------
# in-kernel primitives ([rows, T] layout, static masks — no concat chains)


def _chol(W, n, reg):
    """Lower Cholesky of [n, n, T] with static LM shift + clamped pivots."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = []
    for k in range(n):
        a = W[:, k]  # [n, T]
        if reg:
            a = a + jnp.where(rowi == k, jnp.asarray(reg, W.dtype), 0.0)
        for m in range(k):
            a = a - cols[m] * cols[m][k:k + 1]
        d = jnp.maximum(a[k:k + 1], _PIVOT_FLOOR)  # [1, T]
        dinv = jax.lax.rsqrt(d)
        col = jnp.where(rowi > k, a * dinv, 0.0) + \
            jnp.where(rowi == k, d * dinv, 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=1)  # [n(row), n(col), T]


def _rtrsm_t(L, B, n):
    """X L' = B; L lower [n, n, T], B [m, n, T]."""
    cols = []
    for j in range(n):
        acc = B[:, j]
        for c in range(j):
            acc = acc - cols[c] * L[j:j + 1, c]
        cols.append(acc / L[j:j + 1, j])
    return jnp.stack(cols, axis=1)


def _ltrsv(L, r, n):
    """L y = r, r [n, T]."""
    ys = []
    for i in range(n):
        acc = r[i:i + 1]
        for m in range(i):
            acc = acc - L[i:i + 1, m] * ys[m]
        ys.append(acc / L[i:i + 1, i])
    return jnp.concatenate(ys, axis=0)


def _uttrsv(L, d, n):
    """L' z = d, d [n, T]."""
    zs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = d[i:i + 1]
        for m in range(i + 1, n):
            acc = acc - L[m:m + 1, i] * zs[m]
        zs[i] = acc / L[i:i + 1, i]
    return jnp.concatenate(zs, axis=0)


def _lane_mm(x, P):
    """Cross-lane scatter x[..., child] -> out[..., parent] via MXU:
    out[i, d] = sum_g x[i, g] P[g, d]. x [m, _NP], P [_NP, _NP]."""
    return jax.lax.dot_general(x, P, (((1,), (0,)), ((), ())),
                               preferred_element_type=x.dtype)


def _lane_mm_t(x, P):
    """Cross-lane gather x[..., parent] -> out[..., child]:
    out[i, g] = sum_d x[i, d] P[g, d]."""
    return jax.lax.dot_general(x, P, (((1,), (1,)), ((), ())),
                               preferred_element_type=x.dtype)


# ---------------------------------------------------------------------------
# kernels


def _pad_lanes(x, fill=0.0, lanes=_NP):
    pad = lanes - x.shape[-1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[-1] = (0, pad)
    return jnp.pad(x, cfg, constant_values=fill)


def _factor_levels(Wv, Utv, P_ref, M_ref, G, nxm, n_lev, K, reg,
                   NPg=_NP):
    """The level-synchronous factorization loop shared by crown_factor and
    crown_blocks_factor (values in, lane-layout factors out)."""
    # identity init: lanes never committed (padding / leaf-stage slots)
    # must stay triangular-solvable, or NaNs would propagate through the
    # cross-lane MXU matmuls in crown_solve (0 * NaN = NaN)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 1)
    CholWv = jnp.where(rowi == coli, jnp.ones((), Wv.dtype), 0.0) \
        * jnp.ones((1, 1, NPg), Wv.dtype)
    CholUtv = jnp.zeros((nxm, G, NPg), Wv.dtype)
    for r in range(n_lev):
        Lf = _chol(Wv, G, reg)
        CU = _rtrsm_t(Lf, Utv, G)
        m = M_ref[r]                                 # [1, NP]
        CholWv = jnp.where(m[None], Lf, CholWv)
        CholUtv = jnp.where(m[None], CU, CholUtv)
        # Schur S = CU CU' [nxm, nxm, NP]; only this level's lanes count
        CUm = CU * m[None]
        S = sum(CUm[:, k][:, None, :] * CU[:, k][None, :, :]
                for k in range(G))
        S2 = S.reshape(nxm * nxm, NPg)
        # assemble the K slot updates as one block-diagonal [G, G, NPg]
        # (Mosaic has no value-level dynamic_update_slice)
        upds = [_lane_mm(S2, P_ref[s]).reshape(nxm, nxm, NPg)
                for s in range(K)]
        zero = jnp.zeros((nxm, nxm, NPg), Wv.dtype)
        rows = [jnp.concatenate([upds[s] if t == s else zero
                                 for t in range(K)], axis=1)
                for s in range(K)]
        Wv = Wv - jnp.concatenate(rows, axis=0)
    # root
    Lf = _chol(Wv, G, reg)
    CholWv = jnp.where(M_ref[n_lev][None], Lf, CholWv)
    return CholWv, CholUtv


@partial(jax.jit, static_argnames=("prep", "reg"))
def crown_factor(W, Ut, prep, reg=0.0):
    """Fused tree block-Cholesky. W [NpG, G, G] f32 (equilibrated), Ut
    [NpG, nxm, G] f32. Returns lane-layout factors (CholW [G, G, 128],
    CholUt [nxm, G, 128]) for crown_solve."""
    sched = _get_sched(prep)
    G, nxm, n_lev, K = sched.G, sched.nxm, sched.n_lev, sched.K
    NPg = sched.NPg
    Wt = _pad_lanes(jnp.transpose(W, (1, 2, 0)), lanes=NPg)  # [G, G, NPg]
    # identity on empty lanes keeps the all-lane factorization finite
    lane_pad = (jnp.arange(NPg) >= sched.NpG)[None, None, :]
    eye = jnp.eye(G, dtype=W.dtype)[:, :, None]
    Wt = Wt + jnp.where(lane_pad, eye, 0.0)
    Utt = _pad_lanes(jnp.transpose(Ut, (1, 2, 0)), lanes=NPg)
    Pm = jnp.asarray(sched.P)                          # [K, NPg, NPg]
    Mm = jnp.asarray(sched.masks)                      # [n_lev+1, 1, NPg]

    def kernel(W_ref, Ut_ref, P_ref, M_ref, CholW_ref, CholUt_ref):
        CholWv, CholUtv = _factor_levels(W_ref[...], Ut_ref[...], P_ref,
                                         M_ref, G, nxm, n_lev, K, reg,
                                         NPg=NPg)
        CholW_ref[...] = CholWv
        CholUt_ref[...] = CholUtv

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):  # Mosaic needs i32 index maps
        CholW, CholUt = pl.pallas_call(
            kernel,
            in_specs=[spec((G, G, NPg)), spec((nxm, G, NPg)),
                      spec(Pm.shape), spec(Mm.shape)],
            out_specs=(spec((G, G, NPg)), spec((nxm, G, NPg))),
            out_shape=(jax.ShapeDtypeStruct((G, G, NPg), W.dtype),
                       jax.ShapeDtypeStruct((nxm, G, NPg), W.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Wt, Utt, Pm, Mm)
    return CholW, CholUt


@partial(jax.jit, static_argnames=("prep",))
def crown_solve(CholW, CholUt, rg, prep):
    """Solve M dlam = rg with crown_factor's lane-layout factors.
    rg [NpG, G] f32 -> dlam [NpG, G] f32."""
    sched = _get_sched(prep)
    G, nxm, n_lev, K = sched.G, sched.nxm, sched.n_lev, sched.K
    NPg = sched.NPg
    rt = _pad_lanes(jnp.transpose(rg, (1, 0)), lanes=NPg)   # [G, NPg]
    Pm = jnp.asarray(sched.P)
    Mm = jnp.asarray(sched.masks)

    def kernel(L_ref, CU_ref, P_ref, M_ref, r_ref, dl_ref):
        Lv = L_ref[...]
        CUv = CU_ref[...]
        rv = r_ref[...]
        ysv = jnp.zeros((G, NPg), rv.dtype)
        # backward RHS sweep
        for r in range(n_lev):
            y = _ltrsv(Lv, rv, G)
            m = M_ref[r]
            ysv = jnp.where(m, y, ysv)
            ym = y * m
            radd = sum(CUv[:, g] * ym[g:g + 1] for g in range(G))  # [nxm, NPg]
            rv = rv - jnp.concatenate(
                [_lane_mm(radd, P_ref[s]) for s in range(K)], axis=0)
        # root: L y = r, L' dl = y
        y0 = _ltrsv(Lv, rv, G)
        ysv = jnp.where(M_ref[n_lev], y0, ysv)
        dlv = jnp.where(M_ref[n_lev], _uttrsv(Lv, ysv, G), 0.0)
        # forward substitution, top level (nearest root) first
        for r in range(n_lev - 1, -1, -1):
            dp = sum(_lane_mm_t(dlv[s * nxm:(s + 1) * nxm], P_ref[s])
                     for s in range(K))                  # [nxm, NPg]
            d = ysv - sum(CUv[i] * dp[i:i + 1] for i in range(nxm))
            dl = _uttrsv(Lv, d, G)
            dlv = jnp.where(M_ref[r], dl, dlv)
        dl_ref[...] = dlv

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        dl = pl.pallas_call(
            kernel,
            in_specs=[spec((G, G, NPg)), spec((nxm, G, NPg)),
                      spec(Pm.shape), spec(Mm.shape), spec((G, NPg))],
            out_specs=spec((G, NPg)),
            out_shape=jax.ShapeDtypeStruct((G, NPg), CholW.dtype),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(CholW, CholUt, Pm, Mm, rt)
    return jnp.transpose(dl[:, :sched.NpG], (1, 0))


@partial(jax.jit, static_argnames=("prep", "reg"))
def crown_blocks_factor(ABk, ztp, dvals, sW, sUt, Wadd, prep, reg=0.0):
    """Fused crown factorize for the CLIPPING stage solver: dual-Hessian
    block build (A_i qtp A_j' sibling cross terms + child qtilde diagonal,
    dual_Newton_tree_clipping.c:264-355) + Jacobi scaling + the whole-tree
    level Cholesky, in ONE launch.

    ABk [NpG, K, nxm, nz] kids' masked [A B]; ztp [NpG, nz] parent node
    masked inverses; dvals [NpG, G] kids' own qtilde diagonals (1 on
    invalid slots); sW [NpG, G] Jacobi scales (from the analytic diagonal,
    computed host-XLA-side); sUt [NpG, nxm] dad-row scales; Wadd
    [NpG, G, G] pre-scaled additive term (the negated chain Schur
    complements). Returns lane-layout (CholW, CholUt) for crown_solve.
    """
    sched = _get_sched(prep)
    G, nxm, n_lev, K = sched.G, sched.nxm, sched.n_lev, sched.K
    NPg = sched.NPg
    nz = ABk.shape[-1]
    f32 = jnp.float32
    ABk_t = _pad_lanes(jnp.transpose(ABk, (1, 2, 3, 0)).astype(f32), lanes=NPg)
    ztp_t = _pad_lanes(jnp.transpose(ztp, (1, 0)).astype(f32), lanes=NPg)
    dv_t = _pad_lanes(jnp.transpose(dvals, (1, 0)).astype(f32), fill=1.0, lanes=NPg)
    sW_t = _pad_lanes(jnp.transpose(sW, (1, 0)).astype(f32), fill=1.0, lanes=NPg)
    sUt_t = _pad_lanes(jnp.transpose(sUt, (1, 0)).astype(f32), fill=1.0, lanes=NPg)
    Wadd_t = _pad_lanes(jnp.transpose(Wadd, (1, 2, 0)).astype(f32), lanes=NPg)
    Pm = jnp.asarray(sched.P)
    Mm = jnp.asarray(sched.masks)

    def kernel(AB_ref, ztp_ref, dv_ref, sW_ref, sUt_ref, Wadd_ref,
               P_ref, M_ref, CholW_ref, CholUt_ref):
        zt = ztp_ref[...]                               # [nz, NP]
        # W blocks: (i, j) kid pair -> sum_n ABk_i[:, n] ztp[n] ABk_j[:, n]'
        AB = [AB_ref[k] for k in range(K)]              # [nxm, nz, NP]
        ABz = [sum_ for sum_ in
               (jnp.stack([AB[k][:, n] * zt[n:n + 1] for n in range(nz)],
                          axis=1) for k in range(K))]   # [nxm, nz, NP]
        rows = []
        for i in range(K):
            blocks = []
            for j in range(K):
                blk = sum(ABz[i][:, n][:, None, :] * AB[j][:, n][None]
                          for n in range(nz))           # [nxm, nxm, NP]
                blocks.append(blk)
            rows.append(jnp.concatenate(blocks, axis=1))
        Wv = jnp.concatenate(rows, axis=0)              # [G, G, NP]
        rowi = jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 1)
        dv = dv_ref[...]
        Wv = Wv + jnp.where(rowi == coli, 1.0, 0.0) * dv[:, None, :]
        sWv = sW_ref[...]                               # [G, NP]
        Wv = Wv * sWv[:, None, :] * sWv[None, :, :] + Wadd_ref[...]
        # Ut[i, k*nxm + c] = -ztp[i] * A_k[c, i]  (x rows only)
        Ut_blocks = [jnp.stack([-zt[i] * AB[k][:, i] for i in range(nxm)],
                               axis=0) for k in range(K)]  # [nxm(i), nxm(c), NP]
        Utv = jnp.concatenate(Ut_blocks, axis=1)        # [nxm, G, NP]
        Utv = Utv * sUt_ref[...][:, None, :] * sWv[None, :, :]
        CholWv, CholUtv = _factor_levels(Wv, Utv, P_ref, M_ref,
                                         G, nxm, n_lev, K, reg, NPg=NPg)
        CholW_ref[...] = CholWv
        CholUt_ref[...] = CholUtv

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        CholW, CholUt = pl.pallas_call(
            kernel,
            in_specs=[spec((K, nxm, nz, NPg)), spec((nz, NPg)),
                      spec((G, NPg)), spec((G, NPg)), spec((nxm, NPg)),
                      spec((G, G, NPg)), spec(Pm.shape), spec(Mm.shape)],
            out_specs=(spec((G, G, NPg)), spec((nxm, G, NPg))),
            out_shape=(jax.ShapeDtypeStruct((G, G, NPg), f32),
                       jax.ShapeDtypeStruct((nxm, G, NPg), f32)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(ABk_t, ztp_t, dv_t, sW_t, sUt_t, Wadd_t, Pm, Mm)
    return CholW, CholUt


def _get_eval_sched(prep):
    """Static node-lane schedule for crown_eval: nodes on the lane
    dimension (padded to a multiple of 128) with the parent-gather /
    kid-scatter as one static 0/1 matrix."""
    sched = getattr(prep, "_crown_eval_sched", None)
    if sched is not None:
        return sched
    Nn = prep.Nn
    NPc = max(_NP, ((Nn + _NP - 1) // _NP) * _NP)
    P_par = np.zeros((NPc, NPc), np.float32)
    par = prep.par  # par[0] == 0 (root self-loop, masked by nrxm)
    for n in range(1, Nn):
        P_par[par[n], n] = 1.0  # gather: out[:, n] = in[:, par(n)]
    sched = (NPc, P_par)  # numpy — jnp.asarray at use (jit-safe caching)
    prep._crown_eval_sched = sched
    return sched


def crown_eval_supported(prep) -> bool:
    # whole-crown arrays must fit one VMEM block: the row tensors are
    # tiny ([nz, NPc] ~ 0.1 MB at 1408 lanes) — the binding term is the
    # [NPc, NPc] parent one-hot (7.9 MB at 1408 lanes, f32) next to the
    # rest of the mega-kernel's working set under the 100 MB scoped
    # limit. 2048 lanes (16 MB) covers the 1024-scenario tree's
    # 1365-node crown (round 5; was 1024).
    return prep.Nn <= 2048


def crown_eval_data(qp, prep, xm, um, nrxm):
    """Lane-layout crown problem data for crown_eval (loop-invariant)."""
    f32 = jnp.float32
    NPc, P_par = _get_eval_sched(prep)
    P_par = jnp.asarray(P_par)

    def t(v, fill=0.0):
        pad = NPc - v.shape[0]
        vt = jnp.transpose(v.astype(f32), (1, 0))
        return jnp.pad(vt, ((0, 0), (0, pad)), constant_values=fill)

    AB = jnp.concatenate([qp.A, qp.B], axis=2).astype(f32)  # [Nn, nxm, nz]
    ABt = jnp.pad(jnp.transpose(AB, (1, 2, 0)),
                  ((0, 0), (0, 0), (0, NPc - AB.shape[0])))
    Qd = jnp.diagonal(qp.Q, axis1=1, axis2=2)
    Rd = jnp.diagonal(qp.R, axis1=1, axis2=2)
    xmf = xm.astype(f32)
    umf = um.astype(f32)
    Qd_m = Qd.astype(f32) * xmf + (1.0 - xmf)  # identity padding rows
    Rd_m = Rd.astype(f32) * umf + (1.0 - umf)
    return dict(
        ABt=ABt, P_par=P_par,
        q=t(qp.q), r=t(qp.r), b=t(qp.b),
        Qd=t(Qd_m, 1.0), Rd=t(Rd_m, 1.0),
        Qinv=t(1.0 / Qd_m, 1.0), Rinv=t(1.0 / Rd_m, 1.0),
        xmin=t(qp.xmin, -1.0), xmax=t(qp.xmax, 1.0),
        umin=t(qp.umin, -1.0), umax=t(qp.umax, 1.0),
        xm=t(xm, 0.0), um=t(um, 0.0), nrxm=t(nrxm, 0.0))


def crown_eval(data, lam, extra):
    """Fused crown stage EVALUATION (clipping): modified gradients, clip
    solve, active-set masked inverses, dual residual, and the crown's
    dual-value terms — ONE launch (solve_stage_problems +
    build_dual_problem's gradient + eval_dual_term,
    dual_Newton_tree.c:256-330/:514-546, dual_Newton_tree_clipping.c).

    Nodes live on the lane dimension; the kid-sum and parent-gather are
    MXU matmuls against the static parent matrix. ``lam`` [Nn, nxm]
    (masked), ``extra`` [nz, NPc] lane-layout chain contributions (zeros
    when none). Returns dict with x/u/qtilde/rtilde/res in NODE layout
    [Nn, rows], xUnc/uUnc in lane layout, and fcr (dual-value partial).
    """
    ABt, P_par = data["ABt"], data["P_par"]
    nxm, nz, NPc = ABt.shape
    num = nz - nxm
    Nn = lam.shape[0]
    lam_l = jnp.pad(jnp.transpose(lam.astype(jnp.float32), (1, 0)),
                    ((0, 0), (0, NPc - Nn)))

    def kernel(AB_ref, P_ref, q_ref, r_ref, b_ref, Qd_ref, Rd_ref,
               Qi_ref, Ri_ref, xlo_ref, xhi_ref, ulo_ref, uhi_ref,
               xm_ref, um_ref, nr_ref, lam_ref, ex_ref,
               x_ref, u_ref, qt_ref, rt_ref, xU_ref, uU_ref,
               res_ref, f_ref):
        AB = AB_ref[...]
        lam_m = lam_ref[...]  # pre-masked by the caller (lam * nrxm)
        nr = nr_ref[...]
        # AtBtL_n = AB_n' lam_n  [nz, NPc]
        AtBtL = jnp.concatenate(
            [sum(AB[j, i][None] * lam_m[j:j + 1] for j in range(nxm))
             for i in range(nz)], axis=0)
        # kid-sum: out[:, n] = sum_{k: par(k)=n} AtBtL[:, k]
        sum_AB = _lane_mm_t(AtBtL, P_ref[...]) + ex_ref[...]
        qmod = (-q_ref[...] + lam_m - sum_AB[:nxm]) * xm_ref[...]
        rmod = (-r_ref[...] - sum_AB[nxm:]) * um_ref[...]
        xU = Qi_ref[...] * qmod
        uU = Ri_ref[...] * rmod
        xlo, xhi = xlo_ref[...], xhi_ref[...]
        ulo, uhi = ulo_ref[...], uhi_ref[...]
        x = jnp.minimum(jnp.maximum(xU, xlo), xhi) * xm_ref[...]
        u = jnp.minimum(jnp.maximum(uU, ulo), uhi) * um_ref[...]
        qt = jnp.where((xU > xhi) | (xU < xlo), 0.0, Qi_ref[...])
        rt = jnp.where((uU > uhi) | (uU < ulo), 0.0, Ri_ref[...])
        x_ref[...] = x
        u_ref[...] = u
        qt_ref[...] = qt
        rt_ref[...] = rt
        xU_ref[...] = xU
        uU_ref[...] = uU
        # residual: res_n = AB_n [x; u]_par + b_n - x_n  (non-root)
        zp = _lane_mm(jnp.concatenate([x, u], axis=0), P_ref[...])
        res = jnp.concatenate(
            [sum(AB[i, c][None] * zp[c:c + 1] for c in range(nz))
             for i in range(nxm)], axis=0)
        res = (res + b_ref[...] - x) * nr
        res_ref[...] = res
        # dual-value terms: x(qmod - Qd x / 2) + u(rmod - Rd u / 2) - b lam
        tx = x * (qmod - 0.5 * Qd_ref[...] * x) - b_ref[...] * lam_m * nr
        tu = u * (rmod - 0.5 * Rd_ref[...] * u)
        f_ref[...] = (sum(tx[i:i + 1] for i in range(nxm))
                      + sum(tu[i:i + 1] for i in range(num)))

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    sv = lambda rows: spec((rows, NPc))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            in_specs=[spec((nxm, nz, NPc)), spec((NPc, NPc)),
                      sv(nxm), sv(num), sv(nxm), sv(nxm), sv(num),
                      sv(nxm), sv(num), sv(nxm), sv(nxm), sv(num), sv(num),
                      sv(nxm), sv(num), sv(nxm), sv(nxm), sv(nz)],
            out_specs=(sv(nxm), sv(num), sv(nxm), sv(num), sv(nxm), sv(num),
                       sv(nxm), sv(1)),
            out_shape=tuple(jax.ShapeDtypeStruct((rows, NPc), jnp.float32)
                            for rows in (nxm, num, nxm, num, nxm, num,
                                         nxm, 1)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(ABt, P_par, data["q"], data["r"], data["b"], data["Qd"],
          data["Rd"], data["Qinv"], data["Rinv"], data["xmin"],
          data["xmax"], data["umin"], data["umax"], data["xm"], data["um"],
          data["nrxm"], lam_l, extra)
    x, u, qt, rt, xU, uU, res, f = outs
    tr = lambda v: jnp.transpose(v[:, :Nn], (1, 0))
    return dict(x=tr(x), u=tr(u), qtilde=tr(qt), rtilde=tr(rt),
                xUnc=xU, uUnc=uU, res=tr(res), fcr=jnp.sum(f[0, :Nn]))
