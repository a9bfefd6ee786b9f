"""Single-launch Pallas cyclic reduction for the sdunes Jay system.

The Jay system (non-anticipativity couplings, block tridiagonal with
P = Ns-1 blocks of size nl) is solved by block cyclic reduction. The XLA
implementation (ops/tridiag.py) runs ceil(log2 P) recursion levels, each
a handful of tiny batched cholesky/triangular-solve/matmul ops — at
Ns = 256 that is ~200 us per solve, 70% of an sdunes Newton iteration
with refinement (scripts/prof_sd.py). This kernel runs the ENTIRE
reduction in ONE launch:

* one block per lane ([b, b, PP] layout, PP = next power of two);
* every level computes on ALL lanes and commits via static masks (the
  crown-kernel pattern) — each lane is eliminated at exactly one level,
  so the saved elimination operators (Z1, Z2, zr) fit in single arrays;
* the lane-distance shifts (i <-> i +- 2^l) ride static one-hot MXU
  matmuls, zero-filled at the boundaries.

Reference semantics: form_and_factorize_Jay + calculate_delta_lambda
(dual_Newton_scenarios.c:795-1074), restructured from the sequential
factorization ("Cannot be parallelized", :815-817) into log2 P parallel
levels. Numerics mirror tridiag.tridiag_cr_solve: per-block regularized
Cholesky with a per-row Levenberg-Marquardt shift, applied always
(reg_tol < 0) or on the fly to blocks with min pivot <= reg_tol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops.crown_kernels import _lane_mm

__all__ = ["jay_supported", "jay_cr_solve"]

_PIVOT_FLOOR = 1e-12
_MAX_PP = 256   # static shift matrices are PP^2 each; 256 -> 4 MB total


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def jay_supported(P: int, b: int) -> bool:
    return 1 <= P and _next_pow2(max(P, 128)) <= _MAX_PP and b <= 8


_SCHED_CACHE = {}


def _sched(P, PP):
    key = (P, PP)
    hit = _SCHED_CACHE.get(key)
    if hit is not None:
        return hit
    while len(_SCHED_CACHE) >= 32:   # bound for long-lived --serve processes
        _SCHED_CACHE.pop(next(iter(_SCHED_CACHE)))
    L = int(np.log2(PP))
    Sup = np.zeros((L, PP, PP), np.float32)   # out lane d = in lane d-h
    Sdn = np.zeros((L, PP, PP), np.float32)   # out lane d = in lane d+h
    m_odd = np.zeros((L, 1, PP), np.float32)
    m_upd = np.zeros((L, 1, PP), np.float32)  # still-active EVEN lanes
    for lev in range(L):
        h = 1 << lev
        for d in range(PP):
            if d - h >= 0:
                Sup[lev, d - h, d] = 1.0
            if d + h < PP:
                Sdn[lev, d + h, d] = 1.0
        idx = np.arange(PP)
        m_odd[lev, 0] = ((idx % (2 * h)) == h).astype(np.float32)
        m_upd[lev, 0] = ((idx % (2 * h)) == 0).astype(np.float32)
    m0 = np.zeros((1, PP), np.float32)
    m0[0, 0] = 1.0
    out = (L, Sup, Sdn, m_odd, m_upd, m0)
    _SCHED_CACHE[key] = out
    return out


def jay_cr_solve(diag, off, rhs, shift=None, reg_tol: float = -1.0):
    """Solve the SPD block-tridiagonal system in one Pallas launch.

    diag [P, b, b], off [P-1, b, b] (block (i+1, i)), rhs [P, b],
    shift [P, b] per-row LM diagonal (None disables). Returns x [P, b]
    in diag's dtype (compute is f32). Semantics match
    tridiag.tridiag_cr_solve.
    """
    P, b, _ = diag.shape
    in_dt = diag.dtype
    PP = _next_pow2(max(P, 128))
    L, Sup, Sdn, m_odd, m_upd, m0 = _sched(P, PP)

    f32 = jnp.float32
    # lane layout + identity/zero padding
    eye_pad = jnp.tile(jnp.eye(b, dtype=f32)[:, :, None], (1, 1, PP - P))
    D = jnp.concatenate(
        [jnp.transpose(diag.astype(f32), (1, 2, 0)), eye_pad], axis=2)
    C_core = jnp.transpose(off.astype(f32), (1, 2, 0))      # lane i-1 = M[i,i-1]
    C = jnp.concatenate(
        [jnp.zeros((b, b, 1), f32), C_core,
         jnp.zeros((b, b, PP - P), f32)], axis=2)
    r = jnp.concatenate(
        [jnp.transpose(rhs.astype(f32), (1, 0)),
         jnp.zeros((b, PP - P), f32)], axis=1)
    sh = (jnp.concatenate(
        [jnp.transpose(shift.astype(f32), (1, 0)),
         jnp.zeros((b, PP - P), f32)], axis=1)
        if shift is not None else jnp.zeros((b, PP), f32))
    has_shift = shift is not None
    on_fly = has_shift and reg_tol >= 0

    # f32 one-hot shift matrices with HIGHEST matmul precision: the
    # shifts must be EXACT pass-throughs (a bf16 matrix would make the
    # MXU truncate the f32 operand to bf16 — measured as a 2e-7
    # convergence floor in the sdunes df64 phase)
    Supj = jnp.asarray(Sup)
    Sdnj = jnp.asarray(Sdn)
    moddj = jnp.asarray(m_odd)
    mupdj = jnp.asarray(m_upd)
    m0j = jnp.asarray(m0)

    def kernel(D_ref, C_ref, r_ref, sh_ref, Sup_ref, Sdn_ref, modd_ref,
               mupd_ref, m0_ref, x_o):
        rowi = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

        def chol(W, add_shift):
            """Lower Cholesky of [b, b, T]; add_shift: per-row LM
            diagonal [b, T] added before factorization (or None)."""
            cols = []
            for k in range(b):
                a = W[:, k]
                if add_shift is not None:
                    a = a + jnp.where(rowi == k, add_shift[k:k + 1], 0.0)
                for m in range(k):
                    a = a - cols[m] * cols[m][k:k + 1]
                d = jnp.maximum(a[k:k + 1], _PIVOT_FLOOR)
                dinv = jax.lax.rsqrt(d)
                col = jnp.where(rowi > k, a * dinv, 0.0) + \
                    jnp.where(rowi == k, d * dinv, 0.0)
                cols.append(col)
            return jnp.stack(cols, axis=1)

        def min_piv(W, add_shift):
            """Smallest raw pivot (no floor) of the factorization."""
            piv = None
            cols = []
            for k in range(b):
                a = W[:, k]
                if add_shift is not None:
                    a = a + jnp.where(rowi == k, add_shift[k:k + 1], 0.0)
                for m in range(k):
                    a = a - cols[m] * cols[m][k:k + 1]
                d = a[k:k + 1]
                # the XLA path compares the CHOLESKY diagonal (sqrt of the
                # pivot) to reg_tol; d * rsqrt(max(d, floor)) equals
                # sqrt(d) for healthy pivots and goes hugely negative for
                # d <= 0 (the NaN-pivot case of jnp.linalg.cholesky)
                pk = d * jax.lax.rsqrt(jnp.maximum(d, _PIVOT_FLOOR))
                piv = pk if piv is None else jnp.minimum(piv, pk)
                dc = jnp.maximum(d, _PIVOT_FLOOR)
                dinv = jax.lax.rsqrt(dc)
                col = jnp.where(rowi > k, a * dinv, 0.0) + \
                    jnp.where(rowi == k, dc * dinv, 0.0)
                cols.append(col)
            return piv

        def ltrsv(Lm, v):
            ys = []
            for i in range(b):
                acc = v[i:i + 1]
                for m in range(i):
                    acc = acc - Lm[i:i + 1, m] * ys[m]
                ys.append(acc / Lm[i:i + 1, i])
            return jnp.concatenate(ys, axis=0)

        def uttrsv(Lm, v):
            zs = [None] * b
            for i in range(b - 1, -1, -1):
                acc = v[i:i + 1]
                for m in range(i + 1, b):
                    acc = acc - Lm[m:m + 1, i] * zs[m]
                zs[i] = acc / Lm[i:i + 1, i]
            return jnp.concatenate(zs, axis=0)

        def solve_vec(Lm, v):
            return uttrsv(Lm, ltrsv(Lm, v))

        def solve_mat(Lm, B):
            return jnp.stack([solve_vec(Lm, B[:, c]) for c in range(b)],
                             axis=1)

        def mm(A, B):
            """A @ B per lane, [b, b, T]."""
            return jnp.stack(
                [sum(A[:, k] * B[k:k + 1, j] for k in range(b))
                 for j in range(b)], axis=1)

        def mm_tA(A, B):
            """A' @ B per lane."""
            return jnp.stack(
                [sum(A[k] * B[k:k + 1, j] for k in range(b))
                 for j in range(b)], axis=1)

        def mv(A, v):
            return sum(A[:, k] * v[k:k + 1] for k in range(b))

        def mv_tA(A, v):
            return sum(A[k] * v[k:k + 1] for k in range(b))

        def tA(A):
            return jnp.stack([A[:, j] for j in range(b)], axis=0)

        def shift_mat(M, S):
            # row-wise lane matmuls (a [b*b, PP] sublane reshape is not
            # reliably supported by Mosaic for b not a multiple of 8)
            return jnp.stack([shift_vec(M[i], S) for i in range(b)], axis=0)

        def shift_vec(v, S):
            return jax.lax.dot_general(
                v, S, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        D = D_ref[...]
        C = C_ref[...]
        r = r_ref[...]
        sh = sh_ref[...]
        Z1s = jnp.zeros((b, b, PP), f32)
        Z2s = jnp.zeros((b, b, PP), f32)
        zrs = jnp.zeros((b, PP), f32)

        for lev in range(L):
            Su = Sup_ref[lev]
            Sd = Sdn_ref[lev]
            mo = modd_ref[lev]           # [1, PP] odd mask this level
            mu_ = mupd_ref[lev]          # [1, PP] active-even mask
            if on_fly:
                piv = min_piv(D, None)
                # NaN-safe: NaN pivot compares False -> shift applied
                use_sh = jnp.where(piv > reg_tol, 0.0, 1.0)
                Lm = chol(D, sh * use_sh)
            elif has_shift:
                Lm = chol(D, sh)
            else:
                Lm = chol(D, None)
            Z1 = solve_mat(Lm, C)                       # D^-1 C
            zr = solve_vec(Lm, r)
            Cd = shift_mat(C, Sd)                       # lane i: C_{i+h}
            Z2 = solve_mat(Lm, tA(Cd))                  # D^-1 C_{i+h}'
            # even-lane updates (shifted odd quantities; zero-filled)
            Z2u = shift_mat(Z2, Su)
            Z1u = shift_mat(Z1, Su)
            zru = shift_vec(zr, Su)
            T1 = mm(C, Z2u)                             # C_e Z2_{e-h}
            tp = mm_tA(C, Z1)                           # C_p' Z1_p (at p)
            T2 = shift_mat(tp, Sd)                      # at e from p=e+h
            rv1 = mv(C, zru)
            rv2 = shift_vec(mv_tA(C, zr), Sd)
            Cn = -mm(C, Z1u)                            # -C_e Z1_{e-h}
            # save odd-lane elimination operators; freeze odd lanes
            Z1s = jnp.where(mo > 0, Z1, Z1s)
            Z2s = jnp.where(mo > 0, Z2, Z2s)
            zrs = jnp.where(mo > 0, zr, zrs)
            # commit ONLY on still-active even lanes: frozen lanes must
            # stay finite — any Inf/NaN anywhere would poison every lane
            # through the one-hot shift matmuls (0 * Inf = NaN)
            D = jnp.where(mu_ > 0, D - T1 - T2, D)
            r = jnp.where(mu_ > 0, r - rv1 - rv2, r)
            C = jnp.where(mu_ > 0, Cn, C)

        # root solve (lane 0)
        if on_fly:
            piv = min_piv(D, None)
            Lm = chol(D, sh * jnp.where(piv > reg_tol, 0.0, 1.0))
        elif has_shift:
            Lm = chol(D, sh)
        else:
            Lm = chol(D, None)
        x = solve_vec(Lm, r) * m0_ref[...]

        # back substitution, deepest level first
        for lev in range(L - 1, -1, -1):
            Su = Sup_ref[lev]
            Sd = Sdn_ref[lev]
            mo = modd_ref[lev]
            xl = shift_vec(x, Su)                       # x_{o-h}
            xr = shift_vec(x, Sd)                       # x_{o+h}
            xo = zrs - mv(Z1s, xl) - mv(Z2s, xr)
            x = jnp.where(mo > 0, xo, x)
        x_o[...] = x

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [spec((b, b, PP)), spec((b, b, PP)), spec((b, PP)),
                spec((b, PP)), spec((L, PP, PP)), spec((L, PP, PP)),
                spec((L, 1, PP)), spec((L, 1, PP)), spec((1, PP))]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out_specs = spec((b, PP))
    out_shape = jax.ShapeDtypeStruct((b, PP), f32)
    with jax.enable_x64(False):
        x = pl.pallas_call(
            kernel, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret(),
            compiler_params=params,
        )(D, C, r, sh, Supj, Sdnj, moddj, mupdj, m0j)
    return jnp.transpose(x[:, :P], (1, 0)).astype(in_dt)
