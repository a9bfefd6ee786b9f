"""Pallas TPU kernels for the chain Riccati sweeps of the multistage IPM.

Same lane-batching strategy as chain_kernels.py (scenarios on the 128-wide
lane dimension, the whole length-L sweep fused into one launch), applied to
the Riccati recurrence of ipm_multistage._chain_riccati_*:

    backward:  M_j = diag(hbar_j) + W,  K_j = -Muu^-1 Mux,
               P_j = Mxx + Mxu K_j,     W   = AB_j' P_j AB_j
    rhs bwd:   k_j = -Muu^-1 m_u,  p_j = m_x + Mxu k_j,
               w   = AB_j' (P_j rb_j + p_j)
    forward:   dx = AB_j dz_parent + rb_j, du = K_j dx + k_j,
               dlam = P_j dx + p_j

All kernels are f32 (the IPM's mixed-precision phase machinery supplies
f64 quality); factors stay in kernel layout [L, ..., SP] between the
factor and the two solves per iteration, exactly like the dual-Newton
chain kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops.chain_kernels import _TS, _pad_s, _interpret
from treeqp_tpu.ops.crown_kernels import _chol, _ltrsv, _uttrsv

__all__ = ["ric_chain_factor", "ric_chain_bwd", "ric_chain_fwd"]

def _ltrsm(L, B, n):
    """Solve L Y = B for Y; L lower [n, n, T], B [n, m, T]."""
    rows = []
    for i in range(n):
        acc = B[i]
        for k in range(i):
            acc = acc - L[i:i + 1, k] * rows[k]
        rows.append(acc / L[i:i + 1, i])
    return jnp.stack(rows, axis=0)


def _uttrsm(L, B, n):
    """Solve L' Y = B; L lower [n, n, T], B [n, m, T]."""
    rows = [None] * n
    for i in range(n - 1, -1, -1):
        acc = B[i]
        for k in range(i + 1, n):
            acc = acc - L[k:k + 1, i] * rows[k]
        rows[i] = acc / L[i:i + 1, i]
    return jnp.stack(rows, axis=0)


def _mm(A, B, n, m, p):
    """C[i, j] = sum_k A[i, k] B[k, j]; A [n, m, T], B [m, p, T]."""
    return jnp.stack(
        [sum(A[:, k] * B[k, j:j + 1] for k in range(m)) for j in range(p)],
        axis=1)


def _mv(A, x, n, m):
    """y[i] = sum_k A[i, k] x[k]; A [n, m, T], x [m, T]."""
    return sum(A[:, k] * x[k:k + 1] for k in range(m))


def _spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * (nd - 1) + (i,),
                        memory_space=pltpu.VMEM)


def _to_kernel(x, SP):
    """[S, L, ...] -> [L, ..., SP]."""
    perm = (1,) + tuple(range(2, x.ndim)) + (0,)
    return _pad_s(jnp.transpose(x, perm), SP)


def _from_kernel(x, S):
    """[L, ..., SP] -> [S, L, ...]."""
    perm = (x.ndim - 1, 0) + tuple(range(1, x.ndim - 1))
    return jnp.transpose(x[..., :S], perm)


def ric_chain_factor(hbar, AB, reg: float = 0.0):
    """hbar [S, L, nz] (diagonal stage Hessians) or [S, L, nz, nz]
    (dense — general C/D rows) f32, AB [S, L, nx, nz] f32. Returns
    kernel-layout factors dict + W0 [S, nz, nz]."""
    S, L, nx, nz = AB.shape
    num = nz - nx
    dense = hbar.ndim == 4
    SP = max(_TS, ((S + _TS - 1) // _TS) * _TS)
    hb_t = _to_kernel(hbar, SP)
    # identity hbar on padded lanes keeps the recursion finite
    if dense:
        lane_pad = (jnp.arange(SP) >= S)[None, None, None, :]
        eye = jnp.eye(nz, dtype=hbar.dtype)[None, :, :, None]
        hb_t = hb_t + jnp.where(lane_pad, eye, 0.0)
    else:
        lane_pad = (jnp.arange(SP) >= S)[None, None, :]
        hb_t = hb_t + jnp.where(lane_pad, 1.0, 0.0)
    AB_t = _to_kernel(AB, SP)

    def kernel(hb_ref, AB_ref, P_ref, Lu_ref, K_ref, Mxu_ref, W0_ref):
        W = jnp.zeros((nz, nz, _TS), hb_ref.dtype)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, 1), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, 1), 1)
        for j in range(L - 1, -1, -1):
            hb = hb_ref[j]
            M = W + (hb if dense
                     else jnp.where(rowi == coli, 1.0, 0.0) * hb[None, :, :])
            Muu = M[nx:, nx:]
            Lu = _chol(Muu, num, reg)
            Mux = M[nx:, :nx]
            Kb = -_uttrsm(Lu, _ltrsm(Lu, Mux, num), num)  # [num, nx, T]
            Mxu = M[:nx, nx:]
            P = M[:nx, :nx] + _mm(Mxu, Kb, nx, num, nx)
            P = 0.5 * (P + P.swapaxes(0, 1))
            P_ref[j] = P
            Lu_ref[j] = Lu
            K_ref[j] = Kb
            Mxu_ref[j] = Mxu
            ABj = AB_ref[j]  # [nx, nz, T]
            tmp = _mm(P, ABj, nx, nx, nz)  # [nx, nz, T]
            # W = AB' tmp: [nz, nz, T]
            W = jnp.stack(
                [sum(ABj[x, i:i + 1] * tmp[x] for x in range(nx))
                 for i in range(nz)], axis=0)
        W0_ref[...] = W

    hb_spec = _spec((L, nz, nz, _TS)) if dense else _spec((L, nz, _TS))
    with jax.enable_x64(False):
        P, Lu, K, Mxu, W0 = pl.pallas_call(
            kernel,
            grid=(SP // _TS,),
            in_specs=[hb_spec, _spec((L, nx, nz, _TS))],
            out_specs=(_spec((L, nx, nx, _TS)), _spec((L, num, num, _TS)),
                       _spec((L, num, nx, _TS)), _spec((L, nx, num, _TS)),
                       _spec((nz, nz, _TS))),
            out_shape=(jax.ShapeDtypeStruct((L, nx, nx, SP), hbar.dtype),
                       jax.ShapeDtypeStruct((L, num, num, SP), hbar.dtype),
                       jax.ShapeDtypeStruct((L, num, nx, SP), hbar.dtype),
                       jax.ShapeDtypeStruct((L, nx, num, SP), hbar.dtype),
                       jax.ShapeDtypeStruct((nz, nz, SP), hbar.dtype)),
            interpret=_interpret(),
        )(hb_t, AB_t)
    return dict(P=P, Luu=Lu, K=K, Mxu=Mxu, AB_t=AB_t, shape=(S, L, nx, nz)), \
        _from_kernel(W0, S)


def ric_chain_bwd(fact, rg, rb):
    """rg [S, L, nz], rb [S, L, nx] f32. Returns kernel-layout (p, k) and
    w0 [S, nz]."""
    S, L, nx, nz = fact["shape"]
    num = nz - nx
    P, Lu, Mxu, AB = fact["P"], fact["Luu"], fact["Mxu"], fact["AB_t"]
    SP = P.shape[-1]
    rg_t = _to_kernel(rg.astype(P.dtype), SP)
    rb_t = _to_kernel(rb.astype(P.dtype), SP)

    def kernel(P_ref, Lu_ref, Mxu_ref, AB_ref, rg_ref, rb_ref,
               p_ref, k_ref, w0_ref):
        w = jnp.zeros((nz, _TS), P_ref.dtype)
        for j in range(L - 1, -1, -1):
            m = rg_ref[j] + w
            mu = m[nx:]
            kb = -_uttrsv(Lu_ref[j], _ltrsv(Lu_ref[j], mu, num), num)
            pb = m[:nx] + _mv(Mxu_ref[j], kb, nx, num)
            p_ref[j] = pb
            k_ref[j] = kb
            v = _mv(P_ref[j], rb_ref[j], nx, nx) + pb
            ABj = AB_ref[j]
            w = jnp.stack([sum(ABj[x, i] * v[x] for x in range(nx))
                           for i in range(nz)], axis=0)
        w0_ref[...] = w

    with jax.enable_x64(False):
        p, k, w0 = pl.pallas_call(
            kernel,
            grid=(SP // _TS,),
            in_specs=[_spec((L, nx, nx, _TS)), _spec((L, num, num, _TS)),
                      _spec((L, nx, num, _TS)), _spec((L, nx, nz, _TS)),
                      _spec((L, nz, _TS)), _spec((L, nx, _TS))],
            out_specs=(_spec((L, nx, _TS)), _spec((L, num, _TS)),
                       _spec((nz, _TS))),
            out_shape=(jax.ShapeDtypeStruct((L, nx, SP), P.dtype),
                       jax.ShapeDtypeStruct((L, num, SP), P.dtype),
                       jax.ShapeDtypeStruct((nz, SP), P.dtype)),
            interpret=_interpret(),
        )(P, Lu, Mxu, AB, rg_t, rb_t)
    return p, k, jnp.transpose(w0[..., :S], (1, 0))


def ric_chain_fwd(fact, p, k, rb, z_root):
    """p/k kernel layout from ric_chain_bwd; rb [S, L, nx]; z_root [S, nz].
    Returns (dz [S, L, nz], dlam [S, L, nx])."""
    S, L, nx, nz = fact["shape"]
    num = nz - nx
    P, K, AB = fact["P"], fact["K"], fact["AB_t"]
    SP = P.shape[-1]
    rb_t = _to_kernel(rb.astype(P.dtype), SP)
    zr_t = _pad_s(jnp.transpose(z_root.astype(P.dtype), (1, 0)), SP)

    def kernel(P_ref, K_ref, AB_ref, rb_ref, p_ref, k_ref, zr_ref,
               dz_ref, dl_ref):
        zp = zr_ref[...]
        for j in range(L):
            ABj = AB_ref[j]
            dx = jnp.stack([sum(ABj[x, zi] * zp[zi] for zi in range(nz))
                            for x in range(nx)], axis=0) + rb_ref[j]
            du = _mv(K_ref[j], dx, num, nx) + k_ref[j]
            dlam = _mv(P_ref[j], dx, nx, nx) + p_ref[j]
            dz = jnp.concatenate([dx, du], axis=0)
            dz_ref[j] = dz
            dl_ref[j] = dlam
            zp = dz

    with jax.enable_x64(False):
        dz, dl = pl.pallas_call(
            kernel,
            grid=(SP // _TS,),
            in_specs=[_spec((L, nx, nx, _TS)), _spec((L, num, nx, _TS)),
                      _spec((L, nx, nz, _TS)), _spec((L, nx, _TS)),
                      _spec((L, nx, _TS)), _spec((L, num, _TS)),
                      _spec((nz, _TS))],
            out_specs=(_spec((L, nz, _TS)), _spec((L, nx, _TS))),
            out_shape=(jax.ShapeDtypeStruct((L, nz, SP), P.dtype),
                       jax.ShapeDtypeStruct((L, nx, SP), P.dtype)),
            interpret=_interpret(),
        )(P, K, AB, rb_t, p, k, zr_t)
    return _from_kernel(dz, S), _from_kernel(dl, S)
