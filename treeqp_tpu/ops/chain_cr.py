"""Cyclic-reduction (parallel-scan) variants of the banded chain solve
sweeps — the round-4 roofline's named lever (BENCH_NOTES "MFU/roofline":
the f32-phase bound is the serial VPU dependency chain of the L-level
banded sweeps, not launches/MXU/HBM).

The serial sweeps (ops/chain_kernels.chain_solve_bwd/chain_forward) run
L dependent triangular solves of depth ~n^2 each — a ~L*n^2-deep scalar
dependency chain per solve. The affine form of the recurrences

    bwd:  y_j    = b_j + A_j y_{j+1},   A_j = -L_j^-1 CU_{j+1},
          b_j    = L_j^-1 r_j
    fwd:  d_j    = c_j + B_j d_{j-1},   B_j = -L_j^-T CU_j^T,
          c_j    = L_j^-T y_j

makes them associative scans: ceil(log2 L) doubling levels of [n, n]
compositions, each a batch of INDEPENDENT lane-wise products — depth
~log2(L) * n instead of L * n^2, at ~n/2x more flops (cheap on the VPU).
The A/B composition operands depend only on the FACTORS, so they are
precomputed once per factorization (`chain_cr_precompute`) — the
per-solve cost is the b/c triangular solves (independent over j, depth
n^2 once) plus the doubling levels.

Prototype scope (round 5, verdict #7): standalone kernels mirroring the
chain_kernels solve signatures + parity tests + a TPU microbenchmark
(scripts/prof_chain_cr.py) to accept/reject the restructuring on data
before surgery on the fused system/iteration kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops.chain_kernels import (
    _chol, _ltrsv, _uttrsv, _interpret)  # reuse the lane primitives

__all__ = ["chain_cr_precompute", "chain_solve_bwd_cr", "chain_forward_cr"]

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _spec(shape):
    return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _mm_j(A, B, n):
    """Per-j lane-batched compose C[j] = A[j] @ B[j]: A, B [Lp, n, n, S].
    n^3 independent [Lp, S] multiplies — VPU-pipelineable (no cross-op
    dependency except the n-term accumulation trees)."""
    return jnp.stack([
        jnp.stack([sum(A[:, i, m] * B[:, m, k] for m in range(n))
                   for k in range(n)], axis=1)
        for i in range(n)], axis=1)


def _mv_j(A, v, n):
    """Per-j lane-batched matvec w[j] = A[j] @ v[j]: v [Lp, n, S]."""
    return jnp.stack([sum(A[:, i, m] * v[:, m] for m in range(n))
                      for i in range(n)], axis=1)


@functools.partial(jax.jit, static_argnames=())
def chain_cr_precompute(Lt, CUt):
    """Per-factorization composition operands.

    Lt/CUt: kernel-layout factors [L, n, n, S] (chain_kernels.chain_factor).
    Returns (Abwd, Bfwd) [L, n, n, S]:
      Abwd[j] = -L_j^-1 CU_{j+1}   (Abwd[L-1] = 0)
      Bfwd[j] = -L_j^-T CU_j^T
    """
    L, n, _, S = Lt.shape

    def kernel(L_ref, CU_ref, A_ref, B_ref):
        for j in range(L):
            Lj = L_ref[j]
            if j < L - 1:
                CUn = CU_ref[j + 1]
                cols = [_ltrsv(Lj, CUn[:, k], n) for k in range(n)]
                A_ref[j] = -jnp.stack(cols, axis=1)
            else:
                A_ref[j] = jnp.zeros((n, n, S), Lj.dtype)
            CUj = CU_ref[j]
            # CU_j^T columns = CU_j rows
            colsB = [_uttrsv(Lj, CUj[k], n) for k in range(n)]
            B_ref[j] = -jnp.stack(colsB, axis=1)

    with jax.enable_x64(False):
        Abwd, Bfwd = pl.pallas_call(
            kernel,
            in_specs=[_spec(Lt.shape), _spec(Lt.shape)],
            out_specs=(_spec(Lt.shape), _spec(Lt.shape)),
            out_shape=(jax.ShapeDtypeStruct(Lt.shape, Lt.dtype),
                       jax.ShapeDtypeStruct(Lt.shape, Lt.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt)
    return Abwd, Bfwd


def _doubling_suffix(A, b, L, n):
    """Suffix affine scan by doubling: y_j = b_j + A_j y_{j+1} with
    y_L = 0. A, b are [L, ...]; returns y [L, n, S]."""
    h = 1
    while h < L:
        # shift up by h: entries j+h (zero past the end)
        Az = jnp.concatenate([A[h:], jnp.zeros_like(A[:h])], axis=0)
        bz = jnp.concatenate([b[h:], jnp.zeros_like(b[:h])], axis=0)
        b = b + _mv_j(A, bz, n)
        A = _mm_j(A, Az, n)
        h *= 2
    return b


def _doubling_prefix(B, c, L, n):
    """Prefix affine scan by doubling: d_j = c_j + B_j d_{j-1}, d_{-1}
    folded into c_0 by the caller."""
    h = 1
    while h < L:
        Bz = jnp.concatenate([jnp.zeros_like(B[:h]), B[:-h]], axis=0)
        cz = jnp.concatenate([jnp.zeros_like(c[:h]), c[:-h]], axis=0)
        c = c + _mv_j(B, cz, n)
        B = _mm_j(B, Bz, n)
        h *= 2
    return c


@functools.partial(jax.jit, static_argnames=())
def chain_solve_bwd_cr(Lt, CUt, Abwd, res):
    """CR variant of chain_solve_bwd: y and the crown RHS update.

    res [S, L, n] (node layout). Returns (ys in KERNEL layout
    [L, n, S_pad] — feed straight to chain_forward_cr — and radd0
    [S, n]), matching chain_kernels.chain_solve_bwd."""
    L, n, _, Sp = Lt.shape
    S = res.shape[0]
    rt = jnp.transpose(res.astype(Lt.dtype), (1, 2, 0))
    if Sp > S:
        rt = jnp.pad(rt, ((0, 0), (0, 0), (0, Sp - S)))

    def kernel(L_ref, CU_ref, A_ref, r_ref, y_ref, radd_ref):
        # b_j = L_j^-1 r_j — independent over j
        b = jnp.stack([_ltrsv(L_ref[j], r_ref[j], n) for j in range(L)],
                      axis=0)
        y = _doubling_suffix(A_ref[...], b, L, n)
        y_ref[...] = y
        CU0 = CU_ref[0]
        y0 = y[0]
        radd_ref[...] = sum(CU0[:, k] * y0[k:k + 1] for k in range(n))

    with jax.enable_x64(False):
        ys, radd0 = pl.pallas_call(
            kernel,
            in_specs=[_spec(Lt.shape), _spec(Lt.shape), _spec(Lt.shape),
                      _spec((L, n, Sp))],
            out_specs=(_spec((L, n, Sp)), _spec((n, Sp))),
            out_shape=(jax.ShapeDtypeStruct((L, n, Sp), Lt.dtype),
                       jax.ShapeDtypeStruct((n, Sp), Lt.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt, Abwd, rt)
    return ys, jnp.transpose(radd0, (1, 0))[:S]


@functools.partial(jax.jit, static_argnames=())
def chain_forward_cr(Lt, CUt, Bfwd, ys, droot):
    """CR variant of chain_forward: dlam down the chains.

    ys in KERNEL layout [L, n, S_pad] (from chain_solve_bwd_cr);
    droot [S, n] (crown dlam at each chain root). Returns dlam
    [S, L, n] like chain_kernels.chain_forward."""
    L, n, _, Sp = Lt.shape
    S = droot.shape[0]
    yt = ys.astype(Lt.dtype)
    dr = jnp.transpose(droot.astype(Lt.dtype), (1, 0))
    if Sp > S:
        dr = jnp.pad(dr, ((0, 0), (0, Sp - S)))

    def kernel(L_ref, CU_ref, B_ref, y_ref, dr_ref, d_ref):
        # c_j = L_j^-T y_j, with the root term folded into c_0:
        # d_0 = L_0^-T (y_0 - CU_0^T droot) = c_0 + B_0 droot
        c = jnp.stack([_uttrsv(L_ref[j], y_ref[j], n) for j in range(L)],
                      axis=0)
        B = B_ref[...]
        drv = dr_ref[...]
        c0 = c[0] + sum(B[0][:, m] * drv[m:m + 1] for m in range(n))
        c = jnp.concatenate([c0[None], c[1:]], axis=0)
        d_ref[...] = _doubling_prefix(B, c, L, n)

    with jax.enable_x64(False):
        dls = pl.pallas_call(
            kernel,
            in_specs=[_spec(Lt.shape), _spec(Lt.shape), _spec(Lt.shape),
                      _spec((L, n, Sp)), _spec((n, Sp))],
            out_specs=_spec((L, n, Sp)),
            out_shape=jax.ShapeDtypeStruct((L, n, Sp), Lt.dtype),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt, Bfwd, yt, dr)
    return jnp.transpose(dls, (2, 0, 1))[:S]
