"""Single-launch Pallas TPU kernel for df64 (double-float) sum reductions.

The df64 phase of the multistage dual Newton needs exactly-ordered two-sum
accumulation for its dual values and directional derivatives (ms_df64.py):
an f32 `jnp.sum` has ~sqrt(n)*2^-24 relative error — 1e-4 absolute on the
O(1e3) dual values whose Armijo comparisons must resolve 1e-10 differences.
The XLA radix-chain formulation (`ms_df64._sum_terms`) is numerically right
but compiles to ~126 *separate* tiny kernels (63 sequential df.adds per
radix level resist fusion), so one dual value costs ~0.22 ms of pure launch
overhead on the remote TPU — half the per-iteration budget (profiled,
BENCH_NOTES.md round 2). This kernel performs the whole binary two-sum tree
in ONE launch: reshape to [rows, 128] lanes, fold rows to 8, fold lanes to
1, fold sublanes to 1 (zero padding is exact for two-sum).

Accuracy: identical op sequence class as `df64.df_sum` — a binary tree of
`df64.add` (QD ieee_add), error ~log2(n) df-ulps ~ 2^-44 relative; the
equivalence test (tests/test_df_reduce.py) checks it against the XLA tree
and a float64 reference.

Replaces the f64 BLAS dot/sum kernels the reference uses for dual values
(dual_Newton_tree.c:446-637); there is no counterpart kernel upstream —
this is TPU-specific launch-overhead engineering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops import df64 as df
from treeqp_tpu.ops.df64 import Df

__all__ = ["df_reduce_flat", "MAX_ELEMS"]

_LANES = 128
# single-block kernel: rows capped so the block plus the first fold's
# live temporaries (full input + half-size result + two-sum scratch)
# stay well inside the ~16 MiB VMEM: 4096 rows * 128 lanes * 4 B * 2
# words = 4 MiB of input, ~<=3x that live at the first fold. Larger
# inputs go through the chunked path in df_reduce_flat.
_MAX_ROWS = 4096
MAX_ELEMS = _MAX_ROWS * _LANES


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _fold_kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref):
    x = Df(hi_ref[...], lo_ref[...])
    m = x.hi.shape[0]
    while m > 8:  # rows -> 8 (m is a power of two)
        h = m // 2
        x = df.add(x[:h], x[h:m])
        m = h
    w = _LANES
    while w > 1:  # lanes -> 1
        h = w // 2
        x = df.add(Df(x.hi[:, :h], x.lo[:, :h]),
                   Df(x.hi[:, h:w], x.lo[:, h:w]))
        w = h
    while m > 1:  # sublanes -> 1
        h = m // 2
        x = df.add(x[:h], x[h:m])
        m = h
    out_hi_ref[...] = x.hi
    out_lo_ref[...] = x.lo


def df_reduce_flat(x: Df) -> Df:
    """Exact-ordered df64 sum of a flat Df vector -> scalar Df.

    One fused TPU kernel (binary two-sum tree over a [rows, 128] layout)
    for inputs up to ``MAX_ELEMS``; larger inputs run chunk-wise through
    the same kernel (the bench-scale inputs are ~1.5e5 elements).
    """
    n = x.hi.size
    if n > MAX_ELEMS:
        # chunked fallback: each MAX_ELEMS block through the kernel, the
        # few partial scalars combined with exact two-sum. Keeps the API
        # safe for any input size (and under python -O) instead of
        # tripping a Mosaic VMEM failure at compile time.
        n_chunks = -(-n // MAX_ELEMS)
        pad = n_chunks * MAX_ELEMS - n
        hi = jnp.concatenate([x.hi.reshape(-1), jnp.zeros((pad,), jnp.float32)])
        lo = jnp.concatenate([x.lo.reshape(-1), jnp.zeros((pad,), jnp.float32)])
        acc = df_reduce_flat(Df(hi[:MAX_ELEMS], lo[:MAX_ELEMS]))
        for c in range(1, n_chunks):
            sl = slice(c * MAX_ELEMS, (c + 1) * MAX_ELEMS)
            acc = df.add(acc, df_reduce_flat(Df(hi[sl], lo[sl])))
        return acc
    rows = max(8, -(-n // _LANES))
    rows = 1 << (rows - 1).bit_length()  # pow2 so halving folds are exact
    pad = rows * _LANES - n
    hi = jnp.concatenate([x.hi.reshape(-1), jnp.zeros((pad,), jnp.float32)])
    lo = jnp.concatenate([x.lo.reshape(-1), jnp.zeros((pad,), jnp.float32)])
    hi = hi.reshape(rows, _LANES)
    lo = lo.reshape(rows, _LANES)

    spec_in = pl.BlockSpec((rows, _LANES), lambda: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):  # Mosaic needs i32 index maps
        out_hi, out_lo = pl.pallas_call(
            _fold_kernel,
            in_specs=[spec_in, spec_in],
            out_specs=(spec_out, spec_out),
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            interpret=_interpret(),
        )(hi, lo)
    return Df(out_hi.reshape(()), out_lo.reshape(()))
