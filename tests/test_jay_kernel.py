"""Parity of the single-launch Pallas Jay cyclic reduction
(ops/jay_kernel.py) against the XLA recursion (ops/tridiag.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from treeqp_tpu.ops.jay_kernel import jay_cr_solve, jay_supported
from treeqp_tpu.ops.tridiag import tridiag_cr_solve


def _random_system(P, b, seed, singular=False):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(P, b, b))
    diag = A @ A.transpose(0, 2, 1) + 3.0 * b * np.eye(b)
    off = 0.3 * rng.normal(size=(max(P - 1, 0), b, b))
    rhs = rng.normal(size=(P, b))
    if singular and P > 2:
        # make one block exactly singular in a row (active-set boundary:
        # a fully-clipped coordinate also zeroes its couplings, like the
        # Jay system's U columns)
        m = P // 2
        diag[m, 0, :] = 0.0
        diag[m, :, 0] = 0.0
        off[m, :, 0] = 0.0      # M[m+1, m] column of the dead row
        off[m - 1, 0, :] = 0.0  # M[m, m-1] row of the dead row
    f32 = jnp.float32
    return (jnp.asarray(diag, f32), jnp.asarray(off, f32),
            jnp.asarray(rhs, f32))


@pytest.mark.parametrize("P,b", [
    pytest.param(5, 4, marks=pytest.mark.slow),
    (100, 3),   # the daily-gate representative (the 255-lane headline
    # shape costs ~20 s in interpret mode; CI's full matrix runs it)
    pytest.param(255, 4, marks=pytest.mark.slow),
    pytest.param(127, 8, marks=pytest.mark.slow),
])
def test_jay_kernel_parity(P, b):
    assert jay_supported(P, b)
    diag, off, rhs = _random_system(P, b, seed=P + b)
    ref = tridiag_cr_solve(diag, off, rhs)
    out = jay_cr_solve(diag, off, rhs)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4 * max(scale, 1.0)


@pytest.mark.slow
def test_jay_kernel_ill_conditioned_residual():
    """Wide per-row scaling (cond ~1e6). Regression: garbage growth on
    frozen lanes used to reach the one-hot shift matmuls as Inf and
    poison every lane (0 * Inf = NaN); commit masks must keep frozen
    lanes finite. Assert residual quality matches the XLA recursion."""
    rng = np.random.default_rng(0)
    P, b = 255, 4
    A = rng.normal(size=(P, b, b))
    diag = A @ A.transpose(0, 2, 1) + 3.0 * b * np.eye(b)
    s = 10.0 ** rng.uniform(-1.5, 1.5, size=(P, b))
    diag = diag * s[:, :, None] * s[:, None, :]
    off = 0.3 * rng.normal(size=(P - 1, b, b)) * s[1:, :, None] * s[:-1, None, :]
    rhs = rng.normal(size=(P, b))

    def resid(x):
        x = np.asarray(x, np.float64)
        r = np.einsum("pij,pj->pi", diag, x)
        r[1:] += np.einsum("pij,pj->pi", off, x[:-1])
        r[:-1] += np.einsum("pji,pj->pi", off, x[1:])
        return np.abs(r - rhs).max()

    d32, o32, r32 = (jnp.asarray(v, jnp.float32) for v in (diag, off, rhs))
    ref = tridiag_cr_solve(d32, o32, r32)
    out = jay_cr_solve(d32, o32, r32)
    assert np.isfinite(np.asarray(out)).all()
    assert resid(out) < 10.0 * max(resid(ref), 1e-6)


@pytest.mark.slow
def test_jay_kernel_shift_always():
    diag, off, rhs = _random_system(64, 4, seed=7)
    shift = jnp.full((64, 4), 1e-3, jnp.float32)
    ref = tridiag_cr_solve(diag, off, rhs, shift=shift, reg_tol=-1.0)
    out = jay_cr_solve(diag, off, rhs, shift=shift, reg_tol=-1.0)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4 * max(scale, 1.0)


@pytest.mark.slow
def test_jay_kernel_on_the_fly_singular():
    # exactly singular middle block: only the shifted factorization is
    # usable there; on-the-fly must recover like the XLA path
    diag, off, rhs = _random_system(33, 4, seed=3, singular=True)
    shift = jnp.full((33, 4), 1e-2, jnp.float32)
    ref = tridiag_cr_solve(diag, off, rhs, shift=shift, reg_tol=1e-6)
    out = jay_cr_solve(diag, off, rhs, shift=shift, reg_tol=1e-6)
    finite = jnp.isfinite(out).all()
    assert bool(finite)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-3 * max(scale, 1.0)
