"""Parity of the cyclic-reduction chain solve sweeps (ops/chain_cr.py,
round-5 prototype of the roofline's named lever) against the serial
kernels, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from treeqp_tpu.ops import chain_kernels as ck
from treeqp_tpu.ops.chain_cr import (
    chain_cr_precompute, chain_solve_bwd_cr, chain_forward_cr)


def _factors(S=5, L=8, n=4, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((S, L, n, n))
    Wc = jnp.asarray((A @ A.transpose(0, 1, 3, 2)
                      + 3.0 * np.eye(n)).astype(np.float32))
    Utc = jnp.asarray(0.3 * rng.standard_normal((S, L, n, n))
                      .astype(np.float32))
    Lt, CUt, schur0 = ck.chain_factor(Wc, Utc)
    return Lt, CUt


@pytest.mark.parametrize("dims", [
    pytest.param((5, 8, 4), marks=pytest.mark.slow),
    pytest.param((3, 16, 8), marks=pytest.mark.slow),  # headline-ish shape
    (2, 6, 3),   # daily-gate representative (interpret mode is slow)
])
def test_cr_sweeps_match_serial(dims):
    S, L, n = dims
    Lt, CUt = _factors(S, L, n)
    rng = np.random.default_rng(1)
    res = jnp.asarray(rng.standard_normal((S, L, n)).astype(np.float32))
    droot = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))

    ys_ref, radd_ref = ck.chain_solve_bwd(Lt, CUt, res)
    dls_ref = ck.chain_forward(Lt, CUt, ys_ref, droot)

    Abwd, Bfwd = chain_cr_precompute(Lt, CUt)
    ys, radd = chain_solve_bwd_cr(Lt, CUt, Abwd, res)
    dls = chain_forward_cr(Lt, CUt, Bfwd, ys, droot)

    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(radd), np.asarray(radd_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dls), np.asarray(dls_ref),
                               atol=2e-4)
