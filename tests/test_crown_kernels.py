"""Pallas crown-kernel (interpret mode) vs XLA tree-Cholesky equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers.tdunes import TdunesOpts
from treeqp_tpu.utils.tree import TreeStructure
from treeqp_tpu.ops import crown_kernels as ckr


@pytest.mark.parametrize("md,Nr,Nh,nx,nu", [
    # bench crown topology (85 lambda-groups: the big compile, slow-marked)
    pytest.param(4, 4, 4, 8, 1, marks=pytest.mark.slow),
    (3, 2, 3, 4, 1),
    pytest.param(2, 3, 5, 5, 2, marks=pytest.mark.slow),
    # 341 lambda-groups: beyond the old 128-lane cap (VERDICT r3 #8,
    # lifted by the collapsed per-slot scatter matrices)
    pytest.param(4, 5, 5, 4, 1, marks=pytest.mark.slow),
])
def test_crown_factor_solve_matches_xla(md, Nr, Nh, nx, nu):
    topo = TreeStructure.multistage(md=md, Nr=Nr, Nh=Nh, nx=nx, nu=nu)
    prep = td._get_prep(topo)
    key = jax.random.PRNGKey(0)
    Wr = jax.random.normal(key, (prep.NpG, prep.G, prep.G), jnp.float64)
    W = Wr @ Wr.swapaxes(1, 2) / prep.G + 2 * jnp.eye(prep.G)
    Ut = 0.04 * jax.random.normal(key, (prep.NpG, prep.nxm, prep.G), jnp.float64)
    rg = jax.random.normal(key, (prep.NpG, prep.G), jnp.float64)

    o_xla = TdunesOpts(factor_dtype="float32", reg_type="always",
                       reg_value=1e-6, chain_backend="xla")
    o_pal = TdunesOpts(factor_dtype="float32", reg_type="always",
                       reg_value=1e-6, chain_backend="pallas")
    assert ckr.crown_supported(prep, o_pal)
    d_xla = td._tree_chol_solve(td._tree_chol_factor(W, Ut, o_xla, prep),
                                rg, o_xla, prep)
    d_pal = td._tree_chol_solve(td._tree_chol_factor(W, Ut, o_pal, prep),
                                rg, o_pal, prep)
    scale = float(jnp.max(jnp.abs(d_xla)))
    assert float(jnp.max(jnp.abs(d_xla - d_pal))) < 1e-4 * max(scale, 1.0)


def test_crown_unsupported_falls_back():
    """The lambda-group cap is a VMEM budget on the slot scatter
    matrices, not the 128-lane width: a 159-group tree takes the kernel
    path (it used to fall back), while a 5461-group tree exceeds the
    raised budget and must fall back."""
    o_pal = TdunesOpts(factor_dtype="float32", reg_type="always",
                       chain_backend="pallas")
    topo = TreeStructure.multistage(md=2, Nr=1, Nh=80, nx=2, nu=1)
    prep = td._get_prep(topo)
    assert prep.NpG > 128
    assert ckr.crown_supported(prep, o_pal)
    # raised scoped-VMEM budget (vmem_limit_bytes=100 MB): a 1365-group
    # tree now FITS; a 5461-group tree still exceeds it
    mid = TreeStructure.multistage(md=4, Nr=6, Nh=6, nx=2, nu=1)
    assert ckr.crown_supported(td._get_prep(mid), o_pal)
    big = TreeStructure.multistage(md=4, Nr=7, Nh=7, nx=2, nu=1)
    prep_big = td._get_prep(big)
    assert prep_big.NpG > 4096
    assert not ckr.crown_supported(prep_big, o_pal)
