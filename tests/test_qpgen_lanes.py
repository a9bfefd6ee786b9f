"""Lane-major qpgen path (ops/qpgen_lanes.py) vs the node-major
reference implementation.

The lanes path is TPU-gated: XLA *CPU* fusion contracts FP expressions
and perturbs the df64 error-free transforms at ~f32 level (measured:
identical mu, z differing at 2.3e-7 between jit and eager on CPU,
bit-stable across XLA flags), while the TPU pipeline preserves them
(the df64 phase's certified 1e-10 KKT rides the same ops). CPU parity
is therefore asserted in EAGER mode, where the transforms hold."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from benchmarks.models import spring_mass_chain
from treeqp_tpu.solvers.tdunes import (
    TdunesOpts, _qpgen_batch, _stage_data, _get_prep, _modified_gradient)
from treeqp_tpu.utils.tree import TreeStructure
from treeqp_tpu.ops import qpgen_lanes as ql


@pytest.fixture(scope="module")
def stage_instance():
    qp0, _ = spring_mass_chain(nm=2, md=2, Nr=2, Nh=5)
    topo0 = qp0.topo
    nc = tuple(1 if (i % 3 == 0 and i > 0) else 0 for i in range(topo0.Nn))
    topo = TreeStructure.from_parent(topo0.parent, topo0.nx, topo0.nu, nc)
    C = np.zeros((topo.Nn, topo.ncm, topo.nxm))
    D = np.zeros((topo.Nn, topo.ncm, topo.num))
    dmin = np.full((topo.Nn, topo.ncm), -1e12)
    dmax = np.full((topo.Nn, topo.ncm), 1e12)
    for i in range(topo.Nn):
        if nc[i]:
            C[i, 0, :2] = [1.0, 1.0]
            D[i, 0, :topo.nu[i]] = 0.3
            dmin[i, 0], dmax[i, 0] = -0.4, 0.4
    qp = qp0.replace(C=jnp.asarray(C), D=jnp.asarray(D),
                     dmin=jnp.asarray(dmin), dmax=jnp.asarray(dmax),
                     topo=topo)
    opts = TdunesOpts(stage_solver="qpgen", tol=1e-9)
    prep = _get_prep(qp.topo)
    data = _stage_data(qp, opts)
    rng = np.random.default_rng(0)
    lam = jnp.asarray(rng.normal(size=(topo.Nn, topo.nxm)) * 0.1)
    qmod, rmod = _modified_gradient(qp, lam, prep)
    hmod = jnp.concatenate([qmod, rmod], axis=1)
    return hmod, data, opts


def _both(hmod, data, opts, ws=None):
    args = (hmod, data["H"], data["Hinv"], data["G"], data["lo"],
            data["hi"], data["m_lo"], data["m_hi"], data["rho_row"],
            data["L_admm"], opts)
    ref = _qpgen_batch(*args, ws=ws, GH=data["GH"], GHG=data["GHG"])
    out = ql.qpgen_solve_lanes(*args, ws=ws, GH=data["GH"],
                               GHG=data["GHG"])
    return ref, out


@pytest.mark.slow
def test_lanes_matches_node_path_cold(stage_instance):
    hmod, data, opts = stage_instance
    (z0, P0, mu0, res0, ws0), (z1, P1, mu1, res1, ws1) = _both(
        hmod, data, opts)
    assert float(res1) < 1e-9
    assert float(jnp.abs(z0 - z1).max()) < 1e-9
    assert float(jnp.abs(mu0 - mu1).max()) < 1e-8
    assert float(jnp.abs(P0 - P1).max()) < 1e-8
    assert float(jnp.abs(ws0[0] - ws1[0]).max()) == 0.0
    assert float(jnp.abs(ws0[1] - ws1[1]).max()) == 0.0


@pytest.mark.slow
def test_lanes_hotstart(stage_instance):
    hmod, data, opts = stage_instance
    ref, out_cold = _both(hmod, data, opts)
    ws = ref[4]
    _, out_warm = _both(hmod, data, opts, ws=ws)
    assert float(out_warm[3]) < 1e-9
    assert float(jnp.abs(ref[0] - out_warm[0]).max()) < 1e-9


def test_lanes_gate_off_on_cpu():
    opts = TdunesOpts(qpgen_factor_dtype="float32")
    if jax.default_backend() not in ("tpu", "axon"):
        assert not ql.qpgen_lanes_enabled(opts, jnp.dtype(jnp.float64))
