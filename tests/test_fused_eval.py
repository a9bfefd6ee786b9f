"""Unit tests for the round-3 fused evaluation/factorization kernels
(interpret mode on CPU): each kernel must reproduce the unfused XLA
reference path on real problem data.

Kernels under test (the launch-latency fusion ladder, BENCH_NOTES):
  * chain_kernels.chain_eval — chain stage solve + root contributions +
    dual-value partial sums
  * chain_kernels.chain_blocks_factor / chain_blocks_factor_lanes —
    block build + Jacobi equilibration + banded factorization
  * chain_kernels.chain_full_solve_mat — multi-RHS full banded solve
  * crown_kernels.crown_eval — crown stage solve + residual + dual terms
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from benchmarks.models import spring_mass_chain
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm
from treeqp_tpu.ops import chain_kernels as ck
from treeqp_tpu.ops import crown_kernels as ckr


def _problem():
    qp, _ = spring_mass_chain(nm=2, md=3, Nr=2, Nh=10)
    return qp, tm.split_multistage(qp)


@pytest.mark.slow
def test_chain_eval_matches_unfused():
    qp, ms = _problem()
    rng = np.random.default_rng(1)
    lam = jnp.asarray(rng.standard_normal(ms.b.shape) * 0.1)
    ref = tm._chain_stage_solve(ms, lam)
    eq, er = tm._chain_root_contrib(ms, lam)
    f_ref = tm._chain_dual_terms(ms, ref, lam)

    data_l = ck.chain_eval_data(ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd,
                                ms.xmin, ms.xmax, ms.umin, ms.umax, ms.b)
    out = ck.chain_eval(data_l, lam.astype(jnp.float32))
    assert float(jnp.max(jnp.abs(out["x"] - ref["x"]))) < 1e-6
    assert float(jnp.max(jnp.abs(out["u"] - ref["u"]))) < 1e-6
    S = ms.b.shape[0]
    qt_sl = jnp.transpose(out["qt"][..., :S], (2, 0, 1))
    rt_sl = jnp.transpose(out["rt"][..., :S], (2, 0, 1))
    assert float(jnp.max(jnp.abs(qt_sl - ref["qt"]))) < 1e-6
    assert float(jnp.max(jnp.abs(rt_sl - ref["rt"]))) < 1e-6
    rid = np.asarray(ms.meta.root_ids)
    cq_ref = jnp.concatenate([eq[rid], er[rid]], axis=1)
    assert float(jnp.max(jnp.abs(out["cqr"] - cq_ref))) < 1e-6
    assert abs(float(out["fch"]) - float(f_ref)) < 1e-5 * abs(float(f_ref))
    # fused chain residual: with zero crown solution, _chain_residual's
    # j=0 row reduces to b_0 - x_0 — exactly what the kernel emits
    x0 = jnp.zeros((ms.meta.crown_topo.Nn, ms.meta.crown_topo.nxm),
                   ms.b.dtype)
    u0 = jnp.zeros((ms.meta.crown_topo.Nn, ms.meta.crown_topo.num),
                   ms.b.dtype)
    res_ref = tm._chain_residual(ms, ref, x0, u0)
    assert float(jnp.max(jnp.abs(out["res_part"] - res_ref))) < 1e-6


@pytest.mark.slow
def test_chain_blocks_factor_variants_agree():
    qp, ms = _problem()
    rng = np.random.default_rng(2)
    lam = jnp.asarray(rng.standard_normal(ms.b.shape) * 0.1)
    sol = tm._chain_stage_solve(ms, lam)
    S, _, nx = ms.b.shape
    nz = nx + ms.r.shape[-1]
    ztp_root = jnp.asarray(rng.random((S, nz)) + 0.3, jnp.float32)
    s_root = jnp.asarray(rng.random((S, nx)) + 0.5, jnp.float32)

    # unfused reference: XLA blocks + equilibration + chain_factor
    qt32 = sol["qt"].astype(jnp.float32)
    rt32 = sol["rt"].astype(jnp.float32)
    ztp = jnp.concatenate(
        [ztp_root[:, None],
         jnp.concatenate([qt32, rt32], -1)[:, :-1]], axis=1)
    ABt = jnp.concatenate([ms.A, ms.B], axis=3).astype(jnp.float32)
    r0 = ck.chain_blocks_factor(ABt, ztp, qt32, s_root)

    # lane-input variant (consumes chain_eval's kernel-layout outputs)
    data_l = ck.chain_eval_data(ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd,
                                ms.xmin, ms.xmax, ms.umin, ms.umax, ms.b)
    ev = ck.chain_eval(data_l, lam.astype(jnp.float32))
    r1 = ck.chain_blocks_factor_lanes(data_l["ABt"], ev["qt"], ev["rt"],
                                      ztp_root, s_root)
    for a, b in zip(r0, r1):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5


def test_chain_full_solve_mat_exact():
    rng = np.random.default_rng(0)
    S, L, n, m = 3, 5, 4, 3
    D = np.zeros((S, L, n, n))
    Off = rng.standard_normal((S, L - 1, n, n)) * 0.2
    for s in range(S):
        for k in range(L):
            A = rng.standard_normal((n, n)) * 0.3
            D[s, k] = A @ A.T + 3 * np.eye(n)
    M = np.zeros((S, L * n, L * n))
    for s in range(S):
        for k in range(L):
            M[s, k * n:(k + 1) * n, k * n:(k + 1) * n] = D[s, k]
        for k in range(L - 1):
            M[s, (k + 1) * n:(k + 2) * n, k * n:(k + 1) * n] = Off[s, k]
            M[s, k * n:(k + 1) * n, (k + 1) * n:(k + 2) * n] = Off[s, k].T
    rhs = rng.standard_normal((S, L, n, m))
    zref = np.linalg.solve(M, rhs.reshape(S, L * n, m)).reshape(S, L, n, m)
    # reversed-stage chain layout, no root coupling (Ut_0 = 0)
    Wc = jnp.asarray(np.flip(D, 1), jnp.float32)
    Ut = np.zeros((S, L, n, n))
    Ut[:, 1:] = np.flip(Off, 1)
    Lt, CUt, _ = ck.chain_factor(Wc, jnp.asarray(Ut, jnp.float32))
    z = np.flip(np.asarray(ck.chain_full_solve_mat(
        Lt, CUt, jnp.asarray(np.flip(rhs, 1), jnp.float32))), 1)
    assert np.max(np.abs(z - zref)) / np.max(np.abs(zref)) < 1e-5


def test_crown_eval_matches_unfused():
    qp, ms = _problem()
    cr_qp = ms.crown
    prep = td._get_prep(ms.meta.crown_topo)
    opts = td.TdunesOpts(stage_solver="clipping")
    data = td._stage_data(cr_qp, opts)
    xm, um, nrxm = td._masks(cr_qp)
    rng = np.random.default_rng(3)
    lam = jnp.asarray(rng.standard_normal((prep.Nn, prep.nxm)) * 0.2) * nrxm
    lam_ch = jnp.asarray(rng.standard_normal(ms.b.shape) * 0.1)
    eq, er = tm._chain_root_contrib(ms, lam_ch)

    sol = td._stage_solve(cr_qp, lam, data, opts, prep, eq, er)
    res_ref = td._dual_residual(cr_qp, sol, prep)
    f_ref = td._dual_value(cr_qp, lam, sol, data, opts)

    ed = ckr.crown_eval_data(cr_qp, prep, xm, um, nrxm)
    NPc, _ = ckr._get_eval_sched(prep)
    extra = jnp.pad(jnp.transpose(jnp.concatenate(
        [eq, er], axis=1).astype(jnp.float32), (1, 0)),
        ((0, 0), (0, NPc - prep.Nn)))
    out = ckr.crown_eval(ed, lam, extra)
    for k, ref in [("x", sol["x"]), ("u", sol["u"]),
                   ("qtilde", sol["qtilde"]), ("rtilde", sol["rtilde"]),
                   ("res", res_ref)]:
        assert float(jnp.max(jnp.abs(out[k] - ref))) < 1e-6, k
    assert abs(float(out["fcr"]) - float(f_ref)) < 1e-5 * abs(float(f_ref))
