"""Parity tests for the fused df64 evaluation kernels.

On TPU hardware the kernels match the unfused ms_df64 path to ~1e-15
(df64 ulps; verified on a v5e — see the module docstring and
BENCH_NOTES round 4). On CPU, Pallas interpret mode contracts FP
expressions (FMA/reassociation), which breaks the error-free transforms
at the ~f32-ulp level; the solver therefore only enables the fused path
on TPU backends, and these CPU tests assert at 1e-6 — tight enough to
catch any layout/mask/indexing bug (those produce O(1) errors), loose
enough for the interpret-mode contraction noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from benchmarks.models import spring_mass_chain
from treeqp_tpu.ops import df64 as df
from treeqp_tpu.ops import df_eval_kernels as dek
from treeqp_tpu.solvers import ms_df64 as md
from treeqp_tpu.solvers import tdunes as td
from treeqp_tpu.solvers import tdunes_multistage as tm
from treeqp_tpu.solvers.tdunes import TdunesOpts

TOL = 1e-6  # interpret-mode contraction noise; ~1e-15 on real TPU

pytestmark = pytest.mark.slow  # interpret-mode kernel runs, ~1 min


@pytest.fixture(scope="module")
def setup():
    qp, _ = spring_mass_chain(nm=2, md=2, Nr=2, Nh=8)
    ms = tm.split_multistage(qp)
    opts = TdunesOpts(stage_solver="clipping", factor_dtype="float32",
                      chain_backend="pallas")
    prep = td._get_prep(ms.meta.crown_topo)
    dd, meta = md.make_dd(ms, opts, prep)
    rid = np.asarray(meta["rid"])
    lam_cr = df.from_f64(0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (ms.meta.crown_topo.Nn, ms.meta.crown_topo.nxm)))
    lam_cr = md._mask(lam_cr, dd["nrxm"])
    lam_ch = df.from_f64(0.05 * jax.random.normal(
        jax.random.PRNGKey(1), ms.q.shape))
    return ms, prep, dd, meta, rid, lam_cr, lam_ch


def _dmax(a, b):
    return float(jnp.max(jnp.abs(df.to_f64(a) - df.to_f64(b))))


def test_chain_eval_df_matches_unfused(setup):
    ms, prep, dd, meta, rid, lam_cr, lam_ch = setup
    _, ch0 = md.df_stage_solve(dd, meta, prep, lam_cr, lam_ch)
    data_ch = dek.chain_eval_df_data(
        ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd, ms.xmin, ms.xmax,
        ms.umin, ms.umax, ms.b)
    ch = dek.chain_eval_df(data_ch, lam_ch)
    S = ms.b.shape[0]
    assert _dmax(ch["x"], ch0["x"]) < TOL
    assert _dmax(ch["u"], ch0["u"]) < TOL
    qt_nodes = df.Df(jnp.transpose(ch["qt"].hi[..., :S], (2, 0, 1)),
                     jnp.transpose(ch["qt"].lo[..., :S], (2, 0, 1)))
    # active-set pattern must be EXACT (factorization reuse keys on it)
    assert bool(jnp.all((qt_nodes.hi != 0) == (ch0["qt"].hi != 0)))
    cqr0 = md._contract(dd["ABp"][:, 0], lam_ch[:, 0], axis=1)
    assert _dmax(ch["cqr"], cqr0) < TOL


def test_crown_eval_df_and_residuals_match_unfused(setup):
    ms, prep, dd, meta, rid, lam_cr, lam_ch = setup
    cr0, ch0 = md.df_stage_solve(dd, meta, prep, lam_cr, lam_ch)
    rc0, rh0 = md.df_residuals(dd, meta, prep, cr0, ch0)
    f0 = md.df_dual_value(dd, lam_cr, lam_ch, cr0, ch0)

    data_ch = dek.chain_eval_df_data(
        ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd, ms.xmin, ms.xmax,
        ms.umin, ms.umax, ms.b)
    xm, um, nrxm = td._masks(ms.crown)
    data_cr = dek.crown_eval_df_data(ms.crown, prep, xm, um, nrxm)
    ch = dek.chain_eval_df(data_ch, lam_ch)
    NPc = data_cr["ABt"][0].shape[2]
    nz = ms.A.shape[-1] + ms.B.shape[-1]
    zh = jnp.zeros((nz, NPc), jnp.float32)
    extra = df.Df(zh.at[:, rid].set(ch["cqr"].hi.T),
                  zh.at[:, rid].set(ch["cqr"].lo.T))
    cr = dek.crown_eval_df(data_cr, lam_cr, extra)

    assert _dmax(cr["x"], cr0["x"]) < TOL
    assert _dmax(cr["u"], cr0["u"]) < TOL
    assert bool(jnp.all((cr["qtilde"].hi != 0) == (cr0["qtilde"].hi != 0)))
    assert _dmax(cr["res"], rc0) < TOL

    # chain residual with the j=0 crown-term completion
    ab0t = df.from_f64(jnp.concatenate(
        [ms.A.swapaxes(2, 3), ms.B.swapaxes(2, 3)], axis=2)[:, 0])
    zr = md._cat([df.Df(cr["x"].hi[rid], cr["x"].lo[rid]),
                  df.Df(cr["u"].hi[rid], cr["u"].lo[rid])], 1)
    a0z = md._contract(ab0t, zr, axis=1)
    row0 = df.add(ch["res_part"][:, 0], a0z)
    res_ch = df.Df(
        jnp.concatenate([row0.hi[:, None], ch["res_part"].hi[:, 1:]], 1),
        jnp.concatenate([row0.lo[:, None], ch["res_part"].lo[:, 1:]], 1))
    assert _dmax(res_ch, rh0) < TOL

    # dual value from the in-kernel partials
    fsum = md._sum_terms([cr["fcr"], ch["fch"]])
    assert abs(float(df.to_f64(fsum)) - float(df.to_f64(f0))) < TOL


def test_apply_kernels_match_df_apply_M(setup):
    ms, prep, dd, meta, rid, lam_cr, lam_ch = setup
    cr0, ch0 = md.df_stage_solve(dd, meta, prep, lam_cr, lam_ch)
    dcr = (0.1 * jax.random.normal(jax.random.PRNGKey(2), lam_cr.hi.shape)
           ).astype(jnp.float32) * dd["nrxm"]
    dch = (0.1 * jax.random.normal(jax.random.PRNGKey(3), lam_ch.hi.shape)
           ).astype(jnp.float32)
    mcr0, mch0 = md.df_apply_M(dd, meta, prep, cr0, ch0, dcr, dch)

    data_ch = dek.chain_eval_df_data(
        ms.A, ms.B, ms.q, ms.r, ms.Qd, ms.Rd, ms.xmin, ms.xmax,
        ms.umin, ms.umax, ms.b)
    xm, um, nrxm = td._masks(ms.crown)
    data_cr = dek.crown_eval_df_data(ms.crown, prep, xm, um, nrxm)
    ch = dek.chain_eval_df(data_ch, lam_ch)
    NPc = data_cr["ABt"][0].shape[2]
    nz = ms.A.shape[-1] + ms.B.shape[-1]
    zh = jnp.zeros((nz, NPc), jnp.float32)
    extra0 = df.Df(zh.at[:, rid].set(ch["cqr"].hi.T),
                   zh.at[:, rid].set(ch["cqr"].lo.T))
    cr = dek.crown_eval_df(data_cr, lam_cr, extra0)

    cha = dek.chain_apply_df(data_ch, ch["qt"], ch["rt"], dch)
    extra = df.Df(zh.at[:, rid].set(cha["cqr"].hi.T),
                  zh.at[:, rid].set(cha["cqr"].lo.T))

    def lane(v):
        pad = NPc - v.hi.shape[0]
        t = lambda w: jnp.pad(jnp.transpose(w, (1, 0)), ((0, 0), (0, pad)))
        return df.Df(t(v.hi), t(v.lo))

    cra = dek.crown_apply_df(data_cr, lane(cr["qtilde"]),
                             lane(cr["rtilde"]), dcr, extra)
    mcr = df.neg(cra["res"])
    zr = md._cat([df.Df(cra["xl"].hi[rid], cra["xl"].lo[rid]),
                  df.Df(cra["ul"].hi[rid], cra["ul"].lo[rid])], 1)
    ab0t = df.from_f64(jnp.concatenate(
        [ms.A.swapaxes(2, 3), ms.B.swapaxes(2, 3)], axis=2)[:, 0])
    a0z = md._contract(ab0t, zr, axis=1)
    row0 = df.add(cha["res_part"][:, 0], a0z)
    res_lin = df.Df(
        jnp.concatenate([row0.hi[:, None], cha["res_part"].hi[:, 1:]], 1),
        jnp.concatenate([row0.lo[:, None], cha["res_part"].lo[:, 1:]], 1))
    mch = df.neg(res_lin)
    assert _dmax(mcr, mcr0) < TOL
    assert _dmax(mch, mch0) < TOL
