"""Diagnose the TPU-only NaN in the generic IPM near convergence:
run ONE cold solve on the bench tree with per-iteration history of
res4 / alpha / mu / where-NaN flags."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

import treeqp_tpu  # noqa: F401  (sets matmul precision)
from treeqp_tpu.solvers import ipm as ip

MD, NR, NH, NM = 4, 4, 20, 4
MAXIT = 40


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
    dev = jax.devices()[0]
    qp = jax.device_put(qp, dev)
    print("device:", dev, flush=True)
    opts = ip.IpmOpts(tol=1e-8, max_iter=MAXIT)

    topo = qp.topo
    prep = ip._get_ipm_prep(topo)
    dt = qp.dtype
    Nn, nxm, num = topo.Nn, topo.nxm, topo.num
    nz = nxm + num

    H, zmask = ip._stage_hessian(qp)
    G, lo, hi, m_lo, m_hi = ip._constraint_data(qp)
    h = jnp.concatenate([qp.q, qp.r], axis=1) * zmask
    nrxm = jnp.asarray(topo.nonroot_x_mask, dt)
    par = prep.par.copy(); par[0] = 0
    n_ineq = jnp.maximum(jnp.sum(m_lo) + jnp.sum(m_hi), 1.0)

    # replicate ipm_solve's iteration with history
    def residuals(z, lam, l_lo, l_hi, s_lo, s_hi):
        t = jnp.einsum("ngz,nz->ng", G, z)
        rg = (jnp.einsum("nij,nj->ni", H, z) * zmask + h
              + jnp.einsum("ngz,ng->nz", G, l_hi - l_lo))
        rg = rg.at[:, :nxm].add(-lam * nrxm)
        AB = jnp.concatenate([qp.A, qp.B], axis=2)
        contrib = jnp.einsum("nxz,nx->nz", AB, lam * nrxm)
        rg = rg + jax.ops.segment_sum(contrib[1:], par[1:], num_segments=Nn)
        rg = rg * zmask
        zp = z[par]
        rb = (jnp.einsum("nxz,nz->nx", AB, zp) + qp.b - z[:, :nxm]) * nrxm
        rd_lo = (s_lo - (t - lo)) * m_lo
        rd_hi = (s_hi - (hi - t)) * m_hi
        rm_lo = s_lo * l_lo * m_lo
        rm_hi = s_hi * l_hi * m_hi
        return rg, rb, rd_lo, rd_hi, rm_lo, rm_hi

    def kkt_rhs(rg, rd_lo, rd_hi, rm_lo, rm_hi, s_lo, s_hi, l_lo, l_hi):
        inv_slo = jnp.where(m_lo > 0, 1.0 / s_lo, 0.0)
        inv_shi = jnp.where(m_hi > 0, 1.0 / s_hi, 0.0)
        gamma = l_lo * inv_slo + l_hi * inv_shi
        qx = ((rm_lo - l_lo * rd_lo) * inv_slo
              - (rm_hi - l_hi * rd_hi) * inv_shi)
        return rg + jnp.einsum("ngz,ng->nz", G, qx), gamma

    z0 = jnp.zeros((Nn, nz), dt)
    lam0 = jnp.zeros((Nn, nxm), dt)
    s_init = jnp.sqrt(opts.mu0)
    s_lo0 = jnp.where(m_lo > 0, jnp.maximum(s_init, -lo), 1.0)
    s_hi0 = jnp.where(m_hi > 0, jnp.maximum(s_init, hi), 1.0)
    l_lo0 = jnp.where(m_lo > 0, opts.mu0 / s_lo0, 0.0)
    l_hi0 = jnp.where(m_hi > 0, opts.mu0 / s_hi0, 0.0)

    @jax.jit
    def run():
        def body(carry, it):
            z, lam, l_lo, l_hi, s_lo, s_hi = carry
            rg, rb, rd_lo, rd_hi, rm_lo, rm_hi = residuals(
                z, lam, l_lo, l_hi, s_lo, s_hi)
            rhs_g, gamma = kkt_rhs(rg, rd_lo, rd_hi, rm_lo, rm_hi,
                                   s_lo, s_hi, l_lo, l_hi)
            Hbar = H + jnp.einsum("ngi,ng,ngj->nij", G, gamma, G)
            fact = ip._riccati_factor(qp, Hbar, prep, opts)
            dz, dlam = ip._riccati_solve(qp, fact, rhs_g, rb, prep)
            mu = (jnp.sum(s_lo * l_lo * m_lo)
                  + jnp.sum(s_hi * l_hi * m_hi)) / n_ineq
            rec = jnp.stack([
                jnp.max(jnp.abs(rg)), jnp.max(jnp.abs(rb)),
                jnp.maximum(jnp.max(jnp.abs(rd_lo)), jnp.max(jnp.abs(rd_hi))),
                jnp.maximum(jnp.max(jnp.abs(rm_lo)), jnp.max(jnp.abs(rm_hi))),
                mu, jnp.max(gamma),
                jnp.sum(jnp.isnan(fact["P"]).astype(dt)),
                jnp.sum(jnp.isnan(fact["Luu"]).astype(dt)),
                jnp.sum(jnp.isnan(dz).astype(dt)),
                jnp.sum(jnp.isnan(rhs_g).astype(dt)),
                jnp.min(jnp.where(m_lo > 0, s_lo, jnp.inf)),
                jnp.min(jnp.where(m_hi > 0, s_hi, jnp.inf)),
            ])
            # one plain predictor-only step to keep the trace simple
            ds_lo = (jnp.einsum("ngz,nz->ng", G, dz) - rd_lo) * m_lo
            ds_hi = (-jnp.einsum("ngz,nz->ng", G, dz) - rd_hi) * m_hi
            inv_slo = jnp.where(m_lo > 0, 1.0 / s_lo, 0.0)
            inv_shi = jnp.where(m_hi > 0, 1.0 / s_hi, 0.0)
            sig_mu = 0.1 * mu
            dl_lo = (-(rm_lo - sig_mu * m_lo + l_lo * ds_lo) * inv_slo) * m_lo
            dl_hi = (-(rm_hi - sig_mu * m_hi + l_hi * ds_hi) * inv_shi) * m_hi

            def mstep(v, dv, mask):
                ratio = jnp.where((dv < 0) & (mask > 0),
                                  -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
                return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

            alpha = jnp.minimum(
                jnp.minimum(mstep(s_lo, ds_lo, m_lo), mstep(s_hi, ds_hi, m_hi)),
                jnp.minimum(mstep(l_lo, dl_lo, m_lo), mstep(l_hi, dl_hi, m_hi)))
            ok = ~jnp.isnan(alpha + jnp.sum(dz))
            a = jnp.where(ok, alpha, 0.0)
            dz = jnp.where(ok, dz, 0.0); dlam_ = jnp.where(ok, dlam, 0.0)
            ds_lo = jnp.where(ok, ds_lo, 0.0); ds_hi = jnp.where(ok, ds_hi, 0.0)
            dl_lo = jnp.where(ok, dl_lo, 0.0); dl_hi = jnp.where(ok, dl_hi, 0.0)
            z = z + a * dz
            lam = lam + a * dlam_ * nrxm
            s_lo_n = jnp.where(m_lo > 0, s_lo + a * ds_lo, 1.0)
            s_hi_n = jnp.where(m_hi > 0, s_hi + a * ds_hi, 1.0)
            l_lo_n = jnp.where(m_lo > 0, l_lo + a * dl_lo, 0.0)
            l_hi_n = jnp.where(m_hi > 0, l_hi + a * dl_hi, 0.0)
            return (z, lam, l_lo_n, l_hi_n, s_lo_n, s_hi_n), \
                jnp.concatenate([rec, jnp.stack([alpha])])

        carry, hist = jax.lax.scan(
            body, (z0, lam0, l_lo0, l_hi0, s_lo0, s_hi0),
            jnp.arange(MAXIT))
        return hist

    hist = np.asarray(jax.block_until_ready(run()))
    cols = ("rg rb rd rm mu gam_max nanP nanLuu nandz nanrhs smin_lo "
            "smin_hi alpha").split()
    print(("%3s" % "it") + "".join(f"{c:>10s}" for c in cols), flush=True)
    for i, row in enumerate(hist):
        print("%3d" % i + "".join(f"{v:10.2e}" for v in row), flush=True)


if __name__ == "__main__":
    main()
