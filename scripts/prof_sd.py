"""Component timing of the sdunes Newton iteration on the headline tree
(f32 coarse-phase cost ~0.83 ms/iter; this attributes it).

Variants (TREEQP_PROF_VARIANT): eval blocks factor fullsolve gram
jayblocks jaysolve apply
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from treeqp_tpu.solvers import sdunes as sd

LOOP_N = int(os.environ.get("TREEQP_PROF_LOOP", "512"))
LOOP_B = int(os.environ.get("TREEQP_PROF_LOOP_BASE", "64"))
NREP = int(os.environ.get("TREEQP_PROF_NREP", "5"))
f32 = jnp.float32

MD, NR, NH, NM = 4, 4, 20, 4


def main():
    variant = os.environ.get("TREEQP_PROF_VARIANT", "eval")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        sqp = sd.scenario_data(qp)
    sqp = sd._cast_sqp(sqp, f32)
    dev = jax.devices()[0]
    sqp = jax.device_put(sqp, dev)
    meta = sqp.meta
    Ns, Nh, Nr = meta.Ns, meta.Nh, meta.Nr
    nu = sqp.r.shape[-1]
    nl = Nr * nu
    opts = sd.SdunesOpts(tol=1e-8, factor_dtype="float32",
                         chain_backend="pallas", reg_type="always",
                         reg_value=1e-6)
    topts = opts._as_tdunes()
    cmask = sd._coupling_masks(meta, f32)
    dm = (cmask[..., None].repeat(nu, axis=-1).reshape(Ns - 1, nl))

    lam0 = jnp.zeros((Ns - 1, Nr, nu), f32)
    mu0 = jnp.zeros((Ns, Nh, sqp.A.shape[-1]), f32)

    @jax.jit
    def setup():
        sol = sd._stage_solve(sqp, mu0, lam0, cmask)
        r_mu, r_lam = sd._residuals(sqp, sol, cmask)
        D, Ssub = sd._banded_blocks(sqp.A, sqp.B, sol["qt"], sol["rt"])
        Uown = sd._coupling_columns(sqp.B, sol["rt"], meta, f32)
        fact = sd._sd_factor(D, Ssub, topts)
        Z = sd._sd_full_solve(
            fact, jnp.concatenate([r_mu[..., None], Uown], axis=-1), topts)
        z_mu, Zu = Z[..., 0], Z[..., 1:]
        Gram = jnp.einsum("skxl,skxm->slm", Uown, Zu)
        diag, off, rt_l, _ = sd._jay_blocks(sqp, {"rt": sol["rt"]}, Gram,
                                            cmask)
        return sol, r_mu, r_lam, D, Ssub, Uown, fact, Z, Gram, diag, off

    (sol0, r_mu0, r_lam0, D0, Ssub0, Uown0, fact0, Z0, Gram0, diag0,
     off0) = jax.block_until_ready(setup())
    rl_full0 = r_lam0.reshape(Ns - 1, nl) * dm

    def timed(build):
        f1, fN = build(LOOP_B), build(LOOP_N)
        jax.block_until_ready(f1())
        jax.block_until_ready(fN())
        t1s, tNs = [], []
        for _ in range(NREP):
            t0 = time.perf_counter()
            jax.block_until_ready(f1())
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(fN())
            tNs.append(time.perf_counter() - t0)
        per = (min(tNs) - min(t1s)) / (LOOP_N - LOOP_B)
        print(f"{variant:10s} {per * 1e6:8.2f} us/call")

    def consume(tree):
        return sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype"))

    def scan_over(body, x0):
        def build(n):
            def prog():
                carry, _ = jax.lax.scan(
                    lambda c, _: (body(c), None), x0, None, length=n)
                return carry
            return jax.jit(prog)
        return build

    if variant == "eval":
        def body(c):
            mu, lam = c
            sol = sd._stage_solve(sqp, mu, lam, cmask)
            r_mu, r_lam = sd._residuals(sqp, sol, cmask)
            f = sd._dual_value(sqp, sol, mu, lam, cmask)
            eps = (consume((r_mu, r_lam)) + f) * 1e-30
            return (mu + eps, lam)
        timed(scan_over(body, (mu0, lam0)))
    elif variant == "blocks":
        def body(c):
            qt = c
            D, Ssub = sd._banded_blocks(sqp.A, sqp.B, qt, sol0["rt"])
            Uown = sd._coupling_columns(sqp.B, sol0["rt"], meta, f32)
            eps = consume((D, Ssub, Uown)) * 1e-30
            return qt + eps
        timed(scan_over(body, sol0["qt"]))
    elif variant == "factor":
        def body(c):
            D = c
            fact = sd._sd_factor(D, Ssub0, topts)
            eps = consume(fact) * 1e-30
            return D + eps
        timed(scan_over(body, D0))
    elif variant == "fullsolve":
        def body(c):
            r_mu = c
            Z = sd._sd_full_solve(
                fact0, jnp.concatenate([r_mu[..., None], Uown0], axis=-1),
                topts)
            eps = consume(Z) * 1e-30
            return r_mu + eps
        timed(scan_over(body, r_mu0))
    elif variant == "gram":
        Zu0 = Z0[..., 1:]
        def body(c):
            U = c
            Gram = jnp.einsum("skxl,skxm->slm", U, Zu0)
            Kv = jnp.einsum("skxl,skx->sl", U, Z0[..., 0])
            eps = consume((Gram, Kv)) * 1e-30
            return U + eps
        timed(scan_over(body, Uown0))
    elif variant == "jayblocks":
        def body(c):
            G = c
            diag, off, rt_l, _ = sd._jay_blocks(sqp, {"rt": sol0["rt"]}, G,
                                                cmask)
            eps = consume((diag, off)) * 1e-30
            return G + eps
        timed(scan_over(body, Gram0))
    elif variant == "jaysolve":
        def body(c):
            r = c
            dl = sd._jay_solve(diag0, off0, r, opts)
            eps = consume(dl) * 1e-30
            return r + eps
        timed(scan_over(body, rl_full0))
    elif variant == "apply":
        AT = sqp.A.swapaxes(2, 3)
        BT = sqp.B.swapaxes(2, 3)
        dmu0 = jnp.ones_like(mu0)
        dl0 = jnp.ones((Ns - 1, nl), f32)
        def body(c):
            dmu, dl = c
            Amu, Al = sd._sd_apply_M(sqp, sol0, cmask, dm, dmu, dl,
                                     AT=AT, BT=BT)
            eps = consume((Amu, Al)) * 1e-30
            return (dmu + eps, dl)
        timed(scan_over(body, (dmu0, dl0)))


if __name__ == "__main__":
    main()
