"""Smoke test for the driver-facing artifacts: bench problem construction
and the graft entry points (cheap shapes, CPU)."""

import jax
import numpy as np


def test_bench_problem_builds():
    import bench

    qp, ms = bench.build_problem()
    assert qp.topo.Nn == 4437
    assert ms.meta.S == 256
    assert np.isfinite(np.asarray(ms.Qd)).all()


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(out[2]) >= 0
    assert np.isfinite(np.asarray(out[0])).all()


def test_chain_protocol_cold_and_warm():
    """The hardened chain protocol (round 3): per-solve-perturbed
    instances, exact-zero cold starts vs genuine warm-start chaining,
    per-solve convergence records. Tiny shapes, CPU."""
    import jax.numpy as jnp

    import bench
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import (
        split_multistage, tdunes_ms_solve)

    qp, _ = spring_mass_chain(nm=1, md=2, Nr=2, Nh=6)
    ms = split_multistage(qp)
    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=60)
    R = 4

    def run_chain(warm, seed):
        lam0c = jnp.zeros((ms.meta.crown_topo.Nn, ms.meta.crown_topo.nxm),
                          ms.q.dtype)
        lam0h = jnp.zeros_like(ms.q)

        def body(carry, k):
            lc_prev, lh_prev = carry
            ms_k = bench.perturb_ms(ms, bench.perturb_factor(k, seed))
            cro, cho, inf = tdunes_ms_solve(ms_k, lc_prev * warm,
                                            lh_prev * warm, opts)
            fp = jnp.sum(cro["x"]) + jnp.sum(cho["x"])  # solution fingerprint
            return (cro["lam"], cho["lam"]), \
                (inf["iter"], inf["error"], inf["status"], fp)

        _, ys = jax.lax.scan(body, (lam0c, lam0h),
                             jnp.arange(R, dtype=ms.q.dtype))
        return ys

    it_c, err_c, st_c, fp_c = (np.asarray(v)
                               for v in jax.jit(run_chain)(0.0, 1.0))
    assert np.all(st_c == 0) and np.all(err_c < 1e-8)
    it_w, err_w, st_w, fp_w = (np.asarray(v)
                               for v in jax.jit(run_chain)(1.0, 1.0))
    assert np.all(st_w == 0) and np.all(err_w < 1e-8)
    # first solves identical (same instance, same zero start); the warm
    # chain's later solves converge in no more iterations than cold
    assert it_c[0] == it_w[0]
    assert it_w[1:].mean() <= it_c[1:].mean()
    # warm and cold agree on the per-instance SOLUTIONS
    np.testing.assert_allclose(fp_c, fp_w, rtol=1e-9, atol=1e-9)
    # the per-solve perturbation actually changes the instances, and the
    # per-rep seed changes them again (nothing in the chain is
    # loop-invariant / hoistable)
    assert len(set(np.round(fp_c, 9))) == len(fp_c)
    _, _, _, fp2 = (np.asarray(v) for v in jax.jit(run_chain)(0.0, 2.0))
    assert not np.allclose(fp_c[1:], fp2[1:])
