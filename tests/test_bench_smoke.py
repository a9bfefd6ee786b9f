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
