"""Fast representatives of the slow-marked test families (round 5,
verdict task 9): the default gate must touch sharding byte budgets and
kernel parity daily, not only in CI's full matrix.

* one HLO collective audit at a 2-device mesh on a tiny tree
  (the test_hlo_audit.py family);
* one interpret-mode Pallas crown-kernel parity case at tiny shapes
  (the test_crown_kernels / test_tpu_parity family).
"""

import numpy as np
import jax
import jax.numpy as jnp

from treeqp_tpu.parallel.hlo_audit import audit_compiled


def test_audit_representative_2dev():
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import (
        split_multistage, tdunes_ms_solve)
    from treeqp_tpu.parallel.sharding import scenario_mesh, shard_multistage

    qp, _ = spring_mass_chain(nm=1, md=2, Nr=1, Nh=3)
    ms = split_multistage(qp)
    mesh = scenario_mesh(jax.devices()[:2])
    ms = shard_multistage(ms, mesh)
    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=10)
    fn = jax.jit(lambda m: tdunes_ms_solve(m, None, None, opts))
    a = audit_compiled(fn.lower(ms).compile(), "tdunes_ms_solve",
                       scan_weight=ms.meta.L)
    # collectives present; no chain-interior movement
    assert a["census"].get("all-reduce", 0) > 0
    chain_bytes = ms.meta.S * ms.meta.L * ms.meta.nx * ms.meta.nx * 8
    big_gather = max((o.bytes_global for o in a["ops"]
                      if o.kind != "all-reduce"), default=0)
    assert big_gather < max(chain_bytes, 1), big_gather


def test_crown_kernel_parity_representative():
    """Tiny crown factor+solve through the Pallas kernels (interpret mode
    on CPU) against the XLA scan path — the kernel-parity family's
    daily-gate case (full suite: test_crown_kernels.py, slow)."""
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes import (
        TdunesOpts, _get_prep, _tree_chol_factor, _tree_chol_solve)
    from treeqp_tpu.ops import crown_kernels as ckr

    qp, _ = spring_mass_chain(nm=2, md=2, Nr=2, Nh=4)
    prep = _get_prep(qp.topo)
    rng = np.random.default_rng(0)
    G, nxm, NpG = prep.G, prep.nxm, prep.NpG
    A = rng.standard_normal((NpG, G, G)).astype(np.float32)
    W = jnp.asarray(A @ A.transpose(0, 2, 1) + 3.0 * np.eye(G, dtype=np.float32))
    Ut = jnp.asarray(0.3 * rng.standard_normal((NpG, nxm, G)).astype(np.float32))
    rg = jnp.asarray(rng.standard_normal((NpG, G)).astype(np.float32))
    opts = TdunesOpts(factor_dtype="float32", reg_type="always",
                      reg_value=1e-6, chain_backend="xla")
    assert ckr.crown_supported(prep, opts)
    f_ref = _tree_chol_factor(W, Ut, opts, prep)
    dl_ref = _tree_chol_solve(f_ref, rg, opts, prep)
    CholW, CholUt = ckr.crown_factor(W, Ut, prep, reg=1e-6)
    dl_k = ckr.crown_solve(CholW, CholUt, rg, prep)
    np.testing.assert_allclose(np.asarray(dl_k), np.asarray(dl_ref),
                               atol=2e-4)
