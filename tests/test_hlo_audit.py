"""HLO collective audit of the sharded solvers (VERDICT r3 #6).

Compiles the scenario-sharded engines on virtual CPU meshes and checks,
at the compiled-module level, the communication claims behind
benchmarks/scaling_analysis.py:

* collectives exist where the design says (Newton body: boundary gathers
  + crown-contribution reductions + scalar termination/line-search psums);
* the largest single GATHER stays far below chain-interior size;
* per-Newton-iteration collective bytes grow strictly sublinearly in the
  horizon L and are mesh-size-independent (weak-scaling numerator);
* the headline-size (256-scenario) per-iteration byte count is pinned as
  a regression canary.

Round-4 audit finding these tests record: GSPMD's auto-partitioning is
far from the hand model's minimal communication (74.8 KB/iter) — it
moves ~6.4 MB/iter on the headline tree (chain-shaped gathers around the
lane-layout transposes, full-width reduction workspaces, crown-shaped
contribution all-reduces). scaling_analysis.py carries both numbers; the
explicit shard_map path is the design answer for reaching the model.
Reference parallel sites: dual_Newton_scenarios.c:528-563, :332-345.
"""

import numpy as np
import pytest

import jax

from treeqp_tpu.parallel.hlo_audit import audit_compiled

pytestmark = pytest.mark.slow  # ~6 SPMD compiles, minutes on CPU


def _ms_compiled(md, Nr, Nh, nm, n_devices):
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import (
        split_multistage, tdunes_ms_solve)
    from treeqp_tpu.parallel.sharding import scenario_mesh, shard_multistage

    qp, _ = spring_mass_chain(nm=nm, md=md, Nr=Nr, Nh=Nh)
    ms = split_multistage(qp)
    mesh = scenario_mesh(jax.devices()[:n_devices])
    ms = shard_multistage(ms, mesh)
    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=20,
                      factor_dtype="float32", refine_steps=1,
                      refine_safeguard=False, chain_backend="xla",
                      reg_type="always", reg_value=1e-6,
                      f32_phase_tol=1e-4, df64_phase=True)
    fn = jax.jit(lambda m: tdunes_ms_solve(m, None, None, opts))
    return fn.lower(ms).compile(), ms.meta


def test_tdunes_ms_collective_audit():
    S, nx = 8, 8
    sizes = {}
    for n_dev in (2, 4, 8):
        compiled, meta = _ms_compiled(md=2, Nr=3, Nh=8, nm=4, n_devices=n_dev)
        a = audit_compiled(compiled, "tdunes_ms_solve", scan_weight=meta.L)
        assert meta.S == S and meta.nx == nx
        # structure: boundary gathers + scalar reductions present
        kinds = a["census"]
        assert kinds.get("all-gather", 0) > 0
        assert kinds.get("all-reduce", 0) > 0
        assert a["per_iter_bytes"] > 0
        # no chain-sized state movement: the largest GATHER stays far
        # below any [S, L, ...] chain-interior gather. (All-reduces are
        # contribution aggregations — crown kid-sums, dual-value
        # reduction workspaces — and are budgeted by the comm-share
        # assertion below, not by this shape bound.)
        chain_bytes = meta.S * meta.L * nx * nx * 4
        big_gather = max((o.bytes_global for o in a["ops"]
                          if o.kind != "all-reduce"), default=0)
        assert big_gather < chain_bytes / 2, big_gather
        sizes[n_dev] = a["per_iter_bytes"]
    # weak-scaling numerator: global collective bytes are mesh-size
    # independent (each device's share shrinks as 1/D)
    vals = np.array(list(sizes.values()), float)
    assert vals.max() / vals.min() < 1.3, sizes


def test_tdunes_ms_headline_size_byte_budget():
    """Audit the 256-scenario headline tree itself (no extrapolation).

    Round-4 finding this test pins down: GSPMD's auto-partitioning of
    the jit path moves ~6.4 MB/iter (chain-shaped [S*L*nx] gathers into
    the lane-layout transposes, full-width reduction workspaces, crown
    contribution all-reduces) — ~85x the hand model's minimal count and
    a ~32% comm share at ICI bandwidth. The budget here is a regression
    canary at today's audited level; the explicit shard_map multichip
    path is the design answer (scaling_analysis.py carries the audited
    numbers for both)."""
    compiled, meta = _ms_compiled(md=4, Nr=4, Nh=20, nm=4, n_devices=8)
    a = audit_compiled(compiled, "tdunes_ms_solve", scan_weight=meta.L)
    assert meta.S == 256
    assert a["per_iter_bytes"] < 8_000_000, a["per_iter_bytes"]


def test_tdunes_ms_bytes_L_independent():
    """Per-iteration collective bytes must not scale with the horizon:
    the mesh moves chain BOUNDARY data (root contributions, Schur
    complements), never chain-interior sweeps."""
    out = {}
    for Nh in (8, 14):
        compiled, meta = _ms_compiled(md=2, Nr=3, Nh=Nh, nm=4, n_devices=8)
        a = audit_compiled(compiled, "tdunes_ms_solve", scan_weight=meta.L)
        out[Nh] = a["per_iter_bytes"]
    # L goes 5 -> 11 (2.2x). Audited round-4 reality on the jit path:
    # bytes grow 1.62x — sublinear (the dominant boundary/crown terms are
    # L-independent) but with a real O(L) residual term from chain-shaped
    # gathers GSPMD inserts around the lane-layout transposes. Bound the
    # growth strictly below proportional as the regression canary; the
    # explicit shard_map path is the design answer for removing the O(L)
    # term entirely.
    assert out[14] < 0.85 * (11 / 5) * out[8], out


def test_ipm_ms_collective_audit():
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.ipm import IpmOpts
    from treeqp_tpu.solvers.ipm_multistage import ipm_ms_solve
    from treeqp_tpu.solvers.tdunes_multistage import split_multistage
    from treeqp_tpu.parallel.sharding import scenario_mesh, shard_multistage

    qp, _ = spring_mass_chain(nm=4, md=2, Nr=3, Nh=8)
    ms = split_multistage(qp)
    mesh = scenario_mesh(jax.devices()[:8])
    ms = shard_multistage(ms, mesh)
    fn = jax.jit(lambda m: ipm_ms_solve(m, IpmOpts(tol=1e-8, max_iter=25)))
    a = audit_compiled(fn.lower(ms).compile(), "ipm_ms_solve",
                       scan_weight=ms.meta.L)
    assert a["census"].get("all-reduce", 0) > 0
    chain_bytes = ms.meta.S * ms.meta.L * ms.meta.nx * ms.meta.nx * 8
    big_gather = max((o.bytes_global for o in a["ops"]
                      if o.kind != "all-reduce"), default=0)
    assert big_gather < chain_bytes / 2, big_gather


def test_sdunes_collective_audit():
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.sdunes import SdunesOpts, scenario_data, \
        sdunes_solve
    from treeqp_tpu.parallel.sharding import scenario_mesh, shard_scenarios

    qp, _ = spring_mass_chain(nm=2, md=2, Nr=3, Nh=8)
    sqp = shard_scenarios(scenario_data(qp), scenario_mesh(jax.devices()[:8]))
    opts = SdunesOpts(tol=1e-8, max_iter=30)
    fn = jax.jit(lambda s: sdunes_solve(s, None, None, opts))
    a = audit_compiled(fn.lower(sqp).compile(), "sdunes_solve",
                       scan_weight=sqp.meta.Nh)
    assert a["census"].get("all-reduce", 0) > 0
    # coupling data crosses the mesh (scenario boundary duals), whole
    # banded stage systems must not
    meta = sqp.meta
    nx = sqp.q.shape[-1]
    band_bytes = meta.Ns * meta.Nh * nx * nx * 8
    big_gather = max((o.bytes_global for o in a["ops"]
                      if o.kind != "all-reduce"), default=0)
    assert big_gather < band_bytes / 2, big_gather


def test_ipm_shmap_path_byte_budget():
    """The round-5 explicit-SPMD IPM path: boundary traffic is the
    chain-root Riccati contributions (W0 [S, nz, nz] f32 per
    factorization, w0 [S, nz] per solve) + scalar reductions — audited
    here at the 256-scenario headline size on an 8-device mesh."""
    from treeqp_tpu.solvers.ipm import IpmOpts
    from treeqp_tpu.solvers.tdunes_multistage import split_multistage
    from treeqp_tpu.parallel.sharding import scenario_mesh
    from treeqp_tpu.parallel.shard_solver import ipm_ms_solve_shmap
    from benchmarks.models import spring_mass_chain

    qp, _ = spring_mass_chain(nm=4, md=4, Nr=4, Nh=20)
    ms = split_multistage(qp)
    mesh = scenario_mesh(jax.devices()[:8])
    opts = IpmOpts(tol=1e-8, max_iter=25, factor_dtype="float32",
                   refine_steps=1)
    fn = jax.jit(lambda m: ipm_ms_solve_shmap(m, opts, mesh))
    a = audit_compiled(fn.lower(ms).compile(), "ipm_ms_solve",
                       scan_weight=ms.meta.L)
    meta = ms.meta
    nz = meta.nx + 1  # nu = 1 on this model
    # budget: W0 gather (f32) + a few [S, nz] f64 vectors per iteration
    # (predictor + corrector solves x refinement) + scalars
    assert a["per_iter_bytes"] < 2_500_000, a["per_iter_bytes"]
    # largest single collective is the W0 boundary gather, never a
    # chain-interior tensor
    big_gather = max((o.bytes_global for o in a["ops"]
                      if o.kind != "all-reduce"), default=0)
    assert big_gather <= meta.S * nz * nz * 8, big_gather


def test_sdunes_shmap_path_byte_budget():
    """The round-5 explicit-SPMD sdunes path: boundary traffic is the
    Jay Gram blocks [Ns, nl, nl] + u/rt/Kv coupling rows — tiny next to
    the sharded [Ns, Nh, nx] banded systems."""
    from treeqp_tpu.solvers.sdunes import SdunesOpts, scenario_data
    from treeqp_tpu.parallel.sharding import scenario_mesh
    from treeqp_tpu.parallel.shard_solver import sdunes_solve_shmap
    from benchmarks.models import spring_mass_chain

    qp, _ = spring_mass_chain(nm=4, md=4, Nr=4, Nh=20)
    sqp = scenario_data(qp)
    mesh = scenario_mesh(jax.devices()[:8])
    opts = SdunesOpts(tol=1e-8, max_iter=30, factor_dtype="float32",
                      refine_steps=1, f32_phase_tol=1e-4)
    fn = jax.jit(lambda s: sdunes_solve_shmap(s, None, None, opts, mesh))
    a = audit_compiled(fn.lower(sqp).compile(), "sdunes_solve",
                       scan_weight=sqp.meta.Nh)
    meta = sqp.meta
    nl = meta.Nr * sqp.r.shape[-1]
    assert a["per_iter_bytes"] < 1_000_000, a["per_iter_bytes"]
    big_gather = max((o.bytes_global for o in a["ops"]
                      if o.kind != "all-reduce"), default=0)
    # largest gather: the Jay Gram boundary blocks (f64 in the exact
    # phase), never the banded chain interiors
    assert big_gather <= meta.Ns * nl * nl * 8, big_gather


def test_shard_map_path_reaches_model_bytes():
    """The explicit-SPMD shard_map path (parallel/shard_solver.py) must
    stay within a small factor of the communication model's minimal
    boundary traffic — the design answer to the GSPMD-auto finding above
    (6.37 MB/iter). Audited round 4: ~0.42 MB/iter static (includes the
    f64 phase and refinement gathers), ~2% comm share at ICI bandwidth."""
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import split_multistage
    from treeqp_tpu.parallel.sharding import scenario_mesh
    from treeqp_tpu.parallel.shard_solver import tdunes_ms_solve_shmap
    from benchmarks.models import spring_mass_chain

    qp, _ = spring_mass_chain(nm=4, md=4, Nr=4, Nh=20)
    ms = split_multistage(qp)
    mesh = scenario_mesh(jax.devices()[:8])
    opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=20,
                      factor_dtype="float32", refine_steps=1,
                      refine_safeguard=False, chain_backend="xla",
                      reg_type="always", reg_value=1e-6,
                      f32_phase_tol=1e-4, df64_phase=True)
    fn = jax.jit(lambda m: tdunes_ms_solve_shmap(m, None, None, opts, mesh))
    a = audit_compiled(fn.lower(ms).compile(), "tdunes_ms_solve",
                       scan_weight=ms.meta.L)
    assert a["per_iter_bytes"] < 600_000, a["per_iter_bytes"]
    # no chain-interior movement: largest gather is the [S, nx, nx]
    # Schur boundary (f32) or its f64-phase counterpart
    big_gather = max((o.bytes_global for o in a["ops"]
                      if o.kind != "all-reduce"), default=0)
    assert big_gather <= ms.meta.S * ms.meta.nx * ms.meta.nx * 8, big_gather
