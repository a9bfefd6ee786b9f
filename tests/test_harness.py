"""Closed-loop harness, benchmark models, fault tolerance, CLI, utils."""

import json
import subprocess
import sys

import numpy as np
import pytest

from benchmarks.models import quadcopter, crane, linear_chain
from benchmarks.closed_loop import closed_loop_mpc, performance_profile
from benchmarks.fault_tolerance import run_fault_tolerant_mpc


def test_crane_closed_loop_tracks_reference():
    """Crane drives the load toward xref=0.2 with KKT <= 1e-6 per step
    (the reference closed-loop accuracy bar, treeqp_main.m:28)."""
    m = crane(md=2, Nr=2, Nh=8)
    log = closed_loop_mpc(m, "tdunes", nsim=10)
    assert log.kkt_violations == 0
    assert abs(log.x[-1][0] - 0.2) < 0.05
    assert np.all(np.abs(log.u) <= 0.5 + 1e-9)


@pytest.mark.slow
def test_quadcopter_closed_loop_stabilizes():
    m = quadcopter(md=2, Nr=2, Nh=8, seed=3)
    log = closed_loop_mpc(m, "tdunes", nsim=10)
    assert log.kkt_violations == 0
    # attitude error decreases
    assert np.linalg.norm(log.x[-1][:3]) < np.linalg.norm(log.x[0][:3])


def test_linear_chain_closed_loop_with_ipm():
    m = linear_chain(nm=2, nu_count=1, md=2, Nr=1, Nh=6)
    log = closed_loop_mpc(m, "ipm", nsim=6)
    assert log.kkt_violations == 0
    # velocities damped
    assert np.linalg.norm(log.x[-1][2:]) < np.linalg.norm(log.x[0][2:])


def test_performance_profile():
    t = np.array([[1.0, 2.0], [3.0, 1.5], [2.0, np.inf]])
    taus, rho = performance_profile(t)
    assert rho[-1][0] == 1.0  # solver 0 solves everything eventually
    assert rho[-1][1] < 1.0  # solver 1 has a failure
    assert np.all(np.diff(rho, axis=0) >= 0)


@pytest.mark.slow
def test_fault_tolerance_markov_switching():
    log = run_fault_tolerant_mpc(nsim=12, seed=1)
    assert log.kkt.max() < 1e-6
    assert len(set(log.configs.tolist())) >= 2  # chain actually switched
    assert np.isfinite(log.x).all()


def test_cli_roundtrip(tmp_path):
    from treeqp_tpu.interfaces.cli import run

    out = tmp_path / "qp_out.json"
    rc = run(["/root/reference/examples/random_qp_utils/data01.json",
              "-o", str(out)])
    assert rc == 0 or rc is None
    j = json.loads(out.read_text())
    assert j["info"]["kkt_tol"] < 1e-12
    assert j["info"]["num_iter"] <= 1
    assert len(j["nodes"]) == 6


@pytest.mark.slow
def test_cli_multistage_dispatch(tmp_path):
    """CLI auto-detects multistage+clipping instances and dispatches the
    crown+chains solvers (VERDICT: expose the ms engines externally),
    returning the identical JSON schema with the solver/interface time
    split (treeqp_info_t analog)."""
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.core.json_io import tree_qp_to_json
    from treeqp_tpu.interfaces.cli import run

    qp, _ = spring_mass_chain(nm=1, md=2, Nr=2, Nh=5)
    qp_path = tmp_path / "qp_in.json"
    qp_path.write_text(json.dumps(tree_qp_to_json(
        qp, options=dict(solver="tdunes", clipping=True, maxit=60))))
    out = tmp_path / "qp_out.json"
    rc = run([str(qp_path), "-o", str(out)])
    assert rc == 0 or rc is None
    j = json.loads(out.read_text())
    assert j["info"]["solver"] == "tdunes_ms"  # ms dispatch happened
    assert j["info"]["status"] == 0
    assert j["info"]["kkt_tol"] < 1e-8
    # solver-vs-interface split present and consistent
    assert j["info"]["solver_time"] > 0
    assert j["info"]["interface_time"] > 0
    assert j["info"]["cpu_time"] == pytest.approx(
        j["info"]["solver_time"] + j["info"]["interface_time"])
    assert len(j["nodes"]) == qp.topo.Nn  # identical schema
    assert len(j["edges"]) == qp.topo.Nn - 1

    # same instance, multistage disabled -> generic tdunes, same solution
    qp_path2 = tmp_path / "qp_in2.json"
    qp_path2.write_text(json.dumps(tree_qp_to_json(
        qp, options=dict(solver="tdunes", clipping=True, maxit=60,
                         multistage=False))))
    out2 = tmp_path / "qp_out2.json"
    run([str(qp_path2), "-o", str(out2)])
    j2 = json.loads(out2.read_text())
    assert j2["info"]["solver"] == "tdunes"
    x1 = np.concatenate([nd["x"] for nd in j["nodes"]])
    x2 = np.concatenate([nd["x"] for nd in j2["nodes"]])
    assert np.max(np.abs(x1 - x2)) < 1e-7

    # the IPM family dispatches too
    qp_path3 = tmp_path / "qp_in3.json"
    qp_path3.write_text(json.dumps(tree_qp_to_json(
        qp, options=dict(solver="hpipm", tol=1e-9))))
    out3 = tmp_path / "qp_out3.json"
    run([str(qp_path3), "-o", str(out3)])
    j3 = json.loads(out3.read_text())
    assert j3["info"]["solver"] == "hpipm_ms"
    assert j3["info"]["status"] == 0
    x3 = np.concatenate([nd["x"] for nd in j3["nodes"]])
    assert np.max(np.abs(x1 - x3)) < 1e-6


def test_profile_ms_phases():
    """PROFILE=3 per-phase split for the multistage solver (f32/df64
    phases, factorization, line-search eval)."""
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import split_multistage
    from treeqp_tpu.utils.profiling import profile_ms_phases

    qp, _ = spring_mass_chain(nm=1, md=2, Nr=1, Nh=4)
    ms = split_multistage(qp)
    prof = profile_ms_phases(
        ms, TdunesOpts(stage_solver="clipping", factor_dtype="float32",
                       f32_phase_tol=1e-3, refine_steps=1), nrep=2)
    for key in ("f32_phase", "f64_phase", "factorization",
                "line_search_eval"):
        assert prof[key] > 0, key
    assert prof["f32_phase_iters"] >= 0
    assert prof["f64_phase_iters"] >= 0


def test_timing_and_printing(tmp_path, capsys):
    from treeqp_tpu.utils.timing import min_time_over
    from treeqp_tpu.utils.printing import (
        tree_qp_in_print, tree_qp_out_print, tree_qp_out_write_txt,
        read_vector_txt)
    from treeqp_tpu import load_tree_qp_file
    from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve

    qp, _ = load_tree_qp_file("/root/reference/examples/random_qp_utils/data00.json")
    opts = TdunesOpts(stage_solver="dense", reg_type="none", max_iter=5)
    t, out = min_time_over(lambda: tdunes_solve(qp, None, opts), nrep=3,
                           check_deterministic=lambda o: int(o.info["iter"]))
    assert t > 0
    tree_qp_in_print(qp, nodes=[0, 1])
    tree_qp_out_print(qp.topo, out, nodes=[0])
    assert "node 0" in capsys.readouterr().out
    tree_qp_out_write_txt(qp.topo, out, str(tmp_path / "sol"))
    x = read_vector_txt(str(tmp_path / "sol_x.txt"))
    assert len(x) == sum(qp.topo.nx)


def test_ltv_batch_setters():
    """LTV flat-array setters (tree_qp_common.c:1953-2153 equivalents)
    reproduce from_node_edge_lists exactly."""
    import numpy as np
    import jax.numpy as jnp
    from treeqp_tpu import TreeQPIn, TreeStructure
    rng = np.random.default_rng(3)
    topo = TreeStructure.multistage(md=2, Nr=2, Nh=4, nx=3, nu=2)
    nodes, edges = [], {}
    A_fl, B_fl, b_fl, Qd_fl, Rd_fl, q_fl, r_fl = [], [], [], [], [], [], []
    xm_fl, xM_fl, um_fl, uM_fl = [], [], [], []
    for i in range(topo.Nn):
        m, n = topo.nx[i], topo.nu[i]
        Qd = rng.uniform(1, 2, m); Rd = rng.uniform(1, 2, n)
        q = rng.standard_normal(m); r = rng.standard_normal(n)
        xmin = -np.ones(m); xmax = np.ones(m)
        umin = -2 * np.ones(n); umax = 2 * np.ones(n)
        nodes.append(dict(Q=np.diag(Qd), R=np.diag(Rd), q=q, r=r,
                          xmin=xmin, xmax=xmax, umin=umin, umax=umax))
        Qd_fl += [Qd]; Rd_fl += [Rd]; q_fl += [q]; r_fl += [r]
        xm_fl += [xmin]; xM_fl += [xmax]; um_fl += [umin]; uM_fl += [umax]
    for c in range(1, topo.Nn):
        p = topo.parent[c]
        A = rng.standard_normal((topo.nx[c], topo.nx[p]))
        B = rng.standard_normal((topo.nx[c], topo.nu[p]))
        b = rng.standard_normal(topo.nx[c])
        edges[c] = dict(A=A, B=B, b=b)
        A_fl.append(A.T.ravel())  # column-major (reference convention)
        B_fl.append(B.T.ravel())
        b_fl.append(b)
    ref = TreeQPIn.from_node_edge_lists(topo, nodes, edges)
    got = (TreeQPIn.zeros(topo)
           .set_ltv_dynamics(np.concatenate(A_fl), np.concatenate(B_fl),
                             np.concatenate(b_fl))
           .set_ltv_objective_diag(np.concatenate(Qd_fl), np.concatenate(Rd_fl),
                                   np.concatenate(q_fl), np.concatenate(r_fl))
           .set_ltv_bounds(np.concatenate(xm_fl), np.concatenate(xM_fl),
                           np.concatenate(um_fl), np.concatenate(uM_fl)))
    for f in ("A", "B", "b", "Q", "R", "q", "r", "xmin", "xmax", "umin", "umax"):
        assert np.allclose(np.asarray(getattr(ref, f)),
                           np.asarray(getattr(got, f))), f


def test_cli_general_constraints_auto_qpgen(tmp_path):
    """CLI auto-selects the qpOASES-class stage solver (qpgen) for
    datasets with general C/D rows and solves them to the KKT bar (the
    reference links qpOASES for non-clipping tdunes)."""
    import json
    from benchmarks.models import spring_mass_chain, with_general_rows
    from treeqp_tpu.core.json_io import (tree_qp_to_json, load_tree_qp_json)
    from treeqp_tpu.interfaces.cli import run

    qp, _ = spring_mass_chain(nm=1, md=2, Nr=1, Nh=4)
    qp_g = with_general_rows(qp, cmax=0.5)
    j = tree_qp_to_json(qp_g, options=dict(solver="tdunes", maxit=80))
    inp = tmp_path / "qp_general.json"
    outp = tmp_path / "qp_general_out.json"
    inp.write_text(json.dumps(j))
    rc = run([str(inp), "-o", str(outp)])
    assert rc == 0
    res = json.loads(outp.read_text())
    assert res["info"]["status"] == 0
    assert res["info"]["kkt_tol"] < 1e-8


def test_cli_serve_persistent(tmp_path):
    """JSON-lines solve server (the C++ SolverSession backend): one child
    process, many solves, jit caches persisting across requests — the
    in-process embedding analog of treeqp_cpp_interface.cpp:130-430."""
    import subprocess
    import sys
    import time

    with open("/root/reference/examples/random_qp_utils/data01.json") as f:
        qp_json = json.load(f)
    p = subprocess.Popen(
        [sys.executable, "-m", "treeqp_tpu.interfaces.cli", "--serve"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        cwd="/root/repo")
    try:
        hello = json.loads(p.stdout.readline())
        assert hello == {"ready": True}
        req = json.dumps({"qp": qp_json}) + "\n"
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            p.stdin.write(req)
            p.stdin.flush()
            resp = json.loads(p.stdout.readline())
            walls.append(time.perf_counter() - t0)
            assert resp["info"]["status"] == 0
            assert resp["info"]["kkt_tol"] < 1e-12
        # warm solves must not re-spawn/re-compile (cold is ~seconds)
        assert min(walls[1:]) < 1.0
        # malformed request: server answers with an error, stays alive
        p.stdin.write('{"qp": {"nodes": []}}\n')
        p.stdin.flush()
        err = json.loads(p.stdout.readline())
        assert "error" in err
        p.stdin.write(req)
        p.stdin.flush()
        resp = json.loads(p.stdout.readline())
        assert resp["info"]["status"] == 0
        p.stdin.write('{"cmd": "quit"}\n')
        p.stdin.flush()
        assert p.wait(timeout=30) == 0
    finally:
        if p.poll() is None:
            p.kill()
