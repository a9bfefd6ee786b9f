"""boxqp stage solver (qpOASES capability class: dense weights + bounds,
with the free-set elimination matrix P feeding the dual Hessian)."""

import jax.numpy as jnp
import numpy as np

from treeqp_tpu import TreeQPIn, TreeStructure, load_tree_qp_file, max_kkt_residual
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve
from treeqp_tpu.solvers.ipm import IpmOpts, ipm_solve
from benchmarks.models import spring_mass_qp


def test_boxqp_on_golden_dataset():
    qp, extras = load_tree_qp_file(
        "/root/reference/examples/random_qp_utils/data03.json")
    out = tdunes_solve(qp, None, TdunesOpts(stage_solver="boxqp", tol=1e-10,
                                            max_iter=10))
    assert int(out.info["iter"]) <= 1
    assert float(max_kkt_residual(qp, out)) < 1e-12
    assert float(jnp.max(jnp.abs(out.x - extras["xopt"]))) < 1e-12


def test_boxqp_matches_clipping_on_spring_mass():
    qp, _ = spring_mass_qp()
    o1 = tdunes_solve(qp, None, TdunesOpts(stage_solver="clipping", tol=1e-9,
                                           max_iter=100))
    o2 = tdunes_solve(qp, None, TdunesOpts(stage_solver="boxqp", tol=1e-9,
                                           max_iter=100))
    assert int(o2.info["status"]) == 0
    assert float(max_kkt_residual(qp, o2)) < 1e-9
    assert float(jnp.max(jnp.abs(o1.x - o2.x))) < 1e-9
    assert float(jnp.max(jnp.abs(o1.mu_u - o2.mu_u))) < 1e-8


def _dense_bounded_qp():
    rng = np.random.default_rng(0)
    topo = TreeStructure.multistage(md=2, Nr=2, Nh=4, nx=3, nu=2)
    nodes = []
    for i in range(topo.Nn):
        nx, nu = topo.nx[i], topo.nu[i]
        M = rng.standard_normal((nx, nx))
        nd = dict(Q=M @ M.T + 2 * np.eye(nx), q=rng.standard_normal(nx),
                  xmin=-0.4 * np.ones(nx), xmax=0.4 * np.ones(nx))
        if nu:
            N = rng.standard_normal((nu, nu))
            nd.update(R=N @ N.T + 2 * np.eye(nu), r=rng.standard_normal(nu),
                      S=0.1 * rng.standard_normal((nu, nx)),
                      umin=-0.3 * np.ones(nu), umax=0.3 * np.ones(nu))
        nodes.append(nd)
    edges = {c: dict(A=0.5 * rng.standard_normal((3, 3)),
                     B=0.5 * rng.standard_normal((3, topo.nu[topo.parent[c]])),
                     b=0.1 * rng.standard_normal(3))
             for c in range(1, topo.Nn)}
    return TreeQPIn.from_node_edge_lists(topo, nodes, edges)


def test_boxqp_dense_weights_with_bounds_agrees_with_ipm():
    """Dense Q/R/S + active bounds — beyond clipping's applicability
    (stage_qp_clipping_is_applicable guards). Cross-solver agreement."""
    qp = _dense_bounded_qp()
    out = tdunes_solve(qp, None, TdunesOpts(stage_solver="boxqp", tol=1e-9,
                                            max_iter=100))
    assert int(out.info["status"]) == 0
    assert float(max_kkt_residual(qp, out)) < 1e-9
    ref = ipm_solve(qp, IpmOpts(tol=1e-10, max_iter=40))
    assert float(jnp.max(jnp.abs(out.x - ref.x))) < 1e-7
    assert float(jnp.max(jnp.abs(out.u - ref.u))) < 1e-7
