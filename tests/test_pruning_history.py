"""Scenario-tree pruning + per-iteration history (PROFILE>=2 analog)."""

import numpy as np

from benchmarks.models import spring_mass_chain
from treeqp_tpu.utils.pruning import prune_scenario_tree
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve
from treeqp_tpu.core.kkt import max_kkt_residual


def test_prune_topology_and_solve():
    qp, _ = spring_mass_chain(nm=2, md=3, Nr=2, Nh=6)
    pruned, kept = prune_scenario_tree(qp, nscenmax=4)
    assert int(np.sum(pruned.topo.nkids == 0)) == 4
    assert pruned.topo.Nn < qp.topo.Nn
    assert pruned.topo.parent[0] == -1
    out = tdunes_solve(pruned, None,
                       TdunesOpts(stage_solver="clipping", tol=1e-9, max_iter=100))
    assert int(out.info["status"]) == 0
    assert float(max_kkt_residual(pruned, out)) < 1e-9


def test_prune_weight_renormalization():
    """Pruning to ALL scenarios must be the identity on the weights."""
    qp, _ = spring_mass_chain(nm=1, md=2, Nr=1, Nh=3)
    pruned, kept = prune_scenario_tree(qp, nscenmax=2)
    assert pruned.topo.Nn == qp.topo.Nn
    assert float(np.max(np.abs(np.asarray(pruned.Q) - np.asarray(qp.Q)))) < 1e-12


def test_prune_by_probability_cover():
    qp, _ = spring_mass_chain(nm=1, md=3, Nr=1, Nh=3)
    probs = np.array([0.6, 0.3, 0.1])
    pruned, _ = prune_scenario_tree(qp, leaf_probs=probs, pcov=0.85)
    assert int(np.sum(pruned.topo.nkids == 0)) == 2  # 0.6 + 0.3 covers


def test_history_recording():
    qp, _ = spring_mass_chain(nm=2, md=2, Nr=2, Nh=6)
    out = tdunes_solve(qp, None, TdunesOpts(stage_solver="clipping", tol=1e-9,
                                            max_iter=50, record_history=True))
    it = int(out.info["iter"])
    eh = np.asarray(out.info["err_hist"])
    lh = np.asarray(out.info["ls_hist"])
    assert np.all(np.isfinite(eh[:it]))
    assert np.all(np.isnan(eh[it + 1:]))
    assert np.all(lh[:it] >= 1)
    # residuals end below tolerance
    assert eh[it] < 1e-9 or eh[it - 1] < 1e-9 or float(out.info["error"]) < 1e-9
