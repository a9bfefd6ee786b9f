"""Validate the KKT oracle + JSON loader against the golden datasets.

The six reference datasets (examples/random_qp_utils/data0*.json) embed the
YALMIP-computed optimum (xopt/uopt). They are unconstrained, so the dynamics
multipliers can be reconstructed bottom-up from stationarity:

    lam_c = Q_c x_c + q_c + S_c' u_c + sum_{k in kids(c)} A_k' lam_k

The oracle is validated by checking that the embedded solution + recovered
multipliers give ~0 KKT residual (stationarity at the root and in u are NOT
used in the reconstruction, so they are genuine checks).
"""

import glob

import numpy as np
import pytest

from treeqp_tpu import load_tree_qp_file, max_kkt_residual, TreeQPOut

DATASETS = sorted(glob.glob("/root/reference/examples/random_qp_utils/data0[0-5].json"))


def recover_lambda_unconstrained(qp, x, u):
    """Bottom-up multiplier recovery for unconstrained tree QPs (numpy)."""
    topo = qp.topo
    Q, S, q = np.asarray(qp.Q), np.asarray(qp.S), np.asarray(qp.q)
    A = np.asarray(qp.A)
    lam = np.zeros((topo.Nn, topo.nxm))
    for c in sorted(range(1, topo.Nn), key=lambda c: -topo.stage[c]):
        lam[c] = Q[c] @ x[c] + q[c] * topo.x_mask[c] + S[c].T @ u[c]
        for k in topo.kids[c]:
            lam[c] += A[k].T @ lam[k]
        lam[c] *= topo.x_mask[c]
    return lam


@pytest.mark.parametrize("path", DATASETS)
def test_golden_solution_has_zero_kkt(path):
    qp, extras = load_tree_qp_file(path)
    x, u = extras["xopt"], extras["uopt"]
    lam = recover_lambda_unconstrained(qp, x, u)
    out = TreeQPOut.zeros(qp.topo)
    out = out.replace(x=np.asarray(x), u=np.asarray(u), lam=lam)
    kkt = float(max_kkt_residual(qp, out))
    assert kkt < 1e-9, f"{path}: KKT residual {kkt:.2e} for golden solution"


@pytest.mark.parametrize("path", DATASETS)
def test_golden_solution_perturbed_detected(path):
    """The oracle must flag a perturbed solution (sanity of the oracle)."""
    qp, extras = load_tree_qp_file(path)
    x, u = extras["xopt"].copy(), extras["uopt"]
    lam = recover_lambda_unconstrained(qp, x, u)
    x[0, 0] += 1e-3
    out = TreeQPOut.zeros(qp.topo).replace(x=np.asarray(x), u=np.asarray(u), lam=lam)
    kkt = float(max_kkt_residual(qp, out))
    assert kkt > 1e-5
