"""Soft constraints (HPIPM `ns` capability class, hpipm_tree.c:152-160).

The slack-variable reduction (core/soft.py) is exact, so:
* with huge penalties the soft solution reproduces the hard solution,
* with finite penalties the bound is violated exactly until the marginal
  penalty matches the constraint pressure (Zu*su + zu = mu at optimum),
* the recovered solution satisfies the original-layout KKT oracle when no
  soft bound is violated.
"""

import numpy as np
import jax.numpy as jnp

from benchmarks.models import linear_chain
from treeqp_tpu.core.kkt import max_kkt_residual
from treeqp_tpu.core.soft import soften_bounds, recover_soft
from treeqp_tpu.solvers.ipm import IpmOpts, ipm_solve


def _tight_problem():
    model = linear_chain(md=2, Nr=1, Nh=6, nm=2, nu_count=1)
    qp = model.qp
    # tighten one state's upper bound so it binds
    xmax = np.asarray(qp.xmax).copy()
    xmax[1:, 0] = 0.02
    return qp.replace(xmax=jnp.asarray(xmax, qp.dtype))


def test_stiff_penalty_matches_hard():
    qp = _tight_problem()
    hard = ipm_solve(qp, IpmOpts(tol=1e-10, max_iter=60))
    soft_idx = [[0] if n > 0 else [] for n in range(qp.topo.Nn)]
    qp_s, m = soften_bounds(qp, soft_idx, Zl=1e8, Zu=1e8)
    aug = ipm_solve(qp_s, IpmOpts(tol=1e-10, max_iter=60))
    out, slacks = recover_soft(aug, m)
    assert int(aug.info["status"]) == 0
    # softening gap ~ mu_hard/Z: with mu ~ 1e2 and Z = 1e8 that is ~1e-6
    assert float(jnp.max(jnp.abs(out.x - hard.x))) < 1e-4
    assert float(jnp.max(jnp.abs(out.u - hard.u))) < 1e-4
    # stiff slacks stay tiny
    smax = max((max(sl, su) for ns in slacks for (sl, su) in ns), default=0.0)
    assert smax < 1e-4


def test_finite_penalty_violates_at_marginal_price():
    qp = _tight_problem()
    hard = ipm_solve(qp, IpmOpts(tol=1e-10, max_iter=60))
    mu_hard = float(jnp.max(hard.mu_x))
    assert mu_hard > 1e-6  # the bound binds
    Zu = 10.0
    soft_idx = [[0] if n > 0 else [] for n in range(qp.topo.Nn)]
    qp_s, m = soften_bounds(qp, soft_idx, Zl=Zu, Zu=Zu)
    aug = ipm_solve(qp_s, IpmOpts(tol=1e-10, max_iter=60))
    assert int(aug.info["status"]) == 0
    out, slacks = recover_soft(aug, m)
    xmax0 = 0.02
    x = np.asarray(out.x)
    viol = np.maximum(x[1:, 0] - xmax0, 0.0)
    assert viol.max() > 1e-6  # softening is actually used
    # su equals the violation; stationarity in su: Zu*su + zu = mu_row
    for n in range(1, qp.topo.Nn):
        sl, su = slacks[n][0]
        assert abs(su - viol[n - 1]) < 1e-5  # up to the IPM interior slack


def test_inactive_soft_bound_keeps_kkt():
    """When the soft bound ends up inactive, the recovered original-layout
    solution passes the hard KKT oracle (slack = 0, multipliers clean)."""
    qp = _tight_problem()
    # loose bound: nothing binds, soft machinery must be a no-op
    xmax = np.asarray(qp.xmax).copy()
    xmax[1:, 0] = 10.0
    qp = qp.replace(xmax=jnp.asarray(xmax, qp.dtype))
    soft_idx = [[0] if n > 0 else [] for n in range(qp.topo.Nn)]
    qp_s, m = soften_bounds(qp, soft_idx, Zl=100.0, Zu=100.0)
    aug = ipm_solve(qp_s, IpmOpts(tol=1e-10, max_iter=60))
    out, slacks = recover_soft(aug, m)
    assert int(aug.info["status"]) == 0
    assert float(max_kkt_residual(qp, out)) < 1e-7
