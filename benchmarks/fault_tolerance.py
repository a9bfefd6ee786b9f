"""Fault-tolerant closed-loop MPC (examples/fault_tolerance.c re-design).

Application-level fault tolerance per SURVEY.md 5.3(b): the plant's
actuator/spring configuration fails and recovers following a Markov chain
(sample_from_markov_chain, fault_tolerance.c:115-133); the controller keeps
one pre-built tree QP per configuration (:496-531) and switches online
(:642-647); if a solve's KKT residual violates the tolerance, it falls back
to the previous control input (:569-574).

Here the plant is the spring-mass chain with per-configuration spring
stiffness (degraded stiffness = failure mode); all configurations share one
topology, so a single jit specialization covers every controller — the
TPU answer to the reference's per-realization pre-allocated workspaces.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from benchmarks.models import spring_mass_chain, spring_chain_rhs, rk4_step, jnp_arr
from treeqp_tpu.core.kkt import max_kkt_residual
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve


@dataclasses.dataclass
class FaultToleranceLog:
    configs: np.ndarray  # plant configuration per step
    kkt: np.ndarray
    fallbacks: int  # steps where the previous control was applied
    x: np.ndarray
    u: np.ndarray


def sample_markov(P, state, rng):
    """One step of the configuration Markov chain (fault_tolerance.c:115-133)."""
    return int(rng.choice(len(P), p=P[state]))


def run_fault_tolerant_mpc(nsim=30, nm=2, md=2, Nr=2, Nh=8, seed=0,
                           kkt_tol=1e-6, opts=None):
    """Closed-loop MPC over a plant that switches spring configurations.

    Configurations: 0 = healthy (k=2.0), 1 = degraded (k=0.8). The
    controller knows the current configuration (fault detection assumed,
    as in the reference) and uses the matching robust tree QP.
    """
    rng = np.random.default_rng(seed)
    ks = [2.0, 0.8]
    # Markov transition matrix: healthy fails w.p. 0.15, recovers w.p. 0.3
    P = np.array([[0.85, 0.15], [0.30, 0.70]])

    # one pre-built QP per configuration (same topology -> one jit cache entry)
    qps = []
    for k in ks:
        qp, x0 = spring_mass_chain(nm=nm, md=md, Nr=Nr, Nh=Nh,
                                   k_nominal=k, k_spread=0.4 * k)
        qps.append(qp)
    nx, nu = qps[0].topo.nx[0], qps[0].topo.nu[0]

    opts = opts or TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=100)
    x = np.asarray(x0, dtype=np.float64)
    config = 0
    u_prev = np.zeros(nu)
    lam = None

    configs, kkts, xs, us = [], [], [x.copy()], []
    fallbacks = 0

    for t in range(nsim):
        qp = qps[config].set_x0(x)
        out = jax.block_until_ready(tdunes_solve(qp, lam, opts))
        kkt = float(max_kkt_residual(qp, out))
        if kkt <= kkt_tol and int(out.info["status"]) == 0:
            u0 = np.asarray(out.u[0, :nu])
            lam = out.lam
        else:
            # KKT violation -> reuse previous control (fault_tolerance.c:569-574)
            u0 = u_prev
            fallbacks += 1
            lam = None
        # plant evolves under the TRUE configuration's stiffness
        rhs = spring_chain_rhs(nm, ks[config])
        x = np.asarray(rk4_step(rhs, jnp_arr(x), jnp_arr(u0), 0.1, 5))[:nx]

        configs.append(config)
        kkts.append(kkt)
        xs.append(x.copy())
        us.append(u0)
        u_prev = u0
        config = sample_markov(P, config, rng)

    return FaultToleranceLog(configs=np.asarray(configs), kkt=np.asarray(kkts),
                             fallbacks=fallbacks, x=np.stack(xs), u=np.stack(us))
