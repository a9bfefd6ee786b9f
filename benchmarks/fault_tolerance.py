"""Fault-tolerant closed-loop MPC (examples/fault_tolerance.c re-design).

Application-level fault tolerance per SURVEY.md 5.3(b), at the
reference example's full fidelity (fault_tolerance.c, 775 LoC):

* the plant's spring configuration fails/recovers following a Markov
  chain over >=4 configurations (sample_from_markov_chain,
  fault_tolerance.c:115-133);
* the controller keeps one PRE-BUILT PRUNED tree QP per configuration
  (:496-531): the scenario tree's branch probabilities depend on the
  configuration's failure intensity, and `prune_scenario_tree`
  (pcov/nscenmax, :57-62, :93-95) keeps only the most likely scenarios —
  so different configurations genuinely get DIFFERENT topologies;
* the controller switches trees online as the detected configuration
  changes (:642-647). Each distinct topology is its own jit
  specialization (static tree metadata keys the jit cache — the TPU
  answer to the reference's per-realization pre-allocated workspaces);
  the per-topology compile happens once, at controller build time or on
  first use, and every later visit to that configuration reuses it;
* if a solve's KKT residual violates the tolerance, the previous control
  input is applied instead (:569-574).

Run as a module to write benchmarks/results/fault_tolerance_r4.jsonl:
    python -m benchmarks.fault_tolerance
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import numpy as np

from benchmarks.models import (spring_mass_chain, spring_chain_rhs, rk4_step,
                               jnp_arr)
from treeqp_tpu.core.kkt import max_kkt_residual
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve
from treeqp_tpu.utils.pruning import prune_scenario_tree


@dataclasses.dataclass
class FaultToleranceLog:
    configs: np.ndarray   # plant configuration per step
    kkt: np.ndarray
    fallbacks: int        # steps where the previous control was applied
    x: np.ndarray
    u: np.ndarray
    topo_nodes: np.ndarray   # nodes of the controller tree used per step
    n_topologies: int        # distinct controller topologies
    solve_ms: np.ndarray     # per-step solve wall time (compile included
                             # on each topology's first visit)
    iters: np.ndarray


def sample_markov(P, state, rng):
    """One step of the configuration Markov chain (fault_tolerance.c:115-133)."""
    return int(rng.choice(len(P), p=P[state]))


def _leaf_probs(topo, branch_probs):
    """Per-leaf probability of a multistage tree: product of the branch
    probabilities along each leaf's root path (realization probability,
    fault_tolerance.c:93-95)."""
    md = len(branch_probs)
    probs = np.ones(topo.Nn)
    # kid index within the parent = branch realization id
    kid_rank = np.zeros(topo.Nn, dtype=int)
    seen = {}
    for n in range(1, topo.Nn):
        p = int(topo.parent[n])
        kid_rank[n] = seen.get(p, 0)
        seen[p] = kid_rank[n] + 1
        if topo.nkids[p] == md:  # branching stage
            probs[n] = probs[p] * branch_probs[kid_rank[n]]
        else:
            probs[n] = probs[p]
    leaves = np.nonzero(topo.nkids == 0)[0]
    lp = probs[leaves]
    return lp / lp.sum()


def build_controllers(configs, nm, md, Nr, Nh, nscenmax, pcov):
    """One pruned tree QP per configuration.

    ``configs``: list of (k_nominal, fail_intensity). The branch
    probabilities tilt toward degraded realizations as fail_intensity
    grows, so pcov keeps different scenario sets — and therefore
    different topologies — per configuration."""
    controllers = []
    for k_nom, intensity in configs:
        qp, x0 = spring_mass_chain(nm=nm, md=md, Nr=Nr, Nh=Nh,
                                   k_nominal=k_nom, k_spread=0.4 * k_nom)
        # branch probabilities over the md realizations: realization 0 is
        # nominal; higher realizations are increasingly degraded and get
        # probability ~ intensity
        w = np.array([1.0] + [intensity / (j + 1) for j in range(1, md)])
        bp = w / w.sum()
        lp = _leaf_probs(qp.topo, bp)
        pruned, kept = prune_scenario_tree(qp, leaf_probs=lp,
                                           nscenmax=nscenmax, pcov=pcov)
        controllers.append(dict(qp=pruned, kept=kept, x0=np.asarray(x0),
                                nodes=pruned.topo.Nn,
                                scenarios=int(np.sum(pruned.topo.nkids == 0))))
    return controllers


def run_fault_tolerant_mpc(nsim=30, nm=2, md=3, Nr=2, Nh=8, seed=0,
                           kkt_tol=1e-6, opts=None, nscenmax=None,
                           pcov=0.85):
    """Closed-loop MPC over a plant that switches spring configurations.

    Configurations (>=4, reference grid :57-62): spring stiffness degrades
    in steps; the controller knows the current configuration (fault
    detection assumed, as in the reference) and uses its PRUNED tree QP —
    per-configuration topology, switched online.
    """
    rng = np.random.default_rng(seed)
    # (k_nominal, failure intensity): healthy, light, degraded, severe
    configs = [(2.0, 0.3), (1.5, 0.6), (1.0, 1.0), (0.6, 1.6)]
    ks = [c[0] for c in configs]
    # Markov chain: mostly stay, degrade one step w.p. 0.15, recover one
    # step w.p. 0.25 (fault_tolerance.c markov chain role)
    n_cfg = len(configs)
    P = np.zeros((n_cfg, n_cfg))
    for i in range(n_cfg):
        P[i, i] = 1.0
        if i + 1 < n_cfg:
            P[i, i + 1] = 0.15
            P[i, i] -= 0.15
        if i > 0:
            P[i, i - 1] = 0.25
            P[i, i] -= 0.25

    controllers = build_controllers(configs, nm, md, Nr, Nh,
                                    nscenmax, pcov)
    topos = {}
    for c in controllers:
        key = (c["qp"].topo.Nn, tuple(int(v) for v in c["qp"].topo.parent))
        topos.setdefault(key, len(topos))
    nx, nu = controllers[0]["qp"].topo.nx[0], controllers[0]["qp"].topo.nu[0]

    opts = opts or TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=100)
    x = controllers[0]["x0"].astype(np.float64)
    config = 0
    u_prev = np.zeros(nu)
    lam = None
    prev_topo_key = None

    configs_l, kkts, xs, us = [], [], [x.copy()], []
    topo_nodes, solve_ms, iters = [], [], []
    fallbacks = 0

    for t in range(nsim):
        ctl = controllers[config]
        qp = ctl["qp"].set_x0(x)
        topo_key = (qp.topo.Nn, tuple(int(v) for v in qp.topo.parent))
        if topo_key != prev_topo_key:
            # topology switch: multiplier warm start does not transfer
            # across different trees (the reference re-initializes the
            # per-realization workspace likewise)
            lam = None
        t0 = time.perf_counter()
        out = jax.block_until_ready(tdunes_solve(qp, lam, opts))
        dt_ms = (time.perf_counter() - t0) * 1e3
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

        configs_l.append(config)
        kkts.append(kkt)
        xs.append(x.copy())
        us.append(u0)
        topo_nodes.append(qp.topo.Nn)
        solve_ms.append(dt_ms)
        iters.append(int(out.info["iter"]))
        u_prev = u0
        prev_topo_key = topo_key
        config = sample_markov(P, config, rng)

    return FaultToleranceLog(
        configs=np.asarray(configs_l), kkt=np.asarray(kkts),
        fallbacks=fallbacks, x=np.stack(xs), u=np.stack(us),
        topo_nodes=np.asarray(topo_nodes), n_topologies=len(topos),
        solve_ms=np.asarray(solve_ms), iters=np.asarray(iters))


def main():
    # the closed loop is eager host-driven control with many small solves:
    # run on CPU (on the remote-TPU backend every eager op is a tunnel RPC)
    jax.config.update("jax_platforms", "cpu")
    log = run_fault_tolerant_mpc(nsim=100, seed=3)
    n_cfg_visited = len(set(log.configs.tolist()))
    n_topo_used = len(set(log.topo_nodes.tolist()))
    # per-topology compile happens on first visit; steady-state cost is
    # the warm per-topology solve
    warm = []
    seen = set()
    for nodes, ms in zip(log.topo_nodes, log.solve_ms):
        if nodes in seen:
            warm.append(ms)
        seen.add(nodes)
    summary = dict(
        nsim=len(log.configs), configs_visited=n_cfg_visited,
        distinct_topologies_built=log.n_topologies,
        distinct_topologies_used=n_topo_used,
        topology_switches=int(np.sum(np.diff(log.topo_nodes) != 0)),
        fallbacks=log.fallbacks,
        max_kkt=float(log.kkt.max()),
        warm_solve_ms_median=float(np.median(warm)) if warm else None,
        cold_solve_ms_max=float(log.solve_ms.max()),
        state_norm_final=float(np.linalg.norm(log.x[-1])),
    )
    rows = [dict(kind="summary", **summary)]
    for t in range(len(log.configs)):
        rows.append(dict(kind="step", t=t, config=int(log.configs[t]),
                         nodes=int(log.topo_nodes[t]),
                         kkt=float(log.kkt[t]),
                         solve_ms=round(float(log.solve_ms[t]), 2),
                         iters=int(log.iters[t])))
    out = "benchmarks/results/fault_tolerance_r4.jsonl"
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(json.dumps(summary))
    assert n_cfg_visited >= 3, "markov chain barely moved; raise nsim"
    assert n_topo_used >= 2, "pruning produced identical topologies"
    assert log.kkt.max() < 1e-6 or log.fallbacks > 0


if __name__ == "__main__":
    main()
