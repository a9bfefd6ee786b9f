"""Experiment-grid sweep with Dolan-More profiles.

The reference protocol (benchmark/treeqp_performance_plot.m:24-42): models x
Nh in {20..50} x Nr in {1..4} x md in {2..4}, nMPC closed-loop steps per
cell, profiles over the solver set. This runner executes a (configurable
subset of) that grid with {tdunes, ipm} and emits the per-cell min solve
times + the performance-profile curves as JSON.

Run: python -m benchmarks.experiment_grid [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from benchmarks.closed_loop import closed_loop_mpc, performance_profile
from benchmarks import models as M
from treeqp_tpu.solvers.tdunes import TdunesOpts


def run_grid(grid, nsim=10):
    solvers = ["tdunes", "ipm"]
    rows = []
    times = []
    for family, kwargs in grid:
        model = getattr(M, family)(**kwargs)
        cell = []
        for s in solvers:
            try:
                log = closed_loop_mpc(model, s, nsim=nsim)
                t = float(np.min(log.cpu_time))
                ok = log.kkt_violations == 0
                cell.append(t if ok else np.inf)
                rows.append(dict(family=family, **kwargs, solver=s,
                                 min_time_s=t, mean_iters=float(log.iters.mean()),
                                 kkt_max=float(log.kkt.max()), ok=ok))
            except Exception as e:  # a solver failing a cell is a data point
                cell.append(np.inf)
                rows.append(dict(family=family, **kwargs, solver=s,
                                 error=str(e)[:100], ok=False))
        times.append(cell)
    taus, rho = performance_profile(np.asarray(times))
    return rows, dict(solvers=solvers, taus=taus.tolist(), rho=rho.tolist())


QUICK_GRID = [
    ("crane", dict(md=2, Nr=2, Nh=10)),
    ("crane", dict(md=3, Nr=2, Nh=10)),
    ("linear_chain", dict(nm=2, nu_count=1, md=2, Nr=2, Nh=10)),
    ("quadcopter", dict(md=2, Nr=2, Nh=10)),
]

FULL_GRID = [(fam, dict(md=md, Nr=Nr, Nh=Nh, **extra))
             for fam, extra in [("crane", {}), ("linear_chain", dict(nm=2, nu_count=1)),
                                ("quadcopter", {})]
             for Nh in (20, 30) for Nr in (1, 2) for md in (2, 3)]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--nsim", type=int, default=10)
    ap.add_argument("--device", choices=["cpu", "default"], default="cpu")
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    rows, profile = run_grid(QUICK_GRID if args.quick else FULL_GRID, args.nsim)
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"performance_profile": profile}))
