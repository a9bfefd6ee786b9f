"""Experiment-grid sweep with Dolan-More profiles.

The reference protocol (benchmark/treeqp_performance_plot.m:24-42): models x
Nh in {20..50} x Nr in {1..4} x md in {2..4}, nMPC closed-loop steps per
cell, profiles over the solver set {tdunes, sdunes, hpmpc(=ipm)}. Cells run
smallest-tree-first and append to a JSONL artifact incrementally; re-running
skips already-recorded cells (resume).

Run: python -m benchmarks.experiment_grid [--quick] [--nsim N] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from benchmarks.closed_loop import closed_loop_mpc, performance_profile
from benchmarks import models as M
from treeqp_tpu.utils.tree import number_of_nodes_multistage

SOLVERS = ["tdunes", "sdunes", "ipm"]


def cell_key(family, kwargs, solver):
    return json.dumps([family, sorted(kwargs.items()), solver])


def run_grid(grid, nsim=50, out_path=None, solvers=SOLVERS):
    done = {}
    if out_path and os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "solver" in r:
                    kw = {k: r[k] for k in ("md", "Nr", "Nh", "nm", "nu_count")
                          if k in r}
                    done[cell_key(r["family"], kw, r["solver"])] = r

    rows = []
    times = []
    fh = open(out_path, "a") if out_path else None
    for family, kwargs in grid:
        model = None
        cell = []
        for s in solvers:
            key = cell_key(family, kwargs, s)
            if key in done:
                r = done[key]
                cell.append(r["min_time_s"] if r.get("ok") else np.inf)
                rows.append(r)
                continue
            if model is None:
                model = getattr(M, family)(**kwargs)
            try:
                t0 = time.perf_counter()
                log = closed_loop_mpc(model, s, nsim=nsim)
                wall = time.perf_counter() - t0
                t = float(np.min(log.cpu_time))
                ok = log.kkt_violations == 0
                r = dict(family=family, **kwargs, solver=s, min_time_s=t,
                         mean_iters=float(log.iters.mean()),
                         kkt_max=float(log.kkt.max()), ok=ok,
                         nsim=nsim, wall_s=round(wall, 1))
            except Exception as e:  # a solver failing a cell is a data point
                r = dict(family=family, **kwargs, solver=s,
                         error=str(e)[:120], ok=False)
            cell.append(r.get("min_time_s", np.inf) if r.get("ok") else np.inf)
            rows.append(r)
            if fh:
                fh.write(json.dumps(r) + "\n")
                fh.flush()
            # free compiled executables: the XLA CPU client dies with
            # "LLVM ERROR: Unable to allocate section memory!" after a few
            # hundred distinct topologies' programs (see tests/conftest.py)
            jax.clear_caches()
        times.append(cell)
    taus, rho = performance_profile(np.asarray(times))
    profile = dict(solvers=list(solvers), taus=taus.tolist(), rho=rho.tolist())
    if fh:
        fh.write(json.dumps({"performance_profile": profile}) + "\n")
        fh.close()
    return rows, profile


QUICK_GRID = [
    ("crane", dict(md=2, Nr=2, Nh=10)),
    ("crane", dict(md=3, Nr=2, Nh=10)),
    ("linear_chain", dict(nm=2, nu_count=1, md=2, Nr=2, Nh=10)),
    ("quadcopter", dict(md=2, Nr=2, Nh=10)),
]

# full reference grid (treeqp_performance_plot.m:24-42), smallest trees first
_FAMS = [("crane", {}), ("linear_chain", dict(nm=2, nu_count=1)),
         ("quadcopter", {})]
FULL_GRID = sorted(
    [(fam, dict(md=md, Nr=Nr, Nh=Nh, **extra))
     for fam, extra in _FAMS
     for Nh in (20, 30, 40, 50) for Nr in (1, 2, 3, 4) for md in (2, 3, 4)],
    key=lambda c: number_of_nodes_multistage(c[1]["md"], c[1]["Nr"], c[1]["Nh"]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--nsim", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--device", choices=["cpu", "default"], default="cpu")
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    rows, profile = run_grid(QUICK_GRID if args.quick else FULL_GRID,
                             args.nsim, out_path=args.out)
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"performance_profile": profile}))
