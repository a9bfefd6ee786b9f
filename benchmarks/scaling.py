"""Weak/strong scaling measurement for the scenario-sharded solver.

Protocol per BASELINE.md: iterations/s at 1 chip / N devices, weak-scaling
efficiency = T(1 device, S0 scenarios) / T(N devices, N*S0 scenarios).
On a real multi-chip slice the mesh axis rides ICI; in this container it can
be exercised on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu),
which validates the collective structure and load balance, not absolute
hardware scaling.

Run: python -m benchmarks.scaling [--weak-base 32] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from treeqp_tpu.solvers.tdunes import TdunesOpts
from treeqp_tpu.solvers.tdunes_multistage import split_multistage, tdunes_ms_solve
from treeqp_tpu.parallel.sharding import scenario_mesh, shard_multistage
from benchmarks.models import spring_mass_chain


def time_solve(ms, opts, nrep=3):
    out = jax.block_until_ready(tdunes_ms_solve(ms, None, None, opts))
    n_iter = int(out[2]["iter"])
    ts = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        jax.block_until_ready(tdunes_ms_solve(ms, None, None, opts))
        ts.append(time.perf_counter() - t0)
    return min(ts), n_iter


def scaling_sweep(devices=(1, 2, 4, 8), weak_base=32, nm=4, Nh=20, nrep=3,
                  opts=None):
    """Returns per-device-count results for weak scaling (S = base * n)."""
    opts = opts or TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=60)
    all_devs = jax.devices()
    results = []
    for n in devices:
        if n > len(all_devs):
            continue
        S = weak_base * n
        # Grow scenarios by DEEPENING the tree (md=2, Nr=log2 S), never by
        # widening one node: a dual-Newton crown block is dense over all
        # kids of a parent (dim sum-of-kid-nx, dual_Newton_tree.h:91-150),
        # so an S-ary root would cost O(S^3) replicated Cholesky and
        # measure the wrong thing entirely.
        Nr = int(np.round(np.log2(S)))
        assert 2 ** Nr == S, "weak_base * n must be a power of two"
        qp, _ = spring_mass_chain(nm=nm, md=2, Nr=Nr, Nh=max(Nh, Nr + 1))
        ms = split_multistage(qp)
        mesh = scenario_mesh(all_devs[:n])
        ms = shard_multistage(ms, mesh)
        t, iters = time_solve(ms, opts, nrep)
        results.append(dict(devices=n, scenarios=S, time_s=t, iters=iters,
                            iters_per_sec=iters / t))
    if results:
        t1 = results[0]["time_s"]
        for r in results:
            r["weak_efficiency"] = t1 / r["time_s"]
            # On VIRTUAL devices all shards timeshare one CPU, so the weak
            # ideal is time growing linearly with device count (total work
            # x N, fixed compute). The interpretable number is the factor
            # ABOVE that ideal: replicated-crown work + collective
            # overhead. Real-slice weak efficiency ~ 1/overhead.
            r["overhead_vs_shared_core_ideal"] = (
                r["time_s"] / (r["devices"] * t1))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--weak-base", type=int, default=32)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--device", choices=["cpu", "default"], default="cpu")
    args = ap.parse_args()
    if args.device == "cpu":
        # the sitecustomize-pinned remote backend ignores JAX_PLATFORMS;
        # virtual-device runs must force the CPU backend explicitly
        jax.config.update("jax_platforms", "cpu")
    for r in scaling_sweep(tuple(args.devices), args.weak_base):
        print(json.dumps(r))
