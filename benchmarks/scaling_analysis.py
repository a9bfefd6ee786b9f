"""Scaling ANALYSIS for the scenario-sharded multistage solver
(VERDICT r2 #9 / BASELINE.md scaling row).

Real >=2-host slices are not available in this environment, so this
artifact does two things instead of pretending the virtual-CPU numbers
mean hardware scaling:

1. **Model** the sharded per-iteration execution exactly: per-device
   load balance (chain nodes per device vs the replicated crown) and the
   collective BYTES each Newton iteration moves over the mesh axis,
   counted from the actual array shapes GSPMD communicates:
     * chain -> crown root contributions cqr [S, nz]   (all-gather)
     * chain Schur complements schur0 [S, nx, nx]       (all-gather)
     * chain-root duals dlam[rid] (crown replicated -> no gather back)
     * termination norm / dual value / Armijo dot       (scalar psums)
   From bandwidth numbers (ICI ~4.5e10 B/s effective per v5e chip,
   DCN ~2.5e9 B/s per host) it derives a communication-time share and a
   predicted 2-host weak-scaling efficiency together with the Amdahl
   term from the replicated crown.

2. **Measure** the virtual-device sweep (benchmarks/scaling.py) and
   label it for what it is: N virtual devices multiplexing ONE shared
   CPU core — wall-clock "efficiency" there is shared-core-confounded
   and validates only that the collectives compile and execute.

Run: python -m benchmarks.scaling_analysis [--skip-virtual]
Writes benchmarks/results/scaling_round4.jsonl.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# quadcopter-class headline workload (bench.py)
MD, NR, NH, NM = 4, 4, 20, 4
ICI_BW = 4.5e10   # B/s effective all-gather bandwidth per v5e chip (ring)
DCN_BW = 2.5e9    # B/s per host across data-center network
# measured on one v5e (prof_chain max_iter probes, BENCH_NOTES round 3):
T_ITER_F32 = 0.436e-3   # coarse-phase Newton iteration, seconds
CROWN_SHARE = 0.35      # fraction of the iteration spent on the
                        # (replicated) crown + scalar glue; bounded above
                        # by the crown kernel + crown-eval fusion count
                        # share of the per-iteration launches


def model(n_devices: int, S: int, link: str = "ici"):
    """Per-iteration communication/load model for S scenarios on D devices."""
    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes_multistage import split_multistage
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        qp, _ = spring_mass_chain(nm=NM, md=MD, Nr=NR, Nh=NH)
        ms = split_multistage(qp)
    meta = ms.meta
    nx, nz, L = meta.nx, meta.nx + meta.nu, meta.L
    Nc = meta.crown_topo.Nn
    assert meta.S == S

    f32 = 4
    # collective bytes per Newton iteration over the scenario axis
    ag_cqr = S * nz * f32                 # chain root contributions
    ag_schur = S * nx * nx * f32          # chain Schur into the crown
    psums = 6 * 8                         # termination/dual/dot scalars
    bytes_per_iter = ag_cqr + ag_schur + psums
    bw = ICI_BW if link == "ici" else DCN_BW
    t_comm = bytes_per_iter / bw

    # load balance: chains split perfectly (identical shapes); the crown
    # is replicated (Amdahl term — every device redoes the crown work)
    chain_nodes = S * L
    t_chain = T_ITER_F32 * (1 - CROWN_SHARE)
    t_crown = T_ITER_F32 * CROWN_SHARE
    t_dev = t_chain / n_devices + t_crown + t_comm
    # weak scaling: S grows with D, so per-device chain work is constant
    # and the crown grows proportionally (crown nodes ~ S * md/(md-1))
    t_weak = t_chain + t_crown + t_comm  # both terms constant per device
    eff_weak = (t_chain + t_crown) / t_weak
    return dict(
        devices=n_devices, scenarios=S, link=link,
        chain_nodes=chain_nodes, crown_nodes=Nc,
        collective_bytes_per_iter=int(bytes_per_iter),
        comm_time_us=round(t_comm * 1e6, 2),
        iter_time_model_ms=round(t_dev * 1e3, 4),
        weak_efficiency_pred=round(eff_weak, 4),
        strong_speedup_pred=round(T_ITER_F32 / t_dev, 2))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-virtual", action="store_true")
    ap.add_argument("--out",
                    default="benchmarks/results/scaling_round4.jsonl")
    args = ap.parse_args(argv)

    rows = []
    # model: 1..8 chips on ICI (one v5e tray) and the 2-host DCN boundary
    for d in (1, 2, 4, 8):
        rows.append({"kind": "model", **model(d, MD**NR, "ici")})
    rows.append({"kind": "model", **model(2, MD**NR, "dcn"),
                 "note": "2 hosts over DCN (v5e pods ride ICI intra-pod; "
                         "this is the conservative cross-pod bound)"})
    # round-4 HLO audit (tests/test_hlo_audit.py, treeqp_tpu/parallel/
    # hlo_audit.py): the GSPMD auto-partitioned jit path as COMPILED moves
    # ~6.37 MB/iter on the headline tree — ~85x this model's minimal
    # count (chain-shaped gathers around lane-layout transposes,
    # full-width reduction workspaces, crown-shaped contribution
    # all-reduces), i.e. a ~32% comm share at ICI bandwidth. The model
    # row above is the MINIMAL boundary traffic the algorithm needs (and
    # what an explicit shard_map port of the iteration pays); the audited
    # row is what jit+GSPMD produces today. Weak-scaling predictions from
    # the model apply to the shard_map design point, not the audited jit
    # path.
    audited = 6_367_656
    rows.append({"kind": "hlo-audit", "devices": 8, "scenarios": MD**NR,
                 "link": "ici", "collective_bytes_per_iter": audited,
                 "comm_time_us": round(audited / ICI_BW * 1e6, 2),
                 "comm_share_of_iter": round(audited / ICI_BW / T_ITER_F32, 3),
                 "note": "GSPMD-auto jit path, compiled at 256 scenarios "
                         "on an 8-device mesh; see tests/test_hlo_audit.py"})
    # the explicit-SPMD shard_map path (parallel/shard_solver.py): the
    # solver inserts the boundary collectives itself (all-gathered chain
    # root contributions [S, nz] / Schur complements [S, nx, nx] + scalar
    # psums) — audited at ~0.42 MB/iter static (includes the f64 phase,
    # refinement gathers and the rarely-taken sequential line-search
    # branch), 15x below GSPMD-auto and within ~6x of this model's
    # single-phase minimal count. Weak-scaling predictions apply to THIS
    # path.
    audited_shmap = 420_996
    rows.append({"kind": "hlo-audit-shard-map", "devices": 8,
                 "scenarios": MD**NR, "link": "ici",
                 "collective_bytes_per_iter": audited_shmap,
                 "comm_time_us": round(audited_shmap / ICI_BW * 1e6, 2),
                 "comm_share_of_iter":
                     round(audited_shmap / ICI_BW / T_ITER_F32, 4),
                 "note": "explicit-SPMD shard_map path "
                         "(parallel/shard_solver.py), compiled at 256 "
                         "scenarios on an 8-device mesh; "
                         "tests/test_hlo_audit.py::"
                         "test_shard_map_path_reaches_model_bytes"})

    if not args.skip_virtual:
        # virtual-device measurement (labeled: shared-core-confounded)
        import jax
        if jax.default_backend() == "cpu" and len(jax.devices()) >= 8:
            from benchmarks.scaling import scaling_sweep
            for r in scaling_sweep(devices=(1, 2, 4, 8)):
                r = dict(r)
                r["kind"] = "virtual-cpu-measured"
                r["note"] = ("N virtual devices multiplex ONE shared CPU "
                             "core: wall-clock efficiency is shared-core-"
                             "confounded; this validates collective "
                             "structure + load balance, NOT hardware "
                             "scaling")
                rows.append(r)
        else:
            rows.append({"kind": "virtual-cpu-measured", "skipped":
                         "run with XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=8 JAX_PLATFORMS=cpu"})

    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
