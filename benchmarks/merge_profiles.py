"""Merge grid JSONL artifacts into one Dolan-More performance profile.

Usage: python -m benchmarks.merge_profiles out.json file1.jsonl file2.jsonl...
Rows are keyed by (family, dims); solvers are whatever appears. Cells a
solver failed (ok=false) count as inf (perf.m convention).
"""

import json
import sys

import numpy as np

from benchmarks.closed_loop import performance_profile


def load_rows(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "solver" in r:
                    rows.append(r)
    return rows


def merge(paths):
    rows = load_rows(paths)
    dims = ("md", "Nr", "Nh", "nm", "nu_count")
    keyf = lambda r: (r["family"],) + tuple(r.get(d) for d in dims)
    solvers = sorted({r["solver"] for r in rows})
    cells = {}
    for r in rows:
        t = r["min_time_s"] if r.get("ok") else np.inf
        ck = keyf(r)
        if r["solver"] in cells.get(ck, {}):
            print(f"warning: duplicate cell {ck} solver={r['solver']} — "
                  "keeping the later row", file=sys.stderr)
        cells.setdefault(ck, {})[r["solver"]] = t
    # a solver with NO row for a problem counts as a failure (inf) — same
    # convention as recorded ok=false rows (perf.m treats missing as inf)
    keys = sorted(cells, key=str)
    times = np.asarray([[cells[k].get(s, np.inf) for s in solvers]
                        for k in keys])
    taus, rho = performance_profile(times)
    return dict(solvers=solvers, n_problems=len(keys),
                taus=taus.tolist(), rho=rho.tolist(),
                solved_frac={s: float(np.mean(np.isfinite(times[:, i])))
                             for i, s in enumerate(solvers)})


if __name__ == "__main__":
    out = merge(sys.argv[2:])
    with open(sys.argv[1], "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("solvers", "n_problems",
                                          "solved_frac")}))
