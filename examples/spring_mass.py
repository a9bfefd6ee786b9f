"""All solver families on the reference's spring_mass robust-MPC instance.

The exact problem of examples/spring_mass.c (md=3, Nr=2, Nh=10, NX=4,
NU=1 from spring_mass_utils/data.c:13-17): tdunes, sdunes, the tree IPM
and the multistage crown+chains variants all solve it; trajectories are
cross-checked element-wise and every solution is certified by the KKT
oracle — the same cross-solver agreement check the reference example runs
(spring_mass.c:309-489).

Run from the repo root:  python examples/spring_mass.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import treeqp_tpu as tq  # noqa: E402
from benchmarks.models import spring_mass_qp  # noqa: E402
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve  # noqa: E402
from treeqp_tpu.solvers.tdunes_multistage import (  # noqa: E402
    split_multistage, tdunes_ms_solve, merge_output)
from treeqp_tpu.solvers.ipm import IpmOpts, ipm_solve  # noqa: E402
from treeqp_tpu.solvers.ipm_multistage import ipm_ms_solve  # noqa: E402
from treeqp_tpu.solvers.sdunes import (  # noqa: E402
    SdunesOpts, scenario_data, sdunes_solve, scenario_output,
    scenario_duals_from_tree)


def main():
    qp, _ = spring_mass_qp()
    results = {}

    out = tdunes_solve(qp, None, TdunesOpts(stage_solver="clipping",
                                            tol=1e-10, max_iter=100))
    results["tdunes"] = out

    ms = split_multistage(qp)
    cro, cho, info = tdunes_ms_solve(
        ms, None, None, TdunesOpts(stage_solver="clipping", tol=1e-10,
                                   max_iter=100))
    results["tdunes_ms"] = merge_output(ms, cro, cho, info)

    results["ipm"] = ipm_solve(qp, IpmOpts(tol=1e-10, max_iter=40))

    cro, cho, info = ipm_ms_solve(ms, IpmOpts(tol=1e-10, max_iter=40))
    results["ipm_ms"] = merge_output(ms, cro, cho, info)

    # sdunes COLD (round 5): the static-LM default (SdunesOpts.reg_type
    # "always") converges from the zero dual start on this instance — the
    # reference instead ships warm-start txt files (spring_mass.c:69-83).
    sqp = scenario_data(qp)
    sol, lam, mu, sinfo = sdunes_solve(sqp, None, None,
                                       SdunesOpts(tol=1e-8, max_iter=100))
    results["sdunes"] = scenario_output(sqp, sol, lam, mu, sinfo)

    # the warm-started variant (the reference's own usage pattern) must
    # still converge in a handful of iterations
    lam0, mu0 = scenario_duals_from_tree(sqp, results["ipm"].lam,
                                         results["ipm"])
    sol_w, lam_w, mu_w, sinfo_w = sdunes_solve(
        sqp, lam0, mu0, SdunesOpts(tol=1e-8, max_iter=100))
    results["sdunes_ws"] = scenario_output(sqp, sol_w, lam_w, mu_w, sinfo_w)

    ref = np.asarray(results["tdunes"].x)
    for name, out in results.items():
        kkt = float(tq.max_kkt_residual(qp, out))
        dx = float(np.max(np.abs(np.asarray(out.x) - ref)))
        it = int(out.info["iter"])
        st = int(out.info["status"])
        print(f"{name:10s} status={st} iter={it:3d} KKT={kkt:.2e} "
              f"max|x - x_tdunes|={dx:.2e}")
        assert st == 0 and kkt < 1e-8 and dx < 1e-7


if __name__ == "__main__":
    main()
