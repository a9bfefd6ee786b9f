import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import time
import numpy as np
import jax

from treeqp_tpu import max_kkt_residual
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve
from benchmarks.models import spring_mass_qp

qp, x0 = spring_mass_qp()
print("Nn", qp.topo.Nn, "Nh", qp.topo.Nh, "groups", qp.topo.num_groups, "Kmax", qp.topo.Kmax)

opts = TdunesOpts(stage_solver="clipping", tol=1e-10, max_iter=100)
t0 = time.time()
out = jax.block_until_ready(tdunes_solve(qp, None, opts))
t1 = time.time()
kkt = float(max_kkt_residual(qp, out))
print(f"iter={int(out.info['iter'])} status={int(out.info['status'])} "
      f"err={float(out.info['error']):.2e} kkt={kkt:.2e} compile+run={t1-t0:.1f}s")

# timed re-runs (NREP-min protocol, Makefile.rule:78-79)
times = []
for _ in range(5):
    t0 = time.time()
    jax.block_until_ready(tdunes_solve(qp, None, opts))
    times.append(time.time() - t0)
print(f"min solve time: {min(times)*1e3:.2f} ms")
print("u[0:3]:", np.asarray(out.u[:3, 0]))
print("x[1]:", np.asarray(out.x[1]))
