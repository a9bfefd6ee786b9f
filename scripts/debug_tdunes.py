import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import time
import numpy as np
import jax

from treeqp_tpu import load_tree_qp_file, max_kkt_residual
from treeqp_tpu.solvers.tdunes import TdunesOpts, tdunes_solve

opts = TdunesOpts(stage_solver="dense", tol=1e-10, max_iter=10, reg_type="none")
for i in range(6):
    path = f"/root/reference/examples/random_qp_utils/data0{i}.json"
    qp, extras = load_tree_qp_file(path)
    t0 = time.time()
    out = tdunes_solve(qp, None, opts)
    out = jax.block_until_ready(out)
    t1 = time.time()
    kkt = float(max_kkt_residual(qp, out))
    errx = np.max(np.abs(np.asarray(out.x) - extras["xopt"]))
    erru = np.max(np.abs(np.asarray(out.u) - extras["uopt"]))
    print(f"data0{i}: iter={int(out.info['iter'])} status={int(out.info['status'])} "
          f"kkt={kkt:.2e} err_x={errx:.2e} err_u={erru:.2e} time={t1-t0:.2f}s")
