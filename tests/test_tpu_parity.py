"""CPU-vs-TPU numerics parity at the mixed-precision bench settings.

The reference CI matrix re-runs its suite under two independent BLAS
implementations (.travis.yml:1-15); the analog here is the same solve on
CPU-jax (f64/xla) and on the real TPU (f32 factorization + Pallas chain
kernels + df64 final phase) agreeing to the solver tolerance.

The suite process is pinned to CPU (conftest.py), so the TPU half runs in
a subprocess. Gated behind TREEQP_TPU_TESTS=1: it needs the remote-TPU
tunnel and a few minutes of remote compile, which the default CPU CI run
must not depend on.
"""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
sys.path.insert(0, %r)
import jax
import jax.numpy as jnp
from benchmarks.models import spring_mass_chain
from treeqp_tpu.solvers.tdunes import TdunesOpts
from treeqp_tpu.solvers.tdunes_multistage import (
    split_multistage, tdunes_ms_solve, merge_output)
from treeqp_tpu.core.kkt import max_kkt_residual

if jax.default_backend() not in ("tpu", "axon"):
    print(json.dumps({"skip": "no TPU backend"}))
    sys.exit(0)

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    qp, _ = spring_mass_chain(nm=2, md=3, Nr=2, Nh=10)
    ms = split_multistage(qp)
dev = jax.devices()[0]
ms = jax.device_put(ms, dev)
qp_dev = jax.device_put(qp, dev)
opts = TdunesOpts(stage_solver="clipping", tol=1e-8, max_iter=120,
                  factor_dtype="float32", refine_steps=1,
                  refine_safeguard=False, chain_backend="pallas",
                  reg_type="always", reg_value=1e-6,
                  f32_phase_tol=1e-4, df64_phase=True)

@jax.jit
def run():
    cro, cho, info = tdunes_ms_solve(ms, None, None, opts)
    out = merge_output(ms, cro, cho, info)
    return out, max_kkt_residual(qp_dev, out), info

out, kkt, info = jax.block_until_ready(run())
print(json.dumps({
    "x": [float(v) for v in out.x.reshape(-1)],
    "u": [float(v) for v in out.u.reshape(-1)],
    "kkt": float(kkt), "iter": int(info["iter"]),
    "status": int(info["status"])}))
""" % (REPO,)


@pytest.mark.skipif(os.environ.get("TREEQP_TPU_TESTS") != "1",
                    reason="TPU parity test needs TREEQP_TPU_TESTS=1 "
                           "(remote-TPU tunnel + minutes of remote compile)")
def test_tpu_matches_cpu_at_bench_settings():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    res = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, timeout=1200)
    data = None
    for line in res.stdout.splitlines():
        try:
            data = json.loads(line)
        except json.JSONDecodeError:
            continue
    assert data is not None, res.stdout + res.stderr
    if "skip" in data:
        pytest.skip(data["skip"])

    from benchmarks.models import spring_mass_chain
    from treeqp_tpu.solvers.tdunes import TdunesOpts
    from treeqp_tpu.solvers.tdunes_multistage import (
        split_multistage, tdunes_ms_solve, merge_output)
    from treeqp_tpu.core.kkt import max_kkt_residual

    qp, _ = spring_mass_chain(nm=2, md=3, Nr=2, Nh=10)
    ms = split_multistage(qp)
    ref = tdunes_ms_solve(ms, None, None,
                          TdunesOpts(stage_solver="clipping", tol=1e-8,
                                     max_iter=120))
    out_ref = merge_output(ms, *ref)

    assert data["status"] == 0
    assert data["kkt"] < 1e-8
    x_tpu = np.asarray(data["x"]).reshape(np.asarray(out_ref.x).shape)
    u_tpu = np.asarray(data["u"]).reshape(np.asarray(out_ref.u).shape)
    assert float(jnp.max(jnp.abs(x_tpu - out_ref.x))) < 1e-7
    assert float(jnp.max(jnp.abs(u_tpu - out_ref.u))) < 1e-7
