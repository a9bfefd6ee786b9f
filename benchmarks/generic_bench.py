"""Generic-tree speed-path benchmark (VERDICT r2 #1 done-criterion).

Measures dual-Newton per-iteration cost on TPU for tree shapes the
multistage crown+chains solver cannot take — asymmetric (thesis-class)
and pruned (fault-tolerance-class) trees — against the multistage path on
a comparable-size tree, and against the generic solver WITHOUT the speed
path (plain f64 scans, the round-2 state).

Protocol: CHAIN_R cold solves of per-solve-perturbed instances inside one
jit (the bench.py chain discipline), per-solve status/error asserted.
Reported: ms per Newton iteration and ns per node per iteration (the
size-normalized comparison).

Axon constraint: ONE big program per process — each mode runs in a child
process (TREEQP_GENERIC_MODE), the parent only aggregates JSON lines.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_R = int(os.environ.get("TREEQP_GENERIC_CHAIN", "48"))
NREP = 3
TOL = 1e-8

MODES = ("ms", "pruned_speed", "pruned_plain", "asym_speed", "asym_plain")


def build(mode):
    import jax
    import numpy as np

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from benchmarks.models import spring_mass_chain
        from treeqp_tpu.utils.pruning import prune_scenario_tree

        if mode == "ms":
            # multistage reference point: 27-scenario spring-mass tree
            qp, _ = spring_mass_chain(nm=2, md=3, Nr=3, Nh=12)
            return qp, None
        if mode.startswith("pruned"):
            # fault-tolerance-class pruned tree: same family, pruned to 12
            # scenarios -> genuinely asymmetric topology
            qp_full, _ = spring_mass_chain(nm=2, md=3, Nr=3, Nh=12)
            rng = np.random.default_rng(0)
            qp, _ = prune_scenario_tree(
                qp_full, leaf_probs=rng.dirichlet(np.ones(27)), nscenmax=12)
            assert qp.topo.multistage_params is None
            return qp, None
        # thesis-example-class asymmetric tree, scaled to non-trivial dims
        from treeqp_tpu.core.qp_data import TreeQPIn
        from treeqp_tpu.utils.tree import TreeStructure
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        # root branches 3 ways; kids chain to different depths (2/5/9)
        parent = [-1, 0, 0, 0]
        tips = [1, 2, 3]
        for d, depth in zip((1, 2, 3), (2, 5, 9)):
            for _ in range(depth):
                parent.append(tips[d - 1])
                tips[d - 1] = len(parent) - 1
        Nn = len(parent)
        nx, nu = 8, 3
        topo = TreeStructure.from_parent(parent, [nx] * Nn, [nu] * Nn,
                                         [0] * Nn)
        Qd = 1.0 + rng.random((Nn, nx))
        Rd = 1.0 + rng.random((Nn, nu))
        qp = TreeQPIn.zeros(topo).replace(
            Q=jnp.asarray(np.einsum("ni,ij->nij", Qd, np.eye(nx))),
            R=jnp.asarray(np.einsum("ni,ij->nij", Rd, np.eye(nu))),
            q=jnp.asarray(rng.standard_normal((Nn, nx))),
            r=jnp.asarray(rng.standard_normal((Nn, nu))),
            A=jnp.asarray(rng.standard_normal((Nn, nx, nx)) * 0.3),
            B=jnp.asarray(rng.standard_normal((Nn, nx, nu)) * 0.3),
            b=jnp.asarray(rng.standard_normal((Nn, nx)) * 0.1),
            xmin=jnp.full((Nn, nx), -0.9), xmax=jnp.full((Nn, nx), 0.9),
            umin=jnp.full((Nn, nu), -0.7), umax=jnp.full((Nn, nu), 0.7),
        )
        qp = qp.replace(A=qp.A.at[0].set(0.0), B=qp.B.at[0].set(0.0),
                        b=qp.b.at[0].set(0.0))
        return qp, None


def speed_opts(on_tpu, plain=False):
    from treeqp_tpu.solvers.tdunes import TdunesOpts

    if plain:
        return TdunesOpts(stage_solver="clipping", tol=TOL, max_iter=120)
    return TdunesOpts(stage_solver="clipping", tol=TOL, max_iter=120,
                      factor_dtype="float32" if on_tpu else "same",
                      refine_steps=1 if on_tpu else 0,
                      refine_safeguard=False,
                      chain_backend="pallas" if on_tpu else "xla",
                      reg_type="always" if on_tpu else "on_the_fly",
                      reg_value=1e-6,
                      f32_phase_tol=1e-4 if on_tpu else 0.0,
                      df64_phase=False)


def mode_main(mode):
    import jax
    import jax.numpy as jnp
    import numpy as np

    qp, _ = build(mode)
    dev = jax.devices()[0]
    qp = jax.device_put(qp, dev)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    plain = mode.endswith("plain")

    if mode == "ms":
        from treeqp_tpu.solvers.tdunes_multistage import (
            split_multistage, tdunes_ms_solve)

        ms = split_multistage(qp)
        opts = dataclasses.replace(speed_opts(on_tpu), df64_phase=on_tpu)

        @jax.jit
        def run_chain(seed):
            def body(carry, k):
                fac = 1.0 + 0.02 * jnp.sin(seed + 1.7 * (k + 1.0))
                cr2 = ms.crown.replace(xmin=ms.crown.xmin.at[0].multiply(fac),
                                       xmax=ms.crown.xmax.at[0].multiply(fac))
                ms_k = dataclasses.replace(ms, crown=cr2)
                _, _, inf = tdunes_ms_solve(ms_k, None, None, opts)
                return carry, (inf["iter"], inf["error"], inf["status"])
            _, ys = jax.lax.scan(body, 0.0,
                                 jnp.arange(CHAIN_R, dtype=qp.dtype))
            return ys
    else:
        from treeqp_tpu.solvers.tdunes import tdunes_solve

        opts = speed_opts(on_tpu, plain=plain)

        @jax.jit
        def run_chain(seed):
            def body(carry, k):
                fac = 1.0 + 0.02 * jnp.sin(seed + 1.7 * (k + 1.0))
                qp_k = qp.replace(xmin=qp.xmin.at[0].multiply(fac),
                                  xmax=qp.xmax.at[0].multiply(fac))
                out = tdunes_solve(qp_k, None, opts)
                return carry, (out.info["iter"], out.info["error"],
                               out.info["status"])
            _, ys = jax.lax.scan(body, 0.0,
                                 jnp.arange(CHAIN_R, dtype=qp.dtype))
            return ys

    out = jax.block_until_ready(run_chain(np.float64(0)))
    times = []
    for k in range(NREP):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run_chain(np.float64(k + 1)))
        times.append(time.perf_counter() - t0)
    iters, errs, stats = (np.asarray(v) for v in out)
    assert np.all(stats == 0), stats
    assert np.all(errs < TOL), errs.max()
    t = min(times)
    tot = int(iters.sum())
    Nn = qp.topo.Nn
    print(json.dumps({
        "mode": mode, "nodes": Nn, "device": str(dev),
        "chained_solves": CHAIN_R, "total_iters": tot,
        "iters_per_solve_mean": round(float(iters.mean()), 2),
        "ms_per_iter": round(1e3 * t / tot, 4),
        "ns_per_node_iter": round(1e9 * t / tot / Nn, 1),
        "iters_per_sec": round(tot / t, 1),
        "max_error": float(errs.max()),
    }))


def main():
    results = []
    for mode in MODES:
        env = dict(os.environ, TREEQP_GENERIC_MODE=mode)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=2400)
        got = None
        for line in r.stdout.splitlines():
            try:
                got = json.loads(line)
            except json.JSONDecodeError:
                continue
        if got is None:
            sys.stderr.write(f"--- mode {mode} failed:\n{r.stdout}{r.stderr}\n")
            continue
        results.append(got)
        print(json.dumps(got), flush=True)
    # size-normalized comparison line
    by = {r["mode"]: r for r in results}
    if "ms" in by and "pruned_speed" in by:
        ratio = (by["pruned_speed"]["ns_per_node_iter"]
                 / by["ms"]["ns_per_node_iter"])
        print(json.dumps({"summary": "pruned_generic_vs_multistage",
                          "per_node_iter_cost_ratio": round(ratio, 2)}))


if __name__ == "__main__":
    if os.environ.get("TREEQP_GENERIC_MODE"):
        mode_main(os.environ["TREEQP_GENERIC_MODE"])
    else:
        main()
