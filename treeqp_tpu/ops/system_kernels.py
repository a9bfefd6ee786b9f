"""Fused whole-system Newton solve for the multistage dual Hessian.

One Pallas launch solves M dlam = r for the FULL crown+chains lambda system
(reference calculate_delta_lambda, dual_Newton_tree.c:641-775):

    chain backward RHS sweeps  ->  crown tree solve  ->  chain forward

The three sweeps were previously three pallas_calls (chain_solve_bwd,
crown_solve, chain_forward) with XLA glue between them: scenario->group
scatter of the chain Schur RHS, group->scenario gather of the crown
solution at the chain roots, plus HBM round-trips for the intermediate
backward solutions ``ys``. Fusing removes the launches and keeps ``ys``
in VMEM; the cross-layout scatters become MXU matmuls against static 0/1
scenario->lane matrices J[slot][scenario, group_lane] — the same trick the
crown kernel uses for its child->parent Schur scatter.

Layouts (all f32):
* chain factors  Lt/CUt [L, n, n, SP]   (chain_kernels kernel layout)
* crown factors  CholW [G, G, NP=128], CholUt [n, G, NP]  (crown_kernels)
* chain rhs      [S, L, n] -> kernel [L, n, SP];  crown rhs [NpG, G] ->
  lane layout [G, NP]

Applicability: multistage trees with uniform chain/crown state dim
(n == crown nxm, always true for split_multistage output) and a
crown_supported() topology. The solvers fall back to the three-call path
otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops.chain_kernels import _TS, _pad_s, _interpret
from treeqp_tpu.ops.crown_kernels import (
    _NP, _PARAMS, _get_sched, _ltrsv, _uttrsv, _lane_mm, _lane_mm_t,
    _pad_lanes)

__all__ = ["ms_sched", "system_supported", "system_solve"]


def ms_sched(prep, root_ids, S):
    """Static scenario<->crown-lane injection matrices for one multistage
    topology: J[k][s, g] = 1 iff chain root s sits at slot k of crown
    lambda-group g. Cached on the prep object."""
    key = ("_ms_sys_sched", tuple(root_ids), S)
    cached = getattr(prep, "_ms_sys_sched_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    rid = np.asarray(root_ids)
    g_of = np.asarray(prep.group_of_node)[rid]
    slot = np.asarray(prep.slot_of_node)[rid]
    K = prep.K
    NPg = _get_sched(prep).NPg
    SP = max(_TS, ((S + _TS - 1) // _TS) * _TS)
    J = np.zeros((K, SP, NPg), np.float32)
    for s in range(S):
        J[slot[s], s, g_of[s]] = 1.0
    prep._ms_sys_sched_cache = (key, J)
    return J


def system_supported(prep, meta, opts) -> bool:
    """Fused-kernel applicability on top of crown_supported: uniform
    chain/crown dims (n == nxm; split_multistage guarantees it)."""
    from treeqp_tpu.ops.crown_kernels import crown_supported
    return (crown_supported(prep, opts) and meta.nx == prep.nxm
            and prep.G == prep.K * prep.nxm)


def system_solve(Lt, CUt, CholW, CholUt, rg, rch, prep, root_ids):
    """Solve the full crown+chain Newton system with stored factors.

    Lt/CUt: chain factors [L, n, n, SP]; CholW/CholUt: crown lane-layout
    factors; rg [NpG, G] crown RHS (group layout, equilibrated); rch
    [S, L, n] chain RHS (equilibrated); root_ids = crown node ids of the
    chain roots (scenario order). Returns (dg [NpG, G], dch [S, L, n])
    in f32.
    """
    sched = _get_sched(prep)
    G, nxm, n_lev, K = sched.G, sched.nxm, sched.n_lev, sched.K
    L, n, _, SP = Lt.shape
    S = rch.shape[0]
    assert n == nxm and G == K * nxm
    J = jnp.asarray(ms_sched(prep, root_ids, S))
    Pm = jnp.asarray(sched.P)
    Mm = jnp.asarray(sched.masks)
    rt_ch = _pad_s(jnp.transpose(rch.astype(Lt.dtype), (1, 2, 0)), SP)
    NPg = sched.NPg
    rt_cr = _pad_lanes(jnp.transpose(rg.astype(Lt.dtype), (1, 0)), lanes=NPg)

    def kernel(Lc_ref, CU_ref, CW_ref, CUc_ref, P_ref, M_ref, J_ref,
               rch_ref, rcr_ref, dl_ref, dls_ref):
        # --- 1. chain backward RHS sweep (ys parked in dls_ref scratch)
        radd = jnp.zeros((n, SP), Lc_ref.dtype)
        for j in range(L - 1, -1, -1):
            y = _ltrsv(Lc_ref[j], rch_ref[j] - radd, n)
            dls_ref[j] = y
            CU = CU_ref[j]
            radd = sum(CU[:, k] * y[k:k + 1] for k in range(n))
        # --- 2. inject the chain Schur RHS into the crown groups
        rv = rcr_ref[...] - jnp.concatenate(
            [_lane_mm(radd, J_ref[k]) for k in range(K)], axis=0)
        # --- 3. crown tree solve (cf. crown_kernels.crown_solve)
        Lv = CW_ref[...]
        CUv = CUc_ref[...]
        ysv = jnp.zeros((G, NPg), rv.dtype)
        for r in range(n_lev):
            yc = _ltrsv(Lv, rv, G)
            m = M_ref[r]
            ysv = jnp.where(m, yc, ysv)
            ym = yc * m
            ra = sum(CUv[:, g] * ym[g:g + 1] for g in range(G))
            rv = rv - jnp.concatenate(
                [_lane_mm(ra, P_ref[s]) for s in range(K)], axis=0)
        y0 = _ltrsv(Lv, rv, G)
        ysv = jnp.where(M_ref[n_lev], y0, ysv)
        dlv = jnp.where(M_ref[n_lev], _uttrsv(Lv, ysv, G), 0.0)
        for r in range(n_lev - 1, -1, -1):
            dp = sum(_lane_mm_t(dlv[s * nxm:(s + 1) * nxm], P_ref[s])
                     for s in range(K))
            d = ysv - sum(CUv[i] * dp[i:i + 1] for i in range(nxm))
            dlc = _uttrsv(Lv, d, G)
            dlv = jnp.where(M_ref[r], dlc, dlv)
        dl_ref[...] = dlv
        # --- 4. crown solution at the chain roots -> scenario lanes
        dp = sum(_lane_mm_t(dlv[k * n:(k + 1) * n], J_ref[k])
                 for k in range(K))
        # --- 5. chain forward substitution
        for j in range(L):
            yj = dls_ref[j]
            CU = CU_ref[j]
            d = yj - sum(CU[k] * dp[k:k + 1] for k in range(n))
            dl = _uttrsv(Lc_ref[j], d, n)
            dls_ref[j] = dl
            dp = dl

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):  # Mosaic needs i32 index maps
        dl, dls = pl.pallas_call(
            kernel,
            in_specs=[spec(Lt.shape), spec(CUt.shape), spec(CholW.shape),
                      spec(CholUt.shape), spec(Pm.shape), spec(Mm.shape),
                      spec(J.shape), spec(rt_ch.shape), spec(rt_cr.shape)],
            out_specs=(spec((G, NPg)), spec((L, n, SP))),
            out_shape=(jax.ShapeDtypeStruct((G, NPg), Lt.dtype),
                       jax.ShapeDtypeStruct((L, n, SP), Lt.dtype)),
            interpret=_interpret(), compiler_params=_PARAMS,
        )(Lt, CUt, CholW, CholUt, Pm, Mm, J, rt_ch, rt_cr)
    dg = jnp.transpose(dl[:, :prep.NpG], (1, 0))
    dch = jnp.transpose(dls[..., :S], (2, 0, 1))
    return dg, dch
