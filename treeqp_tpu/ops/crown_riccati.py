"""Pallas TPU kernels for the crown tree-Riccati recursion of the
multistage IPM.

The crown (stages 0..Nr of a multistage tree, <= a few hundred nodes) runs
ipm._riccati_factor/_riccati_solve as per-depth scans with scattered
[Nc, ...] updates — a handful of launches per depth. These kernels fuse
the whole recursion into one launch using the crown_kernels trick:

* one crown NODE per lane ([.., NPc] arrays, NPc = padded node count);
* every level computes on ALL lanes and commits only its own lanes via
  static masks (tree depth is small, redundant work is free);
* the child->parent Schur/rhs accumulation is an MXU matmul against a
  static 0/1 matrix Padd[level][child_lane, parent_lane] — children of
  one parent sum automatically.

f32 only (the IPM's mixed-precision machinery supplies accuracy via the
exact-KKT refinement); boundary terms from the chains (Wsum0 / wsum0)
enter on the chain-root lanes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from treeqp_tpu.ops.chain_kernels import _interpret
from treeqp_tpu.ops.crown_kernels import _chol, _ltrsv, _uttrsv, _lane_mm, \
    _lane_mm_t
from treeqp_tpu.ops.riccati_kernels import _ltrsm, _uttrsm, _mm, _mv

__all__ = ["crown_ric_supported", "crown_ric_factor", "crown_ric_solve"]

_MAX_LANES = 512


@dataclasses.dataclass(frozen=True)
class _CrownRicSched:
    n_lev: int
    NPc: int
    masks: np.ndarray  # [n_lev, 1, NPc] commit masks (last level = root)
    Padd: np.ndarray   # [n_lev, NPc, NPc] child->parent accumulation
    root_mask: np.ndarray  # [1, NPc]


def _get_sched(prep) -> _CrownRicSched:
    sched = getattr(prep, "_crown_ric_sched", None)
    if sched is not None:
        return sched
    Nn = prep.topo.Nn
    NPc = max(128, -(-Nn // 128) * 128)
    n_lev = prep.n_stages
    masks = np.zeros((n_lev, 1, NPc), np.float32)
    Padd = np.zeros((n_lev, NPc, NPc), np.float32)
    par = prep.topo.parent_np
    for r in range(n_lev):
        idx = prep.bwd_idx[r]
        valid = prep.bwd_valid[r]
        for n, v in zip(idx, valid):
            if not v:
                continue
            masks[r, 0, n] = 1.0
            if n != 0:
                Padd[r, n, par[n]] = 1.0
    root_mask = np.zeros((1, NPc), np.float32)
    root_mask[0, 0] = 1.0
    sched = _CrownRicSched(n_lev=n_lev, NPc=NPc, masks=masks, Padd=Padd,
                           root_mask=root_mask)
    prep._crown_ric_sched = sched
    return sched


def crown_ric_supported(prep, nz) -> bool:
    return (prep.topo.Nn <= _MAX_LANES and prep.n_stages <= 8 and nz <= 16)


def _lanes(x, NPc):
    """[Nc, ...] -> [..., NPc]."""
    perm = tuple(range(1, x.ndim)) + (0,)
    y = jnp.transpose(x, perm)
    pad = NPc - y.shape[-1]
    if pad:
        cfg = [(0, 0)] * y.ndim
        cfg[-1] = (0, pad)
        y = jnp.pad(y, cfg)
    return y


def _unlanes(x, Nc):
    """[..., NPc] -> [Nc, ...]."""
    return jnp.transpose(x[..., :Nc], (x.ndim - 1,) + tuple(range(x.ndim - 1)))


def crown_ric_factor(hbar, AB, Wsum0, prep, nx, reg=0.0):
    """hbar [Nc, nz] f32, AB [Nc, nx, nz] f32, Wsum0 [Nc, nz, nz] f32
    (chain boundary). Returns lane-layout factors dict."""
    sched = _get_sched(prep)
    NPc, n_lev = sched.NPc, sched.n_lev
    Nc, nz = hbar.shape
    num = nz - nx
    hb_t = _lanes(hbar, NPc)
    lane_pad = (jnp.arange(NPc) >= Nc)[None, :]
    hb_t = hb_t + jnp.where(lane_pad, 1.0, 0.0)
    AB_t = _lanes(AB, NPc)
    W0_t = _lanes(Wsum0, NPc)
    Mm = jnp.asarray(sched.masks)
    Pm = jnp.asarray(sched.Padd)

    def kernel(hb_ref, AB_ref, W0_ref, M_ref, P_ref,
               P_out, Lu_out, K_out, Mxu_out):
        Wsum = W0_ref[...]
        rowi = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, 1), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, 1), 1)
        eye = jnp.where(rowi == coli, 1.0, 0.0)
        # identity init so uncommitted/padded lanes stay solvable
        Pv = jnp.broadcast_to(eye[:nx, :nx], (nx, nx, NPc)) \
            * jnp.ones((1, 1, NPc), hb_ref.dtype)
        Luv = jnp.broadcast_to(eye[:num, :num], (num, num, NPc)) \
            * jnp.ones((1, 1, NPc), hb_ref.dtype)
        Kv = jnp.zeros((num, nx, NPc), hb_ref.dtype)
        Mxuv = jnp.zeros((nx, num, NPc), hb_ref.dtype)
        hb = hb_ref[...]
        ABv = AB_ref[...]
        for r in range(n_lev):
            M = Wsum + eye * hb[None, :, :]
            Lu = _chol(M[nx:, nx:], num, reg)
            Kb = -_uttrsm(Lu, _ltrsm(Lu, M[nx:, :nx], num), num)
            Mxu = M[:nx, nx:]
            Pb = M[:nx, :nx] + _mm(Mxu, Kb, nx, num, nx)
            Pb = 0.5 * (Pb + Pb.swapaxes(0, 1))
            m = M_ref[r]  # [1, NPc]
            Pv = jnp.where(m[None], Pb, Pv)
            Luv = jnp.where(m[None], Lu, Luv)
            Kv = jnp.where(m[None], Kb, Kv)
            Mxuv = jnp.where(m[None], Mxu, Mxuv)
            tmp = _mm(Pb, ABv, nx, nx, nz)  # [nx, nz, NPc]
            Wc = jnp.stack(
                [sum(ABv[x, i:i + 1] * tmp[x] for x in range(nx))
                 for i in range(nz)], axis=0) * m[None]
            Wsum = Wsum + _lane_mm(Wc.reshape(nz * nz, NPc),
                                   P_ref[r]).reshape(nz, nz, NPc)
        P_out[...] = Pv
        Lu_out[...] = Luv
        K_out[...] = Kv
        Mxu_out[...] = Mxuv

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        P, Lu, K, Mxu = pl.pallas_call(
            kernel,
            in_specs=[spec((nz, NPc)), spec((nx, nz, NPc)),
                      spec((nz, nz, NPc)), spec(Mm.shape), spec(Pm.shape)],
            out_specs=(spec((nx, nx, NPc)), spec((num, num, NPc)),
                       spec((num, nx, NPc)), spec((nx, num, NPc))),
            out_shape=(jax.ShapeDtypeStruct((nx, nx, NPc), hbar.dtype),
                       jax.ShapeDtypeStruct((num, num, NPc), hbar.dtype),
                       jax.ShapeDtypeStruct((num, nx, NPc), hbar.dtype),
                       jax.ShapeDtypeStruct((nx, num, NPc), hbar.dtype)),
            interpret=_interpret(),
        )(hb_t, AB_t, W0_t, Mm, Pm)
    return dict(P=P, Luu=Lu, K=K, Mxu=Mxu, AB_t=AB_t,
                crown_shape=(Nc, nx, nz))


def crown_ric_solve(fact, rg, rb, wsum0, prep):
    """Solve with crown_ric_factor's lane factors. rg [Nc, nz], rb [Nc, nx],
    wsum0 [Nc, nz] (chain rhs boundary). Returns dz [Nc, nz], dlam [Nc, nx].
    """
    sched = _get_sched(prep)
    NPc, n_lev = sched.NPc, sched.n_lev
    Nc, nx, nz = fact["crown_shape"]
    num = nz - nx
    P, Lu, K, Mxu, AB = (fact["P"], fact["Luu"], fact["K"], fact["Mxu"],
                         fact["AB_t"])
    dt = P.dtype
    rg_t = _lanes(rg.astype(dt), NPc)
    rb_t = _lanes(rb.astype(dt), NPc)
    w0_t = _lanes(wsum0.astype(dt), NPc)
    Mm = jnp.asarray(sched.masks)
    Pm = jnp.asarray(sched.Padd)
    Rm = jnp.asarray(sched.root_mask)

    def kernel(P_ref, Lu_ref, K_ref, Mxu_ref, AB_ref, rg_ref, rb_ref,
               w0_ref, M_ref, Pa_ref, R_ref, dz_ref, dl_ref):
        Pv, Luv, Kv, Mxuv, ABv = (P_ref[...], Lu_ref[...], K_ref[...],
                                  Mxu_ref[...], AB_ref[...])
        rb = rb_ref[...]
        wsum = w0_ref[...]
        pv = jnp.zeros((nx, NPc), Pv.dtype)
        kv = jnp.zeros((num, NPc), Pv.dtype)
        # backward rhs sweep
        for r in range(n_lev):
            m = rg_ref[...] + wsum
            kb = -_uttrsv(Luv, _ltrsv(Luv, m[nx:], num), num)
            pb = m[:nx] + _mv(Mxuv, kb, nx, num)
            lm = M_ref[r]
            pv = jnp.where(lm, pb, pv)
            kv = jnp.where(lm, kb, kv)
            v = _mv(Pv, rb, nx, nx) + pb
            w = jnp.stack([sum(ABv[x, i] * v[x] for x in range(nx))
                           for i in range(nz)], axis=0) * lm
            wsum = wsum + _lane_mm(w, Pa_ref[r])
        # root: P0 dx0 = -p0 (all lanes; commit root lane)
        Lp = _chol(Pv, nx, 0.0)
        dx0 = -_uttrsv(Lp, _ltrsv(Lp, pv, nx), nx)
        dzv = jnp.zeros((nz, NPc), Pv.dtype)
        dlv = jnp.zeros((nx, NPc), Pv.dtype)
        rm = R_ref[...]
        du0 = _mv(Kv, dx0, num, nx) + kv
        dl0 = _mv(Pv, dx0, nx, nx) + pv
        dzv = jnp.where(rm, jnp.concatenate([dx0, du0], axis=0), dzv)
        dlv = jnp.where(rm, dl0, dlv)
        # forward substitution, root level excluded (already set); levels
        # nearest the root first
        for r in range(n_lev - 2, -1, -1):
            zp = _lane_mm_t(dzv.reshape(nz, NPc), Pa_ref[r])  # parent gather
            dx = jnp.stack([sum(ABv[x, zi] * zp[zi] for zi in range(nz))
                            for x in range(nx)], axis=0) + rb
            du = _mv(Kv, dx, num, nx) + kv
            dl = _mv(Pv, dx, nx, nx) + pv
            lm = M_ref[r]
            dzv = jnp.where(lm, jnp.concatenate([dx, du], axis=0), dzv)
            dlv = jnp.where(lm, dl, dlv)
        dz_ref[...] = dzv
        dl_ref[...] = dlv

    spec = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        dz, dl = pl.pallas_call(
            kernel,
            in_specs=[spec((nx, nx, NPc)), spec((num, num, NPc)),
                      spec((num, nx, NPc)), spec((nx, num, NPc)),
                      spec((nx, nz, NPc)), spec((nz, NPc)), spec((nx, NPc)),
                      spec((nz, NPc)), spec(Mm.shape), spec(Pm.shape),
                      spec(Rm.shape)],
            out_specs=(spec((nz, NPc)), spec((nx, NPc))),
            out_shape=(jax.ShapeDtypeStruct((nz, NPc), dt),
                       jax.ShapeDtypeStruct((nx, NPc), dt)),
            interpret=_interpret(),
        )(P, Lu, K, Mxu, AB, rg_t, rb_t, w0_t, Mm, Pm, Rm)
    return _unlanes(dz, Nc), _unlanes(dl, Nc)
