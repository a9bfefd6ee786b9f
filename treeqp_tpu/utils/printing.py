"""Pretty printers and txt I/O (reference treeqp/utils/print.{h,c} and
utils.{h,c}: tree_qp_in_print, tree_qp_out_print, tree_qp_out_write_to_txt,
read/write_double_vector_from/to_txt)."""

from __future__ import annotations

import numpy as np

__all__ = ["tree_qp_in_print", "tree_qp_out_print", "write_vector_txt",
           "read_vector_txt", "tree_qp_out_write_txt"]


def _fmt(a):
    return np.array2string(np.asarray(a), precision=6, suppress_small=True)


def tree_qp_in_print(qp, nodes=None, file=None):
    """Per-node dump of the QP data (print.c tree_qp_in_print)."""
    topo = qp.topo
    nodes = range(topo.Nn) if nodes is None else nodes
    p = lambda *a: print(*a, file=file)
    p(f"tree QP: Nn={topo.Nn} Nh={topo.Nh} dims nx={topo.nx[:8]}... "
      f"nu={topo.nu[:8]}... nc={topo.nc[:8]}...")
    for i in nodes:
        nx, nu, nc = topo.nx[i], topo.nu[i], topo.nc[i]
        p(f"--- node {i} (parent {topo.parent[i]}, stage {topo.stage[i]}, "
          f"nx={nx} nu={nu} nc={nc})")
        p("Q =", _fmt(qp.Q[i, :nx, :nx]))
        if nu:
            p("R =", _fmt(qp.R[i, :nu, :nu]))
            p("S =", _fmt(qp.S[i, :nu, :nx]))
        p("q =", _fmt(qp.q[i, :nx]))
        if nu:
            p("r =", _fmt(qp.r[i, :nu]))
        p("xmin =", _fmt(qp.xmin[i, :nx]), " xmax =", _fmt(qp.xmax[i, :nx]))
        if nu:
            p("umin =", _fmt(qp.umin[i, :nu]), " umax =", _fmt(qp.umax[i, :nu]))
        if nc:
            p("C =", _fmt(qp.C[i, :nc, :nx]), " D =", _fmt(qp.D[i, :nc, :nu]))
            p("dmin =", _fmt(qp.dmin[i, :nc]), " dmax =", _fmt(qp.dmax[i, :nc]))
        if i > 0:
            pnx = topo.nx[topo.parent[i]]
            pnu = topo.nu[topo.parent[i]]
            p("A =", _fmt(qp.A[i, :nx, :pnx]))
            p("B =", _fmt(qp.B[i, :nx, :pnu]))
            p("b =", _fmt(qp.b[i, :nx]))


def tree_qp_out_print(topo, out, nodes=None, file=None):
    """Per-node solution dump (print.c tree_qp_out_print)."""
    nodes = range(topo.Nn) if nodes is None else nodes
    p = lambda *a: print(*a, file=file)
    info = {k: (int(v) if hasattr(v, "astype") and v.ndim == 0 and
                v.dtype.kind == "i" else v) for k, v in out.info.items()}
    p(f"solution: iter={info.get('iter')} status={info.get('status')}")
    for i in nodes:
        nx, nu = topo.nx[i], topo.nu[i]
        p(f"node {i}: x = {_fmt(out.x[i, :nx])}  u = {_fmt(out.u[i, :nu])}")
        p(f"        lam = {_fmt(out.lam[i, :nx])}  mu_x = {_fmt(out.mu_x[i, :nx])}"
          f"  mu_u = {_fmt(out.mu_u[i, :nu])}")


def write_vector_txt(v, path):
    np.savetxt(path, np.asarray(v).reshape(-1))


def read_vector_txt(path):
    return np.loadtxt(path).reshape(-1)


def tree_qp_out_write_txt(topo, out, prefix):
    """Txt export of the solution (print.c tree_qp_out_write_to_txt):
    x/u/lam/mu stacked in node order, real dims only."""
    xs, us, lams = [], [], []
    for i in range(topo.Nn):
        xs.append(np.asarray(out.x[i, : topo.nx[i]]))
        us.append(np.asarray(out.u[i, : topo.nu[i]]))
        if i > 0:
            lams.append(np.asarray(out.lam[i, : topo.nx[i]]))
    write_vector_txt(np.concatenate(xs), f"{prefix}_x.txt")
    write_vector_txt(np.concatenate(us) if us else np.zeros(0), f"{prefix}_u.txt")
    write_vector_txt(np.concatenate(lams) if lams else np.zeros(0), f"{prefix}_lam.txt")
