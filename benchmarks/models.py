"""Benchmark problem generators.

Re-creations of the reference benchmark families (SURVEY.md section 6):

* ``spring_mass_qp`` — the exact instance of examples/spring_mass.c
  (data from examples/spring_mass_utils/data.c; md=3, Nr=2, Nh=10, NX=4, NU=1).
* ``spring_mass_chain`` — parametric chain-of-masses robust-MPC generator
  (same physics family as the reference's benchmark/linear_chain, derived
  from first principles: masses connected by springs with uncertain spring
  constant, exact ZOH-free RK4 discretization of the linear ODE).
"""

from __future__ import annotations

import numpy as np

from treeqp_tpu.core.qp_data import TreeQPIn
from treeqp_tpu.utils.ref_data import parse_c_arrays, read_txt_vector
from treeqp_tpu.utils.tree import TreeStructure

SPRING_MASS_DIR = "/root/reference/examples/spring_mass_utils"


def _col_major(flat: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Unstack [k*rows*cols] column-major chunks into [k, rows, cols]."""
    return flat.reshape(-1, cols, rows).transpose(0, 2, 1)


def spring_mass_qp(data_dir: str = SPRING_MASS_DIR, xmax1: float = 0.2,
                  x0_from_file: bool = True):
    """The spring_mass.c robust-MPC tree QP (reference spring_mass.c:125-227).

    Loads the code-generated instance data (data.c); skips the first
    (nominal) dynamics realization as spring_mass.c:226 does; tightens
    xmax[1] (spring_mass.c:126) so state constraints are active at the
    solution. Returns (qp_in, x0).
    """
    d = parse_c_arrays(f"{data_dir}/data.c")
    Nh, Nr, md = int(d["Nh"]), int(d["Nr"]), int(d["md"])
    NX, NU = int(d["NX"]), int(d["NU"])

    A = _col_major(d["A"], NX, NX)[1:]  # drop nominal realization
    B = _col_major(d["B"], NX, NU)[1:]
    b = d["b"].reshape(-1, NX)[1:]

    xmax = d["xmax"].copy()
    xmax[1] = xmax1

    x0 = read_txt_vector(f"{data_dir}/x0.txt") if x0_from_file else np.zeros(NX)

    topo = TreeStructure.multistage(md=md, Nr=Nr, Nh=Nh, nx=NX, nu=NU)
    qp = TreeQPIn.lti_diag_weights(
        topo, A, B, b,
        dQ=d["dQ"], dq=d["q"], dP=d["dP"], dp=d["p"], dR=d["dR"], dr=d["r"],
        xmin=d["xmin"], xmax=xmax, umin=d["umin"], umax=d["umax"], x0=x0,
        scale_by_stage=True)
    return qp, x0


def spring_mass_dynamics(nm: int, k: float, dt: float, substeps: int = 10):
    """Discretized chain of ``nm`` masses coupled by springs of stiffness
    ``k`` (wall-mass-...-mass-wall), control = force on the last mass.

    States: [positions; velocities] (nx = 2 nm), RK4 with ``substeps``.
    Same family as the reference linear_chain benchmark
    (benchmark/common/import_benchmark.m; the uncertain parameter is the
    spring constant).
    """
    nx = 2 * nm
    K = np.zeros((nm, nm))
    for i in range(nm):
        K[i, i] = -2.0 * k
        if i > 0:
            K[i, i - 1] = k
        if i < nm - 1:
            K[i, i + 1] = k
    Ac = np.zeros((nx, nx))
    Ac[:nm, nm:] = np.eye(nm)
    Ac[nm:, :nm] = K
    Bc = np.zeros((nx, 1))
    Bc[-1, 0] = 1.0

    h = dt / substeps
    Ad = np.eye(nx)
    Bd = np.zeros((nx, 1))
    for _ in range(substeps):
        # one RK4 step of [x' = Ac x + Bc u] with u held constant
        def f(M, N):
            return Ac @ M, Ac @ N + Bc
        k1A, k1B = f(Ad, Bd)
        k2A, k2B = f(Ad + h / 2 * k1A, Bd + h / 2 * k1B)
        k3A, k3B = f(Ad + h / 2 * k2A, Bd + h / 2 * k2B)
        k4A, k4B = f(Ad + h * k3A, Bd + h * k3B)
        Ad = Ad + h / 6 * (k1A + 2 * k2A + 2 * k3A + k4A)
        Bd = Bd + h / 6 * (k1B + 2 * k2B + 2 * k3B + k4B)
    return Ad, Bd


def spring_mass_chain(nm: int = 2, md: int = 3, Nr: int = 2, Nh: int = 10,
                     dt: float = 0.1, k_nominal: float = 2.0, k_spread: float = 1.0,
                     umax: float = 1.0, xmax_pos: float = 1.2, x0=None):
    """Parametric robust-MPC scenario-tree QP over the spring-mass chain.

    ``md`` realizations sample the uncertain spring constant in
    [k_nominal - k_spread, k_nominal + k_spread]. Scales arbitrarily in
    (nm, md, Nr, Nh) — the workload generator for throughput/scaling
    benchmarks (BASELINE.md: quadcopter-class trees, >=256 scenarios).
    Returns (qp_in, x0).
    """
    nx, nu = 2 * nm, 1
    ks = np.linspace(k_nominal - k_spread, k_nominal + k_spread, md)
    AB = [spring_mass_dynamics(nm, k, dt) for k in ks]
    A = np.stack([ab[0] for ab in AB])
    B = np.stack([ab[1] for ab in AB])
    b = np.zeros((md, nx))

    if x0 is None:
        rng = np.random.default_rng(42)
        x0 = 0.5 * rng.standard_normal(nx)
        x0[nm:] = 0.0

    dQ = np.ones(nx)
    dQ[:nm] = 10.0
    dP = 10.0 * dQ
    dR = 0.1 * np.ones(nu)

    xmin = np.full(nx, -1e12)
    xmax = np.full(nx, 1e12)
    xmax[:nm] = xmax_pos

    topo = TreeStructure.multistage(md=md, Nr=Nr, Nh=Nh, nx=nx, nu=nu)
    qp = TreeQPIn.lti_diag_weights(
        topo, A, B, b, dQ=dQ, dq=np.zeros(nx), dP=dP, dp=np.zeros(nx),
        dR=dR, dr=np.zeros(nu), xmin=xmin, xmax=xmax,
        umin=[-umax], umax=[umax], x0=x0, scale_by_stage=True)
    return qp, x0
