"""Benchmark problem generators.

Re-creations of the reference benchmark families (SURVEY.md section 6):

* ``spring_mass_qp`` — the exact instance of examples/spring_mass.c
  (data from examples/spring_mass_utils/data.c; md=3, Nr=2, Nh=10, NX=4, NU=1).
* ``spring_mass_chain`` — parametric chain-of-masses robust-MPC generator.
* ``quadcopter`` — attitude model with uncertain mass (8-12 kg), Ts=0.05
  (benchmark/quadcopter/dynamics_quadcopter_mpc.m + default params);
  linearized around hover with JAX autodiff (replacing CasADi,
  common/linearize_model.m) and exactly discretized via the augmented
  matrix exponential (common/discretize_model.m).
* ``crane`` — overhead crane with uncertain friction b in [0.1, 0.3],
  Ts=0.2 (benchmark/crane/dynamics_crane.m).
* ``linear_chain`` — nm masses on springs, nu actuated, uncertain spring
  constant k in [4, 8] (benchmark/linear_chain/initialize_linear_chain.m).

Each family returns a robust-MPC scenario-tree TreeQPIn plus the nonlinear
plant simulator used by the closed-loop harness.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

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
    # NOTE: xmax1=None keeps the original (untightened) bound from data.c —
    # the configuration of the sdunes-specific reference example
    # (spring_mass_dual_newton_scenarios.c), whose warm-start txt files
    # correspond to the untightened instance.
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
    if xmax1 is not None:
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


# ---------------------------------------------------------------------------
# continuous-time models + linearization/discretization (JAX replaces CasADi)


def linearize(rhs, xlin, ulin):
    """Jacobians of a continuous-time rhs at a point
    (common/linearize_model.m, with jax.jacobian instead of CasADi).
    Runs on CPU: model construction is host-side work."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        xlin = jnp_arr(xlin)
        ulin = jnp_arr(ulin)
        A = jax.jacobian(lambda x: rhs(x, ulin))(xlin)
        B = jax.jacobian(lambda u: rhs(xlin, u))(ulin)
        return np.asarray(A), np.asarray(B)


def discretize(A, B, Ts):
    """Exact ZOH discretization via the augmented matrix exponential
    (common/discretize_model.m)."""
    import jax
    import jax.scipy.linalg as jsl

    nx, nu = B.shape
    M = np.zeros((nx + nu, nx + nu))
    M[:nx, :nx] = Ts * A
    M[:nx, nx:] = Ts * B
    with jax.default_device(jax.devices("cpu")[0]):  # f64 LU: CPU only
        E = np.asarray(jsl.expm(jnp_arr(M)))
    return E[:nx, :nx], E[:nx, nx:]


def jnp_arr(v):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(v, dtype=np.float64))


def rk4_step(rhs, x, u, Ts, substeps=1):
    """RK4 integrator (common/integrate_RK4.m) for the plant simulator."""
    h = Ts / substeps
    for _ in range(substeps):
        k1 = rhs(x, u)
        k2 = rhs(x + h / 2 * k1, u)
        k3 = rhs(x + h / 2 * k2, u)
        k4 = rhs(x + h * k3, u)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    return x


@dataclasses.dataclass
class BenchmarkModel:
    """A robust-MPC benchmark instance: tree QP + nonlinear plant."""

    qp: "TreeQPIn"
    x0: np.ndarray
    simulate: Callable  # (x, u) -> next x (true plant, random parameter)
    xref: np.ndarray  # [NSIM, nx] reference trajectory
    weights: dict  # dQ, dR, dP diagonals (for online q/r updates)
    Ts: float


def _quadcopter_rhs(par):
    import jax.numpy as jnp

    rho, A, Cl, Cd, L, L2 = par["rho"], par["A"], par["Cl"], par["Cd"], par["L"], par["L2"]
    J1, J2, J3 = par["J1"], par["J2"], par["J3"]

    def rhs(x, u):
        q2, q3, q4, O1, O2, O3 = x
        q1 = jnp.sqrt(jnp.maximum(1.0 - q2**2 - q3**2 - q4**2, 1e-12))
        quat = 0.5 * jnp.array([
            q1 * O1 - q4 * O2 + q3 * O3,
            q4 * O1 + q1 * O2 - q2 * O3,
            -q3 * O1 + q2 * O2 + q1 * O3,
        ])
        W1, W2, W3, W4 = u
        dO1 = (-J3 * O2 * O3 + J2 * O2 * O3 + (A * Cl * L * rho * (W2 * W2 - W4 * W4)) / 2) / J1
        dO2 = (J3 * O1 * O3 - J1 * O1 * O3 + (A * Cl * L * rho * (W3 * W3 - W1 * W1)) / 2) / J2
        dO3 = (-J2 * O1 * O2 + J1 * O1 * O2 + (A * Cd * L2 * rho * (W1 * W1 - W2 * W2 + W3 * W3 - W4 * W4)) / 2) / J3
        return jnp.concatenate([quat, jnp.array([dO1, dO2, dO3])])

    return rhs


def _quadcopter_params(m=10.0):
    # default_params_quadcopter.m
    p = dict(rho=1.23, A=0.1, Cl=0.25, Cd=0.3 * 0.25, m=m, g=9.81,
             L=0.5, L2=1.0, J1=0.25, J2=0.25, J3=1.0, Ts=0.05)
    return p


def quadcopter(md=4, Nr=4, Nh=20, x0=None, sim_mass=None, seed=0):
    """Quadcopter attitude robust-MPC tree QP, uncertain mass in [8, 12] kg
    (initialize_quadcopter.m; md realizations linspace over the range).

    nx=6 (quaternion vector part + body rates), nu=4 (rotor speed deltas).
    """
    nx, nu = 6, 4
    masses = np.linspace(8.0, 12.0, md) if md > 1 else np.array([10.0])
    As, Bs = [], []
    for m in masses:
        par = _quadcopter_params(m)
        # linearize at hover: omega_hover from force balance
        w_h = np.sqrt(2 * m * par["g"] / (par["A"] * par["Cl"] * par["rho"]) / 4)
        rhs = _quadcopter_rhs(par)
        A, B = linearize(rhs, np.zeros(nx), w_h * np.ones(nu))
        Ad, Bd = discretize(A, B, par["Ts"])
        As.append(Ad)
        Bs.append(Bd)
    A = np.stack(As)
    B = np.stack(Bs)
    b = np.zeros((md, nx))

    dQ = np.array([500.0, 500, 500, 0.001, 0.001, 0.001])
    dR = 0.001 * np.ones(nu)
    dP = dQ
    inf = 1e12  # reference uses 1e8 as "inf"; map to TREEQP_INF
    xmin = np.concatenate([-inf * np.ones(3), -np.ones(3)])
    xmax = -xmin
    du = 4.0

    if x0 is None:
        rng = np.random.default_rng(seed)
        x0 = np.concatenate([0.05 * rng.standard_normal(3), np.zeros(3)])

    topo = TreeStructure.multistage(md=md, Nr=Nr, Nh=Nh, nx=nx, nu=nu)
    qp = TreeQPIn.lti_diag_weights(
        topo, A, B, b, dQ=dQ, dq=np.zeros(nx), dP=dP, dp=np.zeros(nx),
        dR=dR, dr=np.zeros(nu), xmin=xmin, xmax=xmax,
        umin=-du * np.ones(nu), umax=du * np.ones(nu), x0=x0)

    m_sim = sim_mass if sim_mass is not None else float(
        np.random.default_rng(seed + 1).uniform(8.0, 12.0))
    par_sim = _quadcopter_params(m_sim)
    rhs_sim = _quadcopter_rhs(par_sim)
    w_h = np.sqrt(2 * m_sim * par_sim["g"] / (par_sim["A"] * par_sim["Cl"] * par_sim["rho"]) / 4)

    def simulate(x, u):
        # plant input = hover speed + delta (MPC controls deltas around hover)
        return np.asarray(rk4_step(lambda xx, uu: _quadcopter_rhs(par_sim)(xx, uu),
                                   jnp_arr(x), jnp_arr(u) + w_h, par_sim["Ts"], 5))

    return BenchmarkModel(qp=qp, x0=np.asarray(x0), simulate=simulate,
                          xref=np.zeros((1, nx)), weights=dict(dQ=dQ, dR=dR, dP=dP),
                          Ts=par_sim["Ts"])


def _crane_rhs(b, g=9.81):
    import jax.numpy as jnp

    def rhs(x, u):
        p, v, phi, omega = x
        a = u[0]
        return jnp.array([v, a, omega,
                          -g * jnp.sin(phi) - a * jnp.cos(phi) - b * omega])

    return rhs


def crane(md=3, Nr=2, Nh=10, x0=None, sim_b=None, seed=0):
    """Overhead crane robust-MPC tree QP, uncertain friction b in [0.1, 0.3]
    (initialize_crane.m). nx=4 (pos, vel, angle, ang. vel), nu=1."""
    nx, nu = 4, 1
    Ts = 0.2
    bs = np.linspace(0.1, 0.3, md) if md > 1 else np.array([0.2])
    As, Bs = [], []
    for b in bs:
        A, B = linearize(_crane_rhs(b), np.zeros(nx), np.zeros(nu))
        Ad, Bd = discretize(A, B, Ts)
        As.append(Ad)
        Bs.append(Bd)
    A, B = np.stack(As), np.stack(Bs)
    bvec = np.zeros((md, nx))

    inf = 1e12
    dQ = np.array([10.0, 1, 1, 1])
    dR = np.array([0.1])
    xmin = np.array([-inf, -0.2, -inf, -0.4])
    xmax = -xmin
    xref = np.array([0.2, 0, 0, 0])
    if x0 is None:
        x0 = np.zeros(nx)

    topo = TreeStructure.multistage(md=md, Nr=Nr, Nh=Nh, nx=nx, nu=nu)
    qp = TreeQPIn.lti_diag_weights(
        topo, A, B, bvec, dQ=dQ, dq=-dQ * xref, dP=dQ, dp=-dQ * xref,
        dR=dR, dr=np.zeros(nu), xmin=xmin, xmax=xmax,
        umin=[-0.5], umax=[0.5], x0=x0)

    b_sim = sim_b if sim_b is not None else float(
        np.random.default_rng(seed).uniform(0.1, 0.3))

    def simulate(x, u):
        return np.asarray(rk4_step(_crane_rhs(b_sim), jnp_arr(x), jnp_arr(u), Ts, 5))

    return BenchmarkModel(qp=qp, x0=np.asarray(x0), simulate=simulate,
                          xref=xref[None], weights=dict(dQ=dQ, dR=dR, dP=dQ), Ts=Ts)


def _linear_chain_rhs(nm, nu_count, k):
    import jax.numpy as jnp

    T = (np.diag(-2.0 * np.ones(nm)) + np.diag(np.ones(nm - 1), -1)
         + np.diag(np.ones(nm - 1), 1))
    # controls act as velocity inputs on the first nu masses
    Bv = np.zeros((nm, nu_count))
    for i in range(nu_count):
        Bv[i, i] = 1.0
    Tj = jnp_arr(k * T)
    Bj = jnp_arr(Bv)

    def rhs(x, u):
        pos, vel = x[:nm], x[nm:]
        return jnp.concatenate([vel, Tj @ pos + Bj @ u])

    return rhs


def linear_chain(nm=4, nu_count=3, md=3, Nr=2, Nh=10, sim_k=None, seed=0):
    """Chain of nm masses on springs, nu actuated, uncertain spring constant
    k in [4, 8] (initialize_linear_chain.m). nx = 2 nm."""
    nx = 2 * nm
    Ts = 0.05
    ks = np.linspace(4.0, 8.0, md) if md > 1 else np.array([6.0])
    As, Bs = [], []
    for k in ks:
        A, B = linearize(_linear_chain_rhs(nm, nu_count, k),
                         np.zeros(nx), np.zeros(nu_count))
        Ad, Bd = discretize(A, B, Ts)
        As.append(Ad)
        Bs.append(Bd)
    A, B = np.stack(As), np.stack(Bs)
    bvec = np.zeros((md, nx))

    x0 = np.zeros(nx)
    x0[nm + min(nu_count, nm - 1)] = 2.0  # initial velocity on an uncontrolled mass

    topo = TreeStructure.multistage(md=md, Nr=Nr, Nh=Nh, nx=nx, nu=nu_count)
    qp = TreeQPIn.lti_diag_weights(
        topo, A, B, bvec, dQ=10 * np.ones(nx), dq=np.zeros(nx),
        dP=10 * np.ones(nx), dp=np.zeros(nx),
        dR=np.ones(nu_count), dr=np.zeros(nu_count),
        xmin=-2.0 * np.ones(nx), xmax=2.0 * np.ones(nx),
        umin=-2.0 * np.ones(nu_count), umax=2.0 * np.ones(nu_count), x0=x0)

    k_sim = sim_k if sim_k is not None else float(
        np.random.default_rng(seed).uniform(4.0, 8.0))

    def simulate(x, u):
        return np.asarray(rk4_step(_linear_chain_rhs(nm, nu_count, k_sim),
                                   jnp_arr(x), jnp_arr(u), Ts, 5))

    return BenchmarkModel(qp=qp, x0=x0, simulate=simulate,
                          xref=np.zeros((1, nx)),
                          weights=dict(dQ=10 * np.ones(nx), dR=np.ones(nu_count),
                                       dP=10 * np.ones(nx)), Ts=Ts)


def spring_chain_rhs(nm, k):
    """Continuous-time rhs matching spring_mass_dynamics' Ac/Bc (force on
    the last mass) — the plant model for the fault-tolerance example."""
    import jax.numpy as jnp

    K = np.zeros((nm, nm))
    for i in range(nm):
        K[i, i] = -2.0 * k
        if i > 0:
            K[i, i - 1] = k
        if i < nm - 1:
            K[i, i + 1] = k
    Kj = jnp_arr(K)

    def rhs(x, u):
        pos, vel = x[:nm], x[nm:]
        acc = Kj @ pos
        acc = acc.at[-1].add(u[0])
        return jnp.concatenate([vel, acc])

    return rhs


def with_general_rows(qp, cmax=0.3):
    """Add one general constraint row per node:
    -cmax <= sum_i x_i + 0.5 u_0 <= cmax (couples states and controls).

    Turns a box-only instance into a general-constraint one (reference
    C/D rows, tree_qp_common.h:103-108) for tests/benchmarks of the
    general-row paths."""
    import jax.numpy as jnp

    from treeqp_tpu.core.qp_data import TreeQPIn
    from treeqp_tpu.utils.tree import TreeStructure

    topo = qp.topo
    topo2 = TreeStructure.from_parent(topo.parent, topo.nx, topo.nu,
                                      [1] * topo.Nn)
    Nn, num = topo.Nn, topo.num
    C = jnp.asarray(topo.x_mask, qp.dtype)[:, None, :]
    D = jnp.zeros((Nn, 1, num), qp.dtype).at[:, 0, 0].set(
        0.5 * jnp.asarray(topo.u_mask, qp.dtype)[:, 0])
    return TreeQPIn(
        **{f: getattr(qp, f) for f in
           ("Q", "R", "S", "q", "r", "xmin", "xmax", "umin", "umax",
            "A", "B", "b")},
        C=C, D=D,
        dmin=jnp.full((Nn, 1), -cmax, qp.dtype),
        dmax=jnp.full((Nn, 1), cmax, qp.dtype),
        topo=topo2)
