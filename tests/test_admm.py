"""ADMM QP solver tests: closed-form problems, KKT optimality on the real
OCP subproblem, warm starting."""
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops.admm import QPSettings, solve_qp
from centroidal_mpc_tpu.solver.ocp import INF, QPData, build_qp


def _qp(P, q, A, l, u):
    return QPData(P=jnp.asarray(P, jnp.float64), q=jnp.asarray(q, jnp.float64),
                  A=jnp.asarray(A, jnp.float64), l=jnp.asarray(l, jnp.float64),
                  u=jnp.asarray(u, jnp.float64))


def kkt_residuals(qp: QPData, x, y, act_tol=1e-6):
    """(stationarity, primal violation, complementarity) residuals."""
    P, q, A = np.asarray(qp.P), np.asarray(qp.q), np.asarray(qp.A)
    l, u = np.asarray(qp.l), np.asarray(qp.u)
    ax = A @ x
    stat = np.abs(P @ x + q + A.T @ y).max()
    prim = np.maximum(ax - u, 0).max() if len(ax) else 0.0
    prim = max(prim, np.maximum(l - ax, 0).max())
    comp = np.abs(np.where(y > act_tol, ax - u, 0)).max()
    comp = max(comp, np.abs(np.where(y < -act_tol, ax - l, 0)).max())
    return stat, prim, comp


def test_box_projection():
    """min |x - a|^2 s.t. l <= x <= u has solution clip(a, l, u)."""
    n = 8
    rng = np.random.default_rng(0)
    a = rng.normal(size=n) * 3
    lo, hi = -np.ones(n), np.ones(n)
    qp = _qp(2 * np.eye(n), -2 * a, np.eye(n), lo, hi)
    sol = solve_qp(qp, QPSettings(eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.x), np.clip(a, lo, hi),
                               atol=1e-6)


def test_equality_constrained_matches_kkt_solve():
    """Equality-constrained QP vs the closed-form KKT solution."""
    rng = np.random.default_rng(1)
    n, m = 12, 5
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    K = np.block([[P, A.T], [A, np.zeros((m, m))]])
    sol_exact = np.linalg.solve(K, np.concatenate([-q, b]))[:n]
    qp = _qp(P, q, A, b, b)
    sol = solve_qp(qp, QPSettings(eps_abs=1e-10, eps_rel=1e-10))
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.x), sol_exact, atol=1e-6)


def test_random_inequality_qp_kkt():
    rng = np.random.default_rng(2)
    n, m = 20, 30
    M = rng.normal(size=(n, n))
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    u = rng.uniform(0.5, 2.0, size=m)
    l = -np.full(m, INF)
    qp = _qp(P, q, A, l, u)
    sol = solve_qp(qp, QPSettings(eps_abs=1e-9, eps_rel=1e-9))
    assert bool(sol.converged)
    stat, prim, comp = kkt_residuals(qp, np.asarray(sol.x), np.asarray(sol.y))
    assert stat < 1e-6
    assert prim < 1e-7
    assert comp < 1e-5


@pytest.fixture(scope="module")
def ocp_qp():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    return build_qp(prob.model, prob.plan.schedule, prob.ocp, prob.X0,
                    prob.U0, data, jnp.asarray(100.0), jnp.asarray(100.0))


def test_ocp_subproblem_kkt(ocp_qp):
    """The real SCP subproblem satisfies KKT conditions at the ADMM
    solution (relative scales: weights up to 1e5, forces O(10))."""
    sol = solve_qp(ocp_qp, QPSettings())
    assert bool(sol.converged)
    x, y = np.asarray(sol.x), np.asarray(sol.y)
    stat, prim, comp = kkt_residuals(ocp_qp, x, y)
    scale = max(1.0, np.abs(np.asarray(ocp_qp.q)).max())
    assert stat / scale < 1e-6
    assert prim < 1e-5
    # boundary conditions hold tightly
    np.testing.assert_allclose(x[:9], np.asarray(ocp_qp.l[:9]), atol=1e-6)


def test_warm_start_reduces_iterations(ocp_qp):
    """Warm-starting from the solution converges within the first residual
    check (iterations are counted at check_interval granularity)."""
    cold = solve_qp(ocp_qp, QPSettings())
    warm = solve_qp(ocp_qp, QPSettings(), x0=cold.x, y0=cold.y)
    assert int(warm.iterations) <= QPSettings().check_interval
    assert int(warm.iterations) < int(cold.iterations)
    # residual tolerance does not bound solution distance tighter than the
    # problem conditioning allows; compare at a conditioning-aware tolerance
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               atol=5e-4)
