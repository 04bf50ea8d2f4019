"""DDP/iLQR solver tests: analytic LQR oracle, centroidal warm start."""
import jax
import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models import centroidal as cm
from centroidal_mpc_tpu.solver.ddp import DdpSettings, solve_ilqr
from centroidal_mpc_tpu.solver.warm_start import ddp_warm_start


def test_ilqr_solves_lqr_exactly():
    """On a linear-quadratic problem one iLQR iteration reaches the LQR
    optimum (verified against the Riccati solution)."""
    nx, nu, N = 4, 2, 30
    rng = np.random.default_rng(0)
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.normal(size=(nx, nx)))
    B = jnp.asarray(0.1 * rng.normal(size=(nx, nu)))
    Q = jnp.asarray(np.diag([1.0, 2.0, 0.5, 1.0]))
    R = jnp.asarray(np.diag([0.1, 0.2]))
    Qf = 10.0 * Q
    x0 = jnp.asarray(rng.normal(size=nx))

    dyn = lambda x, u, k: A @ x + B @ u
    cost = lambda x, u, k: 0.5 * (x @ Q @ x + u @ R @ u)
    term = lambda x: 0.5 * x @ Qf @ x

    sol = solve_ilqr(dyn, cost, term, x0, jnp.zeros((N, nu)),
                     DdpSettings(iterations=3))
    # Riccati oracle
    P = np.asarray(Qf)
    Ks = []
    for _ in range(N):
        H = np.asarray(R) + np.asarray(B).T @ P @ np.asarray(B)
        K = -np.linalg.solve(H, np.asarray(B).T @ P @ np.asarray(A))
        P = (np.asarray(Q) + np.asarray(A).T @ P @ np.asarray(A)
             + np.asarray(A).T @ P @ np.asarray(B) @ K)
        Ks.append(K)
    Ks = Ks[::-1]
    x = np.asarray(x0)
    X_opt, U_opt = [x], []
    for k in range(N):
        u = Ks[k] @ x
        U_opt.append(u)
        x = np.asarray(A) @ x + np.asarray(B) @ u
        X_opt.append(x)
    np.testing.assert_allclose(np.asarray(sol.U), np.stack(U_opt),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.X), np.stack(X_opt),
                               rtol=1e-6, atol=1e-8)


def test_ilqr_reduces_cost_monotonically_on_nonlinear_problem():
    """Pendulum swing-up style nonlinear problem: cost decreases."""
    dt = 0.05

    def dyn(x, u, k):
        th, w = x
        return jnp.array([th + dt * w, w + dt * (jnp.sin(th) + u[0])])

    cost = lambda x, u, k: 0.01 * u[0]**2 + 0.1 * x[1]**2
    term = lambda x: 100.0 * ((x[0] - jnp.pi)**2 + x[1]**2)
    x0 = jnp.array([0.0, 0.0])
    sol = solve_ilqr(dyn, cost, term, x0, jnp.zeros((40, 1)),
                     DdpSettings(iterations=50))
    init_cost = float(term(x0))
    assert float(sol.cost) < init_cost
    assert bool(jnp.isfinite(sol.cost))


def test_ddp_warm_start_is_dynamically_consistent():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    X, U = ddp_warm_start(prob.model, prob.plan.schedule, prob.preset.robot)
    # rollout-consistency: X is exactly the rollout of U
    X_roll = cm.rollout(prob.model, prob.plan.schedule, X[0], U)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_roll), atol=1e-9)
    # tracks the gait: final CoM advanced by ~nb_steps * step_length
    expected_dx = (prob.preset.gait.nb_steps * prob.preset.gait.step_length)
    assert abs(float(X[-1, 0]) - expected_dx) < 0.08


def test_scp_accepts_ddp_warm_start():
    """SCP solves from the DDP warm start (the DYNAMICS_FIRST pipeline)."""
    from centroidal_mpc_tpu.solver.scp import solve_scp
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    X, U = ddp_warm_start(prob.model, prob.plan.schedule, prob.preset.robot)
    cfg = prob.ocp.replace(x_init=X[0], x_final=X[-1], X_track=X)
    sol = solve_scp(prob.model, prob.plan.schedule, cfg, X, U, prob.scp)
    assert bool(sol.success)
