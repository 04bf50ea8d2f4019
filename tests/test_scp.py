"""End-to-end SCP tests: the minimum slice of SURVEY.md section 7 step 4."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models import centroidal as cm
from centroidal_mpc_tpu.solver.scp import solve_scp


@pytest.fixture(scope="module")
def trot_solution():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, prob.scp)
    return prob, sol


def test_scp_accepts_and_terminates(trot_solution):
    prob, sol = trot_solution
    assert bool(sol.success)
    assert bool(sol.qp_converged)
    assert int(sol.accepted) >= 1
    # reference-compat loop terminates right after the first success
    assert int(sol.iterations) == int(sol.accepted)


def test_boundary_conditions(trot_solution):
    prob, sol = trot_solution
    X = np.asarray(sol.X)
    np.testing.assert_allclose(X[0], np.asarray(prob.ocp.x_init), atol=1e-5)
    np.testing.assert_allclose(X[-1], np.asarray(prob.ocp.x_final), atol=1e-5)


def test_linearized_dynamics_satisfied(trot_solution):
    """QP dynamics rows bind: A_k x_k + B_k u_k - x_{k+1} = residual."""
    prob, sol = trot_solution
    data = cm.compute_trajectory_data(prob.model, prob.plan.schedule,
                                      prob.X0, prob.U0)
    X, U = np.asarray(sol.X), np.asarray(sol.U)
    A, B, f = np.asarray(data.A), np.asarray(data.B), np.asarray(data.f)
    X0, U0 = np.asarray(prob.X0), np.asarray(prob.U0)
    lhs = (np.einsum("kij,kj->ki", A, X[:-1])
           + np.einsum("kij,kj->ki", B, U) - X[1:])
    rhs = (np.einsum("kij,kj->ki", A, X0[:-1])
           + np.einsum("kij,kj->ki", B, U0) - f)
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_nonlinear_dynamics_consistency(trot_solution):
    """Model accuracy: one-step integration of the solution stays close to
    the next state (rho was accepted, so the linearization is faithful)."""
    prob, sol = trot_solution
    f_nl = np.asarray(cm.integrate_dynamics_trajectory(
        prob.model, prob.plan.schedule, sol.X, sol.U))
    gap = np.abs(f_nl - np.asarray(sol.X)[1:]).max()
    assert gap < 5e-3


def test_friction_pyramid_satisfied(trot_solution):
    """Reference checker semantics (src/constraints.py:298-335): rotated
    tangential rows G R' f <= 0 (+5e-5 tolerance) at active contacts."""
    prob, sol = trot_solution
    U = np.asarray(sol.U)
    G = np.asarray(prob.ocp.pyramid)[:4]
    logic = np.asarray(prob.plan.schedule.logic)
    rot = np.asarray(prob.plan.schedule.orientation)
    worst = -np.inf
    for k in range(prob.plan.horizon):
        for c in range(4):
            if logic[k, c]:
                f = U[k, 3 * c:3 * c + 3]
                worst = max(worst, (G @ rot[k, c].T @ f).max())
    assert worst <= 5e-5


def test_forces_support_weight(trot_solution):
    prob, sol = trot_solution
    U = np.asarray(sol.U)
    logic = np.asarray(prob.plan.schedule.logic)
    fz_total = (U.reshape(-1, 4, 3)[:, :, 2] * logic).sum(axis=1)
    np.testing.assert_allclose(fz_total.mean(), prob.preset.robot.weight_force,
                               rtol=0.05)


def test_stochastic_backed_off_constraints_hold(trot_solution):
    """Chance back-offs tighten the friction rows; the stochastic solution
    satisfies G R' f <= -backoff at active knots (the paper's effect)."""
    prob_nom, sol_nom = trot_solution
    prob = presets.build_problem(presets.SOLO12_TROT_N50, stochastic=True,
                                 dtype=jnp.float64)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, prob.scp)
    assert bool(sol.success)
    # recompute back-offs at the linearization trajectory (what the QP saw)
    data = cm.compute_trajectory_data(prob.model, prob.plan.schedule,
                                      prob.X0, prob.U0)
    G = np.asarray(prob.ocp.pyramid)[:4]
    xi = float(prob.ocp.xi)
    logic = np.asarray(prob.plan.schedule.logic)
    rot = np.asarray(prob.plan.schedule.orientation)
    K_t, S_t = np.asarray(data.K), np.asarray(data.Sigma)
    U = np.asarray(sol.U)
    any_backoff = False
    for k in range(1, prob.plan.horizon):
        for c in range(4):
            if not logic[k, c]:
                continue
            Gr = G @ rot[k, c].T
            Kc = K_t[k, 3 * c:3 * c + 3]
            ksk = np.sqrt(np.maximum(np.diag(Kc @ S_t[k] @ Kc.T), 0.0))
            backoff = np.array([
                sum(xi * 2 * Gr[r, j] * ksk[j] for j in range(3)
                    if Gr[r, j] > 1e-6 and ksk[j] > 1e-6)
                for r in range(4)])
            any_backoff |= (backoff > 1e-6).any()
            f = U[k, 3 * c:3 * c + 3]
            assert (Gr @ f <= -backoff + 5e-5).all()
    assert any_backoff  # the stochastic mode actually tightened something


def test_proper_gusto_mode_converges():
    """update_linearization=True: true re-linearizing SCP also solves."""
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    scp = dataclasses.replace(prob.scp, update_linearization=True,
                              max_iterations=5)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, scp)
    assert bool(sol.success)
    assert int(sol.accepted) >= 1
    f_nl = np.asarray(cm.integrate_dynamics_trajectory(
        prob.model, prob.plan.schedule, sol.X, sol.U))
    assert np.abs(f_nl - np.asarray(sol.X)[1:]).max() < 5e-3


def test_solve_scp_is_jittable():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    fn = jax.jit(solve_scp, static_argnames=("settings",))
    sol = fn(prob.model, prob.plan.schedule, prob.ocp, prob.X0, prob.U0,
             settings=prob.scp)
    assert bool(sol.success)


def test_full_horizon_stochastic_needs_stabilizing_gains():
    """At the reference trot horizon (N=165) the 2-iteration DARE gains
    (src/centroidal_model.py:217-228) do not stabilize the closed loop:
    the covariance trace grows unboundedly and the chance back-offs drive
    active friction upper bounds far negative (the reference demo masks
    the resulting infeasibility by interpolating the *nominal* solution
    in its stochastic branch, run_motion.py:110).  With 30 DARE
    iterations (ScpSettings.lqr_iters / pipeline stochastic_lqr_iters)
    the covariance stays bounded and the stochastic QP is feasible."""
    import numpy as np
    from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data

    prob = presets.build_problem(presets.SOLO12_TROT, stochastic=True,
                                 dtype=jnp.float64)
    X0, U0 = jnp.asarray(prob.X0), jnp.asarray(prob.U0)
    traces = {}
    for it in (2, 30):
        data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                       X0, U0, lqr_iters=it,
                                       with_covariance=True)
        traces[it] = float(jnp.trace(data.Sigma[-1]))
    assert traces[2] > 300.0          # reference semantics: unbounded growth
    assert traces[30] < 0.3 * traces[2]  # stabilized gains bound Sigma
