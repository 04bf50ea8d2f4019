"""Monte-Carlo evaluation layer tests."""
import jax
import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.sim import metrics, monte_carlo
from centroidal_mpc_tpu.solver.scp import solve_scp
from centroidal_mpc_tpu.utils.interpolation import (interpolate_linear,
                                                    interpolate_scp_solution,
                                                    interpolate_zero_order)
import pytest


@pytest.fixture(scope="module")
def solved():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, prob.scp)
    assert bool(sol.success)
    return prob, sol


def test_monte_carlo_shapes_and_determinism(solved):
    prob, sol = solved
    key = jax.random.PRNGKey(42)
    res = monte_carlo.run_monte_carlo(prob.model, prob.plan.schedule,
                                      sol.X, sol.U, sol.K, key, n_sims=8)
    N = prob.plan.horizon
    assert res.X_sim.shape == (8, N + 1, 9)
    assert res.U_sim.shape == (8, N, 12)
    res2 = monte_carlo.run_monte_carlo(prob.model, prob.plan.schedule,
                                       sol.X, sol.U, sol.K, key, n_sims=8)
    np.testing.assert_array_equal(np.asarray(res.X_sim),
                                  np.asarray(res2.X_sim))


def test_zero_disturbance_tracks_reference(solved):
    """With no push and no feedback the rollout equals the open-loop
    nonlinear rollout; with LQR feedback it stays near the plan."""
    prob, sol = solved
    X_sim, U_sim = monte_carlo.closed_loop_rollout(
        prob.model, prob.plan.schedule, sol.X, sol.U, sol.K, sol.X[0],
        jnp.zeros(3, jnp.float64), jnp.asarray(0), 0)
    # feedback keeps the nonlinear rollout close to the SCP plan
    err = np.abs(np.asarray(X_sim) - np.asarray(sol.X)).max()
    assert err < 0.05


def test_push_perturbs_then_lqr_recovers(solved):
    prob, sol = solved
    push = jnp.asarray([0.0, 8.0, 0.0], jnp.float64)
    X_sim, _ = monte_carlo.closed_loop_rollout(
        prob.model, prob.plan.schedule, sol.X, sol.U, sol.K, sol.X[0],
        push, jnp.asarray(10), 10)
    dy = np.abs(np.asarray(X_sim)[:, 4] - np.asarray(sol.X)[:, 4])
    assert dy[15] > 1e-3          # the push visibly disturbs y-momentum
    assert dy[-1] < dy[15:25].max() + 1e-9  # and the gains fight back


def test_tracking_cost_metrics(solved):
    prob, sol = solved
    key = jax.random.PRNGKey(0)
    res = monte_carlo.run_monte_carlo(prob.model, prob.plan.schedule,
                                      sol.X, sol.U, sol.K, key, n_sims=4)
    stats = metrics.cumulative_tracking_cost(prob.model.Q, res.X_sim, sol.X)
    cm = np.asarray(stats["cum_mean"])
    assert cm.shape == (prob.plan.horizon + 1,)
    assert np.all(np.diff(cm) >= -1e-9)  # cumulative => nondecreasing


def test_friction_stats_on_solution(solved):
    prob, sol = solved
    stats = metrics.friction_cone_stats(prob.ocp.pyramid,
                                        prob.plan.schedule, sol.U)
    assert int(stats["violations"]) == 0


def test_interpolation_matches_reference_semantics():
    X = np.array([[0.0, 0.0], [1.0, 2.0], [2.0, 4.0]])
    out = interpolate_linear(X, n_inner=10)
    assert out.shape == (20, 2)
    np.testing.assert_allclose(out[0], [0.0, 0.0])
    np.testing.assert_allclose(out[5], [0.5, 1.0])
    np.testing.assert_allclose(out[19], [1.9, 3.8])  # endpoint not included
    sol = interpolate_scp_solution(X, X[:2])
    assert sol["X"].shape == (20, 2) and sol["U"].shape == (10, 2)
    zoh = interpolate_zero_order(X, 3)
    np.testing.assert_allclose(zoh[:3], np.tile(X[0], (3, 1)))
