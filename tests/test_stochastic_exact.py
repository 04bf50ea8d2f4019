"""Exact covariance-gradient mode tests (the reference's intended math;
SURVEY.md section 2b / section 7 step 5)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import gaits, presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops.admm import QPSettings, solve_qp
from centroidal_mpc_tpu.solver import stochastic
from centroidal_mpc_tpu.solver.ocp import build_qp


@pytest.fixture(scope="module")
def tiny():
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.0, step_height=0.05,
                          step_knots=3, support_knots=2, nb_steps=1)
    preset = dataclasses.replace(presets.SOLO12_TROT, gait=gait)
    return presets.build_problem(preset, stochastic=True, dtype=jnp.float64)


def test_backoff_values_match_compat_path(tiny):
    """The differentiable back-off function reproduces the compat path's
    constant back-off (same gates, same sqrt(K Sigma K') term)."""
    prob = tiny
    from centroidal_mpc_tpu.solver.ocp import _chance_backoffs
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    rot_pyr = jnp.einsum("ri,kcji->kcrj", prob.ocp.pyramid,
                         prob.plan.schedule.orientation)
    rot_pyr = rot_pyr * prob.plan.schedule.logic[:, :, None, None]
    rot_pyr = rot_pyr.at[:, :, 4, :].set(0.0)
    compat = _chance_backoffs(prob.model, prob.ocp, data, rot_pyr)
    exact = stochastic.backoff_values(prob.model, prob.plan.schedule,
                                      prob.ocp, prob.X0, prob.U0)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(compat),
                               rtol=1e-8, atol=1e-12)


def test_backoff_jacobian_matches_finite_differences(tiny):
    prob = tiny
    b, dB_dX, dB_dU = stochastic.backoff_jacobians(
        prob.model, prob.plan.schedule, prob.ocp, prob.X0, prob.U0)
    # pick an active back-off entry and a few input directions
    idx = np.unravel_index(int(jnp.argmax(b)), b.shape)
    assert float(b[idx]) > 1e-6
    eps = 1e-6
    rng = np.random.default_rng(0)
    for _ in range(3):
        dX = jnp.asarray(rng.normal(size=prob.X0.shape))
        dU = jnp.asarray(rng.normal(size=prob.U0.shape))
        f = lambda t: stochastic.backoff_values(
            prob.model, prob.plan.schedule, prob.ocp,
            prob.X0 + t * dX, prob.U0 + t * dU)[idx]
        fd = (float(f(eps)) - float(f(-eps))) / (2 * eps)
        an = (float(jnp.vdot(dB_dX[idx], dX))
              + float(jnp.vdot(dB_dU[idx], dU)))
        np.testing.assert_allclose(an, fd, rtol=2e-4, atol=1e-8)


def test_exact_mode_qp_solves_and_tightens(tiny):
    """Nominal QP + exact back-off linearization solves; the active
    friction rows are tightened at the linearization point."""
    prob = tiny
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    cfg_nom = prob.ocp.replace(stochastic=False)
    r, w = jnp.asarray(100.0), jnp.asarray(100.0)
    qp_nom = build_qp(prob.model, prob.plan.schedule, cfg_nom,
                      prob.X0, prob.U0, data, r, w)
    qp_exact = stochastic.apply_exact_backoffs(
        qp_nom, prob.model, prob.plan.schedule, prob.ocp, prob.X0, prob.U0)
    # effective bound at the linearization point: ub - J zbar = -b < 0 on
    # rows with nonzero back-off
    b, dB_dX, dB_dU = stochastic.backoff_jacobians(
        prob.model, prob.plan.schedule, prob.ocp, prob.X0, prob.U0)
    assert float(jnp.max(b)) > 1e-6
    sol = solve_qp(qp_exact, QPSettings(eps_abs=1e-6, eps_rel=1e-6))
    assert bool(sol.converged)
    # the solution satisfies the original nonlinear chance constraint at
    # first order: G u + b(zbar) + J (z - zbar) <= 5e-5
    N, nu = prob.plan.horizon, 12
    z_x = sol.x[:9 * (N + 1)]
    z_u = sol.x[9 * (N + 1):9 * (N + 1) + nu * N]
    U_sol = z_u.reshape(N, nu)
    G = np.asarray(prob.ocp.pyramid)[:4]
    logic = np.asarray(prob.plan.schedule.logic)
    jx = np.asarray(dB_dX).reshape(N, 4, 5, -1)
    ju = np.asarray(dB_dU).reshape(N, 4, 5, -1)
    dzx = np.asarray(z_x) - np.asarray(prob.X0).reshape(-1)
    dzu = np.asarray(z_u) - np.asarray(prob.U0).reshape(-1)
    for k in range(1, N):
        for c in range(4):
            if not logic[k, c]:
                continue
            f = np.asarray(U_sol[k, 3 * c:3 * c + 3])
            for row in range(4):
                lin = (G[row] @ f + float(b[k, c, row])
                       + jx[k, c, row] @ dzx + ju[k, c, row] @ dzu)
                assert lin <= 5e-5, (k, c, row, lin)
