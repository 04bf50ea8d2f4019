"""Joint-space whole-body DDP tests (models/whole_body_ddp.py).

The reference solves this layer with Crocoddyl FDDP over Pinocchio contact
dynamics (src/whole_body_control.py); there is no published oracle, so
these are property tests: exact quasi-static equilibrium, stable warm-start
rollouts, cost reduction, contact-consistency and tracking quality of the
solved trajectory (SURVEY.md section 4 test strategy).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import gaits
from centroidal_mpc_tpu.config.robots import SOLO12
from centroidal_mpc_tpu.contact.plan import build_contact_plan
from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories
from centroidal_mpc_tpu.models import rigid_body as rb
from centroidal_mpc_tpu.models import whole_body_ddp as wbd
from centroidal_mpc_tpu.solver.ddp import DdpSettings

DT = 0.01
DT_CTRL = 0.001


@pytest.fixture(scope="module")
def setup():
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.06, step_height=0.05,
                          step_knots=8, support_knots=4, nb_steps=1)
    plan = build_contact_plan(SOLO12, gait, DT, dtype=jnp.float64)
    swing = compute_swing_trajectories(plan, DT_CTRL)
    spec = rb.solo12_spec()
    targets = wbd.build_targets(plan, swing, DT_CTRL, dtype=jnp.float64)
    return plan, swing, spec, targets


@pytest.fixture(scope="module")
def solution(setup):
    _, _, spec, targets = setup
    return wbd.solve_whole_body_ddp(
        spec, targets, DT,
        settings=DdpSettings(iterations=40, exact_quu=True))


def test_targets_shapes(setup):
    plan, _, _, targets = setup
    n, c = plan.horizon, 4
    assert targets.contact_mask.shape == (n, c)
    assert targets.foot_target.shape == (n, c, 3)
    assert targets.com_target.shape == (n + 1, 3)
    assert targets.mom_target.shape == (n + 1, 6)
    # stance knots: foot target equals the schedule placement
    mask = np.asarray(targets.contact_mask)
    pos = np.asarray(plan.schedule.position)
    ft = np.asarray(targets.foot_target)
    np.testing.assert_allclose(ft[mask > 0], pos[mask > 0], atol=1e-12)


def test_standing_state_matches_com_and_feet(setup):
    _, _, spec, targets = setup
    x0 = wbd.standing_state(spec, targets)
    q0 = x0[:spec.nq]
    com = rb.com_position(spec, q0)
    np.testing.assert_allclose(np.asarray(com),
                               np.asarray(targets.com_target[0]), atol=1e-3)
    feet = rb.foot_points(spec, q0)
    np.testing.assert_allclose(np.asarray(feet),
                               np.asarray(targets.foot_target[0]), atol=1e-6)


def test_quasi_static_equilibrium_exact(setup):
    """tau from quasi_static_torques holds the standing robot exactly
    (udot ~ 0 through the contact-KKT dynamics)."""
    _, _, spec, targets = setup
    x0 = wbd.standing_state(spec, targets)
    q0, v0 = x0[:spec.nq], x0[spec.nq:]
    tau = wbd.quasi_static_torques(spec, q0, targets.contact_mask[0])
    udot, f = rb.constrained_forward_dynamics(
        spec, q0, v0, tau, targets.contact_mask[0], targets.contact_ref[0])
    assert float(jnp.abs(udot).max()) < 1e-5
    # supporting forces carry the robot weight
    assert abs(float(f[:, 2].sum()) - spec.total_mass * rb.GRAVITY) < 1e-6


def test_warm_start_rollout_stays_upright(setup):
    plan, _, spec, targets = setup
    x0 = wbd.standing_state(spec, targets)
    U0 = wbd.gravity_torque_warm_start(spec, targets)

    def roll(x, k):
        q, v = x[:spec.nq], x[spec.nq:]
        udot, _ = rb.constrained_forward_dynamics(
            spec, q, v, U0[k], targets.contact_mask[k],
            targets.contact_ref[k])
        qn, vn = rb.integrate_step(spec, q, v, udot, DT)
        return jnp.concatenate([qn, vn]), qn[2]

    _, base_z = jax.lax.scan(roll, x0, jnp.arange(plan.horizon))
    assert float(base_z.min()) > 0.15
    assert float(base_z.max()) < 0.40


def test_ddp_improves_and_tracks(setup, solution):
    _, _, spec, targets = setup
    sol = solution
    assert float(sol.cost) < 100.0  # warm-start cost is O(400) on this gait
    # final CoM near the target (the gait advances ~0.03 m)
    assert float(jnp.abs(sol.com[-1] - targets.com_target[-1]).max()) < 0.03
    # stance feet stay on their placements
    mask = np.asarray(targets.contact_mask)[:, :, None]
    err = np.abs(np.asarray(sol.feet[:-1]) - np.asarray(targets.foot_target))
    assert (err * mask).max() < 0.02
    # swing feet follow the quintic references
    assert (err * (1 - mask)).max() < 0.03
    # contact forces are physical: touchdown transients stay bounded
    # (bilateral KKT contacts allow brief pulling; the weight-distribution
    # force regularization keeps it small), fz stays weight-scale
    fz = np.asarray(sol.forces)[..., 2]
    assert fz.min() > -10.0
    assert fz.max() < 2.0 * spec.total_mass * rb.GRAVITY


def test_solution_dynamics_consistency(setup, solution):
    """The solved X is an exact rollout of the solved U (iLQR invariant)."""
    _, _, spec, targets = setup
    sol = solution
    x_k = jnp.concatenate([sol.Q[5], sol.V[5]])
    q, v = sol.Q[5], sol.V[5]
    udot, _ = rb.constrained_forward_dynamics(
        spec, q, v, sol.TAU[5], targets.contact_mask[5],
        targets.contact_ref[5])
    qn, vn = rb.integrate_step(spec, q, v, udot, DT)
    np.testing.assert_allclose(np.asarray(qn), np.asarray(sol.Q[6]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(vn), np.asarray(sol.V[6]),
                               atol=1e-10)


def test_centroidal_extraction_and_interpolation(setup, solution):
    plan, _, spec, targets = setup
    sol = solution
    Xc = sol.centroidal_states()
    assert Xc.shape == (plan.horizon + 1, 9)
    # com column matches the com field; momentum magnitudes are physical
    np.testing.assert_allclose(np.asarray(Xc[:, 0:3]), np.asarray(sol.com))
    traj = wbd.interpolate_whole_body_solution(sol, DT, DT_CTRL)
    t = plan.horizon * 10
    assert traj["q"].shape == ((plan.horizon + 1 - 1) * 10, spec.nq)
    assert traj["tau_ff"].shape == (t, spec.n_joints)
    assert traj["forces"].shape == (t, 12)


def test_stage3_tracks_centroidal_solution(setup):
    """TRACK_CENTROIDAL=True mode: momentum/force targets come from a
    centroidal plan and the DDP follows its CoM path."""
    plan, swing, spec, _ = setup
    n = plan.horizon
    # synthetic centroidal plan: constant CoM height, steady x-progress
    com_x = np.linspace(0.0, 0.03, n + 1)
    Xc = np.zeros((n + 1, 9))
    Xc[:, 0] = com_x
    Xc[:, 2] = 0.22
    Xc[:, 3] = SOLO12.mass * 0.03 / (n * DT)   # px = m vx
    logic = np.asarray(plan.schedule.logic)
    Uc = np.zeros((n, 12))
    fz = SOLO12.mass * 9.81 / np.maximum(logic.sum(1), 1.0)
    for c in range(4):
        Uc[:, 3 * c + 2] = fz * logic[:, c]
    targets = wbd.build_targets(plan, swing, DT_CTRL,
                                X_centroidal=jnp.asarray(Xc),
                                U_centroidal=jnp.asarray(Uc),
                                dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(targets.mom_target),
                               Xc[:, 3:9], atol=1e-12)
    sol = wbd.solve_whole_body_ddp(
        spec, targets, DT, weights=wbd.WholeBodyWeights(force=1e-3),
        settings=DdpSettings(iterations=40, exact_quu=True))
    com = np.asarray(sol.com)
    assert abs(com[-1, 0] - 0.03) < 0.02
    assert abs(com[:, 2] - 0.22).max() < 0.02
