"""Leg kinematics and whole-body tracking tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories
from centroidal_mpc_tpu.models import kinematics as kin
from centroidal_mpc_tpu.models import whole_body as wb
from centroidal_mpc_tpu.solver.scp import solve_scp


def test_fk_ik_roundtrip():
    """IK(FK(q)) = q over the below-hip locomotion workspace (the IK's
    assumed branch; see leg_ik docstring)."""
    geom = kin.SOLO12_LEGS
    rng = np.random.default_rng(0)
    checked = 0
    while checked < 200:
        q = jnp.asarray([rng.uniform(-0.6, 0.6),
                         rng.uniform(-0.9, 0.9),
                         rng.uniform(0.2, 2.2)])  # knee-back branch
        # keep samples whose foot is clearly below the hip plane
        pz = -(geom.l_upper * np.cos(q[1])
               + geom.l_lower * np.cos(q[1] + q[2]))
        if pz > -0.02:
            continue
        checked += 1
        for side in (1.0, -1.0):
            p = kin.leg_fk(q, jnp.asarray(side), geom)
            q2 = kin.leg_ik(p, jnp.asarray(side), 1.0, geom)
            np.testing.assert_allclose(np.asarray(q2), np.asarray(q),
                                       atol=1e-9)


def test_stance_ik_matches_robot_spec():
    """IK of the nominal stance reproduces foot placements consistent with
    RobotSpec.stance_foot_positions at standing height."""
    from centroidal_mpc_tpu.config.robots import SOLO12
    feet_world = jnp.asarray(SOLO12.stance_positions_array())
    base = jnp.asarray([0.0, 0.0, SOLO12.com_height])
    q = kin.ik_all_legs(feet_world - base)
    feet_rt = kin.fk_all_legs(q) + base
    np.testing.assert_allclose(np.asarray(feet_rt), np.asarray(feet_world),
                               atol=1e-9)


def test_jacobian_matches_finite_difference():
    q = jnp.asarray([0.1, -0.4, 0.9])
    side = jnp.asarray(1.0)
    J = np.asarray(kin.leg_jacobian(q, side))
    eps = 1e-7
    for j in range(3):
        dq = np.zeros(3)
        dq[j] = eps
        d = (np.asarray(kin.leg_fk(q + dq, side))
             - np.asarray(kin.leg_fk(q - dq, side))) / (2 * eps)
        np.testing.assert_allclose(J[:, j], d, atol=1e-6)


def test_static_torques_support_weight():
    """tau = -J'f at stance with weight-bearing forces: knee torques carry
    the load; a zero force gives zero torque."""
    from centroidal_mpc_tpu.config.robots import SOLO12
    feet_world = jnp.asarray(SOLO12.stance_positions_array())
    base = jnp.asarray([0.0, 0.0, SOLO12.com_height])
    q = kin.ik_all_legs(feet_world - base)
    w = SOLO12.weight_force / 4
    f = jnp.tile(jnp.asarray([0.0, 0.0, w]), (4, 1))
    tau = np.asarray(kin.feet_contact_torques(q, f))
    assert np.abs(tau).max() > 0.1          # load is carried
    tau0 = np.asarray(kin.feet_contact_torques(q, jnp.zeros((4, 3))))
    np.testing.assert_allclose(tau0, 0.0, atol=1e-12)


@pytest.fixture(scope="module")
def tracked():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, prob.scp)
    assert bool(sol.success)
    swing = compute_swing_trajectories(prob.plan, prob.preset.dt_ctrl)
    traj = wb.track_centroidal_solution(prob.plan, swing, sol.X, sol.U,
                                        prob.preset.dt_ctrl)
    return prob, sol, traj


def test_whole_body_shapes_and_consistency(tracked):
    prob, sol, traj = tracked
    T = prob.plan.horizon * 10
    assert traj.q.shape == (T, 12)
    assert traj.qdot.shape == (T, 12)
    assert traj.tau_ff.shape == (T, 12)
    # FK of the IK joints reproduces the foot targets
    q_legs = np.asarray(traj.q).reshape(T, 4, 3)
    base = np.asarray(traj.base_pos)
    feet_fk = np.stack([
        np.asarray(kin.fk_all_legs(jnp.asarray(q_legs[t]))) + base[t]
        for t in range(0, T, 37)])
    feet_ref = np.asarray(traj.feet)[::37]
    np.testing.assert_allclose(feet_fk, feet_ref, atol=1e-6)
    # torque magnitudes sane for a 2.5 kg robot (solo12 limit ~ 3 Nm)
    assert np.abs(np.asarray(traj.tau_ff)).max() < 3.0


def test_dat_export(tracked, tmp_path):
    _, _, traj = tracked
    files = wb.export_robot_dat(traj, tmp_path)
    assert set(files) == {"quadruped_positions", "quadruped_velocities",
                          "quadruped_feedforward_torque"}
    data = np.loadtxt(files["quadruped_positions"])
    assert data.shape == (traj.q.shape[0], 13)  # index + 12 joints
    np.testing.assert_allclose(data[:, 1:], np.asarray(traj.q), atol=1e-12)
