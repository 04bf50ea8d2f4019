"""Contact-plan expansion tests against reference semantics
(src/contact_plan.py:112-264)."""
import numpy as np
import pytest

from centroidal_mpc_tpu.config import gaits
from centroidal_mpc_tpu.config.robots import BOLT, SOLO12, TALOS
from centroidal_mpc_tpu.contact.plan import build_contact_plan
from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories

DT = 0.01


def test_trot_horizon_matches_reference():
    # nbSteps=4 trot: 3 x (5+15+5+15) + (5+15+5+15+5) = 165 knots
    # (SURVEY.md "Key dimensions"; conf_solo12_trot.py:50).
    plan = build_contact_plan(SOLO12, gaits.SOLO12_TROT, DT)
    assert plan.horizon == 165
    assert plan.schedule.logic.shape == (165, 4)
    assert plan.schedule.position.shape == (165, 4, 3)
    assert plan.schedule.orientation.shape == (165, 4, 3, 3)


def test_bench_gait_horizon_is_50():
    plan = build_contact_plan(SOLO12, gaits.SOLO12_TROT_N50, DT)
    assert plan.horizon == 50


def test_trot_phase_structure():
    plan = build_contact_plan(SOLO12, gaits.SOLO12_TROT, DT)
    logic = np.asarray(plan.schedule.logic)
    # First 5 knots: double support, all active.
    assert np.all(logic[:5] == 1.0)
    # Knots 5..20: rflhStep -> FR(0) and HL(3) swing; FL(1), HR(2) planted.
    assert np.all(logic[5:20, 0] == 0.0)
    assert np.all(logic[5:20, 3] == 0.0)
    assert np.all(logic[5:20, 1] == 1.0)
    assert np.all(logic[5:20, 2] == 1.0)
    # Final phase: closing double support.
    assert np.all(logic[-5:] == 1.0)


def test_step_length_advancement():
    plan = build_contact_plan(SOLO12, gaits.SOLO12_TROT, DT)
    pos = np.asarray(plan.schedule.position)
    x0 = SOLO12.stance_positions_array()
    # After the first rflhStep, FR has advanced by stepLength: visible in the
    # second double support (knots 20..25).
    np.testing.assert_allclose(pos[20, 0, 0], x0[0, 0] + 0.12, atol=1e-12)
    np.testing.assert_allclose(pos[20, 1, 0], x0[1, 0], atol=1e-12)
    # Each foot steps nb_steps times in total -> final placement advanced by
    # nb_steps * stepLength.
    np.testing.assert_allclose(pos[-1, :, 0], x0[:, 0] + 4 * 0.12, atol=1e-12)
    # Inactive knots carry zero position (reference centroidal_model.py:144-145).
    assert np.all(pos[5:20, 0] == 0.0)


def test_orientation_identity_when_active():
    plan = build_contact_plan(SOLO12, gaits.SOLO12_TROT, DT)
    rot = np.asarray(plan.schedule.orientation)
    np.testing.assert_allclose(rot[0, 0], np.eye(3), atol=1e-12)
    assert np.all(rot[5:20, 0] == 0.0)


def test_biped_pace_uses_two_contacts():
    plan = build_contact_plan(TALOS, gaits.TALOS_PACE, dt=0.03)
    # nbSteps=4 pace biped: 3*(5+15+5+15)+(5+15+5+15+5) = 165
    assert plan.horizon == 165
    assert plan.schedule.logic.shape[1] == 2
    logic = np.asarray(plan.schedule.logic)
    # rfStep: RF (index 0) swings.
    assert np.all(logic[5:20, 0] == 0.0)
    assert np.all(logic[5:20, 1] == 1.0)


def test_bolt_pace():
    plan = build_contact_plan(BOLT, gaits.BOLT_PACE, dt=0.01)
    # nbSteps=5: 4*(2+10+2+10) + (2+10+2+10+2) = 122
    assert plan.horizon == 122


def test_swing_trajectories_shape_and_landing():
    gait = gaits.SOLO12_TROT
    plan = build_contact_plan(SOLO12, gait, DT)
    swing = compute_swing_trajectories(plan, dt_ctrl=0.001)
    n_ctrl_total = int(round(plan.phases[-1].t_end / 0.001))
    assert swing.pos.shape == (4, 3, n_ctrl_total)
    # During the first swing phase of FR (t in [0.05, 0.20)), x goes from the
    # stance position toward stance + stepLength.
    x0 = SOLO12.stance_positions_array()[0, 0]
    t0, t1 = int(0.05 / 0.001), int(0.20 / 0.001)
    np.testing.assert_allclose(swing.pos[0, 0, t0], x0, atol=1e-9)
    np.testing.assert_allclose(swing.pos[0, 0, t1 - 1], x0 + 0.12, atol=1e-2)
    # z reaches ~step_height mid-swing and returns near zero.
    zmax = swing.pos[0, 2, t0:t1].max()
    assert zmax == pytest.approx(gait.step_height, abs=1e-2)
    assert abs(swing.pos[0, 2, t1 - 1]) < 5e-3
    # While planted, foot reference equals the placement.
    np.testing.assert_allclose(swing.pos[1, :, 0],
                               SOLO12.stance_positions_array()[1], atol=1e-12)
