"""Full-physics closed-loop simulator tests (sim/physics.py).

The reference's counterpart is PyBullet Monte-Carlo (src/simulate_solo.py);
there is no numeric oracle, so these are physical-property tests: contact
model laws, energy sanity (a dropped robot settles), closed-loop stability
of a planned gait under the reference control law, and the slippage /
tracking-cost statistics pipeline (SURVEY.md section 4).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu import presets
from centroidal_mpc_tpu.config import gaits
from centroidal_mpc_tpu.contact import terrain
from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories
from centroidal_mpc_tpu.models import rigid_body as rb
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.models.whole_body import track_centroidal_solution
from centroidal_mpc_tpu.sim import physics as phys


@pytest.fixture(scope="module")
def closed_loop():
    """Standing trot (step_length 0) with full reference pipeline refs."""
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.0, step_height=0.03,
                          step_knots=8, support_knots=4, nb_steps=1)
    pre = dataclasses.replace(presets.SOLO12_TROT, gait=gait)
    prob = presets.build_problem(pre, dtype=jnp.float64)
    swing = compute_swing_trajectories(prob.plan, 0.001)
    wb = track_centroidal_solution(prob.plan, swing, prob.X0, prob.U0, 0.001)
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    refs = phys.build_references(wb, prob.X0, data.K, prob.plan.schedule)
    spec = rb.solo12_spec()
    q0 = jnp.concatenate([refs.h_des[0, :3], jnp.zeros(3), refs.q_des[0]])
    x0 = jnp.concatenate([q0, jnp.zeros(spec.nv)])
    return spec, refs, x0


def test_contact_force_laws():
    """Normal force: spring-damper, never negative; friction clamped to
    the cone; airborne feet re-anchor."""
    s = phys.PhysicsSettings()
    feet = jnp.array([[0.0, 0.0, -0.002],     # penetrating, static
                      [0.1, 0.0, -0.002],     # penetrating, dragged in x
                      [0.2, 0.0, 0.05],       # airborne
                      [0.3, 0.0, -0.001]])    # separating fast
    vel = jnp.array([[0.0, 0.0, 0.0],
                     [0.5, 0.0, 0.0],
                     [0.0, 0.0, 0.0],
                     [0.0, 0.0, 1.0]])
    anchors = feet + jnp.array([[0.0, 0.0, 0.0], [-0.05, 0.0, 0.0],
                                [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    f, new_anchors = phys._contact_forces(s, feet, vel, anchors, feet.dtype,
                                          terrain.FLAT.arrays(feet.dtype))
    # static foot: pure normal force kp*pen
    np.testing.assert_allclose(float(f[0, 2]), s.ground_kp * 0.002)
    assert abs(float(f[0, 0])) < 1e-12
    # dragged foot: tangential force clamped to mu * fz
    ft = float(jnp.linalg.norm(f[1, :2]))
    assert ft <= s.mu * float(f[1, 2]) + 1e-9
    assert ft > 0.9 * s.mu * float(f[1, 2])  # saturated
    # airborne foot: zero force, anchor snaps to current xy
    np.testing.assert_allclose(np.asarray(f[2]), 0.0)
    np.testing.assert_allclose(np.asarray(new_anchors[2]),
                               np.asarray(feet[2]))
    # separating fast: damper would pull -> clamped at zero
    assert float(f[3, 2]) == 0.0


def test_drop_settles_to_rest(closed_loop):
    """A robot dropped from 1 cm above its stance settles on the ground:
    contact dissipates energy, final CoM height near static equilibrium."""
    spec, refs, x0 = closed_loop
    x_drop = x0.at[2].add(0.01)
    # constant standing references (first-knot targets held)
    hold = refs.replace(
        q_des=jnp.tile(refs.q_des[0], (600, 1)),
        qd_des=jnp.zeros((600, refs.qd_des.shape[1]), x0.dtype),
        tau_ff=jnp.tile(refs.tau_ff[0], (600, 1)),
        h_des=jnp.tile(refs.h_des[0], (600, 1)),
        K_lqr=jnp.tile(refs.K_lqr[0], (600, 1, 1)),
        logic=jnp.ones((600, 4), x0.dtype))
    h, feet, _ = phys.simulate_episode(spec, hold, x_drop, jnp.zeros(3),
                                       jnp.asarray(10**9), 1)
    pz_end = float(jnp.abs(h[-50:, 5]).max())   # pz = m vz [kg m/s]
    assert pz_end < 0.1                          # |vz| < 4 cm/s
    assert 0.15 < float(h[-1, 2]) < 0.30


def test_closed_loop_gait_tracks(closed_loop):
    """No-push episode: the reference control law keeps the robot upright
    and near the plan through two swing phases."""
    spec, refs, x0 = closed_loop
    h, feet, rpy = phys.simulate_episode(spec, refs, x0, jnp.zeros(3),
                                         jnp.asarray(10**9), 1)
    assert float(h[:, 2].min()) > 0.12
    assert float(jnp.abs(h[-1, 0:2]).max()) < 0.10   # CoM xy stays home
    assert float(jnp.abs(rpy).max()) < 0.5


def test_monte_carlo_pushes_and_stats(closed_loop):
    spec, refs, x0 = closed_loop
    res = phys.run_physics_monte_carlo(spec, refs, x0,
                                       jax.random.PRNGKey(3), 4)
    assert res.h.shape[0] == 4
    assert not bool(res.fell.any())
    slip = phys.foot_slippage(res, refs)
    cost = phys.tracking_cost(res, refs)
    assert slip.shape == (4,)
    assert float(slip.min()) >= 0.0
    # cumulative cost is nondecreasing
    assert float((cost[:, 1:] - cost[:, :-1]).min()) >= -1e-9
    # pushes perturb: pushed episodes differ from each other
    assert float(jnp.abs(res.h[0] - res.h[1]).max()) > 1e-4


def test_swing_references_have_no_holes(closed_loop):
    """Regression: poly sample-count truncation left (0,0,0) holes at
    swing-phase ends (utils/polynomials.py int -> round fix), producing
    ~700 rad/s qd_des spikes."""
    _, refs, _ = closed_loop
    assert float(jnp.abs(refs.qd_des).max()) < 50.0
    dq = jnp.abs(refs.q_des[1:] - refs.q_des[:-1]).max()
    assert float(dq) < 0.05
