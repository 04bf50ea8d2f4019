"""Uneven-terrain (stepstone/Debris) capability tests.

Reference counterparts: rotated `Debris` contact frames
(src/contact_plan.py:8-37), per-knot (logic, R, p) packing
(fill_debris_list, :305-328), and the PyBullet stepstone terrain
(src/simulate_solo.py:55-75, 217-256).  These tests cover the full path:
terrain geometry -> foothold snapping with rotated frames -> SCP solving
with *active* rotated friction pyramids -> physics plant colliding with the
same stones.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu import presets
from centroidal_mpc_tpu.config import gaits
from centroidal_mpc_tpu.config.robots import SOLO12
from centroidal_mpc_tpu.contact import terrain as ter
from centroidal_mpc_tpu.contact.plan import build_contact_plan
from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories
from centroidal_mpc_tpu.solver.ocp import friction_pyramid_matrix
from centroidal_mpc_tpu.solver.scp import solve_scp

MU = 0.5
# Tilt strictly steeper than the pyramid half-angle atan(mu/sqrt(2)) =
# 0.3398 rad: a world-vertical force then VIOLATES the rotated cone, so a
# feasible solution must lean into the slope -- the rotated rows are
# provably active, not decorative.
STEEP = 0.40


def _standing_terrain(roll: float = STEEP) -> ter.Terrain:
    """Stones under solo12's two left feet (y > 0), tilted about x."""
    stance = SOLO12.stance_positions_array()
    stones = tuple(
        ter.Stepstone(center=(p[0], p[1]), height=0.02, size=(0.12, 0.12),
                      roll=roll)
        for p in stance if p[1] > 0)
    return ter.Terrain(stones=stones)


def _standing_problem(terrain, stochastic=False):
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.0, step_height=0.03,
                          step_knots=8, support_knots=4, nb_steps=1)
    pre = dataclasses.replace(presets.SOLO12_TROT, gait=gait)
    return presets.build_problem(pre, dtype=jnp.float64, terrain=terrain,
                                 stochastic=stochastic)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def test_stepstone_plane_geometry():
    st = ter.Stepstone(center=(0.25, 0.15), height=0.01, roll=0.2)
    assert st.covers(0.25, 0.15) and st.covers(0.29, 0.19)
    assert not st.covers(0.4, 0.15)
    np.testing.assert_allclose(st.plane_height(0.25, 0.15), 0.01)
    # roll > 0 tilts the normal toward -y: surface rises with +y
    assert st.plane_height(0.25, 0.17) > 0.01
    n = st.normal()
    np.testing.assert_allclose(np.linalg.norm(n), 1.0)
    assert n[1] < 0 and n[2] > 0.9


def test_terrain_surface_at_picks_highest_cover():
    t = ter.Terrain(stones=(
        ter.Stepstone(center=(0.0, 0.0), height=0.01),
        ter.Stepstone(center=(0.02, 0.0), height=0.03, pitch=0.1),
    ))
    z, r = t.surface_at(0.01, 0.0)
    assert z > 0.025                      # the higher stone wins
    assert not np.allclose(r, np.eye(3))
    z_g, r_g = t.surface_at(1.0, 1.0)     # off both stones: flat ground
    assert z_g == 0.0
    np.testing.assert_allclose(r_g, np.eye(3))


def test_reference_debris_layout_mapping():
    """TROT_DEBRIS mirrors build_one_stepstone(start_pos=(0.2, 0.15, 0.01),
    orientation=(0.1, 0, 0, 1)) (src/simulate_solo.py:225-229): box spans
    x in [0.2, 0.3], top face at z=0.01, roll = 2 atan(0.1)."""
    s = ter.TROT_DEBRIS.stones[0]
    np.testing.assert_allclose(s.center, (0.25, 0.15))
    np.testing.assert_allclose(s.height, 0.01)
    np.testing.assert_allclose(s.roll, 2 * np.arctan(0.1))
    assert s.covers(0.21, 0.15) and s.covers(0.29, 0.15)
    assert not s.covers(0.31, 0.15)


def test_surface_query_matches_host_side():
    t = ter.TROT_DEBRIS
    from centroidal_mpc_tpu.sim.physics import surface_query
    arr = t.arrays()
    pts = np.array([[0.25, 0.15, 0.0], [0.47, -0.16, 0.0], [0.0, 0.0, 0.0]])
    _, n_dev, z_dev = jax.jit(surface_query)(arr, jnp.asarray(pts))
    for i, p in enumerate(pts):
        z_host, r_host = t.surface_at(p[0], p[1])
        np.testing.assert_allclose(float(z_dev[i]), z_host, atol=1e-12)
        np.testing.assert_allclose(np.asarray(n_dev[i]), r_host[:, 2],
                                   atol=1e-12)


# ---------------------------------------------------------------------------
# contact plan on terrain
# ---------------------------------------------------------------------------

def test_plan_snaps_footholds_to_stones():
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.1, step_height=0.05,
                          step_knots=8, support_knots=4, nb_steps=2)
    plan = build_contact_plan(SOLO12, gait, 0.01, terrain=ter.TROT_DEBRIS,
                              dtype=jnp.float64)
    ori = np.asarray(plan.schedule.orientation)
    pos = np.asarray(plan.schedule.position)
    logic = np.asarray(plan.schedule.logic) > 0
    tilted = [(k, c) for k in range(ori.shape[0]) for c in range(4)
              if logic[k, c]
              and not np.allclose(ori[k, c], np.eye(3), atol=1e-12)]
    assert len(tilted) > 0
    # tilted footholds sit on the stone plane, not the ground
    for k, c in tilted:
        x, y, z = pos[k, c]
        z_host, r_host = ter.TROT_DEBRIS.surface_at(x, y)
        assert z > 0.0
        np.testing.assert_allclose(z, z_host, atol=1e-12)
        np.testing.assert_allclose(ori[k, c], r_host, atol=1e-12)
    # inactive knots keep the zero frame (reference fill_debris_list
    # emits jnp.zeros((3,3)) for inactive contacts)
    assert np.allclose(ori[~logic], 0.0)


def test_flat_plan_unchanged_by_default():
    """No terrain argument -> identical schedule to round 1 (identity
    frames, z = 0)."""
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.1, step_height=0.05,
                          step_knots=4, support_knots=2, nb_steps=1)
    plan = build_contact_plan(SOLO12, gait, 0.01, dtype=jnp.float64)
    ori = np.asarray(plan.schedule.orientation)
    logic = np.asarray(plan.schedule.logic) > 0
    assert np.allclose(np.asarray(plan.schedule.position)[..., 2], 0.0)
    for k in range(ori.shape[0]):
        for c in range(4):
            if logic[k, c]:
                np.testing.assert_allclose(ori[k, c], np.eye(3))


def test_swing_trajectories_reach_stone_heights():
    """Swing z endpoints follow the lift-off/landing surface heights and
    the apex clears the higher surface by step_height."""
    stone = ter.Stepstone(center=(0.2946, -0.14695), height=0.03,
                          size=(0.2, 0.1))
    gait = gaits.GaitSpec(gaits.TROT, step_length=0.1, step_height=0.05,
                          step_knots=8, support_knots=4, nb_steps=1)
    plan = build_contact_plan(SOLO12, gait, 0.01,
                              terrain=ter.Terrain(stones=(stone,)),
                              dtype=jnp.float64)
    swing = compute_swing_trajectories(plan, 0.001)
    # FR (index 0) swings first and lands on the stone
    fr = swing.pos[0]
    land_phase = next(ph for ph in plan.phases
                      if not ph.active[0] and ph.name == "rflhStep")
    t1 = int(round(land_phase.t_end / 0.001)) - 1
    assert abs(fr[2, t1] - 0.03) < 5e-3          # lands at stone height
    assert fr[2].max() >= 0.03 + 0.04            # apex clears stone + ~h


# ---------------------------------------------------------------------------
# SCP on tilted contacts (the end-to-end solver test)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tilted_solution():
    terrain = _standing_terrain()
    prob = _standing_problem(terrain)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp, prob.X0,
                    prob.U0, prob.scp)
    return prob, sol


def _cone_values(prob, U):
    """G R' f per (knot, contact, row) for the 4 filled tangential rows."""
    G = friction_pyramid_matrix(MU, jnp.float64)[:4]
    ori = np.asarray(prob.plan.schedule.orientation)
    logic = np.asarray(prob.plan.schedule.logic)
    f = np.asarray(U).reshape(U.shape[0], 4, 3)
    vals = np.einsum("ri,kcji,kcj->kcr", G, ori, f)
    return vals, logic


def test_scp_solves_on_tilted_contacts(tilted_solution):
    prob, sol = tilted_solution
    assert bool(sol.success)
    assert bool(sol.qp_converged)
    vals, logic = _cone_values(prob, sol.U)
    active = logic > 0
    # rotated cone satisfied at every active contact
    assert vals[active].max() < 1e-4
    # ... and provably ACTIVE: some rotated row is binding (near zero)
    assert vals[active].max() > -1e-2


def test_tilted_cone_rejects_vertical_forces(tilted_solution):
    """The weight-distribution warm start (world-vertical forces) violates
    the rotated cone on the steep stones -- the rotated rows really
    constrain the solution; identity frames would not."""
    prob, _ = tilted_solution
    vals, logic = _cone_values(prob, prob.U0)
    ori = np.asarray(prob.plan.schedule.orientation)
    tilted = (logic > 0) & ~np.isclose(
        ori[:, :, 2, 2], 1.0, atol=1e-9)
    assert vals[tilted].max() > 1e-2     # vertical force breaks tilted cone
    # the solved forces differ from the warm start on tilted contacts
    _, sol = tilted_solution
    dU = np.abs(np.asarray(sol.U) - np.asarray(prob.U0)).reshape(-1, 4, 3)
    assert dU.max() > 0.1


def test_tilted_forces_lean_into_slope(tilted_solution):
    """On a +roll stone (normal tilted toward -y) the contact force picks
    up a -y tangential component; flat-ground feet stay near vertical."""
    prob, sol = tilted_solution
    f = np.asarray(sol.U).reshape(-1, 4, 3)
    logic = np.asarray(prob.plan.schedule.logic)
    ori = np.asarray(prob.plan.schedule.orientation)
    tilted_mask = (logic > 0) & ~np.isclose(ori[:, :, 2, 2], 1.0, atol=1e-9)
    fy = f[..., 1][tilted_mask]
    fz = f[..., 2][tilted_mask]
    big = fz > 1.0                     # loaded knots
    assert (fy[big] < 0).mean() > 0.9  # leaning into the slope


def test_stochastic_scp_on_tilted_contacts():
    """Chance back-offs compose with rotated pyramids (the G in the
    back-off expression is the rotated one)."""
    terrain = _standing_terrain(roll=0.25)   # moderate tilt + back-offs
    prob = _standing_problem(terrain, stochastic=True)
    scp = dataclasses.replace(prob.scp, lqr_iters=30)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp, prob.X0,
                    prob.U0, scp)
    assert bool(sol.success)
    vals, logic = _cone_values(prob, sol.U)
    assert vals[logic > 0].max() < 1e-4


# ---------------------------------------------------------------------------
# physics plant on terrain
# ---------------------------------------------------------------------------

def test_contact_forces_on_tilted_plane():
    """A foot pressed into a tilted stone gets a force along the stone
    normal (not world-z) while sticking."""
    from centroidal_mpc_tpu.sim import physics as phys
    stone = ter.Stepstone(center=(0.0, 0.0), height=0.02, roll=STEEP)
    arr = ter.Terrain(stones=(stone,)).arrays()
    s = phys.PhysicsSettings()
    n = stone.normal()
    p_surf = np.array([0.0, 0.0, 0.02])
    foot = jnp.asarray(p_surf - 0.002 * n)[None]   # 2 mm into the plane
    vel = jnp.zeros((1, 3))
    anchor = jnp.asarray(p_surf)[None]
    f, _ = phys._contact_forces(s, foot, vel, anchor, foot.dtype, arr)
    f = np.asarray(f[0])
    fn = float(f @ n)
    np.testing.assert_allclose(fn, s.ground_kp * 0.002, rtol=1e-6)
    # anchored at the penetration point's projection: no spurious large
    # tangential force
    ft = f - fn * n
    assert np.linalg.norm(ft) <= s.mu * fn + 1e-9


def test_standing_on_stones_settles():
    """Closed-loop hold on the tilted-stone stance: the robot settles
    without falling and the stone feet track the stone surfaces."""
    from centroidal_mpc_tpu.models import rigid_body as rb
    from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
    from centroidal_mpc_tpu.models.whole_body import track_centroidal_solution
    from centroidal_mpc_tpu.sim import physics as phys

    terrain = _standing_terrain(roll=0.2)
    prob = _standing_problem(terrain)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp, prob.X0,
                    prob.U0, prob.scp)
    assert bool(sol.success)
    swing = compute_swing_trajectories(prob.plan, 0.001)
    wb = track_centroidal_solution(prob.plan, swing, sol.X, sol.U, 0.001)
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   sol.X, sol.U)
    refs = phys.build_references(wb, sol.X, data.K, prob.plan.schedule)
    spec = rb.solo12_spec()
    q0 = jnp.concatenate([refs.h_des[0, :3], jnp.zeros(3), refs.q_des[0]])
    x0 = jnp.concatenate([q0, jnp.zeros(spec.nv)])
    arr = terrain.arrays()
    h, feet, rpy = phys.simulate_episode(spec, refs, x0, jnp.zeros(3),
                                         jnp.asarray(10**9), 1,
                                         terrain=arr)
    assert float(h[:, 2].min()) > 0.12           # never collapses
    assert float(jnp.abs(rpy).max()) < 0.5
    # left feet (y > 0) end on the stones, not the ground plane
    feet_end = np.asarray(feet[-1])
    for c in range(4):
        x, y, z = feet_end[c]
        z_surf, _ = terrain.surface_at(x, y)
        if z_surf > 0:
            assert z > 0.005                     # resting at stone level
        assert z > z_surf - 0.01                 # at most mm-scale penetration
