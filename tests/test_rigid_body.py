"""Physics validation of the JAX rigid-body engine (models/rigid_body.py).

The reference outsources all of this to Pinocchio/Crocoddyl (C++); here the
engine itself is first-party, so the tests check physical invariants:
kinematic consistency with the closed-form leg model, kinetic-energy /
mass-matrix agreement, momentum conservation laws, and KKT satisfaction of
the contact dynamics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.models import kinematics as kin
from centroidal_mpc_tpu.models import rigid_body as rb

SPEC = rb.solo12_spec()


def _rand_state(key, base_motion=True):
    kq, ku = jax.random.split(key)
    q = 0.4 * jax.random.normal(kq, (SPEC.nq,), jnp.float64)
    if not base_motion:
        q = q.at[0:6].set(0.0)
    q = q.at[2].add(0.25)
    u = 0.5 * jax.random.normal(ku, (SPEC.nv,), jnp.float64)
    return q, u


def test_fk_matches_closed_form_legs():
    """World feet at identity base == closed-form base-frame FK."""
    key = jax.random.PRNGKey(0)
    q_legs = 0.6 * jax.random.normal(key, (4, 3), jnp.float64)
    q = jnp.concatenate([jnp.zeros(6, jnp.float64), q_legs.reshape(-1)])
    np.testing.assert_allclose(np.asarray(rb.foot_points(SPEC, q)),
                               np.asarray(kin.fk_all_legs(q_legs)),
                               atol=1e-12)


def test_mass_matrix_spd_and_energy_consistent():
    """M symmetric positive definite; u'Mu/2 == sum of body energies."""
    q, u = _rand_state(jax.random.PRNGKey(1))
    M = rb.mass_matrix(SPEC, q)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M.T), atol=1e-12)
    assert np.linalg.eigvalsh(np.asarray(M)).min() > 0
    # energy via body spatial velocities
    J = rb.body_jacobians(SPEC, q)
    I = rb.spatial_inertias_world(SPEC, q)
    v = jnp.einsum("brj,j->br", J, u)
    t_bodies = 0.5 * jnp.einsum("br,brs,bs->", v, I, v)
    np.testing.assert_allclose(float(0.5 * u @ M @ u), float(t_bodies),
                               rtol=1e-12)


def test_contact_jacobian_matches_foot_point_ad():
    """Jc u == d/dt foot_points along the coordinate rates."""
    q, u = _rand_state(jax.random.PRNGKey(2))
    qdot = rb._kinematic_qdot(SPEC, q, u)
    _, feet_dot = jax.jvp(lambda qq: rb.foot_points(SPEC, qq), (q,), (qdot,))
    Jc = rb.contact_jacobian(SPEC, q)
    np.testing.assert_allclose(np.asarray(jnp.einsum("fij,j->fi", Jc, u)),
                               np.asarray(feet_dot), atol=1e-10)


def test_free_fall_momentum_laws():
    """Unconstrained, unactuated: dP/dt = m g and dL_O/dt = c x m g."""
    q, u = _rand_state(jax.random.PRNGKey(3))
    tau = jnp.zeros(12, jnp.float64)
    mask = jnp.zeros(4, jnp.float64)
    ref = jnp.zeros((4, 3), jnp.float64)
    udot, f = rb.constrained_forward_dynamics(SPEC, q, u, tau, mask, ref)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-8)

    def momentum_origin(qq, uu):
        J = rb.body_jacobians(SPEC, qq)
        I = rb.spatial_inertias_world(SPEC, qq)
        return jnp.einsum("brs,bsj,j->r", I, J, uu)

    qdot = rb._kinematic_qdot(SPEC, q, u)
    _, dh = jax.jvp(momentum_origin, (q, u), (qdot, udot))
    m_tot = SPEC.total_mass
    g = jnp.array([0.0, 0.0, -rb.GRAVITY], jnp.float64)
    com = rb.com_position(SPEC, q)
    np.testing.assert_allclose(np.asarray(dh[3:6]), np.asarray(m_tot * g),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(dh[0:3]),
                               np.asarray(jnp.cross(com, m_tot * g)),
                               atol=1e-7)


def test_bias_matches_lagrangian_finite_difference():
    """h(q,u) against the energy-based Euler-Lagrange equations.

    In coordinate rates qdot the EOM are d/dt(dT/dqdot) - dT/dq + dV/dq =
    tau_q.  With tau = 0 and no contacts the engine's udot must satisfy
    them; checked by AD of the scalar Lagrangian (independent pathway from
    bias_forces' d'Alembert assembly).
    """
    q, u = _rand_state(jax.random.PRNGKey(4))

    def qdot_of(qq, uu):
        return rb._kinematic_qdot(SPEC, qq, uu)

    def u_of(qq, qd):
        # invert the (linear in u) kinematic map
        B = jax.jacfwd(lambda uu: qdot_of(qq, uu))(jnp.zeros_like(u))
        return jnp.linalg.solve(B, qd)

    def kinetic(qq, qd):
        uu = u_of(qq, qd)
        return 0.5 * uu @ rb.mass_matrix(SPEC, qq) @ uu

    def potential(qq):
        return SPEC.total_mass * rb.GRAVITY * rb.com_position(SPEC, qq)[2]

    qdot = qdot_of(q, u)
    udot, _ = rb.constrained_forward_dynamics(
        SPEC, q, u, jnp.zeros(12, jnp.float64), jnp.zeros(4, jnp.float64),
        jnp.zeros((4, 3), jnp.float64))
    _, qddot = jax.jvp(qdot_of, (q, u), (qdot, udot))

    p_fn = jax.grad(kinetic, argnums=1)
    # d/dt (dT/dqdot) along (qdot, qddot)
    _, dp = jax.jvp(p_fn, (q, qdot), (qdot, qddot))
    residual = dp - jax.grad(kinetic, argnums=0)(q, qdot) \
        + jax.grad(potential)(q)
    np.testing.assert_allclose(np.asarray(residual), 0.0, atol=1e-7)


def test_contact_dynamics_satisfies_kkt():
    """Active feet: Jc udot + gamma = -kd v - kp err; inactive: f = 0."""
    q, u = _rand_state(jax.random.PRNGKey(5))
    mask = jnp.array([1.0, 0.0, 1.0, 1.0], jnp.float64)
    feet = rb.foot_points(SPEC, q)
    ref = feet + 0.01
    tau = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (12,), jnp.float64)
    s = rb.ContactDynamicsSettings()
    udot, f = rb.constrained_forward_dynamics(SPEC, q, u, tau, mask, ref,
                                              settings=s)
    np.testing.assert_allclose(np.asarray(f[1]), 0.0, atol=1e-9)
    Jc = rb.contact_jacobian(SPEC, q).reshape(12, SPEC.nv)
    qdot = rb._kinematic_qdot(SPEC, q, u)
    _, gamma = jax.jvp(
        lambda qq: rb.contact_jacobian(SPEC, qq).reshape(12, SPEC.nv) @ u,
        (q,), (qdot,))
    lhs = (Jc @ udot + gamma).reshape(4, 3)
    rhs = (-s.baumgarte_kd * (Jc @ u).reshape(4, 3)
           - s.baumgarte_kp * (feet - ref))
    for i in range(4):
        if mask[i] > 0.5:
            np.testing.assert_allclose(np.asarray(lhs[i]),
                                       np.asarray(rhs[i]), atol=1e-6)
    # EOM: M udot + h = S'tau + Jc' f
    M = rb.mass_matrix(SPEC, q)
    h = rb.bias_forces(SPEC, q, u)
    tau_gen = jnp.concatenate([jnp.zeros(6, jnp.float64), tau])
    np.testing.assert_allclose(
        np.asarray(M @ udot + h),
        np.asarray(tau_gen + Jc.T @ f.reshape(12)), atol=1e-6)


def test_standing_equilibrium():
    """PD around a stance with gravity-consistent feet stays put."""
    q_legs = kin.ik_all_legs(
        jnp.asarray(kin.SOLO12_LEGS.hip_positions(), jnp.float64)
        + jnp.array([0.0, 0.0, -0.24], jnp.float64))
    q = jnp.concatenate([jnp.array([0.0, 0.0, 0.24, 0.0, 0.0, 0.0],
                                   jnp.float64), q_legs.reshape(-1)])
    u = jnp.zeros(SPEC.nv, jnp.float64)
    ref = rb.foot_points(SPEC, q)
    mask = jnp.ones(4, jnp.float64)

    def pd_step(carry, _):
        qk, uk = carry
        tau = -50.0 * (qk[6:] - q[6:]) - 1.0 * uk[6:]
        udot, _f = rb.constrained_forward_dynamics(SPEC, qk, uk, tau, mask,
                                                   ref)
        qn, un = rb.integrate_step(SPEC, qk, uk, udot, 1e-3)
        return (qn, un), None

    (qf, uf), _ = jax.lax.scan(pd_step, (q, u), None, length=500)
    assert float(jnp.abs(qf[0:3] - q[0:3]).max()) < 5e-3
    assert float(jnp.abs(uf).max()) < 0.2


def test_centroidal_momentum_consistency():
    """Linear part == total mass * com velocity."""
    q, u = _rand_state(jax.random.PRNGKey(7))
    h = rb.centroidal_momentum(SPEC, q, u)
    qdot = rb._kinematic_qdot(SPEC, q, u)
    _, com_dot = jax.jvp(lambda qq: rb.com_position(SPEC, qq), (q,), (qdot,))
    np.testing.assert_allclose(np.asarray(h[0:3]),
                               np.asarray(SPEC.total_mass * com_dot),
                               rtol=1e-9, atol=1e-12)
