"""Analytic leg kinematics for point-foot robots (solo12, bolt) in JAX.

The reference leans on pinocchio (C++) for all kinematics: foot placements
(src/contact_plan.py:149-155), whole-body state extraction
(src/whole_body_control.py:384-432) and contact Jacobians in the simulator
(src/simulate_solo.py:146-160).  3-DoF point-foot legs (hip
abduction-adduction HAA about x, hip flexion HFE and knee KFE about y)
admit closed-form FK and IK, so the whole kinematic layer is a handful of
trigonometric expressions: jittable, vmappable over legs/knots/batches,
differentiable (Jacobians via jacfwd).  The same geometry class covers the
solo12 quadruped and the bolt biped (reference conf_bolt.py) — a geometry
is just the set of HAA origins, lateral-offset signs, and link lengths.

Conventions: base frame centered at the base link, x forward, z up.  Leg
order matches RobotSpec.foot_names (solo12: FR, FL, HR, HL; bolt: FL, FR).
Zero configuration = straight legs pointing down.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LegGeometry:
    """Point-foot leg geometry (meters), approximating URDF parameters.

    hip_x/hip_y: HAA joint position in the base frame; y_off: lateral
    offset from the HAA axis to the leg's sagittal plane; l_upper/l_lower:
    link lengths.  By default the hips form the solo12 quadruped layout
    (FR, FL, HR, HL); `hips`/`sides` override it for other morphologies
    (e.g. the 2-legged bolt).
    """

    hip_x: float = 0.1946
    hip_y: float = 0.0875
    y_off: float = 0.05945
    l_upper: float = 0.160
    l_lower: float = 0.160
    hips: Optional[Tuple[Tuple[float, float, float], ...]] = None
    sides: Optional[Tuple[float, ...]] = None

    @property
    def n_legs(self) -> int:
        return 4 if self.hips is None else len(self.hips)

    def hip_positions(self) -> np.ndarray:
        """(n_legs, 3) HAA origins in base frame."""
        if self.hips is not None:
            return np.asarray(self.hips, np.float64)
        return np.array([
            [self.hip_x, -self.hip_y, 0.0],
            [self.hip_x, self.hip_y, 0.0],
            [-self.hip_x, -self.hip_y, 0.0],
            [-self.hip_x, self.hip_y, 0.0],
        ])

    def side_signs(self) -> np.ndarray:
        """(n_legs,) +1 left / -1 right lateral offset signs."""
        if self.sides is not None:
            return np.asarray(self.sides, np.float64)
        return np.array([-1.0, 1.0, -1.0, 1.0])


SOLO12_LEGS = LegGeometry()

# Bolt point-foot biped (reference conf_bolt.py; FL, FR order from its
# ee_frame_names ['FL_ANKLE', 'FR_ANKLE']).  The HAA origins put the legs
# directly above the nominal stance of config/robots.py:BOLT; the 0.25 m
# segments make the BOLT com_height (0.355 m, the reference q0 base
# height) reachable with the whole-body mass distribution of
# rigid_body.bolt_spec — a deliberate deviation from the published link
# lengths in favor of framework-internal consistency.
BOLT_LEGS = LegGeometry(
    hip_x=0.0, hip_y=0.1235, y_off=0.0, l_upper=0.25, l_lower=0.25,
    hips=((0.0, 0.1235, 0.0), (0.0, -0.1235, 0.0)),
    sides=(1.0, -1.0))


def leg_fk(q: jnp.ndarray, side: jnp.ndarray,
           geom: LegGeometry = SOLO12_LEGS) -> jnp.ndarray:
    """Foot position in the HIP frame for one leg.

    q = (q_haa, q_hfe, q_kfe); side = +-1 (lateral offset sign).
    The sagittal-plane chain hangs below the HFE axis; HAA rotates the
    plane about the base x-axis.
    """
    haa, hfe, kfe = q[0], q[1], q[2]
    # planar chain in the leg plane (x forward, z down-positive distance)
    px = -(geom.l_upper * jnp.sin(hfe) + geom.l_lower * jnp.sin(hfe + kfe))
    pz = -(geom.l_upper * jnp.cos(hfe) + geom.l_lower * jnp.cos(hfe + kfe))
    p_plane = jnp.array([px, side * geom.y_off, pz])
    c, s = jnp.cos(haa), jnp.sin(haa)
    rot_x = jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])
    return rot_x @ p_plane


def leg_ik(p_hip: jnp.ndarray, side: jnp.ndarray, knee_sign: float = 1.0,
           geom: LegGeometry = SOLO12_LEGS) -> jnp.ndarray:
    """Closed-form IK: foot position in the hip frame -> (haa, hfe, kfe).

    knee_sign selects the knee-bent-backward (+1) or forward (-1) branch.
    Unreachable targets are clamped to the workspace boundary.  The
    below-hip branch is assumed (foot under the hip plane, the locomotion
    workspace); targets above the hip plane resolve to their below-plane
    mirror.
    """
    x, y, z = p_hip[0], p_hip[1], p_hip[2]
    # HAA from the lateral plane: rotate (y, z) so the leg plane sits at
    # lateral offset side*y_off.  With r^2 = y^2 + z^2, the in-plane
    # vertical reach is sqrt(r^2 - y_off^2).
    r_sq = y * y + z * z
    r = jnp.sqrt(jnp.maximum(r_sq, geom.y_off**2 + 1e-10))
    zeta = jnp.sqrt(jnp.maximum(r_sq - geom.y_off**2, 1e-12))
    # angle of (y, z) and of the target point in the rotated frame
    haa = jnp.arctan2(z, y) - jnp.arctan2(-zeta, side * geom.y_off)
    # wrap to [-pi, pi]
    haa = jnp.arctan2(jnp.sin(haa), jnp.cos(haa))
    # planar 2-link IK in the leg plane with extension d
    d_sq = x * x + zeta * zeta
    d = jnp.sqrt(jnp.maximum(d_sq, 1e-12))
    l1, l2 = geom.l_upper, geom.l_lower
    d = jnp.clip(d, jnp.abs(l1 - l2) + 1e-9, l1 + l2 - 1e-9)
    cos_knee = (d * d - l1 * l1 - l2 * l2) / (2.0 * l1 * l2)
    kfe = knee_sign * jnp.arccos(jnp.clip(cos_knee, -1.0, 1.0))
    alpha = jnp.arctan2(-x, zeta)  # angle of target from straight-down
    beta = jnp.arctan2(l2 * jnp.sin(kfe), l1 + l2 * jnp.cos(kfe))
    hfe = alpha - beta
    return jnp.array([haa, hfe, kfe])


def leg_jacobian(q: jnp.ndarray, side: jnp.ndarray,
                 geom: LegGeometry = SOLO12_LEGS) -> jnp.ndarray:
    """(3, 3) foot-position Jacobian d p_hip / d q (AD of the closed-form
    FK; the reference queries pinocchio per knot,
    src/simulate_solo.py:146-160)."""
    return jax.jacfwd(leg_fk, argnums=0)(q, side, geom)


def fk_all_legs(q_legs: jnp.ndarray,
                geom: LegGeometry = SOLO12_LEGS) -> jnp.ndarray:
    """(n_legs, 3) base-frame foot positions from (n_legs, 3) joint angles."""
    hips = jnp.asarray(geom.hip_positions(), q_legs.dtype)
    sides = jnp.asarray(geom.side_signs(), q_legs.dtype)
    feet = jax.vmap(leg_fk, in_axes=(0, 0, None))(q_legs, sides, geom)
    return hips + feet


def ik_all_legs(feet_base: jnp.ndarray,
                geom: LegGeometry = SOLO12_LEGS) -> jnp.ndarray:
    """(n_legs, 3) joint angles from (n_legs, 3) base-frame foot targets."""
    hips = jnp.asarray(geom.hip_positions(), feet_base.dtype)
    sides = jnp.asarray(geom.side_signs(), feet_base.dtype)
    return jax.vmap(leg_ik, in_axes=(0, 0, None, None))(
        feet_base - hips, sides, 1.0, geom)


def feet_contact_torques(q_legs: jnp.ndarray, forces: jnp.ndarray,
                         geom: LegGeometry = SOLO12_LEGS) -> jnp.ndarray:
    """(n_legs, 3) joint torques realizing base-frame contact forces:
    tau_leg = -J_leg' f_leg (reaction; reference applies -Jc' K dh as the
    centroidal correction, src/simulate_solo.py:295-296)."""
    sides = jnp.asarray(geom.side_signs(), q_legs.dtype)
    jacs = jax.vmap(leg_jacobian, in_axes=(0, 0, None))(q_legs, sides, geom)
    return -jnp.einsum("lij,li->lj", jacs, forces)
