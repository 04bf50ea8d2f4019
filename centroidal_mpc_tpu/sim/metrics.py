"""Evaluation metrics over Monte-Carlo rollouts.

Vectorized equivalents of the reference's analysis suite:
  * cumulative centroidal tracking cost mean/std across sims
    (src/utils.py:245-302);
  * friction-pyramid violation/saturation counters
    (src/constraints.py:298-335, evaluate_friction_pyramid_constraints);
  * tangential/vertical force ratios (src/utils.py:116-243).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from centroidal_mpc_tpu.contact.plan import ContactSchedule

# Reference checker tolerances (src/constraints.py:327-328).
VIOLATION_TOL = 5e-5
SATURATION_TOL = 1e-6


def cumulative_tracking_cost(Q: jnp.ndarray, X_sim: jnp.ndarray,
                             X_ref: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Cumulative per-knot tracking cost statistics across sims.

    X_sim: (S, N+1, nx), X_ref: (N+1, nx).  Returns cumulative mean and
    cumulative std over time, shape (N+1,), matching the reference's
    accumulation (src/utils.py:266-284).
    """
    dx = X_sim - X_ref[None]
    j = jnp.einsum("ski,ij,skj->sk", dx, Q, dx)       # (S, N+1)
    return {
        "cum_mean": jnp.cumsum(j.mean(axis=0)),
        "cum_std": jnp.cumsum(j.std(axis=0)),
        "per_knot": j,
    }


def friction_cone_stats(pyramid: jnp.ndarray, schedule: ContactSchedule,
                        U: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Violation / saturation counts of the rotated friction pyramid.

    U: (..., N, nu) forces (point3 layout).  Counts rows with
    G R' f > tol (violations) and |G R' f| <= sat_tol (saturations) over
    all 5 pyramid rows at active contacts, like the reference's checker
    (which, unlike its constraint assembly, uses all 5 rows).
    """
    n, c = schedule.logic.shape
    F = U.reshape(U.shape[:-2] + (n, c, 3))
    rot_pyr = jnp.einsum("ri,kcji->kcrj", pyramid, schedule.orientation)
    lhs = jnp.einsum("kcrj,...kcj->...kcr", rot_pyr, F)
    active = schedule.logic[:, :, None] > 0
    violations = jnp.sum((lhs > VIOLATION_TOL) & active, axis=(-1, -2, -3))
    saturations = jnp.sum((jnp.abs(lhs) <= SATURATION_TOL) & active,
                          axis=(-1, -2, -3))
    return {"violations": violations, "saturations": saturations}


def tangential_ratio(schedule: ContactSchedule, U: jnp.ndarray) -> jnp.ndarray:
    """|f_tangential| / f_z at active contacts (nan where swinging);
    the quantity plotted against mu in the paper's force figures
    (src/utils.py:215-221).  U: (..., N, nu)."""
    n, c = schedule.logic.shape
    F = U.reshape(U.shape[:-2] + (n, c, 3))
    ratio = jnp.linalg.norm(F[..., :2], axis=-1) / jnp.maximum(
        F[..., 2], 1e-9)
    return jnp.where(schedule.logic > 0, ratio, jnp.nan)
