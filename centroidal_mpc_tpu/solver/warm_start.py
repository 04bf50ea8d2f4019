"""Analytic warm starts for the SCP solve.

The reference warm-starts states from a whole-body DDP solve loaded off
disk and controls from a weight-distribution heuristic
(src/centroidal_model.py:158-187).  Its DYNAMICS_FIRST path (commented out,
:164-171) builds states from the active-contact centroid.  Both are
implemented here as pure functions; the DDP bracket lives in
models/whole_body.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config.robots import POINT3, RobotSpec
from centroidal_mpc_tpu.contact.plan import ContactSchedule


def centroid_state_warm_start(robot: RobotSpec, schedule: ContactSchedule,
                              dtype=None) -> jnp.ndarray:
    """(N+1, nx) state warm start: CoM above the active-contact centroid,
    zero momenta (reference's commented DYNAMICS_FIRST path,
    src/centroidal_model.py:164-171; centroid per src/utils.py:18-24)."""
    logic = np.asarray(schedule.logic)
    pos = np.asarray(schedule.position)
    dtype = dtype or schedule.logic.dtype
    n = logic.shape[0]
    X = np.zeros((n + 1, 9))
    n_active = np.maximum(logic.sum(axis=1), 1.0)
    centroid = (pos * logic[:, :, None]).sum(axis=1) / n_active[:, None]
    X[:n, 0] = centroid[:, 0]
    X[:n, 1] = centroid[:, 1]
    X[:n, 2] = robot.com_height + centroid[:, 2]
    X[n] = X[n - 1]
    return jnp.asarray(X, dtype)


def weight_distribution_control_warm_start(robot: RobotSpec,
                                           schedule: ContactSchedule,
                                           dtype=None) -> jnp.ndarray:
    """(N, nu) control warm start: each active contact carries an equal
    share of the robot weight, with 1e-3 tangential forces (reference
    src/centroidal_model.py:176-183)."""
    logic = np.asarray(schedule.logic)
    dtype = dtype or schedule.logic.dtype
    n, c = logic.shape
    share = robot.weight_force / np.maximum(logic.sum(axis=1), 1.0)
    per_contact = np.zeros((n, c, robot.n_u_per_contact))
    fz_col = 2 if robot.contact_model == POINT3 else 4
    fx_col = 0 if robot.contact_model == POINT3 else 2
    per_contact[:, :, fx_col] = 1e-3 * logic
    per_contact[:, :, fx_col + 1] = 1e-3 * logic
    per_contact[:, :, fz_col] = share[:, None] * logic
    return jnp.asarray(per_contact.reshape(n, robot.n_u), dtype)
