"""Solution interpolation to the control rate.

Reference: interpolate_SCP_solution (src/scp_solver.py:95-111, linear 10x)
and interpolate_centroidal_traj (src/utils.py:26-41, zero-order hold).
Vectorized; array layout (N, dim) knot-major.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def interpolate_linear(traj: np.ndarray, n_inner: int = 10) -> np.ndarray:
    """Piecewise-linear upsampling: (N, d) -> ((N-1)*n_inner, d) with
    samples x_k + j/n_inner (x_{k+1} - x_k), j = 0..n_inner-1
    (reference src/scp_solver.py:101-110)."""
    traj = np.asarray(traj)
    d = traj[1:] - traj[:-1]                    # (N-1, d)
    frac = (np.arange(n_inner) / n_inner)[None, :, None]
    out = traj[:-1, None, :] + frac * d[:, None, :]
    return out.reshape(-1, traj.shape[-1])


def interpolate_scp_solution(X: np.ndarray, U: np.ndarray,
                             n_inner: int = 10) -> Dict[str, np.ndarray]:
    """Linear 10x interpolation of an SCP solution, both trajectories
    upsampled independently (reference src/scp_solver.py:95-111)."""
    return {"X": interpolate_linear(X, n_inner),
            "U": interpolate_linear(U, n_inner)}


def interpolate_zero_order(traj: np.ndarray, n_inner: int) -> np.ndarray:
    """Zero-order hold: each knot repeated n_inner times
    (reference src/utils.py:26-41)."""
    return np.repeat(np.asarray(traj), n_inner, axis=0)
