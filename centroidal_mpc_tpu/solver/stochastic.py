"""Exact chance-constraint linearization (the reference's intended math).

The reference linearizes the friction chance-constraint back-offs
xi * 2 G sqrt((K Sigma K')_jj) with respect to the trajectory through
dSigma/d(x, u) tensors -- which it computes as `jacrev` of a CONSTANT, so
they are identically zero and only the constant back-off survives
(src/centroidal_model.py:239-240, src/constraints.py:187-214; SURVEY.md
section 2b).  The default stochastic mode replicates that behavior.

This module implements the linearization the reference *intended*:
`backoff_jacobians` differentiates the true back-off function -- through
the closed-loop covariance recursion Sigma_{k+1} =
(A+BK) Sigma (A+BK)' + C cov_w C' + cov_eta, including the dependence of
A, B, C, K on the trajectory -- with one `jacrev` over the whole horizon.
`apply_exact_backoffs` then adds the row coefficients and bound shifts in
the reference's own form:

    A[idx, z] += xi * J,   ub[idx] += xi * (J @ zbar) - backoff(zbar)

Cost: one reverse-mode pass per active back-off row (N*C*4 outputs) --
orders of magnitude beyond the zero-gradient mode, so this is a flagged
validation/research path (`exact_cov_gradients`), not the throughput
default.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from centroidal_mpc_tpu.contact.plan import ContactSchedule
from centroidal_mpc_tpu.models.centroidal import (CentroidalModel,
                                                  compute_trajectory_data)
from centroidal_mpc_tpu.solver.ocp import OcpConfig, QPData


def backoff_values(model: CentroidalModel, schedule: ContactSchedule,
                   cfg: OcpConfig, X: jnp.ndarray,
                   U: jnp.ndarray) -> jnp.ndarray:
    """(N, C, 5) chance-constraint back-offs at trajectory (X, U).

    b_kcr = xi * sum_j gate * 2 G_kcrj sqrt((K_k Sigma_k K_k')_jj), zero at
    knot 0 (reference src/constraints.py:187-214).  Differentiable in
    (X, U) through the full covariance recursion.
    """
    data = compute_trajectory_data(model, schedule, X, U)
    rot_pyr = jnp.einsum("ri,kcji->kcrj", cfg.pyramid, schedule.orientation)
    rot_pyr = rot_pyr * schedule.logic[:, :, None, None]
    if not cfg.fill_unilateral:
        rot_pyr = rot_pyr.at[:, :, 4, :].set(0.0)
    N, C = rot_pyr.shape[0], rot_pyr.shape[1]
    nuc = model.n_u_per_contact
    K_full = data.K.reshape(N, C, nuc, -1)
    K_c = K_full[:, :, 2:5, :] if nuc == 6 else K_full
    KS = jnp.einsum("kcjx,kxy->kcjy", K_c, data.Sigma[:N])
    ksk_diag = jnp.einsum("kcjy,kcjy->kcj", KS, K_c)
    sqrt_ksk = jnp.sqrt(jnp.maximum(ksk_diag, 1e-16))
    G = rot_pyr[..., 2:5] if nuc == 6 else rot_pyr
    gate = ((G > 1e-6) & (sqrt_ksk[:, :, None, :] > 1e-6)).astype(G.dtype)
    gate = jax.lax.stop_gradient(gate)  # active-set gate, not a smooth term
    backoff = cfg.xi * 2.0 * jnp.sum(G * sqrt_ksk[:, :, None, :] * gate,
                                     axis=-1)
    return backoff.at[0].set(0.0)


def backoff_jacobians(model: CentroidalModel, schedule: ContactSchedule,
                      cfg: OcpConfig, X: jnp.ndarray, U: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(b, dB_dX, dB_dU): back-offs and their exact trajectory Jacobians.

    Shapes: b (N, C, 5); dB_dX (N, C, 5, N+1, nx); dB_dU (N, C, 5, N, nu).
    """
    fn = lambda x, u: backoff_values(model, schedule, cfg, x, u)
    b = fn(X, U)
    dB_dX, dB_dU = jax.jacrev(fn, argnums=(0, 1))(X, U)
    return b, dB_dX, dB_dU


def apply_exact_backoffs(qp: QPData, model: CentroidalModel,
                         schedule: ContactSchedule, cfg: OcpConfig,
                         X: jnp.ndarray, U: jnp.ndarray) -> QPData:
    """Add the exact back-off linearization to a dense nominal QP.

    The nominal `build_qp` (cfg.stochastic=False) provides the friction
    rows G u <= 0; this adds, per the reference's constraint form,
    row += J and ub += J@zbar - b so the constraint reads
    G u + J (z - zbar) <= -b(zbar).
    """
    from centroidal_mpc_tpu.solver.ocp import N_X, _offsets, qp_dims
    N = U.shape[0]
    nx, nu, C = N_X, model.n_u, model.n_contacts
    _, segs = qp_dims(model, N)
    off_row, _ = _offsets(segs)
    b, dB_dX, dB_dU = backoff_jacobians(model, schedule, cfg, X, U)

    n_rows = 5
    rfr = off_row["friction"]
    rows = (rfr + jnp.arange(C)[None, :, None] * (n_rows * N)
            + jnp.arange(N)[:, None, None] * n_rows
            + jnp.arange(n_rows)[None, None, :])          # (N, C, 5)
    jx = dB_dX.reshape(N, C, n_rows, (N + 1) * nx)
    ju = dB_dU.reshape(N, C, n_rows, N * nu)
    A = qp.A
    A = A.at[rows.reshape(-1), : (N + 1) * nx].add(
        jx.reshape(-1, (N + 1) * nx))
    A = A.at[rows.reshape(-1),
             (N + 1) * nx:(N + 1) * nx + N * nu].add(ju.reshape(-1, N * nu))
    shift = (jnp.einsum("kcrz,z->kcr", jx, X.reshape(-1))
             + jnp.einsum("kcrz,z->kcr", ju, U.reshape(-1)))
    u_new = qp.u.at[rows.reshape(-1)].add((shift - b).reshape(-1))
    return qp.replace(A=A, u=u_new)
