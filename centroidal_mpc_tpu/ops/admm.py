"""Jitted ADMM QP solver with OSQP semantics.

The reference crosses Python -> C into OSQP for every SCP subproblem
(src/scp_solver.py:59-68: eps_abs = eps_rel = 1e-7, warm start, polish).
Here the same ADMM algorithm (Stellato et al., OSQP) runs as one XLA
program so it can be vmapped over scenario batches and sharded with pjit
-- no host round-trips inside the SCP loop.

Components mirrored from OSQP:
  * modified Ruiz equilibration (scaling matrices D, E, cost scale c);
  * per-constraint step sizes: rho_eq = 1e3 * rho on rows with l == u,
    rho / 1e3 on (-inf, inf) rows;
  * over-relaxation alpha, regularization sigma;
  * unscaled primal/dual residual termination with eps_abs/eps_rel;
  * adaptive rho with periodic refactorization;
  * optional warm starting of (x, y).

Batched-execution structure: the solver runs an outer `while_loop` over
SEGMENTS of `check_interval` plain ADMM iterations (an inner `fori_loop`
of pure matvec + backsolve work).  Residual evaluation and the adaptive-rho
refactorization happen only at segment boundaries.  This matters under
vmap: a `lax.cond` inside the hot loop lowers to `select` with BOTH
branches executed per iteration, which would turn the occasional Cholesky
refactorization into one per iteration; at segment granularity its cost is
amortized 1/check_interval.

Solution polish is intentionally omitted: ADMM at 1e-7 tolerance is within
the 1e-4 parity budget (BASELINE.md), and polish's dynamic active set fits
XLA poorly; an active-set masked-KKT polish can be added behind a flag.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from centroidal_mpc_tpu.solver.ocp import INF, QPData


@dataclasses.dataclass(frozen=True)
class QPSettings:
    """Static solver settings (OSQP defaults unless noted)."""

    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-7   # reference src/scp_solver.py:63
    eps_rel: float = 1e-7
    max_iter: int = 20000
    check_interval: int = 25   # residual/adaptation cadence (OSQP default)
    scaling_iters: int = 10
    adaptive_rho: bool = True
    adaptive_rho_tol: float = 5.0
    # 'cond': refactor only when the prim/dual ratio leaves the deadband
    # (lax.cond -- cheap single-solve, but under vmap BOTH branches run
    # every check, costing a factorization per segment regardless).
    # 'always': unconditionally refactor at every residual check with the
    # deadbanded rho -- same math, vmap-friendly (one batched
    # factorization per check_interval, amortized over the segment).
    # Block solver only; the dense solver keeps its per-row cond path.
    adaptive_rho_mode: str = "cond"
    eq_rho_scale: float = 1e3
    # Block-solver factorization: 'cholesky' (blocked Cholesky with
    # pre-inverted factors, XLA scan; backward-stable, works everywhere),
    # 'pallas' (same math fused into ops/pallas_blockqp TPU kernels with
    # the scenario batch on the VPU lanes -- ~90x the XLA factorization
    # on v5e, the TPU production path; under vmap requires
    # adaptive_rho_mode='always'; interpret-mode on CPU), or 'thomas'
    # (Newton-Schulz Schur-complement inverses, matmul-only -- the
    # inverse error compounds through the knot recursion and breaks f32
    # convergence on TPU; CPU-validated, experimental), or 'pallas_fused'
    # (the pallas kernels PLUS the whole ADMM iteration fused into the
    # two sweep launches, ops/pallas_admm_iter -- measured slower than
    # 'pallas' at batch 128/N=50 due to the row-matrix stream; opt-in
    # experimental, see PARITY.md round 3).  Ignored by the dense solver.
    factor_method: str = "cholesky"
    # Block-solver sweep lowering: 'scan' (sequential, throughput default)
    # or 'assoc' (log-depth associative scan; fewer dependent steps for
    # latency mode at ~V x more FLOPs).  Ignored by the dense solver.
    sweep_method: str = "scan"
    # Block-solver solution polish (the OSQP polish step, reference
    # src/scp_solver.py:62, as a masked active-set ALM — see
    # blockqp._polish).  One extra factorization + polish_iters sweeps
    # after termination; the polished iterate is kept only if it improves
    # max(prim, dual).  Lets the main loop run at loose eps while
    # delivering tight-solution quality.  Ignored by the dense solver.
    polish: bool = False
    polish_rho: float = 1e5
    polish_iters: int = 4
    polish_active_tol: float = 1e-3


class QPSolution(struct.PyTreeNode):
    x: jnp.ndarray          # primal solution (unscaled)
    y: jnp.ndarray          # dual solution (unscaled)
    z: jnp.ndarray          # projected constraint values
    iterations: jnp.ndarray
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    converged: jnp.ndarray  # bool


def ruiz_equilibrate(qp: QPData, iters: int):
    """Modified Ruiz equilibration of [[P, A'], [A, 0]] with cost scaling.

    Returns (scaled QPData, D (n,), E (m,), c scalar).  All-zero rows or
    columns scale by 1 (guarded).
    """
    P, q, A, l, u = qp.P, qp.q, qp.A, qp.l, qp.u
    n, m = P.shape[0], A.shape[0]
    dtype = P.dtype
    D = jnp.ones(n, dtype)
    E = jnp.ones(m, dtype)
    c = jnp.ones((), dtype)

    def body(_, carry):
        P, q, A, D, E, c = carry
        col_norm = jnp.maximum(jnp.abs(P).max(axis=0), jnp.abs(A).max(axis=0))
        d = 1.0 / jnp.sqrt(jnp.where(col_norm > 0, col_norm, 1.0))
        row_norm = jnp.abs(A).max(axis=1)
        e = 1.0 / jnp.sqrt(jnp.where(row_norm > 0, row_norm, 1.0))
        P = d[:, None] * P * d[None, :]
        A = e[:, None] * A * d[None, :]
        q = d * q
        # cost normalization (OSQP): gamma = 1/max(mean col norm P, |q|_inf)
        p_cols = jnp.abs(P).max(axis=0).mean()
        gamma_den = jnp.maximum(p_cols, jnp.abs(q).max())
        gamma = 1.0 / jnp.where(gamma_den > 0, gamma_den, 1.0)
        P, q, c = P * gamma, q * gamma, c * gamma
        return P, q, A, D * d, E * e, c

    P, q, A, D, E, c = jax.lax.fori_loop(0, iters, body, (P, q, A, D, E, c))
    l = jnp.clip(E * l, -INF, INF)
    u = jnp.clip(E * u, -INF, INF)
    return QPData(P=P, q=q, A=A, l=l, u=u), D, E, c


def _rho_vector(l, u, rho, settings: QPSettings):
    eq = (u - l) < 1e-10
    loose = (l <= -INF) & (u >= INF)
    return jnp.where(eq, settings.eq_rho_scale * rho,
                     jnp.where(loose, rho / settings.eq_rho_scale, rho))


def solve_qp(qp: QPData, settings: QPSettings = QPSettings(),
             x0=None, y0=None) -> QPSolution:
    """Solve min 1/2 x'Px + q'x s.t. l <= Ax <= u.  Jittable/vmappable."""
    n, m = qp.P.shape[0], qp.A.shape[0]
    dtype = qp.P.dtype
    scaled, D, E, c = ruiz_equilibrate(qp, settings.scaling_iters)
    P, q, A, l, u = scaled.P, scaled.q, scaled.A, scaled.l, scaled.u
    sigma = jnp.asarray(settings.sigma, dtype)
    n_segments = -(-settings.max_iter // settings.check_interval)

    def factor(rho_scalar):
        rho_vec = _rho_vector(l, u, rho_scalar, settings)
        M = (P + sigma * jnp.eye(n, dtype=dtype)
             + (A.T * rho_vec[None, :]) @ A)
        return jnp.linalg.cholesky(M), rho_vec

    rho0 = jnp.asarray(settings.rho, dtype)
    chol, rho_vec = factor(rho0)

    # Warm start in scaled space: x_unscaled = D x_scaled, y_unscaled = E y/c.
    x = jnp.zeros(n, dtype) if x0 is None else x0 / D
    y = jnp.zeros(m, dtype) if y0 is None else c * y0 / E
    z = A @ x

    def chol_solve(L, b):
        w = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, w, lower=False)

    def admm_iter(_, state):
        x, z, y, rho_vec, L = state
        rhs = sigma * x - q + A.T @ (rho_vec * z - y)
        x_t = chol_solve(L, rhs)
        z_t = A @ x_t
        x_new = settings.alpha * x_t + (1 - settings.alpha) * x
        z_relaxed = settings.alpha * z_t + (1 - settings.alpha) * z
        z_new = jnp.clip(z_relaxed + y / rho_vec, l, u)
        y_new = y + rho_vec * (z_relaxed - z_new)
        return x_new, z_new, y_new, rho_vec, L

    def segment(carry):
        x, z, y, rho_scalar, rho_vec, L, it, _, _, _ = carry
        x, z, y, rho_vec, L = jax.lax.fori_loop(
            0, settings.check_interval, admm_iter, (x, z, y, rho_vec, L))
        it = it + settings.check_interval

        # Unscaled residuals (OSQP sec. 5.1), once per segment.
        Ax = A @ x
        Px = P @ x
        Aty = A.T @ y
        prim = jnp.abs((Ax - z) / E).max()
        dual = jnp.abs((Px + q + Aty) / D).max() / c
        prim_scale = jnp.maximum(jnp.abs(Ax / E).max(), jnp.abs(z / E).max())
        dual_scale = jnp.maximum(
            jnp.maximum(jnp.abs(Px / D).max(), jnp.abs(Aty / D).max()),
            jnp.abs(q / D).max()) / c
        eps_prim = settings.eps_abs + settings.eps_rel * prim_scale
        eps_dual = settings.eps_abs + settings.eps_rel * dual_scale
        done = (prim < eps_prim) & (dual < eps_dual)

        if settings.adaptive_rho:
            # OSQP adaptive rho at segment granularity.  NOTE: under vmap,
            # lax.cond lowers to both-branches execution, so the batched
            # throughput path should run with adaptive_rho=False (Ruiz
            # scaling + fixed rho + warm starts); adaptive rho is for
            # unbatched high-accuracy solves where cond stays lazy.
            ratio = jnp.sqrt(
                (prim / jnp.maximum(prim_scale, 1e-30))
                / jnp.maximum(dual / jnp.maximum(dual_scale, 1e-30), 1e-30))
            new_rho = jnp.clip(rho_scalar * ratio, 1e-6, 1e6)
            trigger = ((ratio > settings.adaptive_rho_tol)
                       | (ratio < 1.0 / settings.adaptive_rho_tol)) & ~done

            def refactor(_):
                L2, rv2 = factor(new_rho)
                return new_rho, rv2, L2

            rho_scalar, rho_vec, L = jax.lax.cond(
                trigger, refactor, lambda _: (rho_scalar, rho_vec, L), None)

        return x, z, y, rho_scalar, rho_vec, L, it, prim, dual, done

    def cond(carry):
        *_, it, _, _, done = carry
        return (~done) & (it < n_segments * settings.check_interval)

    init = (x, z, y, rho0, rho_vec, chol, jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False))
    x, z, y, _, _, _, it, prim, dual, done = jax.lax.while_loop(
        cond, segment, init)
    return QPSolution(x=D * x, y=E * y / c, z=z / E, iterations=it,
                      prim_res=prim, dual_res=dual, converged=done)
