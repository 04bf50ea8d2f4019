"""Pallas block-tridiagonal factorization/backsolve kernels.

CPU interpret-mode parity against the XLA blocked-Cholesky path
(compiled-mode behavior on TPU v5e is covered by bench runs and
benchmarks/profile_blockqp2.py; see ops/pallas_blockqp.py docstring).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.ops import blockqp, pallas_blockqp as pbq
from centroidal_mpc_tpu.ops.admm import QPSettings


def _random_block_tridiag(key, b, n, v, dtype=jnp.float64):
    """Random SPD block-tridiagonal system (diag, off, rhs)."""
    k1, k2, k3 = jax.random.split(key, 3)
    off = 0.3 * jax.random.normal(k1, (b, n, v, v), dtype)
    r = jax.random.normal(k2, (b, n + 1, v, v), dtype)
    diag = jnp.einsum("bkij,bklj->bkil", r, r) / v + 2.0 * jnp.eye(
        v, dtype=dtype)
    # diagonal dominance over the couplings keeps M SPD
    diag = diag + 2.0 * jnp.eye(v, dtype=dtype) * jnp.abs(off).sum(
        axis=(2, 3)).max() * jnp.ones((b, n + 1, 1, 1), dtype)
    rhs = jax.random.normal(k3, (b, n + 1, v), dtype)
    return diag, off, rhs


@pytest.mark.parametrize("b,n,v", [(4, 7, 22), (3, 5, 13)])
def test_factor_solve_matches_xla(b, n, v):
    key = jax.random.PRNGKey(0)
    diag, off, rhs = _random_block_tridiag(key, b, n, v)

    fac = pbq.factor_batched(diag, off, interpret=True)
    out = pbq.solve_batched(fac, rhs, interpret=True)

    ref_fac = jax.vmap(blockqp._block_tridiag_cholesky)(diag, off)
    ref = jax.vmap(lambda f, r: blockqp._block_tridiag_solve(f, r))(
        ref_fac, rhs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_solve_is_actual_inverse():
    """M w = b: reconstruct M w from blocks and compare to b."""
    key = jax.random.PRNGKey(1)
    b, n, v = 2, 6, 9
    diag, off, rhs = _random_block_tridiag(key, b, n, v)
    fac = pbq.factor_batched(diag, off, interpret=True)
    w = pbq.solve_batched(fac, rhs, interpret=True)

    def apply_m(diag, off, w):
        out = jnp.einsum("kij,kj->ki", diag, w)
        out = out.at[1:].add(jnp.einsum("kij,kj->ki", off, w[:-1]))
        out = out.at[:-1].add(jnp.einsum("kji,kj->ki", off, w[1:]))
        return out

    mw = jax.vmap(apply_m)(diag, off, w)
    np.testing.assert_allclose(np.asarray(mw), np.asarray(rhs),
                               rtol=1e-8, atol=1e-8)


def test_factor_batched_large_batch_padding():
    """Batch sizes above one lane tile (128) pad to the next multiple --
    the regression that killed the per-call custom_vmap design."""
    key = jax.random.PRNGKey(3)
    diag, off, rhs = _random_block_tridiag(key, 130, 3, 9,
                                           dtype=jnp.float32)
    fac = pbq.factor_batched(diag, off, interpret=True)
    assert fac.Cinv.shape[-1] == 256
    out = pbq.solve_batched(fac, rhs, interpret=True)
    ref_fac = jax.vmap(blockqp._block_tridiag_cholesky)(diag, off)
    ref = jax.vmap(lambda f, r: blockqp._block_tridiag_solve(f, r))(
        ref_fac, rhs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pallas_method", ["pallas"])
def test_solve_block_qp_pallas_backend_parity(pallas_method):
    """Full batched SCP-subproblem solve: the pallas factor methods walk
    the SAME iterate sequence as 'cholesky' on a real (small) trot QP
    batch -- equal iteration counts and per-scenario residuals, tight
    X/U parity.  (Convergence quality of the block solver itself is
    covered by tests/test_blockqp.py and the TPU bench; this pins the
    kernel swap-ins to the XLA path bit-for-bit up to rounding.)
    """
    from centroidal_mpc_tpu.config import presets
    from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data

    preset = dataclasses.replace(
        presets.SOLO12_TROT_N50,
        gait=dataclasses.replace(presets.SOLO12_TROT_N50.gait,
                                 step_knots=6, support_knots=2, nb_steps=1))
    prob = presets.build_problem(preset, dtype=jnp.float64)
    B = 2
    X0 = jnp.broadcast_to(prob.X0, (B,) + prob.X0.shape)
    X0 = X0.at[:, 0, 0].add(1e-3 * jnp.arange(B))
    U0 = jnp.broadcast_to(prob.U0, (B,) + prob.U0.shape)

    def solve(x, u, method):
        data = compute_trajectory_data(prob.model, prob.plan.schedule, x, u,
                                       with_covariance=False)
        qp = blockqp.build_block_qp(
            prob.model, prob.plan.schedule, prob.ocp, x, u, data,
            jnp.asarray(100.0, jnp.float64), jnp.asarray(100.0, jnp.float64))
        st = QPSettings(eps_abs=1e-5, eps_rel=1e-5, max_iter=500,
                        adaptive_rho=True, adaptive_rho_mode="always",
                        factor_method=method)
        # warm start from the linearization point, as the SCP driver does
        w0 = blockqp.WVars(x=x, u=u, t=jnp.zeros(x.shape[0], x.dtype))
        return blockqp.solve_block_qp(qp, st, w0=w0)

    sol_c = jax.vmap(lambda x, u: solve(x, u, "cholesky"))(X0, U0)
    # B=2 < PALLAS_MIN_BATCH exercises the batch-first op with its
    # vmapped-XLA fallback; forcing the threshold to 1 exercises the
    # actual kernels (interpret mode on CPU) inside the op
    for min_batch in (blockqp.PALLAS_MIN_BATCH, 1):
        old = blockqp.PALLAS_MIN_BATCH
        blockqp.PALLAS_MIN_BATCH = min_batch
        blockqp._pallas_admm_op.cache_clear()
        try:
            sol_p = jax.vmap(lambda x, u: solve(x, u, pallas_method))(X0,
                                                                       U0)
        finally:
            blockqp.PALLAS_MIN_BATCH = old
            blockqp._pallas_admm_op.cache_clear()
        np.testing.assert_array_equal(np.asarray(sol_p.iterations),
                                      np.asarray(sol_c.iterations))
        np.testing.assert_allclose(np.asarray(sol_p.prim_res),
                                   np.asarray(sol_c.prim_res), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sol_p.dual_res),
                                   np.asarray(sol_c.dual_res), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sol_p.X), np.asarray(sol_c.X),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sol_p.U), np.asarray(sol_c.U),
                                   rtol=1e-6, atol=1e-6)


def test_solve_block_qp_pallas_unbatched_matches():
    """Single-scenario (no vmap) pallas path: the op's primal runs the
    loop on a batch of one and matches the cholesky backend."""
    from centroidal_mpc_tpu.config import presets
    from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data

    preset = dataclasses.replace(
        presets.SOLO12_TROT_N50,
        gait=dataclasses.replace(presets.SOLO12_TROT_N50.gait,
                                 step_knots=4, support_knots=2, nb_steps=1))
    prob = presets.build_problem(preset, dtype=jnp.float64)

    def solve(method):
        data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                       prob.X0, prob.U0,
                                       with_covariance=False)
        qp = blockqp.build_block_qp(
            prob.model, prob.plan.schedule, prob.ocp, prob.X0, prob.U0,
            data, jnp.asarray(100.0, jnp.float64),
            jnp.asarray(100.0, jnp.float64))
        st = QPSettings(eps_abs=1e-5, eps_rel=1e-5, max_iter=300,
                        adaptive_rho=False, factor_method=method,
                        polish=True)
        w0 = blockqp.WVars(x=prob.X0, u=prob.U0,
                           t=jnp.zeros(prob.X0.shape[0], jnp.float64))
        return blockqp.solve_block_qp(qp, st, w0=w0)

    sol_p = solve("pallas")
    sol_c = solve("cholesky")
    np.testing.assert_array_equal(np.asarray(sol_p.iterations),
                                  np.asarray(sol_c.iterations))
    np.testing.assert_allclose(np.asarray(sol_p.X), np.asarray(sol_c.X),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_p.U), np.asarray(sol_c.U),
                               rtol=1e-6, atol=1e-6)
