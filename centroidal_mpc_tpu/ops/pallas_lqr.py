"""Pallas TPU kernel for the batched truncated-DARE LQR gain chain.

Profile evidence (bench leaf-liveness bisect, TPU v5e, batch 128, solo12
trot N=50, 2026-08-21): computing the LQR gains K of the solution --
3 sequential SPD inverses per (scenario, knot) problem (reference
compute_lqr_feedback_gains, src/centroidal_model.py:217-228) -- cost
~24 ms/solve as XLA ops even though each problem is a 12x12: XLA pads
every tiny batched matmul of the Newton-Schulz chain to full 128x128 MXU
tiles, so ~100 sequential launches of ~26 GFLOP-effective padded matmuls
dominate.  Dropping the Newton-Schulz count to its measured convergence
(6) got ~11 ms; this kernel removes the padded-MXU pathology entirely.

Shape contract: the S = batch x knots independent DARE problems ride the
128-wide VPU lane axis; each lane holds its (nx, nx) P matrix as v8 x v8
sublane registers, and every matmul is a static broadcast-FMA loop on
(v8, v8, 128) tiles -- ~11 MFLOP per matmul on the VPU, one kernel
launch for the whole chain.  The in-register Cholesky inverse
(pallas_blockqp._chol_inv) replaces Newton-Schulz: exact, and free of
sequential-iteration count.

Same math as models.centroidal.lqr_gain (P <- Q + A'PA - A'PB H^-1 B'PA
with H = R + B'PB, K = -H^-1 B'PA); integration goes through a
custom_vmap in models/centroidal.py so the scenario-batch axis collapses
onto the lane dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centroidal_mpc_tpu.ops.pallas_blockqp import (LANES, _chol_inv,
                                                   _interpret_default,
                                                   _mat_mul, _mat_mul_nt,
                                                   _v8)


def _mat_mul_tn(a, b, v):
    """C[i,j,:] = sum_l a[l,i,:] * b[l,j,:]  (a^T @ b, lane-batched)."""
    acc = a[0, :, :][:, None, :] * b[0, :, :][None, :, :]
    for l in range(1, v):
        acc += a[l, :, :][:, None, :] * b[l, :, :][None, :, :]
    return acc


def _dare_kernel(a_ref, b_ref, q_ref, r_ref, k_ref, *, n_iter: int,
                 v: int, v8: int):
    dtype = a_ref.dtype
    A = a_ref[...]
    Bm = b_ref[...]
    Q = q_ref[...]
    R = r_ref[...]          # carries identity on pad-diagonal rows

    P = Q
    BtP = BtPA = None
    for _ in range(n_iter + 1):
        BtP = _mat_mul_tn(Bm, P, v8)                  # B'P
        H = R + _mat_mul(BtP, Bm, v8)                 # R + B'PB
        linv = _chol_inv(H, v, v8, dtype)
        hinv = _mat_mul_tn(linv, linv, v8)            # L^-T L^-1
        BtPA = _mat_mul(BtP, A, v8)                   # B'PA
        AtPB = jnp.swapaxes(BtPA, 0, 1)               # (B'PA)' = A'PB
        AtP = _mat_mul_tn(A, P, v8)
        P = (Q + _mat_mul(AtP, A, v8)
             - _mat_mul(_mat_mul(AtPB, hinv, v8), BtPA, v8))
    # after the loop: hinv/BtPA correspond to the n_iter-step P (the last
    # body ran one extra P update whose result is discarded -- K uses the
    # H of the fixed point reached after n_iter updates, matching
    # lqr_gain's final spd_inverse(R + B'PB) @ (B'PA))
    k_ref[...] = -_mat_mul(hinv, BtPA, v8)


@functools.partial(jax.jit, static_argnames=("n_iter", "interpret"))
def lqr_gain_batched(Q: jnp.ndarray, R: jnp.ndarray, A: jnp.ndarray,
                     B: jnp.ndarray, n_iter: int = 2,
                     interpret: bool | None = None) -> jnp.ndarray:
    """K gains for S independent (A, B) pairs in one kernel launch.

    Q: (nx, nx); R: (nu, nu); A: (S, nx, nx); B: (S, nx, nu).
    Returns K: (S, nu, nx).  S is padded to a multiple of 128 lanes.
    """
    if interpret is None:
        interpret = _interpret_default()
    S, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    v8 = _v8(max(nx, nu))
    sp = -(-S // LANES) * LANES
    dtype = A.dtype

    At = jnp.pad(jnp.transpose(A, (1, 2, 0)),
                 ((0, v8 - nx), (0, v8 - nx), (0, sp - S)))
    Bt = jnp.pad(jnp.transpose(B, (1, 2, 0)),
                 ((0, v8 - nx), (0, v8 - nu), (0, sp - S)))
    Qt = jnp.broadcast_to(
        jnp.pad(Q, ((0, v8 - nx), (0, v8 - nx)))[:, :, None],
        (v8, v8, LANES)).astype(dtype)
    # identity on R's pad diagonal keeps the in-kernel Cholesky finite on
    # pad rows AND pad lanes (H = R there, B being zero-padded)
    pad_eye = jnp.zeros((v8, v8), dtype).at[
        jnp.arange(nu, v8), jnp.arange(nu, v8)].set(1.0)
    Rt = jnp.broadcast_to(
        (jnp.pad(R, ((0, v8 - nu), (0, v8 - nu))) + pad_eye)[:, :, None],
        (v8, v8, LANES)).astype(dtype)

    kernel = functools.partial(_dare_kernel, n_iter=n_iter, v=max(nx, nu),
                               v8=v8)
    sspec = pl.BlockSpec((v8, v8, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((v8, v8, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    K = pl.pallas_call(
        kernel,
        grid=(sp // LANES,),
        in_specs=[sspec, sspec, cspec, cspec],
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct((v8, v8, sp), dtype),
        interpret=interpret,
    )(At, Bt, Qt, Rt)
    return jnp.transpose(K[:nu, :nx, :S], (2, 0, 1))
