"""Pallas TPU kernels for the block-tridiagonal KKT factorization.

Profile evidence (benchmarks/profile_blockqp2.py, TPU v5e, batch 128,
solo12 trot N=50): the batched block-ADMM solve spends ~32 ms of its
~70 ms in `_block_tridiag_cholesky` -- XLA lowers the per-knot 22x22
Cholesky + triangular solves as column-loops of dynamic-update-slices,
which is catastrophic when scanned over 50 knots and batched over 128
scenarios.  The backsolve sweeps add another ~10 ms at ~1.7x the HBM
roofline.  This module moves both onto the VPU with the batch on the
128-wide lane axis:

  * `factor_batched` -- one kernel pass over the knots (grid =
    (batch_tiles, N+1)); each grid step DMAs the knot's (V, V)
    diagonal/off-diagonal blocks for 128 scenarios, runs the blocked-
    Cholesky recursion entirely in VMEM registers (matmul accumulation,
    Cholesky, and triangular inversion are static column loops of
    broadcast-FMA ops on (V, 128) tiles), and writes the four
    pre-inverted factors.  The sequential knot carry (previous C_k^{-1})
    lives in VMEM scratch, which persists across grid steps on TPU.
  * `solve_fwd` / `solve_bwd` -- the two ADMM-iteration sweeps, each a
    single kernel launch that fuses the knot-parallel C^{-1} application
    into the sequential affine recurrence (one pass over the factors
    instead of XLA's ~100 scan dispatches).

Layout contract: kernel-major (knot, V8, V8, B) with V8 = V rounded up
to the 8-row sublane and B the lane axis (multiple of 128); batch-major
(B, N+1, V, V) wrappers handle transposes and padding.  The padded
diagonal carries the identity so Cholesky stays finite on pad rows.

Same math as blockqp._block_tridiag_cholesky / _block_tridiag_solve
(the factors are bit-compatible up to f32 rounding); integration into
the vmapped solver goes through jax.custom_batching.custom_vmap in
ops/blockqp.py -- the unbatched call keeps the XLA path, the batched
call collapses the whole vmap axis onto the lane dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _v8(v: int) -> int:
    return -(-v // 8) * 8


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


class KmTridiagFactor(struct.PyTreeNode):
    """Pre-inverted block-tridiagonal factors, kernel-major layout.

    All arrays are (N+1, V8, V8, Bp) with Bp a multiple of 128.  Slot k
    of `Pfwd`/`Pbwd` holds the coupling consumed when producing knot k in
    the forward sweep and knot k-1 in the backward sweep respectively;
    slot 0 is zero.  No static fields: the pytree structure must match
    across batch sizes (custom_vmap compares treedefs between the
    unbatched primal and the batched rule); logical dims are recovered
    from the rhs shape at solve time.
    """

    Cinv: jnp.ndarray
    CinvT: jnp.ndarray
    Pfwd: jnp.ndarray
    Pbwd: jnp.ndarray


# ---------------------------------------------------------------------------
# in-kernel (V8, V8, L) matrix helpers: batched over the lane axis
# ---------------------------------------------------------------------------


def _mat_mul(a, b, v):
    """C[i,j,:] = sum_l a[i,l,:] * b[l,j,:] (lane-batched matmul)."""
    acc = a[:, 0, :][:, None, :] * b[0, :, :][None, :, :]
    for l in range(1, v):
        acc += a[:, l, :][:, None, :] * b[l, :, :][None, :, :]
    return acc


def _mat_mul_nt(a, b, v):
    """C[i,j,:] = sum_l a[i,l,:] * b[j,l,:]  (a @ b^T)."""
    acc = a[:, 0, :][:, None, :] * b[:, 0, :][None, :, :]
    for l in range(1, v):
        acc += a[:, l, :][:, None, :] * b[:, l, :][None, :, :]
    return acc


def _chol_inv(s, v, v8, dtype):
    """Return L^{-1} for the Cholesky factor L of s ((V8, V8, L) SPD).

    Column-loop Cholesky followed by row-loop forward substitution; all
    static loops of (V8, L) broadcast-FMA ops.  Pad rows must carry the
    identity on the diagonal of `s`.
    """
    lanes = s.shape[-1]
    cols = []
    for c in range(v8):
        isq = jax.lax.rsqrt(s[c, c, :])                      # (L,)
        col = s[:, c, :] * isq[None, :]                      # (V8, L)
        if c > 0:  # mask the (symmetric-residual) rows above the diagonal
            mask = (jax.lax.broadcasted_iota(jnp.int32, (v8, 1), 0) >= c)
            col = jnp.where(mask, col, jnp.zeros_like(col))
        cols.append(col)
        s = s - col[:, None, :] * col[None, :, :]
    # forward substitution: row i of X = (e_i - sum_{l<i} L[i,l] X[l]) / L[i,i]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (v8, 1), 0)
    rows = []
    for i in range(v8):
        acc = jnp.where(col_iota == i, jnp.ones((v8, lanes), dtype),
                        jnp.zeros((v8, lanes), dtype))       # e_i row
        for l in range(i):
            acc = acc - cols[l][i, :][None, :] * rows[l]
        rows.append(acc / cols[i][i, :][None, :])
    return jnp.stack(rows, axis=0)                           # (V8, V8, L)


# ---------------------------------------------------------------------------
# factorization kernel
# ---------------------------------------------------------------------------


def _factor_kernel(diag_ref, off_ref, cinv_ref, cinvt_ref, pfwd_ref,
                   pbwd_ref, prev_scr, *, v: int, v8: int):
    k = pl.program_id(1)
    dtype = diag_ref.dtype
    d = diag_ref[0]

    @pl.when(k == 0)
    def _():
        x = _chol_inv(d, v, v8, dtype)
        xt = jnp.swapaxes(x, 0, 1)
        cinv_ref[0] = x
        cinvt_ref[0] = xt
        pfwd_ref[0] = jnp.zeros_like(d)
        pbwd_ref[0] = jnp.zeros_like(d)
        prev_scr[:] = x

    @pl.when(k > 0)
    def _():
        prev = prev_scr[:]                                   # Cinv_{k-1}
        o = off_ref[0]
        # W = O C_{k-1}^{-T}: W[i,j] = sum_l o[i,l] prev[j,l]
        w = _mat_mul_nt(o, prev, v8)
        s = d - _mat_mul_nt(w, w, v8)                        # D_k - W W'
        x = _chol_inv(s, v, v8, dtype)
        xt = jnp.swapaxes(x, 0, 1)
        cinv_ref[0] = x
        cinvt_ref[0] = xt
        pfwd_ref[0] = _mat_mul(x, w, v8)                     # C_k^{-1} W
        # Pbwd_{k-1} = C_{k-1}^{-T} W': [i,j] = sum_l prev[l,i] w[j,l]
        #            = (W @ C_{k-1}^{-1})' elementwise
        pbwd_ref[0] = jnp.swapaxes(_mat_mul(w, prev, v8), 0, 1)
        prev_scr[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_batched(diag: jnp.ndarray, off: jnp.ndarray,
                   interpret: bool | None = None) -> KmTridiagFactor:
    """Batched block-tridiagonal Cholesky with pre-inverted factors.

    diag: (B, N+1, V, V); off: (B, N, V, V).  Returns kernel-major
    factors; B is padded to a multiple of 128 internally.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, n1, vdim, _ = diag.shape
    n = n1 - 1
    v8 = _v8(vdim)
    bp = -(-b // LANES) * LANES
    dtype = diag.dtype

    dg = jnp.transpose(diag, (1, 2, 3, 0))                   # (N+1, V, V, B)
    of = jnp.transpose(off, (1, 2, 3, 0))
    dg = jnp.pad(dg, ((0, 0), (0, v8 - vdim), (0, v8 - vdim), (0, bp - b)))
    of = jnp.pad(of, ((0, 0), (0, v8 - vdim), (0, v8 - vdim), (0, bp - b)))
    # identity on the padded diagonal (Cholesky pad rows) and on padded
    # lanes (keeps rsqrt finite there)
    pad_eye = jnp.zeros((v8, v8), dtype).at[
        jnp.arange(vdim, v8), jnp.arange(vdim, v8)].set(1.0)
    dg = dg + pad_eye[None, :, :, None]
    if bp > b:
        lane_eye = jnp.concatenate(
            [jnp.zeros((b,), dtype), jnp.ones((bp - b,), dtype)])
        dg = dg + (jnp.eye(v8, dtype=dtype)[None, :, :, None]
                   * lane_eye[None, None, None, :])
    of = jnp.concatenate([of[:1], of], axis=0) if n > 0 else jnp.zeros(
        (1, v8, v8, bp), dtype)
    # of now has N+1 slots; slot k holds O_{k-1} for k >= 1 (slot 0 unused)

    kernel = functools.partial(_factor_kernel, v=vdim, v8=v8)
    grid = (bp // LANES, n1)
    bspec = pl.BlockSpec((1, v8, v8, LANES), lambda i, k: (k, 0, 0, i),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n1, v8, v8, bp), dtype)
    cinv, cinvt, pfwd, pbwd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec, bspec],
        out_specs=(bspec, bspec, bspec, bspec),
        out_shape=(out_shape,) * 4,
        scratch_shapes=[pltpu.VMEM((v8, v8, LANES), dtype)],
        interpret=interpret,
    )(dg, of)
    return KmTridiagFactor(Cinv=cinv, CinvT=cinvt, Pfwd=pfwd, Pbwd=pbwd)


# ---------------------------------------------------------------------------
# fused sweep kernels
# ---------------------------------------------------------------------------


def _mat_vec(m, x, v):
    """y[i,:] = sum_l m[i,l,:] * x[l,:]."""
    acc = m[:, 0, :] * x[0, :][None, :]
    for l in range(1, v):
        acc += m[:, l, :] * x[l, :][None, :]
    return acc


def _fwd_kernel(cinv_ref, pfwd_ref, b_ref, out_ref, v_scr, *, v8: int):
    k = pl.program_id(1)
    c = _mat_vec(cinv_ref[0], b_ref[0], v8)                  # C_k^{-1} b_k

    @pl.when(k == 0)
    def _():
        v_scr[:] = c

    @pl.when(k > 0)
    def _():
        v_scr[:] = c - _mat_vec(pfwd_ref[0], v_scr[:], v8)

    out_ref[0] = v_scr[:]


def _bwd_kernel(cinvt_ref, pbwd_ref, v_ref, out_ref, w_scr, *, v8: int):
    s = pl.program_id(1)
    d = _mat_vec(cinvt_ref[0], v_ref[0], v8)                 # C_k^{-T} v_k

    @pl.when(s == 0)
    def _():
        w_scr[:] = d

    @pl.when(s > 0)
    def _():
        w_scr[:] = d - _mat_vec(pbwd_ref[0], w_scr[:], v8)

    out_ref[0] = w_scr[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_batched(fac: KmTridiagFactor, b: jnp.ndarray,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Solve M w = b with kernel-major factors; b: (B, N+1, V)."""
    if interpret is None:
        interpret = _interpret_default()
    bsz, n1, vdim = b.shape
    v8 = fac.Cinv.shape[1]
    bp = fac.Cinv.shape[-1]
    n = n1 - 1
    dtype = b.dtype

    bt = jnp.transpose(b, (1, 2, 0))                         # (N+1, V, B)
    bt = jnp.pad(bt, ((0, 0), (0, v8 - vdim), (0, bp - bsz)))

    mspec = pl.BlockSpec((1, v8, v8, LANES), lambda i, k: (k, 0, 0, i),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, v8, LANES), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM)
    grid = (bp // LANES, n1)
    out_shape = jax.ShapeDtypeStruct((n1, v8, bp), dtype)

    vfwd = pl.pallas_call(
        functools.partial(_fwd_kernel, v8=v8),
        grid=grid,
        in_specs=[mspec, mspec, vspec],
        out_specs=vspec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((v8, LANES), dtype)],
        interpret=interpret,
    )(fac.Cinv, fac.Pfwd, bt)

    # backward pass: step s visits knot N-s; Pbwd slot (N-s)+1 holds the
    # coupling for producing knot N-s (slot index clipped at s=0, unused)
    rspec = pl.BlockSpec((1, v8, v8, LANES),
                         lambda i, s: (jnp.minimum(n - s + 1, n), 0, 0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, v8, v8, LANES), lambda i, s: (n - s, 0, 0, i),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, v8, LANES), lambda i, s: (n - s, 0, i),
                         memory_space=pltpu.VMEM)
    wout = pl.pallas_call(
        functools.partial(_bwd_kernel, v8=v8),
        grid=grid,
        in_specs=[cspec, rspec, wspec],
        out_specs=wspec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((v8, LANES), dtype)],
        interpret=interpret,
    )(fac.CinvT, fac.Pbwd, vfwd)

    return jnp.transpose(wout[:, :vdim, :bsz], (2, 0, 1))    # (B, N+1, V)
