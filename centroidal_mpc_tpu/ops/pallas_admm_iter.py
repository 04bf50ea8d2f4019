"""Fully-fused ADMM iteration kernels for the block QP.

Profile evidence (stage decomposition, TPU v5e, batch 128, solo12 trot
N=50, 2026-08-21): after the factorization (ops/pallas_blockqp, 0.35 ms)
and the LQR gains (ops/pallas_lqr) moved into kernels, the batched solve
IS the ADMM iteration loop: ~100 iterations x ~0.18 ms.  Each XLA
iteration dispatches the two sweep kernels plus ~30 small ops (the
einsum A/A' applications over 7 row groups, relaxation, projection,
dual update), so the loop is kernel-launch- and HBM-revisit-bound, not
FLOP-bound.

This module fuses ONE ENTIRE ADMM ITERATION into the two sweep
launches:

  fwd kernel (knots ascending):  rz = rho z - y; rhs_k = sigma w_k +
      (A' rz)_k - q_k (the dyn-row coupling from knot k-1 rides a VMEM
      scratch); v_k = Cinv_k rhs_k - Pfwd_k v_{k-1}.
  bwd kernel (knots descending): w~_k = Cinv'_k v_k - Pbwd w~_{k+1};
      z~_k = (A w~)_k (the x_{k+1} term reads the scratch BEFORE it is
      overwritten); relaxation, box projection, and the dual update all
      happen in-register; outputs (w, z, y) for the next iteration.

Row-block representation: all 7 constraint groups of one knot are ONE
(R, L) tile (R = 3 nx + 7 C + 9 rows: init | dyn | cop | fric | trust |
slack | final, inert pad rows with rho=1, l=-inf, u=+inf), and the
whole per-knot constraint operator is ONE (R, V) matrix `Mrow` plus the
diagonal -Ih coupling to x_{k+1} -- built once per solve from the
Ruiz-scaled blocks, so the kernels are generic over robots (point3 and
wrench6 alike).

Iteration state (w, z, y) stays in the kernel-major (knot, sublane,
lane) layout for a whole residual-check segment; pack/unpack to the
solver's ZGroups layout happens once per segment, amortized over
check_interval iterations.

Same math as the admm_iter closure in blockqp._admm_loop_batched
(bit-identical up to f32 reassociation); parity is tested in interpret
mode (tests/test_pallas_admm_iter.py) and certified compiled by the
bench kernel_parity field.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centroidal_mpc_tpu.ops.pallas_blockqp import (LANES, KmTridiagFactor,
                                                   _interpret_default,
                                                   _mat_vec, _v8)
from centroidal_mpc_tpu.solver.ocp import INF


class RowLayout(NamedTuple):
    """Static row offsets of the per-knot constraint block."""

    nx: int
    nu: int
    C: int
    nuc: int

    @property
    def o_init(self):
        return 0

    @property
    def o_dyn(self):
        return self.nx

    @property
    def o_cop(self):
        return 2 * self.nx

    @property
    def o_fric(self):
        return 2 * self.nx + 2 * self.C

    @property
    def o_trust(self):
        return 2 * self.nx + 7 * self.C

    @property
    def o_slack(self):
        return self.o_trust + 8

    @property
    def o_final(self):
        return self.o_slack + 1

    @property
    def R(self):
        return self.o_final + self.nx

    @property
    def R8(self):
        return _v8(self.R)

    @property
    def V(self):
        return self.nx + self.nu + 1

    @property
    def V8(self):
        return _v8(self.V)


def layout_of(s) -> RowLayout:
    """RowLayout from an (unbatched or batched) _Scaled pytree."""
    nx = s.Ah.shape[-1]
    nu = s.Bh.shape[-1]
    C, nuc = s.Gh.shape[-3], s.Gh.shape[-1]
    return RowLayout(nx=nx, nu=nu, C=C, nuc=nuc)


# ---------------------------------------------------------------------------
# batch-major <-> kernel-major packing (XLA, once per segment / solve)
# ---------------------------------------------------------------------------


def _km(a, bp):
    """(B, N1, S) -> (N1, S, Bp): kernel-major with padded lanes."""
    b = a.shape[0]
    out = jnp.transpose(a, (1, 2, 0))
    return jnp.pad(out, ((0, 0), (0, 0), (0, bp - b)))


def pack_rows(lay: RowLayout, z, bp: int, pad_value: float = 0.0):
    """Batched ZGroups -> kernel-major rows (N+1, R8, Bp)."""
    b, n = z.dyn.shape[0], z.dyn.shape[1]
    dtype = z.dyn.dtype
    zeros_n1 = jnp.full((b, n + 1, 1), pad_value, dtype)

    def knotify(a, rows):
        """(B, N, rows) -> (B, N+1, rows) with a pad_value final knot."""
        pad = jnp.full((b, 1, rows), pad_value, dtype)
        return jnp.concatenate([a.reshape(b, n, rows), pad], axis=1)

    init = jnp.concatenate(
        [z.init[:, None, :],
         jnp.full((b, n, lay.nx), pad_value, dtype)], axis=1)
    final = jnp.concatenate(
        [jnp.full((b, n, lay.nx), pad_value, dtype),
         z.final[:, None, :]], axis=1)
    rows = jnp.concatenate([
        init,
        knotify(z.dyn, lay.nx),
        knotify(z.cop, 2 * lay.C),
        knotify(z.fric, 5 * lay.C),
        z.trust,
        z.slack[:, :, None],
        final,
    ], axis=2)
    rows = jnp.pad(rows, ((0, 0), (0, 0), (0, lay.R8 - lay.R)),
                   constant_values=pad_value)
    return _km(rows, bp)


def unpack_rows(lay: RowLayout, rows_km, b: int, zlike):
    """kernel-major rows (N+1, R8, Bp) -> batched ZGroups."""
    n = zlike.dyn.shape[1]
    r = jnp.transpose(rows_km[:, :, :b], (2, 0, 1))   # (B, N+1, R8)
    sl = lambda o, w: r[:, :, o:o + w]
    return type(zlike)(
        init=sl(lay.o_init, lay.nx)[:, 0],
        dyn=sl(lay.o_dyn, lay.nx)[:, :n],
        final=sl(lay.o_final, lay.nx)[:, n],
        cop=sl(lay.o_cop, 2 * lay.C)[:, :n].reshape(b, n, lay.C, 2),
        fric=sl(lay.o_fric, 5 * lay.C)[:, :n].reshape(b, n, lay.C, 5),
        trust=sl(lay.o_trust, 8),
        slack=sl(lay.o_slack, 1)[:, :, 0],
    )


def pack_w(lay: RowLayout, w, bp: int):
    """Batched WVars -> kernel-major (N+1, V8, Bp)."""
    b, n = w.u.shape[0], w.u.shape[1]
    u_full = jnp.concatenate(
        [w.u, jnp.zeros((b, 1, lay.nu), w.u.dtype)], axis=1)
    W = jnp.concatenate([w.x, u_full, w.t[:, :, None]], axis=2)
    W = jnp.pad(W, ((0, 0), (0, 0), (0, lay.V8 - lay.V)))
    return _km(W, bp)


def unpack_w(lay: RowLayout, w_km, b: int, wlike):
    n = wlike.u.shape[1]
    W = jnp.transpose(w_km[:, :, :b], (2, 0, 1))
    return type(wlike)(x=W[:, :, :lay.nx],
                       u=W[:, :n, lay.nx:lay.nx + lay.nu],
                       t=W[:, :, lay.nx + lay.nu])


def build_rowmat(lay: RowLayout, s, bp: int):
    """Per-knot constraint matrices, kernel-major.

    Returns (Mrow (N+1, R8, V8, Bp), Ih (N+1, nx8, Bp)): z_k = Mrow_k w_k
    - Ih_k * x_{k+1} (dyn rows), built from the batched _Scaled blocks.
    """
    b, n = s.Ah.shape[0], s.Ah.shape[1]
    nx, nu, C, nuc = lay.nx, lay.nu, lay.C, lay.nuc
    dtype = s.Ah.dtype
    M = jnp.zeros((b, n + 1, lay.R8, lay.V8), dtype)
    # init rows, knot 0
    M = M.at[:, 0, lay.o_init:lay.o_init + nx, :nx].set(
        jax.vmap(jnp.diag)(s.d0))
    # dyn rows, knots 0..N-1
    M = M.at[:, :n, lay.o_dyn:lay.o_dyn + nx, :nx].set(s.Ah)
    M = M.at[:, :n, lay.o_dyn:lay.o_dyn + nx, nx:nx + nu].set(s.Bh)
    # cop rows (coefficient on u[c*nuc + i], i < 2)
    for c in range(C):
        for i in range(2):
            M = M.at[:, :n, lay.o_cop + 2 * c + i,
                     nx + c * nuc + i].set(s.coph[:, :, c, i])
    # friction rows
    for c in range(C):
        M = M.at[:, :n, lay.o_fric + 5 * c:lay.o_fric + 5 * (c + 1),
                 nx + c * nuc:nx + (c + 1) * nuc].set(s.Gh[:, :, c])
    # trust rows: Th on x[6:9], -wh on t
    M = M.at[:, :, lay.o_trust:lay.o_trust + 8, 6:9].set(s.Th)
    M = M.at[:, :, lay.o_trust:lay.o_trust + 8, lay.V - 1].set(-s.wh)
    # slack row: -sh on t
    M = M.at[:, :, lay.o_slack, lay.V - 1].set(-s.sh)
    # final rows, knot N
    M = M.at[:, n, lay.o_final:lay.o_final + nx, :nx].set(
        jax.vmap(jnp.diag)(s.dN))

    Mk = jnp.pad(jnp.transpose(M, (1, 2, 3, 0)),
                 ((0, 0), (0, 0), (0, 0), (0, bp - b)))
    ih = jnp.concatenate(
        [s.Ih, jnp.zeros((b, 1, nx), dtype)], axis=1)
    ih = jnp.pad(ih, ((0, 0), (0, 0), (0, _v8(nx) - nx)))
    return Mk, _km(ih, bp)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _mat_vec_tn(m, x, r):
    """y[v,:] = sum_r m[r,v,:] * x[r,:]  (M' x, lane-batched)."""
    acc = m[0, :, :] * x[0, :][None, :]
    for l in range(1, r):
        acc += m[l, :, :] * x[l, :][None, :]
    return acc


def _fwd_iter_kernel(mrow_ref, ih_ref, cinv_ref, pfwd_ref, w_ref, q_ref,
                     z_ref, y_ref, rho_ref, v_ref, v_scr, ihrz_scr, *,
                     sigma: float, r8: int, v8: int, nx: int):
    k = pl.program_id(1)
    rz = rho_ref[0] * z_ref[0] - y_ref[0]                    # (R8, L)
    atz = _mat_vec_tn(mrow_ref[0], rz, r8)                   # (V8, L)

    # knot k-1's dyn rows couple -Ih_{k-1} x_k: add the scratch carried
    # from the previous grid step (rows >= nx are zero via Ih's padding,
    # so adding onto atz[:nx8] never touches real u entries)
    nx8 = ihrz_scr.shape[0]
    prev = ihrz_scr[:]
    contrib = jnp.where(k > 0, prev, jnp.zeros_like(prev))
    atz = jnp.concatenate([atz[:nx8] + contrib, atz[nx8:]], axis=0)

    rhs = sigma * w_ref[0] + atz - q_ref[0]
    c = _mat_vec(cinv_ref[0], rhs, v8)

    @pl.when(k == 0)
    def _():
        v_scr[:] = c

    @pl.when(k > 0)
    def _():
        v_scr[:] = c - _mat_vec(pfwd_ref[0], v_scr[:], v8)

    v_ref[0] = v_scr[:]
    # stage -Ih_k * rz_dyn_k for knot k+1 (rows past nx masked by Ih pad)
    ihrz_scr[:] = -ih_ref[0] * rz[nx:nx + nx8, :]


def _bwd_iter_kernel(mrow_ref, ih_ref, cinvt_ref, pbwd_ref, v_ref, w_ref,
                     z_ref, y_ref, rho_ref, l_ref, u_ref,
                     wout_ref, zout_ref, yout_ref, wt_scr, *,
                     alpha: float, r8: int, v8: int, nx: int):
    s = pl.program_id(1)
    d = _mat_vec(cinvt_ref[0], v_ref[0], v8)

    # w~_{k+1}: read the scratch BEFORE overwriting it (garbage at s==0,
    # gated below)
    xnext = wt_scr[:]                                        # (V8, L)

    @pl.when(s == 0)
    def _():
        wt_scr[:] = d

    @pl.when(s > 0)
    def _():
        wt_scr[:] = d - _mat_vec(pbwd_ref[0], wt_scr[:], v8)

    wt = wt_scr[:]
    zt = _mat_vec(mrow_ref[0], wt, v8)                       # (R8, L)
    # dyn rows: -Ih_k * x_{k+1}; Ih is zero at k=N and on pad rows
    ih = ih_ref[0]                                           # (nx8, L)
    nx8 = ih.shape[0]
    coup = jnp.where(s > 0, -ih * xnext[:nx8, :], jnp.zeros_like(ih))
    zt = jnp.concatenate(
        [zt[:nx], zt[nx:nx + nx8] + coup, zt[nx + nx8:]], axis=0)

    w_old = w_ref[0]
    z_old = z_ref[0]
    y_old = y_ref[0]
    rho = rho_ref[0]
    wout_ref[0] = alpha * wt + (1.0 - alpha) * w_old
    z_rel = alpha * zt + (1.0 - alpha) * z_old
    z_new = jnp.clip(z_rel + y_old / rho, l_ref[0], u_ref[0])
    zout_ref[0] = z_new
    yout_ref[0] = y_old + rho * (z_rel - z_new)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("lay", "sigma", "alpha",
                                             "n_iters", "interpret"))
def iterate_batched(lay: RowLayout, fac: KmTridiagFactor,
                    mrow_km, ih_km, q_km, l_km, u_km, rho_km,
                    w_km, z_km, y_km, sigma: float, alpha: float,
                    n_iters: int, interpret: bool | None = None):
    """Run n_iters fused ADMM iterations in kernel-major space."""
    if interpret is None:
        interpret = _interpret_default()
    n1, r8, bp = z_km.shape
    v8 = w_km.shape[1]
    nx8 = ih_km.shape[1]
    n = n1 - 1
    dtype = w_km.dtype

    grid = (bp // LANES, n1)
    mspec = pl.BlockSpec((1, r8, v8, LANES), lambda i, k: (k, 0, 0, i),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, v8, v8, LANES), lambda i, k: (k, 0, 0, i),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, v8, LANES), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM)
    zspec = pl.BlockSpec((1, r8, LANES), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, nx8, LANES), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM)

    # descending index maps for the backward pass
    rmspec = pl.BlockSpec((1, r8, v8, LANES),
                          lambda i, s: (n - s, 0, 0, i),
                          memory_space=pltpu.VMEM)
    rpspec = pl.BlockSpec((1, v8, v8, LANES),
                          lambda i, s: (jnp.minimum(n - s + 1, n), 0, 0, i),
                          memory_space=pltpu.VMEM)
    rcspec = pl.BlockSpec((1, v8, v8, LANES),
                          lambda i, s: (n - s, 0, 0, i),
                          memory_space=pltpu.VMEM)
    rvspec = pl.BlockSpec((1, v8, LANES), lambda i, s: (n - s, 0, i),
                          memory_space=pltpu.VMEM)
    rzspec = pl.BlockSpec((1, r8, LANES), lambda i, s: (n - s, 0, i),
                          memory_space=pltpu.VMEM)
    rispec = pl.BlockSpec((1, nx8, LANES), lambda i, s: (n - s, 0, i),
                          memory_space=pltpu.VMEM)

    fwd = pl.pallas_call(
        functools.partial(_fwd_iter_kernel, sigma=float(sigma), r8=r8,
                          v8=v8, nx=lay.nx),
        grid=grid,
        in_specs=[mspec, ispec, fspec, fspec, vspec, vspec, zspec, zspec,
                  zspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n1, v8, bp), dtype),
        scratch_shapes=[pltpu.VMEM((v8, LANES), dtype),
                        pltpu.VMEM((nx8, LANES), dtype)],
        interpret=interpret,
    )

    bwd = pl.pallas_call(
        functools.partial(_bwd_iter_kernel, alpha=float(alpha), r8=r8,
                          v8=v8, nx=lay.nx),
        grid=grid,
        in_specs=[rmspec, rispec, rcspec, rpspec, rvspec, rvspec, rzspec,
                  rzspec, rzspec, rzspec, rzspec],
        out_specs=(rvspec, rzspec, rzspec),
        out_shape=(jax.ShapeDtypeStruct((n1, v8, bp), dtype),
                   jax.ShapeDtypeStruct((n1, r8, bp), dtype),
                   jax.ShapeDtypeStruct((n1, r8, bp), dtype)),
        scratch_shapes=[pltpu.VMEM((v8, LANES), dtype)],
        interpret=interpret,
    )

    def one_iter(_, state):
        w, z, y = state
        v = fwd(mrow_km, ih_km, fac.Cinv, fac.Pfwd, w, q_km, z, y, rho_km)
        w2, z2, y2 = bwd(mrow_km, ih_km, fac.CinvT, fac.Pbwd, v, w, z, y,
                         rho_km, l_km, u_km)
        return w2, z2, y2

    return jax.lax.fori_loop(0, n_iters, one_iter, (w_km, z_km, y_km))
