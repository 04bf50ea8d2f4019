"""Pallas TPU kernels for the block-tridiagonal sweeps.

The ADMM hot loop's backsolve is two affine recurrences over knots,

    v_k = c_k - P_k @ v_{k-1}            (forward; mirrored backward)

with per-scenario (V, V) coupling blocks.  Under the vmapped solver these
lower to a `lax.scan` of batched matvecs -- correct, but each of the ~100
scan steps is a separate tiny device op.  This kernel fuses an entire
sweep into ONE kernel launch with the batch dimension on the VPU lanes:

  * grid over batch tiles of 128 scenarios (the lane width);
  * the (N, V, V, 128) coupling blocks stay in HBM and stream through a
    double-buffered async-copy pipeline, one knot ahead of the compute;
  * the per-knot update is V broadcast-FMA ops on (V, 128) tiles, so an
    entire N-knot sweep is a few thousand vector ops with no per-step
    XLA dispatch.

Layout contract (kernel-major): P is (N, V, V, B) and c is (N+1, V, B)
with B the trailing/lane axis; `sweep_batched` handles the transposes
from the solver-major (B, N, V, V) layout.

Status: EXPERIMENTAL -- measured findings on TPU v5e (2026-08, this repo):
  * interpret mode matches the XLA scan reference exactly (tests);
  * the compiled Mosaic lowering currently MISCOMPARES (the HBM-sliced
    per-knot DMA reads wrong data; a sync single-buffer variant fails the
    same way, so it is the DMA/layout path, not the double buffering);
  * measured in-jit at B=512/N=50/V=22, the fused kernel is within noise
    of XLA's batched-matvec scan (1.35 vs 1.24 ms/sweep) -- per-step
    dispatch was NOT the bottleneck inside a jitted program.
The production solver therefore keeps the XLA scan path; this kernel is
kept as the starting point for a future natively-batched solver where a
fused factor+sweeps kernel (holding factors in VMEM across all ~100 ADMM
iterations) is the projected win, not the lone sweep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # batch tile per kernel program (VPU lane width)


def _sweep_kernel(p_hbm, c_ref, out_ref, scratch, sem, *, n_knots: int,
                  v_dim: int, reverse: bool):
    """One affine-recurrence sweep for a LANES-wide batch tile.

    p_hbm: (N, V, V, B) in HBM (manually streamed); c_ref/out_ref:
    (N+1, V, LANES) VMEM blocks; scratch: (2, V, V, LANES) double buffer.
    Forward:  v_0 = c_0;  v_k = c_k - P_{k-1} v_{k-1}
    Backward: v_N = c_N;  v_k = c_k - P_k v_{k+1}
    """
    i = pl.program_id(0)
    off = i * LANES

    def p_index(step):
        # coupling block consumed at `step` (producing knot k below)
        return n_knots - step if reverse else step - 1

    def dma(slot, step):
        return pltpu.make_async_copy(
            p_hbm.at[p_index(step), :, :, pl.ds(off, LANES)],
            scratch.at[slot], sem.at[slot])

    start = n_knots if reverse else 0
    v0 = c_ref[start]
    out_ref[start] = v0
    dma(0, 1).start()

    def body(step, v):
        slot = jax.lax.rem(step - 1, 2)
        nxt = jax.lax.rem(step, 2)

        @pl.when(step < n_knots)
        def _():
            dma(nxt, step + 1).start()

        dma(slot, step).wait()
        k = n_knots - step if reverse else step
        acc = c_ref[k]
        p = scratch[slot]
        for j in range(v_dim):  # static V: broadcast-FMA chain on lanes
            acc = acc - p[:, j, :] * v[j, :][None, :]
        out_ref[k] = acc
        return acc

    jax.lax.fori_loop(1, n_knots + 1, body, v0)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def sweep_batched(P: jnp.ndarray, c: jnp.ndarray, reverse: bool = False,
                  interpret: bool = False) -> jnp.ndarray:
    """All-prefix solve of v_k = c_k - P_k v_{k-1} for a whole batch.

    P: (B, N, V, V); c: (B, N+1, V); B must be a multiple of 128.
    Returns (B, N+1, V).
    """
    b, n, v, _ = P.shape
    if b % LANES != 0:
        raise ValueError(f"batch {b} must be a multiple of {LANES}")
    v8 = -(-v // 8) * 8  # sublane-aligned V (Mosaic DMA slice constraint)
    # kernel-major layout: batch on the lane axis, V padded to sublanes
    p_t = jnp.transpose(P, (1, 2, 3, 0))      # (N, V, V, B)
    p_t = jnp.pad(p_t, ((0, 0), (0, v8 - v), (0, v8 - v), (0, 0)))
    c_t = jnp.transpose(c, (1, 2, 0))         # (N+1, V, B)
    c_t = jnp.pad(c_t, ((0, 0), (0, v8 - v), (0, 0)))

    kernel = functools.partial(_sweep_kernel, n_knots=n, v_dim=v,
                               reverse=reverse)
    out_t = pl.pallas_call(
        kernel,
        grid=(b // LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # P stays in HBM
            pl.BlockSpec((n + 1, v8, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n + 1, v8, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + 1, v8, b), P.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, v8, v8, LANES), P.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p_t, c_t)
    return jnp.transpose(out_t[:, :v, :], (2, 0, 1))


def sweep_reference(P: jnp.ndarray, c: jnp.ndarray,
                    reverse: bool = False) -> jnp.ndarray:
    """XLA scan reference implementation (same math, batch-major)."""

    def one(Pb, cb):
        Ppad = -Pb  # recurrence as v = c + (-P) v

        def fwd(vp, inputs):
            ck, pk = inputs
            vk = ck + pk @ vp
            return vk, vk

        if reverse:
            _, vs = jax.lax.scan(fwd, cb[-1], (cb[:-1], Ppad),
                                 reverse=True)
            return jnp.concatenate([vs, cb[-1:]], axis=0)
        _, vs = jax.lax.scan(fwd, cb[0], (cb[1:], Ppad))
        return jnp.concatenate([cb[:1], vs], axis=0)

    return jax.vmap(one)(P, c)
