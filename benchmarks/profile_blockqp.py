#!/usr/bin/env python
"""Block-QP solver decomposition profile (VERDICT round 1, item 3).

Times the pieces of the production block-ADMM solve on the attached
device to locate the bottleneck before deciding the Pallas kernel's fate:

  * full batched SCP solve (the bench workload)
  * one block-tridiagonal factorization
  * k ADMM-style backsolves (scan sweeps) -- sequential-latency probe
  * the same with sweep_method='assoc' (log-depth, matmul-heavy)
  * the constraint operator A / A' applications

Roofline context (v5e, f32): one backsolve streams ~3 N V^2 floats of
factors per scenario; at batch 128, N=50, V=22 that is ~37 MB per
iteration => ~46 us/iteration at 800 GB/s if HBM-bound.

    python benchmarks/profile_blockqp.py --batch 128 --iters 100
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops import blockqp
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.parallel.batch import batched_solve, tile_ocp_config

import dataclasses


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100,
                    help="ADMM iterations in the sweep probe")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = presets.build_problem(
        presets.SOLO12_TROT_N50, dtype=jnp.float32,
        qp=QPSettings(eps_abs=5e-4, eps_rel=5e-4, max_iter=4000,
                      adaptive_rho=False))
    prob = dataclasses.replace(
        prob, scp=dataclasses.replace(prob.scp, qp_backend="block",
                                      norm_method="power"))
    B = args.batch
    X0 = jnp.broadcast_to(prob.X0, (B,) + prob.X0.shape)
    U0 = jnp.broadcast_to(prob.U0, (B,) + prob.U0.shape)
    cfg = tile_ocp_config(prob.ocp, X0[:, 0], X0[:, -1], X0)

    # force tunnel sync mode
    jax.block_until_ready(jnp.zeros(1) + 1)
    print(f"# device={jax.devices()[0].device_kind} batch={B}",
          file=sys.stderr)

    # 1. full solve
    solve = jax.jit(lambda c, x, u: batched_solve(
        prob.model, prob.plan.schedule, c, x, u, prob.scp))
    t_full, sol = timed(solve, cfg, X0, U0)
    qp_iters = float(jnp.mean(sol.qp_iterations))
    print(f"full_solve_ms={t_full*1e3:.2f} mean_qp_iters={qp_iters:.0f} "
          f"ms_per_iter={t_full*1e3/max(qp_iters,1):.3f}")

    # shared: per-scenario block QP data at the warm start
    def build_one(c, x, u):
        data = compute_trajectory_data(prob.model, prob.plan.schedule, x, u,
                                       with_covariance=False)
        return blockqp.build_block_qp(
            prob.model, prob.plan.schedule, c, x, u, data,
            jnp.asarray(100.0, jnp.float32), jnp.asarray(100.0, jnp.float32))

    qp_b = jax.jit(jax.vmap(build_one))(cfg, X0, U0)
    jax.block_until_ready(qp_b)

    s_b = jax.jit(jax.vmap(
        lambda qp: blockqp._ruiz(qp, 10)))(qp_b)
    jax.block_until_ready(s_b)

    def factor_one(s):
        rho_g = blockqp._rho_groups(QPSettings(), 0.1, s)
        diag, off = blockqp._assemble_blocks(s, rho_g, 1e-6)
        return blockqp._block_tridiag_cholesky(diag, off)

    # 2. factorization
    fac_fn = jax.jit(jax.vmap(factor_one))
    t_fac, fac_b = timed(fac_fn, s_b)
    print(f"factorize_ms={t_fac*1e3:.2f}")

    # 3. k sweeps, sequential scan vs assoc
    V = fac_b.Cinv.shape[-1]
    N = prob.plan.horizon
    b0 = jnp.ones((B, N + 1, V), jnp.float32)

    for method in ("scan", "assoc"):
        def sweeps(fac, b, _m=method):
            def body(x, _):
                y = jax.vmap(lambda f, bb: blockqp._block_tridiag_solve(
                    f, bb, _m))(fac, x)
                return y / (1.0 + jnp.abs(y).max()), None
            out, _ = jax.lax.scan(body, b, None, length=args.iters)
            return out
        fn = jax.jit(sweeps)
        t_sw, _ = timed(fn, fac_b, b0)
        print(f"backsolves_{method}_ms={t_sw*1e3:.2f} "
              f"({t_sw*1e6/args.iters:.1f} us/backsolve)")

    # 4. A / A' applications
    def apply_ops(s, b):
        def body(w, _):
            wv = blockqp.WVars(x=w[:, :9], u=w[:-1, 9:9 + 12], t=w[:, -1])
            z = blockqp._apply_A(s, wv)
            w2 = blockqp._apply_AT(s, z)
            out = jnp.zeros_like(w)
            out = out.at[:, :9].set(w2.x)
            out = out.at[:-1, 9:9 + 12].set(w2.u)
            out = out.at[:, -1].set(w2.t)
            return out / (1.0 + jnp.abs(out).max()), None
        out, _ = jax.lax.scan(body, b, None, length=args.iters)
        return out

    fn = jax.jit(jax.vmap(apply_ops, in_axes=(0, 0)))
    t_ap, _ = timed(fn, s_b, b0)
    print(f"apply_A_AT_ms={t_ap*1e3:.2f} ({t_ap*1e6/args.iters:.1f} us/pair)")

    # roofline estimate
    bytes_per_iter = B * (3 * N * V * V + 2 * N * V * V) * 4
    print(f"# factor stream/iter ~{bytes_per_iter/1e6:.1f} MB "
          f"=> {bytes_per_iter/800e9*1e6:.0f} us at 800 GB/s")


if __name__ == "__main__":
    main()
