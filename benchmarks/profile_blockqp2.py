#!/usr/bin/env python
"""Chain-difference decomposition profile of the block-ADMM solve.

Timing methodology (axon tunnel):
  * every stage runs k in-jit repetitions inside a lax.scan whose body
    depends on the carry (so XLA cannot hoist it), returning a scalar;
  * the per-rep time is the difference quotient between two chain
    lengths, which cancels the ~25 ms tunnel round-trip constant;
  * the scalar is read back with float() -- block_until_ready on device
    arrays does NOT reliably wait through the tunnel.

    python benchmarks/profile_blockqp2.py --batch 128
"""
import argparse
import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops import blockqp
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.parallel.batch import batched_solve, tile_ocp_config


def rep_time(fn, k1, k2, trials=3, label=""):
    """fn(k) runs k in-jit reps and reads back a scalar; returns seconds
    per rep via the difference quotient."""
    fn(k1), fn(k2)  # compile

    def best(k):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(k)
            b = min(b, time.perf_counter() - t0)
        return b

    t = (best(k2) - best(k1)) / (k2 - k1)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch

    prob = presets.build_problem(
        presets.SOLO12_TROT_N50, dtype=jnp.float32,
        qp=QPSettings(eps_abs=5e-4, eps_rel=5e-4, max_iter=4000,
                      adaptive_rho=False))
    prob = dataclasses.replace(
        prob, scp=dataclasses.replace(prob.scp, qp_backend="block",
                                      norm_method="power"))
    X0 = jnp.broadcast_to(prob.X0, (B,) + prob.X0.shape)
    U0 = jnp.broadcast_to(prob.U0, (B,) + prob.U0.shape)
    cfg = tile_ocp_config(prob.ocp, X0[:, 0], X0[:, -1], X0)

    float(jnp.zeros(()) + 1)  # enter sync tunnel mode
    print(f"# device={jax.devices()[0].device_kind} batch={B}",
          file=sys.stderr)

    # ---- full solve
    solve = jax.jit(lambda c, x, u: batched_solve(
        prob.model, prob.plan.schedule, c, x, u, prob.scp))
    sol = solve(cfg, X0, U0)
    qp_iters = float(jnp.mean(sol.qp_iterations))
    scp_iters = float(jnp.mean(sol.iterations))

    def full_chain(k):
        out = None
        for i in range(k):
            out = solve(cfg, X0 + 1e-5 * i, U0)
        return float(out.X.sum())

    t_full = rep_time(full_chain, 1, 6)
    print(f"full_solve_ms={t_full*1e3:.2f} mean_qp_iters={qp_iters:.0f} "
          f"mean_scp_iters={scp_iters:.1f}")

    # ---- staged data
    def build_one(c, x, u):
        data = compute_trajectory_data(prob.model, prob.plan.schedule, x, u,
                                       with_covariance=False)
        return blockqp.build_block_qp(
            prob.model, prob.plan.schedule, c, x, u, data,
            jnp.asarray(100.0, jnp.float32), jnp.asarray(100.0, jnp.float32))

    qp_b = jax.jit(jax.vmap(build_one))(cfg, X0, U0)
    s_b = jax.jit(jax.vmap(lambda qp: blockqp._ruiz(qp, 10)))(qp_b)

    def factor_one(s):
        rho_g = blockqp._rho_groups(QPSettings(), 0.1, s)
        diag, off = blockqp._assemble_blocks(s, rho_g, 1e-6)
        return blockqp._block_tridiag_cholesky(diag, off)

    fac_b = jax.jit(jax.vmap(factor_one))(s_b)

    # ---- linearize
    @functools.partial(jax.jit, static_argnums=2)
    def lin_chain(x, u, k):
        def body(c, _):
            data = jax.vmap(lambda xx, uu: compute_trajectory_data(
                prob.model, prob.plan.schedule, xx, uu,
                with_covariance=False))(x + c * 1e-20, u)
            return c + data.A[..., 0, 0].sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
        return out

    t_lin = rep_time(lambda k: float(lin_chain(X0, U0, k)), 2, 10)
    print(f"linearize_ms={t_lin*1e3:.3f}")

    # ---- ruiz (10 equilibration passes)
    @functools.partial(jax.jit, static_argnums=1)
    def ruiz_chain(qp, k):
        def body(c, _):
            qp2 = qp.replace(qx=qp.qx + c * 1e-20)
            s = jax.vmap(lambda q: blockqp._ruiz(q, 10))(qp2)
            return c + s.Ah[..., 0, 0].sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
        return out

    t_ruiz = rep_time(lambda k: float(ruiz_chain(qp_b, k)), 2, 10)
    print(f"ruiz_ms={t_ruiz*1e3:.3f}")

    # ---- assemble blocks
    @functools.partial(jax.jit, static_argnums=1)
    def asm_chain(s, k):
        def body(c, _):
            s2 = s._replace(Ah=s.Ah + c * 1e-20)
            rho_g = jax.vmap(
                lambda ss: blockqp._rho_groups(QPSettings(), 0.1, ss))(s2)
            diag, off = jax.vmap(blockqp._assemble_blocks)(
                s2, rho_g, jnp.full((B,), 1e-6, jnp.float32))
            return c + diag[..., 0, 0].sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
        return out

    t_asm = rep_time(lambda k: float(asm_chain(s_b, k)), 2, 10)
    print(f"assemble_ms={t_asm*1e3:.3f}")

    # ---- factorize
    @functools.partial(jax.jit, static_argnums=1)
    def fac_chain(s, k):
        def body(c, _):
            s2 = s._replace(Ah=s.Ah + c * 1e-20)
            f = jax.vmap(factor_one)(s2)
            return c + f.Cinv[..., 0, 0].sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
        return out

    t_fac = rep_time(lambda k: float(fac_chain(s_b, k)), 2, 10)
    print(f"factorize_ms={t_fac*1e3:.3f}")

    # ---- backsolve sweeps
    V = fac_b.Cinv.shape[-1]
    N = prob.plan.horizon
    b0 = jnp.ones((B, N + 1, V), jnp.float32)

    for method in ("scan", "assoc"):
        @functools.partial(jax.jit, static_argnums=2)
        def sweep_chain(fac, b, k, _m=method):
            def body(x, _):
                y = jax.vmap(lambda f, bb: blockqp._block_tridiag_solve(
                    f, bb, _m))(fac, x)
                return y / (1.0 + jnp.abs(y).max()), None
            out, _ = jax.lax.scan(body, b, None, length=k)
            return out.sum()

        t_sw = rep_time(lambda k: float(sweep_chain(fac_b, b0, k)), 5, 105)
        print(f"backsolve_{method}_us={t_sw*1e6:.1f}")

    # ---- apply A / A'
    @functools.partial(jax.jit, static_argnums=2)
    def apply_chain(s, b, k):
        def one(ss, w):
            wv = blockqp.WVars(x=w[:, :9], u=w[:-1, 9:9 + 12], t=w[:, -1])
            z = blockqp._apply_A(ss, wv)
            w2 = blockqp._apply_AT(ss, z)
            out = jnp.zeros_like(w)
            out = out.at[:, :9].set(w2.x)
            out = out.at[:-1, 9:9 + 12].set(w2.u)
            out = out.at[:, -1].set(w2.t)
            return out

        def body(x, _):
            y = jax.vmap(one)(s, x)
            return y / (1.0 + jnp.abs(y).max()), None
        out, _ = jax.lax.scan(body, b, None, length=k)
        return out.sum()

    t_ap = rep_time(lambda k: float(apply_chain(s_b, b0, k)), 5, 105)
    print(f"apply_A_AT_us={t_ap*1e6:.1f}")

    # ---- residual evaluation (every check_interval=25 iters)
    w0 = blockqp.WVars(x=b0[:, :, :9], u=b0[:, :-1, 9:21], t=b0[:, :, -1])

    @functools.partial(jax.jit, static_argnums=1)
    def resid_chain(s, k):
        z0 = jax.vmap(blockqp._apply_A)(s, w0)
        def body(c, _):
            w = blockqp.WVars(x=w0.x + c * 1e-20, u=w0.u, t=w0.t)
            out = jax.vmap(lambda ss, ww, zz: blockqp._residuals(
                ss, QPSettings(), ww, zz, zz)[0])(s, w, z0)
            return c + out.sum() * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
        return out

    t_res = rep_time(lambda k: float(resid_chain(s_b, k)), 2, 22)
    print(f"residuals_us={t_res*1e6:.1f}")

    bytes_per_iter = B * 4 * (N + 1) * V * V * 4
    print(f"# factor stream/iter ~{bytes_per_iter/1e6:.1f} MB "
          f"=> {bytes_per_iter/819e9*1e6:.0f} us at 819 GB/s")
    est = (t_lin + t_ruiz + t_asm + t_fac
           + qp_iters * (t_sw + t_ap) + qp_iters / 25 * t_res)
    print(f"# est iter-loop composition: lin+ruiz+asm+fac="
          f"{(t_lin+t_ruiz+t_asm+t_fac)*1e3:.2f}ms "
          f"admm_loop={(qp_iters*(t_sw+t_ap))*1e3:.2f}ms "
          f"resid={(qp_iters/25*t_res)*1e3:.2f}ms "
          f"total_est={est*1e3:.2f}ms vs measured {t_full*1e3:.2f}ms")


if __name__ == "__main__":
    main()
