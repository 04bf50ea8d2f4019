"""Recompute TPU-polished solutions' dual residuals in f64 on the host.

Decides whether the eps=1e-5 tier's failing lanes carry a TRUE dual
residual above threshold or only an f32 evaluation-noise floor
(cancellation inside A'y with O(1e2) equality multipliers).
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops import blockqp
from centroidal_mpc_tpu.ops.admm import QPSettings

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64

qp_set = QPSettings(
    eps_abs=1e-5, eps_rel=1e-5, max_iter=4000,
    adaptive_rho=False, adaptive_rho_mode="always",
    sweep_method="scan", factor_method="pallas",
    polish=True, check_interval=10, alpha=1.7,
    polish_iters=12, polish_rounds=2,
    polish_cg_iters=20, polish_cg_restarts=3,
    polish_rho_ramp=10.0, stall_segments=30)

preset = presets.PRESETS["solo12_trot_n50"]
prob = presets.build_problem(preset, dtype=jnp.float32, qp=qp_set)

key = jax.random.PRNGKey(0)
dx = jnp.zeros((BATCH, 9), jnp.float32)
dx = dx.at[1:, :2].set(
    0.005 * jax.random.normal(key, (BATCH - 1, 2), jnp.float32))
X0 = prob.X0[None] + dx[:, None, :]
U0 = jnp.broadcast_to(prob.U0, (BATCH,) + prob.U0.shape)


def solve_one(x0, u0):
    cfg = prob.ocp.replace(x_init=x0[0], x_final=x0[-1], X_track=x0)
    data = compute_trajectory_data(prob.model, prob.plan.schedule, x0, u0,
                                   lqr_iters=2, with_covariance=False)
    qp = blockqp.build_block_qp(prob.model, prob.plan.schedule, cfg, x0,
                                u0, data, jnp.asarray(100.0, jnp.float32),
                                jnp.asarray(100.0, jnp.float32))
    w0 = blockqp.WVars(x=x0, u=u0, t=jnp.zeros(x0.shape[0], jnp.float32))
    return blockqp.solve_block_qp(qp, qp_set, w0=w0)


sol = jax.jit(jax.vmap(solve_one))(X0, U0)
jax.block_until_ready(sol)
conv = np.asarray(sol.converged)
dual_f32 = np.asarray(sol.dual_res)
print(f"on-chip converged {conv.sum()}/{BATCH}")

# host-side f64 re-evaluation of the OSQP residuals/thresholds
cpu = jax.devices("cpu")[0]
with jax.enable_x64(True), jax.default_device(cpu):
    prob64 = presets.build_problem(preset, dtype=jnp.float64, qp=qp_set)
    lanes = list(np.where(~conv)[0][:10]) + list(np.where(conv)[0][:3])
    for i in lanes:
        x0 = jnp.asarray(np.asarray(X0[i]), jnp.float64)
        u0 = jnp.asarray(np.asarray(U0[i]), jnp.float64)
        cfg = prob64.ocp.replace(x_init=x0[0], x_final=x0[-1], X_track=x0)
        data = compute_trajectory_data(prob64.model, prob64.plan.schedule,
                                       x0, u0, lqr_iters=2,
                                       with_covariance=False)
        qp = blockqp.build_block_qp(
            prob64.model, prob64.plan.schedule, cfg, x0, u0, data,
            jnp.asarray(100.0, jnp.float64), jnp.asarray(100.0, jnp.float64))
        s = blockqp._ruiz(qp, qp_set.scaling_iters)
        w = blockqp._wmap(
            lambda a, d: a / d,
            blockqp.WVars(jnp.asarray(np.asarray(sol.X[i]), jnp.float64),
                          jnp.asarray(np.asarray(sol.U[i]), jnp.float64),
                          jnp.asarray(np.asarray(sol.t[i]), jnp.float64)),
            s.D)
        y_i = jax.tree.map(lambda a: a[i], sol.y)
        y = blockqp._zmap(
            lambda a, e: s.c * jnp.asarray(np.asarray(a), jnp.float64) / e,
            y_i, s.E)
        z = blockqp._apply_A(s, w)
        prim, dual, ep, ed, _, _ = blockqp._residuals(s, qp_set, w, z, y)
        tag = "FAIL" if not conv[i] else "ok"
        print(f"lane {i:3d} [{tag}] f32 dual {dual_f32[i]:.3e} | "
              f"f64 dual {float(dual):.3e} thr {float(ed):.3e} "
              f"prim {float(prim):.3e} thr {float(ep):.3e}")
