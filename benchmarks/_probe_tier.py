"""Probe: eps=1e-5 tier failure mode on-chip (VERDICT r4 item 3)."""
import dataclasses
import sys

import jax
import jax.numpy as jnp

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
import numpy as np
prim = np.asarray(sol.prim_res)
dual = np.asarray(sol.dual_res)
conv = np.asarray(sol.converged)
its = np.asarray(sol.iterations)
print(f"converged {conv.sum()}/{BATCH}  mean_iters {its.mean():.0f}")
print("failing lanes:")
for i in np.where(~conv)[0][:16]:
    print(f"  lane {i}: prim {prim[i]:.3e} dual {dual[i]:.3e} "
          f"iters {its[i]} status {np.asarray(sol.status)[i]}")
ok = np.where(conv)[0]
print(f"converged lanes: prim med {np.median(prim[ok]):.2e} "
      f"max {prim[ok].max():.2e}; dual med {np.median(dual[ok]):.2e} "
      f"max {dual[ok].max():.2e}")
