"""On-chip f64-island re-evaluation of the polish residuals on the SAME
f32 QP data (isolates evaluation noise from problem-data drift)."""
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16

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


def solve_and_measure(x0, u0):
    cfg = prob.ocp.replace(x_init=x0[0], x_final=x0[-1], X_track=x0)
    data = compute_trajectory_data(prob.model, prob.plan.schedule, x0, u0,
                                   lqr_iters=2, with_covariance=False)
    qp = blockqp.build_block_qp(prob.model, prob.plan.schedule, cfg, x0,
                                u0, data, jnp.asarray(100.0, jnp.float32),
                                jnp.asarray(100.0, jnp.float32))
    w0 = blockqp.WVars(x=x0, u=u0, t=jnp.zeros(x0.shape[0], jnp.float32))
    sol = blockqp.solve_block_qp(qp, qp_set, w0=w0)
    # rebuild the SAME scaled frame and re-evaluate residuals in both
    # precisions on identical data
    s = blockqp._ruiz(qp, qp_set.scaling_iters)
    w = blockqp._wmap(lambda a, d: a / d,
                      blockqp.WVars(sol.X, sol.U, sol.t), s.D)
    y = blockqp._zmap(lambda a, e: s.c * a / e, sol.y, s.E)
    z = blockqp._apply_A(s, w)
    prim32, dual32, ep32, ed32, _, _ = blockqp._residuals(
        s, qp_set, w, z, y)
    with jax.enable_x64(True):
        f64 = jnp.float64
        s64 = jax.tree.map(lambda a: a.astype(f64), s)
        w64 = blockqp._wmap(lambda a: a.astype(f64), w)
        y64 = blockqp.ZGroups(*(v.astype(f64) for v in y))
        z64 = blockqp._apply_A(s64, w64)
        prim64, dual64, ep64, ed64, _, _ = blockqp._residuals(
            s64, qp_set, w64, z64, y64)
    return (sol.converged, dual32, ed32,
            dual64.astype(jnp.float32), ed64.astype(jnp.float32))


conv, d32, e32, d64, e64 = jax.jit(jax.vmap(solve_and_measure))(X0, U0)
jax.block_until_ready(conv)
for i in range(BATCH):
    print(f"lane {i:3d} conv={bool(conv[i])} f32 dual {float(d32[i]):.3e}"
          f"/{float(e32[i]):.3e}  f64-island dual {float(d64[i]):.3e}"
          f"/{float(e64[i]):.3e}")
