"""Dissect the polish dual refinement on a hard eps=1e-5 lane (CPU f32).

Round-5 instrument for the eps=1e-5 certification work (VERDICT r4
item 3): reproduces one of the ~8% of batch lanes whose dual residual
missed the tier threshold under the round-4 CG formulation, and prints
the polished residuals for CGLS budget variants.  See also
_probe_lsq.py (the least-squares diagnostic that located the floor in
the Krylov formulation) and _probe_tier.py (the on-chip batch probe).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops import blockqp
from centroidal_mpc_tpu.ops.admm import QPSettings

LANE = int(sys.argv[1]) if len(sys.argv) > 1 else 6

base = QPSettings(
    eps_abs=1e-5, eps_rel=1e-5, max_iter=4000,
    adaptive_rho=False, sweep_method="scan", factor_method="cholesky",
    polish=False, check_interval=10, alpha=1.7, stall_segments=30)

prob = presets.build_problem(presets.PRESETS["solo12_trot_n50"],
                             dtype=jnp.float32, qp=base)
key = jax.random.PRNGKey(0)
noise = 0.005 * jax.random.normal(key, (63, 2), jnp.float32)
dx = jnp.zeros(9, jnp.float32).at[:2].set(noise[LANE - 1])
x0 = prob.X0 + dx[None, :]
u0 = prob.U0
cfg = prob.ocp.replace(x_init=x0[0], x_final=x0[-1], X_track=x0)
data = compute_trajectory_data(prob.model, prob.plan.schedule, x0, u0,
                               lqr_iters=2, with_covariance=False)
qp = blockqp.build_block_qp(prob.model, prob.plan.schedule, cfg, x0, u0,
                            data, jnp.asarray(100.0, jnp.float32),
                            jnp.asarray(100.0, jnp.float32))
w0 = blockqp.WVars(x=x0, u=u0, t=jnp.zeros(x0.shape[0], jnp.float32))
sol = jax.jit(lambda: blockqp.solve_block_qp(qp, base, w0=w0))()
jax.block_until_ready(sol)
print(f"lane {LANE} raw ADMM: conv {sol.converged} prim {sol.prim_res:.3e}"
      f" dual {sol.dual_res:.3e} iters {sol.iterations}")

# Re-scale the solution into the polish's frame and run polish variants.
s = blockqp._ruiz(qp, base.scaling_iters)
w = blockqp._wmap(lambda a, d: a / d, blockqp.WVars(sol.X, sol.U, sol.t),
                  s.D)
y = blockqp._zmap(lambda a, e: s.c * a / e, sol.y, s.E)
nx, nu = 9, 12


def run_polish(**over):
    st = dataclasses.replace(base, polish=True, **over)
    sigma = jnp.asarray(st.sigma, jnp.float32)
    factorize = blockqp._block_tridiag_cholesky
    backsolve = lambda f, b: blockqp._block_tridiag_solve(f, b, "scan")

    @jax.jit
    def go():
        w_p, z_p, y_p, y_lo = blockqp._polish(s, st, sigma, factorize,
                                              backsolve, w, y, nx, nu)
        return blockqp._residuals(s, st, w_p, z_p, y_p, y_lo)

    prim, dual, eps_p, eps_d, _, _ = go()
    return float(prim), float(dual), float(eps_p), float(eps_d)


variants = [
    ("cg20x3 (tier)", dict(polish_iters=12, polish_rounds=2,
                       polish_cg_iters=20, polish_cg_restarts=3,
                       polish_rho_ramp=10.0)),
    ("cg15x2",        dict(polish_iters=12, polish_rounds=2,
                       polish_cg_iters=15, polish_cg_restarts=2,
                       polish_rho_ramp=10.0)),
]
for name, over in variants:
    prim, dual, eps_p, eps_d = run_polish(**over)
    print(f"{name:12s} prim {prim:.3e}/{eps_p:.2e} "
          f"dual {dual:.3e}/{eps_d:.2e} "
          f"{'PASS' if prim < eps_p and dual < eps_d else 'fail'}")
