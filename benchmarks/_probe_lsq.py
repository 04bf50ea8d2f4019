"""Decisive diagnostic: is the post-CG dual floor an active-set
misdetection (some needed rows excluded from the mask) or a primal
error (no y on ANY rows can explain the gradient)?

Computes, in f64 numpy, min_dy ||g + A' dy||_inf with dy supported on
(a) the detected active rows, (b) all finite rows.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
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
x0 = (prob.X0 + dx[None, :]).astype(jnp.float32)
u0 = prob.U0
cfg = prob.ocp.replace(x_init=x0[0], x_final=x0[-1], X_track=x0)
data = compute_trajectory_data(prob.model, prob.plan.schedule, x0, u0,
                               lqr_iters=2, with_covariance=False)
qp = blockqp.build_block_qp(prob.model, prob.plan.schedule, cfg, x0, u0,
                            data, jnp.asarray(100.0, jnp.float32),
                            jnp.asarray(100.0, jnp.float32))
w0 = blockqp.WVars(x=x0, u=u0, t=jnp.zeros(x0.shape[0], jnp.float32))
st = dataclasses.replace(base, polish=True, polish_iters=12,
                         polish_rounds=2, polish_cg_iters=20,
                         polish_cg_restarts=3, polish_rho_ramp=10.0)
sol = jax.jit(lambda: blockqp.solve_block_qp(qp, st, w0=w0))()
jax.block_until_ready(sol)
print(f"lane {LANE} polished: conv {sol.converged} prim {sol.prim_res:.3e}"
      f" dual {sol.dual_res:.3e}")

s = blockqp._ruiz(qp, st.scaling_iters)
w = blockqp._wmap(lambda a, d: (a / d).astype(jnp.float32),
                  blockqp.WVars(sol.X, sol.U, sol.t), s.D)
y = blockqp._zmap(lambda a, e: (s.c * a / e).astype(jnp.float32),
                  sol.y, s.E)
N = qp.horizon

# f64 frame
s64 = jax.tree.map(lambda a: a.astype(jnp.float64), s)
w64 = blockqp._wmap(lambda a: a.astype(jnp.float64), w)
y64 = blockqp.ZGroups(*(v.astype(jnp.float64) for v in y))


def zflat(z):
    return jnp.concatenate([jnp.ravel(v) for v in z])


def wflat(wv):
    return jnp.concatenate([jnp.ravel(wv.x), jnp.ravel(wv.u),
                            jnp.ravel(wv.t)])


def wunflat(v):
    nx, nu = 9, 12
    a = v[:(N + 1) * nx].reshape(N + 1, nx)
    b = v[(N + 1) * nx:(N + 1) * nx + N * nu].reshape(N, nu)
    c = v[(N + 1) * nx + N * nu:]
    return blockqp.WVars(x=a, u=b, t=c)


Pw = blockqp.WVars(x=jnp.einsum("kij,kj->ki", s64.Px, w64.x),
                   u=jnp.einsum("kij,kj->ki", s64.Pu, w64.u),
                   t=jnp.zeros_like(w64.t))
g = blockqp._wmap(lambda p, q_, at: p + q_ + at, Pw, s64.q,
                  blockqp._apply_AT(s64, y64))
gv = np.asarray(wflat(g))
print(f"scaled dual inf-norm of g: {np.abs(gv).max():.3e} "
      f"(/c = {np.abs(gv).max()/float(s.c):.3e} unscaled-ish)")

# dense A' (n_w x n_z) in the scaled frame
AT = jax.jacrev(lambda zv: wflat(blockqp._apply_AT(
    s64, jax.tree.unflatten(jax.tree.structure(y64), [
        zv[a:b].reshape(v.shape) for (a, b), v in zip(
            zip(np.cumsum([0] + [v.size for v in y64])[:-1],
                np.cumsum([v.size for v in y64])), y64)]))))(
                    zflat(y64))
AT = np.asarray(AT)
print("dense A' shape", AT.shape)

# masks
atol = st.polish_active_tol
Aw = blockqp._apply_A(s64, w64)
mask_act, mask_fin = [], []
for lo, hi, zz, yy, ee in zip(s64.l, s64.u, Aw, y64, s64.E):
    fin_l = np.asarray(lo / ee > -0.5e20)
    fin_u = np.asarray(hi / ee < 0.5e20)
    low = (np.asarray(zz - lo) < atol) | (np.asarray(yy) < -1e-12)
    high = (np.asarray(hi - zz) < atol) | (np.asarray(yy) > 1e-12)
    mask_act.append(((low & fin_l) | (high & fin_u)).ravel())
    mask_fin.append((fin_l | fin_u).ravel())
mask_act = np.concatenate(mask_act)
mask_fin = np.concatenate(mask_fin)
print(f"active rows {mask_act.sum()}, finite rows {mask_fin.sum()}, "
      f"total {mask_act.size}")

for name, m in [("active-rows", mask_act), ("all-finite", mask_fin)]:
    Am = AT[:, m]
    dy, *_ = np.linalg.lstsq(Am, -gv, rcond=None)
    res = gv + Am @ dy
    print(f"{name:12s}: min ||g + A'dy||_inf = {np.abs(res).max():.3e} "
          f" (2-norm {np.linalg.norm(res):.3e})")

# CGLS on min ||g + A_act' dy||_2 (no M^{-1}): convergence vs iterations
for prec in (np.float64, np.float32):
    Am = AT[:, mask_act].astype(prec)
    b = (-gv).astype(prec)
    x = np.zeros(Am.shape[1], prec)
    r = b.copy()
    sv = Am.T @ r
    p = sv.copy()
    gamma = sv @ sv
    hist = []
    for it in range(1, 61):
        q = Am @ p
        alpha = gamma / max(q @ q, 1e-30)
        x += alpha * p
        r -= alpha * q
        sv = Am.T @ r
        gnew = sv @ sv
        p = sv + (gnew / max(gamma, 1e-30)) * p
        gamma = gnew
        if it in (5, 10, 15, 20, 30, 40, 60):
            hist.append((it, float(np.abs(gv + AT[:, mask_act] @ x.astype(np.float64)).max())))
    print(prec.__name__, ["%d:%.2e" % h for h in hist])

# D-weighted LSQ (the norm _residuals actually measures):
Dv = np.asarray(wflat(s64.D))
for name, m in [("active-rows", mask_act), ("all-finite", mask_fin)]:
    Am = AT[:, m] / Dv[:, None]
    bw = -gv / Dv
    dy, *_ = np.linalg.lstsq(Am, bw, rcond=None)
    res = bw - Am @ dy  # = (g + A'dy)/D
    print(f"weighted {name:12s}: min max|g+A'dy|/D = {np.abs(res).max():.3e}"
          f" -> unscaled dual {np.abs(res).max()/float(s64.c):.3e}")
# where is the current max |g/D|?
wres = np.abs(gv / Dv)
i = int(wres.argmax())
nxv = (N + 1) * 9
nuv = N * 12
kind = "x" if i < nxv else ("u" if i < nxv + nuv else "t")
print(f"current weighted dual max at flat idx {i} ({kind}), "
      f"|g/D| {wres.max():.3e} (unscaled {wres.max()/float(s64.c):.3e}), "
      f"D {Dv[i]:.3e}, g {gv[i]:.3e}")

# weighted CGLS convergence (f32): does 1/D weighting wreck conditioning?
print("D range:", Dv.min(), Dv.max())
Amw = (AT[:, mask_act] / Dv[:, None]).astype(np.float32)
bw32 = (-gv / Dv).astype(np.float32)
x = np.zeros(Amw.shape[1], np.float32)
r = bw32.copy()
sv = Amw.T @ r
p = sv.copy()
gamma = sv @ sv
for it in range(1, 61):
    q = Amw @ p
    alpha = gamma / max(q @ q, 1e-30)
    x += alpha * p
    r -= alpha * q
    sv = Amw.T @ r
    gnew = sv @ sv
    p = sv + (gnew / max(gamma, 1e-30)) * p
    gamma = gnew
    if it in (5, 10, 20, 40, 60):
        res = (gv + AT[:, mask_act] @ x.astype(np.float64)) / Dv
        print(f"  wCGLS f32 it {it}: max|res| {np.abs(res).max():.3e} "
              f"unscaled {np.abs(res).max()/float(s64.c):.3e}")
