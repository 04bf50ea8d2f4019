"""QP assembly golden tests.

The oracle re-derives the reference's flat QP (src/cost.py,
src/constraints.py, src/optimizer.py index layout) with straightforward
numpy loops, independently of the vectorized scatter assembly in
solver/ocp.py, and diffs the dense matrices elementwise.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.solver import ocp

RADIUS, WEIGHT = 100.0, 100.0


@pytest.fixture(scope="module")
def solo_problem():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    qp = ocp.build_qp(prob.model, prob.plan.schedule, prob.ocp,
                      prob.X0, prob.U0, data,
                      jnp.asarray(RADIUS), jnp.asarray(WEIGHT))
    return prob, data, qp


def _oracle_dense(prob, data, radius, weight, stochastic=False):
    """Reference-layout dense QP via plain loops (the test oracle)."""
    model, plan, cfg = prob.model, prob.plan, prob.ocp
    N = plan.horizon
    nx, nu, C = 9, model.n_u, model.n_contacts
    n = nx * (N + 1) + nu * N + (N + 1) + N
    off_u = nx * (N + 1)
    off_t = off_u + nu * N
    X, U = np.asarray(prob.X0), np.asarray(prob.U0)
    Wx, Wu = np.asarray(cfg.Wx), np.asarray(cfg.Wu)
    logic = np.asarray(plan.schedule.logic)
    rot = np.asarray(plan.schedule.orientation)

    # cost: block-diag weights + tracking gradient + slack L1
    P = np.zeros((n, n))
    for k in range(N + 1):
        P[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx] = Wx
    for k in range(N):
        P[off_u + k * nu:off_u + (k + 1) * nu,
          off_u + k * nu:off_u + (k + 1) * nu] = Wu
    q = np.zeros(n)
    for k in range(N + 1):
        q[k * nx:(k + 1) * nx] = -Wx @ X[k]
        q[off_t + k] = 1.0
    rows = []

    def add(row, lo, hi):
        rows.append((row, lo, hi))

    # initial / dynamics / final
    for i in range(nx):
        r = np.zeros(n); r[i] = 1.0
        add(r, float(cfg.x_init[i]), float(cfg.x_init[i]))
    A_traj, B_traj, F = (np.asarray(data.A), np.asarray(data.B),
                         np.asarray(data.f))
    for k in range(N):
        res = A_traj[k] @ X[k] + B_traj[k] @ U[k] - F[k]
        for i in range(nx):
            r = np.zeros(n)
            r[k * nx:(k + 1) * nx] = A_traj[k][i]
            r[off_u + k * nu:off_u + (k + 1) * nu] = B_traj[k][i]
            r[(k + 1) * nx + i] = -1.0
            add(r, res[i] - 1e-12, res[i] + 1e-12)
    for i in range(nx):
        r = np.zeros(n); r[N * nx + i] = 1.0
        add(r, float(cfg.x_final[i]), float(cfg.x_final[i]))
    # friction: contact-major blocks of 5N rows; only 4 tangential filled
    G = np.asarray(cfg.pyramid)
    backoffs = np.zeros((N, C, 5))
    if stochastic:
        xi = float(cfg.xi)
        K_t = np.asarray(data.K)
        S_t = np.asarray(data.Sigma)
        for k in range(1, N):
            for c in range(C):
                if logic[k, c] == 0:
                    continue
                Gr = G @ rot[k, c].T
                Kc = K_t[k, c * 3:c * 3 + 3, :]
                ksk = Kc @ S_t[k] @ Kc.T
                for row in range(4):
                    for j in range(3):
                        s = np.sqrt(max(ksk[j, j], 0.0))
                        if Gr[row, j] > 1e-6 and s > 1e-6:
                            backoffs[k, c, row] += xi * 2 * Gr[row, j] * s
    for c in range(C):
        for k in range(N):
            Gr = (G @ rot[k, c].T) * logic[k, c]
            for row in range(5):
                r = np.zeros(n)
                if row < 4:
                    r[off_u + k * nu + c * 3: off_u + k * nu + c * 3 + 3] = Gr[row]
                add(r, -ocp.INF, -backoffs[k, c, row])
    # trust region
    pen = np.asarray(ocp.sign_enumeration_matrix(3))
    for k in range(N + 1):
        for p in range(8):
            r = np.zeros(n)
            r[k * nx + 6:k * nx + 9] = pen[p]
            r[off_t + k] = -1.0 / weight
            add(r, -ocp.INF, radius + pen[p] @ X[k, 6:9])
    for k in range(N + 1):
        r = np.zeros(n); r[off_t + k] = -1.0
        add(r, -ocp.INF, 0.0)
    A = np.stack([r for r, _, _ in rows])
    l = np.array([lo for _, lo, _ in rows])
    u = np.array([hi for _, _, hi in rows])
    return P, q, A, l, u


def test_dense_qp_matches_oracle(solo_problem):
    prob, data, qp = solo_problem
    P, q, A, l, u = _oracle_dense(prob, data, RADIUS, WEIGHT)
    np.testing.assert_allclose(np.asarray(qp.P), P, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.q), q, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.A), A, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.l), l, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.u), u, atol=1e-12)


def test_stochastic_backoffs_match_oracle():
    prob = presets.build_problem(presets.SOLO12_TROT_N50, stochastic=True,
                                 dtype=jnp.float64)
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    qp = ocp.build_qp(prob.model, prob.plan.schedule, prob.ocp,
                      prob.X0, prob.U0, data,
                      jnp.asarray(RADIUS), jnp.asarray(WEIGHT))
    P, q, A, l, u = _oracle_dense(prob, data, RADIUS, WEIGHT, stochastic=True)
    np.testing.assert_allclose(np.asarray(qp.A), A, atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.u), u, rtol=1e-9, atol=1e-12)
    # back-offs actually tighten something
    n_fric0 = 9 + 9 * prob.plan.horizon + 9
    fric_u = np.asarray(qp.u)[n_fric0:n_fric0 + 4 * 5 * prob.plan.horizon]
    assert (fric_u < 0).any()


def test_unilateral_row_flag():
    """fill_unilateral=True populates the 5th pyramid row the reference
    leaves empty (src/constraints.py:180; SURVEY.md 2b)."""
    import dataclasses as dc
    prob = presets.build_problem(presets.SOLO12_TROT_N50, dtype=jnp.float64)
    cfg = dc.replace(prob.ocp, fill_unilateral=True)
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0)
    qp = ocp.build_qp(prob.model, prob.plan.schedule, cfg, prob.X0, prob.U0,
                      data, jnp.asarray(RADIUS), jnp.asarray(WEIGHT))
    N = prob.plan.horizon
    fric0 = 9 + 9 * N + 9
    A = np.asarray(qp.A)
    # 5th row of first active knot/contact: -fz <= 0
    row = A[fric0 + 4]
    off_u = 9 * (N + 1)
    assert row[off_u + 2] == -1.0
