"""Independent KKT certification of the production ADMM solutions.

The reference's QP oracle is OSQP at eps 1e-7 with polish
(src/scp_solver.py:59-68), which cannot run in this environment.  The
strongest feasible substitute (VERDICT round 1, item 2a) is ops/certify.py:
a scipy-sparse-LU active-set solver sharing no code with the ADMM paths,
certifying the block solver's answers at the FULL reference horizon
(N=165 trot, conf_solo12_trot.py:12-17 -> 3x(5+15+5+15)+(5+15+5+15+5)
knots) in both nominal and stochastic modes.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu import presets
from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
from centroidal_mpc_tpu.ops import blockqp
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.ops.certify import (certify_qp_solution,
                                            flatten_block_solution)
from centroidal_mpc_tpu.solver.ocp import build_qp

TIGHT = QPSettings(eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
                   adaptive_rho=True, polish=True)


def test_certifier_standalone_small_qp():
    """Cold-start sanity on a hand-checkable QP:
    min 1/2 ||x||^2 - [3, 4] x  s.t.  0 <= x <= [1, 10], x0 + x1 <= 8.
    Unconstrained optimum (3, 4); x0 clips at 1; x1 -> 4."""
    P = np.eye(2)
    q = np.array([-3.0, -4.0])
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    l = np.array([0.0, 0.0, -1e20])
    u = np.array([1.0, 10.0, 8.0])
    res = certify_qp_solution(P, q, A, l, u)
    assert res.converged
    np.testing.assert_allclose(res.x, [1.0, 4.0], atol=1e-10)
    assert res.stationarity < 1e-10
    assert res.primal_violation < 1e-10
    # upper-active row dual positive (OSQP convention)
    assert res.y[0] > 0


def _solve_and_certify(stochastic: bool):
    prob = presets.build_problem(presets.SOLO12_TROT, dtype=jnp.float64,
                                 stochastic=stochastic)
    lqr_iters = 30 if stochastic else 2
    data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                   prob.X0, prob.U0, lqr_iters=lqr_iters,
                                   with_covariance=stochastic)
    r0 = jnp.asarray(prob.scp.trust_region_radius0, jnp.float64)
    w0 = jnp.asarray(prob.scp.omega0, jnp.float64)
    qpd = build_qp(prob.model, prob.plan.schedule, prob.ocp,
                   prob.X0, prob.U0, data, r0, w0)
    qpb = blockqp.build_block_qp(prob.model, prob.plan.schedule, prob.ocp,
                                 prob.X0, prob.U0, data, r0, w0)
    bsol = blockqp.solve_block_qp(qpb, TIGHT)
    assert bool(bsol.converged)
    x_admm, y_admm = flatten_block_solution(bsol, prob.plan.horizon)
    res = certify_qp_solution(
        np.asarray(qpd.P), np.asarray(qpd.q), np.asarray(qpd.A),
        np.asarray(qpd.l), np.asarray(qpd.u), x_admm, y_admm)
    return prob, x_admm, res


@pytest.mark.parametrize("stochastic", [False, True],
                         ids=["nominal", "stochastic"])
def test_certify_full_trot_n165(stochastic):
    """Full-reference-scale certification: the independent active-set
    solve reaches KKT residuals <= 1e-8 and the block-ADMM(+polish)
    solution sits within 1e-4 (the BASELINE parity tolerance) of it --
    measured, not assumed."""
    prob, x_admm, res = _solve_and_certify(stochastic)
    assert prob.plan.horizon == 165
    assert res.converged
    assert res.stationarity < 1e-8
    assert res.primal_violation < 1e-8
    assert res.comp_slack < 1e-6
    n_xu = 9 * 166 + 12 * 165
    gap = np.abs(x_admm[:n_xu] - res.x[:n_xu]).max()
    assert gap < 1e-4, f"ADMM-vs-certified gap {gap:.2e}"
