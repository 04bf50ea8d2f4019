"""Receding-horizon MPC tests: rolling re-solve over the full trot plan,
warm-start effectiveness, disturbance rejection."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models.centroidal import dynamics_step
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.solver.mpc import MpcController
from centroidal_mpc_tpu.solver.warm_start import (
    centroid_state_warm_start, weight_distribution_control_warm_start)


@pytest.fixture(scope="module")
def controller():
    """MPC over the full trot plan, tracking the dynamically-consistent
    DDP warm start (the kinematic centroid path has zero momenta and is
    not a trackable reference)."""
    from centroidal_mpc_tpu.solver.warm_start import ddp_warm_start
    prob0 = presets.build_problem(presets.SOLO12_TROT, dtype=jnp.float64)
    X_warm, U_warm = ddp_warm_start(prob0.model, prob0.plan.schedule,
                                    presets.SOLO12_TROT.robot)
    prob = presets.build_problem(presets.SOLO12_TROT, dtype=jnp.float64,
                                 X_warm=X_warm, U_warm=U_warm)
    cfg = prob.ocp.replace(terminal_equality=False)
    settings = dataclasses.replace(
        prob.scp, qp_backend="block",
        qp=QPSettings(eps_abs=1e-5, eps_rel=1e-5, max_iter=4000,
                      adaptive_rho=False))
    ctrl = MpcController(model=prob.model, schedule=prob.plan.schedule,
                         cfg=cfg, settings=settings, window=20)
    return prob, ctrl


def test_mpc_rolls_through_the_plan(controller):
    prob, ctrl = controller
    state = ctrl.init_state(prob.X0, prob.U0)
    step = jax.jit(ctrl.step)
    x = prob.X0[0]
    qp_iters = []
    for i in range(30):
        state, sol = step(state, x)
        assert bool(sol.success), f"tick {i}"
        qp_iters.append(int(sol.qp_iterations))
        # plant: apply the first control through the true dynamics
        k = i  # plan knot == tick here
        x = dynamics_step(prob.model, x, sol.U[0],
                          prob.plan.schedule.position[k],
                          prob.plan.schedule.logic[k],
                          prob.plan.schedule.orientation[k])
    # closed loop stays near the reference path
    ref = prob.ocp.X_track[30]
    assert float(jnp.linalg.norm(x - ref)) < 0.1
    assert np.all(np.asarray(qp_iters) < 4000)  # never iteration-capped


def test_mpc_rejects_disturbance(controller):
    """A lateral momentum kick decays under receding re-solves.

    Decay is deliberately gradual: with the reference cost weights
    (tangential-force penalty 1e2 vs momentum tracking 1e3) the QP's
    optimal correction spreads the impulse over ~45 knots, so the test
    asserts steady decay at that optimal rate, not a dead-beat response."""
    prob, ctrl = controller
    state = ctrl.init_state(prob.X0, prob.U0)
    step = jax.jit(ctrl.step)
    x = prob.X0[0]
    mom_err = []
    for i in range(40):
        if i == 8:
            x = x.at[4].add(0.3)  # lateral momentum kick
        state, sol = step(state, x)
        assert bool(sol.success)
        x = dynamics_step(prob.model, x, sol.U[0],
                          prob.plan.schedule.position[i],
                          prob.plan.schedule.logic[i],
                          prob.plan.schedule.orientation[i])
        mom_err.append(float(jnp.abs(x[4] - prob.ocp.X_track[i + 1, 4])))
    peak = max(mom_err[8:12])
    assert peak > 0.25                    # the kick is visible
    assert mom_err[-1] < 0.65 * peak      # steady optimal-rate decay
    # and the error decreases monotonically after the kick settles
    tail = mom_err[12:]
    assert all(b <= a + 1e-6 for a, b in zip(tail, tail[1:]))


def test_mpc_tick_clamps_at_plan_end(controller):
    prob, ctrl = controller
    state = ctrl.init_state(prob.X0, prob.U0)
    state = state.replace(tick=jnp.asarray(ctrl.max_tick, jnp.int32))
    new_state, sol = ctrl.step(state, prob.X0[0])
    assert int(new_state.tick) == ctrl.max_tick
    assert bool(sol.success)
