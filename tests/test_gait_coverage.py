"""End-to-end SCP coverage across gaits and robots (reduced horizons).

BASELINE.md coverage row: solo12 trot / pace / bound, bolt biped, talos
humanoid.  Full reference horizons run in the demo; here single-cycle
variants keep the suite fast while exercising every gait template, both
contact models, and both QP backends.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models import centroidal as cm
from centroidal_mpc_tpu.solver.scp import solve_scp


def _single_cycle(preset):
    return dataclasses.replace(
        preset, gait=dataclasses.replace(preset.gait, nb_steps=1))


CASES = [
    ("solo12_trot", _single_cycle(presets.SOLO12_TROT), "block"),
    ("solo12_pace", _single_cycle(presets.SOLO12_PACE), "block"),
    ("solo12_bound", _single_cycle(presets.SOLO12_BOUND), "block"),
    ("bolt_pace", _single_cycle(presets.BOLT_PACE), "block"),
    ("talos_pace", _single_cycle(presets.TALOS_PACE), "block"),
    ("solo12_trot_dense", _single_cycle(presets.SOLO12_TROT), "dense"),
]


@pytest.mark.parametrize("name,preset,backend",
                         CASES, ids=[c[0] for c in CASES])
def test_gait_solves_and_is_consistent(name, preset, backend):
    prob = presets.build_problem(preset, dtype=jnp.float64)
    scp = dataclasses.replace(prob.scp, qp_backend=backend)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, scp)
    assert bool(sol.success), name
    assert bool(sol.qp_converged), name
    # nonlinear one-step consistency of the accepted solution (the more
    # dynamic bound gait carries a larger frozen-linearization gap; the
    # re-linearizing test below shows it shrinks under proper GuSTO)
    f_nl = np.asarray(cm.integrate_dynamics_trajectory(
        prob.model, prob.plan.schedule, sol.X, sol.U))
    assert np.abs(f_nl - np.asarray(sol.X)[1:]).max() < 5e-2, name
    # friction at active contacts (tangential rows)
    G = np.asarray(prob.ocp.pyramid)[:4]
    logic = np.asarray(prob.plan.schedule.logic)
    rot = np.asarray(prob.plan.schedule.orientation)
    U = np.asarray(sol.U)
    nuc = prob.model.n_u_per_contact
    f_off = 0 if nuc == 3 else 2
    worst = -np.inf
    for k in range(prob.plan.horizon):
        for c in range(prob.model.n_contacts):
            if logic[k, c]:
                f = U[k, nuc * c + f_off:nuc * c + f_off + 3]
                worst = max(worst, (G @ rot[k, c].T @ f).max())
    assert worst <= 1e-4, (name, worst)
    # CoM advances by the commanded step length
    expect_dx = preset.gait.nb_steps * preset.gait.step_length
    assert abs(float(sol.X[-1, 0]) - float(sol.X[0, 0]) - expect_dx) < 1e-5


def test_relinearization_tightens_bound_gait():
    """update_linearization=True reduces the nonlinear gap on the most
    dynamic gait (bound)."""
    preset = _single_cycle(presets.SOLO12_BOUND)
    prob = presets.build_problem(preset, dtype=jnp.float64)

    def gap(scp):
        sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                        prob.X0, prob.U0, scp)
        assert bool(sol.success)
        f_nl = np.asarray(cm.integrate_dynamics_trajectory(
            prob.model, prob.plan.schedule, sol.X, sol.U))
        return np.abs(f_nl - np.asarray(sol.X)[1:]).max()

    frozen = gap(prob.scp)
    proper = gap(dataclasses.replace(prob.scp, update_linearization=True,
                                     max_iterations=6))
    assert proper < frozen


def test_stochastic_pace_and_bound():
    """Stochastic mode solves on the non-trot gaits too."""
    for preset in [_single_cycle(presets.SOLO12_PACE),
                   _single_cycle(presets.SOLO12_BOUND)]:
        prob = presets.build_problem(preset, stochastic=True,
                                     dtype=jnp.float64)
        sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                        prob.X0, prob.U0, prob.scp)
        assert bool(sol.success), preset.name
