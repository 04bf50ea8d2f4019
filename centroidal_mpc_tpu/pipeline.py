"""End-to-end motion pipeline: the reference demo driver, as a library.

Reference: build/lib/demos/run_motion.py:16-143 (and the trot/bound demo
notebooks): whole-body DDP warm start -> nominal centroidal SCP ->
whole-body tracking -> stochastic SCP -> Monte-Carlo evaluation, with npz
artifact handoffs between stages.  Here each stage is a pure function over
device arrays; artifacts go through utils.artifacts.ArtifactStore under the
reference's file names, so every stage is independently re-runnable
(SURVEY.md section 5 checkpoint/resume).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config.presets import Problem, ProblemPreset, build_problem
from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories
from centroidal_mpc_tpu.models import whole_body
from centroidal_mpc_tpu.sim import metrics, monte_carlo
from centroidal_mpc_tpu.solver.ddp import DdpSettings
from centroidal_mpc_tpu.solver.scp import ScpSolution, solve_scp
from centroidal_mpc_tpu.solver.warm_start import ddp_warm_start
from centroidal_mpc_tpu.utils import artifacts as art
from centroidal_mpc_tpu.utils.interpolation import interpolate_scp_solution


@dataclasses.dataclass
class PipelineResult:
    problem: Problem
    warm_X: np.ndarray
    warm_U: np.ndarray
    nominal: ScpSolution
    stochastic: Optional[ScpSolution]
    mc_nominal: Optional[monte_carlo.MonteCarloResult]
    mc_stochastic: Optional[monte_carlo.MonteCarloResult]
    eval_stats: Dict[str, np.ndarray]


def run_pipeline(preset: ProblemPreset, store: Optional[art.ArtifactStore] = None,
                 stochastic: bool = True, n_sims: int = 0,
                 dtype=jnp.float32, seed: int = 0,
                 ddp_settings: Optional[DdpSettings] = None) -> PipelineResult:
    """Run the full pipeline for one preset.

    Stage 1 (warm start): jitted centroidal iLQR tracking the contact
      centroid path -- the reference's stage-1 whole-body DDP role
      (run_motion.py:16-30), saved as wholeBody_to_centroidal_traj.
    Stage 2 (nominal SCP): solve + 10x interpolation, saved as
      scp_sol_interpol_nom / centroidal_to_wholeBody_traj
      (run_motion.py:38-43).
    Stage 2' (stochastic SCP): chance-constrained resolve
      (run_motion.py:106-112).
    Stage 4 (Monte-Carlo): batched disturbance rollouts with LQR feedback
      for both solutions plus evaluation statistics (notebook cell 10).
    """
    # ---- stage 1: warm start
    prob0 = build_problem(preset, dtype=dtype)
    X_warm, U_warm = ddp_warm_start(prob0.model, prob0.plan.schedule,
                                    preset.robot,
                                    settings=ddp_settings or DdpSettings())
    if store is not None:
        store.save(art.WHOLEBODY_TO_CENTROIDAL, X=np.asarray(X_warm))

    # ---- stage 2: nominal SCP
    prob = build_problem(preset, dtype=dtype, X_warm=X_warm, U_warm=U_warm)
    nominal = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                        prob.X0, prob.U0, prob.scp)
    interp = interpolate_scp_solution(np.asarray(nominal.X),
                                      np.asarray(nominal.U))
    if store is not None:
        store.save(art.SCP_INTERPOLATED_NOMINAL, **interp)
        store.save(art.CENTROIDAL_TO_WHOLEBODY,
                   X=np.asarray(nominal.X), U=np.asarray(nominal.U))

    # ---- stage 3: whole-body tracking (joint-space deliverable)
    if store is not None and preset.robot.contact_model == "point3" \
            and preset.robot.n_contacts == 4:
        swing = compute_swing_trajectories(prob.plan, preset.dt_ctrl)
        wb_traj = whole_body.track_centroidal_solution(
            prob.plan, swing, nominal.X, nominal.U, preset.dt_ctrl)
        store.save(art.WHOLEBODY_INTERPOLATED,
                   X=np.asarray(nominal.X), U=np.asarray(nominal.U),
                   q=np.asarray(wb_traj.q), qdot=np.asarray(wb_traj.qdot),
                   tau=np.asarray(wb_traj.tau_ff),
                   gains=np.asarray([float(wb_traj.kp), float(wb_traj.kd)]))
        whole_body.export_robot_dat(wb_traj, store.root)

    # ---- stage 2': stochastic SCP
    stoch_sol = None
    if stochastic:
        prob_s = build_problem(preset, stochastic=True, dtype=dtype,
                               X_warm=X_warm, U_warm=U_warm)
        stoch_sol = solve_scp(prob_s.model, prob_s.plan.schedule, prob_s.ocp,
                              prob_s.X0, prob_s.U0, prob_s.scp)
        if store is not None:
            interp_s = interpolate_scp_solution(np.asarray(stoch_sol.X),
                                                np.asarray(stoch_sol.U))
            store.save(art.SCP_INTERPOLATED_STOCHASTIC, **interp_s)

    # ---- stage 4: Monte-Carlo evaluation
    mc_nom = mc_sto = None
    stats: Dict[str, np.ndarray] = {}
    if n_sims > 0:
        key = jax.random.PRNGKey(seed)
        mc_nom = monte_carlo.run_monte_carlo(
            prob.model, prob.plan.schedule, nominal.X, nominal.U, nominal.K,
            key, n_sims)
        tc = metrics.cumulative_tracking_cost(prob.model.Q, mc_nom.X_sim,
                                              nominal.X)
        fr = metrics.friction_cone_stats(prob.ocp.pyramid,
                                         prob.plan.schedule, mc_nom.U_sim)
        stats["nominal_cum_cost"] = np.asarray(tc["cum_mean"])
        stats["nominal_cum_cost_std"] = np.asarray(tc["cum_std"])
        stats["nominal_violations"] = np.asarray(fr["violations"])
        if stoch_sol is not None:
            mc_sto = monte_carlo.run_monte_carlo(
                prob.model, prob.plan.schedule, stoch_sol.X, stoch_sol.U,
                stoch_sol.K, key, n_sims)
            tc_s = metrics.cumulative_tracking_cost(
                prob.model.Q, mc_sto.X_sim, stoch_sol.X)
            fr_s = metrics.friction_cone_stats(
                prob.ocp.pyramid, prob.plan.schedule, mc_sto.U_sim)
            stats["stochastic_cum_cost"] = np.asarray(tc_s["cum_mean"])
            stats["stochastic_cum_cost_std"] = np.asarray(tc_s["cum_std"])
            stats["stochastic_violations"] = np.asarray(fr_s["violations"])
        if store is not None:
            store.save("monte_carlo_stats", **stats)

    return PipelineResult(problem=prob, warm_X=np.asarray(X_warm),
                          warm_U=np.asarray(U_warm), nominal=nominal,
                          stochastic=stoch_sol, mc_nominal=mc_nom,
                          mc_stochastic=mc_sto, eval_stats=stats)
