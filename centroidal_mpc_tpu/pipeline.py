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
    wb_ddp: Optional[object] = None          # WholeBodySolution (joint-space)
    mc_physics: Optional[object] = None      # PhysicsSimResult
    wb_traj: Optional[object] = None         # kinematic WholeBodyTrajectory
    physics_refs: Optional[object] = None    # ClosedLoopReferences
    terrain: Optional[object] = None         # contact/terrain.Terrain


def run_pipeline(preset: ProblemPreset, store: Optional[art.ArtifactStore] = None,
                 stochastic: bool = True, n_sims: int = 0,
                 dtype=jnp.float32, seed: int = 0,
                 ddp_settings: Optional[DdpSettings] = None,
                 whole_body_mode: str = "kinematic",
                 physics_sims: int = 0,
                 qp_backend: str = "block",
                 stochastic_lqr_iters: int = 30,
                 terrain=None) -> PipelineResult:
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

    whole_body_mode selects the stage-3 deliverable for solo12-class
    robots: "kinematic" (closed-form IK layer, models/whole_body.py) or
    "ddp" (joint-space iLQR over the contact-KKT rigid-body dynamics,
    models/whole_body_ddp.py — the reference's TRACK_CENTROIDAL=True
    Crocoddyl stage, run_motion.py:49-72).
    physics_sims > 0 additionally runs the full-physics Monte-Carlo
    (sim/physics.py, the PyBullet role) with that many episodes.
    terrain (contact/terrain.Terrain) runs the whole pipeline on uneven
    stepstone terrain: footholds snap onto tilted stones (rotated friction
    pyramids in the SCP) and the physics plant collides against the same
    stones (the reference's GAIT='..._ON_DEBRI' mode,
    src/simulate_solo.py:217-256).

    qp_backend defaults to the block production solver: the dense
    reference-layout path at the full reference horizon (N=165) carries
    O(n^2) matrices through every ADMM iteration and is ~50x slower --
    keep it for golden tests, not pipelines.
    """

    def _fast(p: Problem) -> Problem:
        return dataclasses.replace(p, scp=dataclasses.replace(
            p.scp, qp_backend=qp_backend))

    # f32 cannot reach the preset default (the reference's OSQP operating
    # point, eps=1e-7, src/scp_solver.py:63): scaled residuals floor out
    # near 1e-4 and the QP spins to max_iter without converging
    # (observed: the f32 CPU demo at N=165).  Use the bench-certified
    # f32 tier (eps 1e-4 + adaptive rho + polish: x err 7.1e-5 vs the
    # f64 reference, BENCH round 3) unless the caller overrides.
    build_kwargs = {}
    if jnp.dtype(dtype) == jnp.float32:
        from centroidal_mpc_tpu.ops.admm import QPSettings
        build_kwargs["qp"] = QPSettings(
            eps_abs=1e-4, eps_rel=1e-4, max_iter=4000,
            adaptive_rho=True, adaptive_rho_mode="always", polish=True)

    def build_problem(preset, **kw):  # shadow with dtype-aware defaults
        from centroidal_mpc_tpu.config.presets import build_problem as bp
        return bp(preset, **{**build_kwargs, **kw})

    # ---- stage 1: warm start
    prob0 = build_problem(preset, dtype=dtype, terrain=terrain)
    X_warm, U_warm = ddp_warm_start(prob0.model, prob0.plan.schedule,
                                    preset.robot,
                                    settings=ddp_settings or DdpSettings())
    if store is not None:
        store.save(art.WHOLEBODY_TO_CENTROIDAL, X=np.asarray(X_warm))

    # ---- stage 2: nominal SCP
    prob = _fast(build_problem(preset, dtype=dtype, X_warm=X_warm,
                               U_warm=U_warm, terrain=terrain))
    nominal = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                        prob.X0, prob.U0, prob.scp)
    interp = interpolate_scp_solution(np.asarray(nominal.X),
                                      np.asarray(nominal.U))
    if store is not None:
        store.save(art.SCP_INTERPOLATED_NOMINAL, **interp)
        store.save(art.CENTROIDAL_TO_WHOLEBODY,
                   X=np.asarray(nominal.X), U=np.asarray(nominal.U))

    # ---- stage 3: whole-body tracking (joint-space deliverable)
    wb_traj = wb_sol = None
    point3 = preset.robot.contact_model == "point3"
    if store is not None or physics_sims > 0:
        from centroidal_mpc_tpu.models import rigid_body as rb
        from centroidal_mpc_tpu.models import whole_body_ddp as wbd
        spec = rb.robot_spec(preset.robot.name)
        swing = compute_swing_trajectories(prob.plan, preset.dt_ctrl)
        if point3:
            # kinematic deliverable (closed-form IK layer); also the
            # reference-law plant input for the physics Monte-Carlo
            geom = wbd.leg_geometry_from_spec(spec)
            wb_traj = whole_body.track_centroidal_solution(
                prob.plan, swing, nominal.X, nominal.U, preset.dt_ctrl,
                geom=geom)
        if whole_body_mode == "ddp" or not point3:
            # wrench6 robots (talos) have no closed-form kinematic layer;
            # the joint-space DDP is their stage-3 path
            targets = wbd.build_targets(
                prob.plan, swing, preset.dt_ctrl,
                X_centroidal=nominal.X, U_centroidal=nominal.U, dtype=dtype)
            wb_sol = wbd.solve_whole_body_ddp(spec, targets, preset.dt)
            if store is not None:
                interp_wb = wbd.interpolate_whole_body_solution(
                    wb_sol, preset.dt, preset.dt_ctrl)
                store.save(art.WHOLEBODY_INTERPOLATED,
                           X=np.asarray(wb_sol.centroidal_states()),
                           U=np.asarray(nominal.U), **interp_wb)
        elif store is not None:
            store.save(art.WHOLEBODY_INTERPOLATED,
                       X=np.asarray(nominal.X), U=np.asarray(nominal.U),
                       q=np.asarray(wb_traj.q), qdot=np.asarray(wb_traj.qdot),
                       tau=np.asarray(wb_traj.tau_ff),
                       gains=np.asarray([float(wb_traj.kp), float(wb_traj.kd)]))
        if store is not None and wb_traj is not None:
            whole_body.export_robot_dat(wb_traj, store.root)

    # ---- stage 2': stochastic SCP
    # The stochastic stage runs with 30 DARE iterations by default: the
    # reference's 2-iteration LQR gains do not stabilize the closed loop
    # at the full trot horizon, the covariance grows unboundedly, and the
    # chance-constrained QP is infeasible (the reference demo hides this
    # by interpolating the *nominal* solution in its stochastic branch,
    # run_motion.py:110 -- a silent fallback).  Here an infeasible
    # stochastic solve is reported, and its downstream stages are skipped
    # instead of evaluating a garbage trajectory.
    stoch_sol = None
    if stochastic:
        prob_s = _fast(build_problem(preset, stochastic=True, dtype=dtype,
                                     X_warm=X_warm, U_warm=U_warm,
                                     terrain=terrain))
        scp_s = dataclasses.replace(prob_s.scp,
                                    lqr_iters=stochastic_lqr_iters)
        stoch_sol = solve_scp(prob_s.model, prob_s.plan.schedule, prob_s.ocp,
                              prob_s.X0, prob_s.U0, scp_s)
        if not bool(stoch_sol.success):
            print("[pipeline] WARNING: stochastic SCP did not converge "
                  f"(qp_converged={bool(stoch_sol.qp_converged)}); "
                  "skipping stochastic artifacts/evaluation")
        elif store is not None:
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
        if stoch_sol is not None and bool(stoch_sol.success):
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

    # ---- stage 4b: full-physics Monte-Carlo (the PyBullet role)
    mc_phys = None
    physics_refs = None
    if physics_sims > 0 and wb_traj is not None:
        from centroidal_mpc_tpu.models import rigid_body as rb
        from centroidal_mpc_tpu.models.centroidal import compute_trajectory_data
        from centroidal_mpc_tpu.sim import physics as phys
        spec = rb.robot_spec(preset.robot.name)
        data = compute_trajectory_data(prob.model, prob.plan.schedule,
                                       nominal.X, nominal.U)
        refs = phys.build_references(wb_traj, nominal.X, data.K,
                                     prob.plan.schedule)
        q0 = jnp.concatenate([refs.h_des[0, :3],
                              jnp.zeros((3,), refs.h_des.dtype),
                              refs.q_des[0]])
        x0 = jnp.concatenate([q0, jnp.zeros((spec.nv,), refs.h_des.dtype)])
        tarr = None if terrain is None else terrain.arrays(
            np.float64 if dtype == jnp.float64 else np.float32)
        mc_phys = phys.run_physics_monte_carlo(
            spec, refs, x0, jax.random.PRNGKey(seed + 1), physics_sims,
            terrain=tarr)
        physics_refs = refs
        stats["physics_slippage"] = np.asarray(
            phys.foot_slippage(mc_phys, refs, terrain=tarr))
        stats["physics_slippage_series"] = np.asarray(
            phys.foot_slippage_series(mc_phys, refs, terrain=tarr))
        stats["physics_cum_cost"] = np.asarray(
            phys.tracking_cost(mc_phys, refs)[:, -1])
        stats["physics_fell"] = np.asarray(mc_phys.fell)
        if store is not None:
            store.save("physics_monte_carlo_stats",
                       slippage=stats["physics_slippage"],
                       cum_cost=stats["physics_cum_cost"],
                       fell=stats["physics_fell"])

    return PipelineResult(problem=prob, warm_X=np.asarray(X_warm),
                          warm_U=np.asarray(U_warm), nominal=nominal,
                          stochastic=stoch_sol, mc_nominal=mc_nom,
                          mc_stochastic=mc_sto, eval_stats=stats,
                          wb_ddp=wb_sol, mc_physics=mc_phys,
                          wb_traj=wb_traj, physics_refs=physics_refs,
                          terrain=terrain)
