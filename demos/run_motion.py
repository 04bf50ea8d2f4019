#!/usr/bin/env python
"""End-to-end motion demo: warm start -> nominal SCP -> stochastic SCP ->
Monte-Carlo evaluation -> artifacts + plots.

The script form of the reference demo notebooks
(build/lib/demos/run_motion.py, demos/trot_demo.ipynb): pick a preset, run
the full pipeline, drop npz artifacts and analysis figures in --out.

Usage:
    python demos/run_motion.py --preset solo12_trot --sims 32 --out artifacts/trot
    python demos/run_motion.py --preset solo12_bound --cpu --f64
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="solo12_trot")
    ap.add_argument("--sims", type=int, default=16,
                    help="Monte-Carlo rollouts (0 disables)")
    ap.add_argument("--out", default="artifacts/demo")
    ap.add_argument("--nominal-only", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--f64", action="store_true",
                    help="float64 (CPU reference mode)")
    ap.add_argument("--whole-body", choices=["kinematic", "ddp"],
                    default="kinematic",
                    help="stage-3 layer: closed-form IK or joint-space DDP "
                         "over the rigid-body contact dynamics")
    ap.add_argument("--physics-sims", type=int, default=0,
                    help="full-physics Monte-Carlo episodes (0 disables)")
    ap.add_argument("--qp-backend", choices=["block", "dense"],
                    default="block",
                    help="block = structure-exploiting production solver; "
                         "dense = reference-layout path (slow at N=165)")
    ap.add_argument("--terrain", choices=["flat", "debris"], default="flat",
                    help="debris = the reference's per-gait stepstone "
                         "terrain (GAIT='..._ON_DEBRI', "
                         "src/simulate_solo.py:217-256): tilted footholds "
                         "in the plan + stones in the physics plant")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from centroidal_mpc_tpu.config import presets
    from centroidal_mpc_tpu.contact.swing import compute_swing_trajectories
    from centroidal_mpc_tpu.pipeline import run_pipeline
    from centroidal_mpc_tpu.sim import plots
    from centroidal_mpc_tpu.utils.artifacts import ArtifactStore

    preset = presets.PRESETS[args.preset]
    terrain = None
    if args.terrain == "debris":
        from centroidal_mpc_tpu.contact import terrain as ter
        terrain = ter.DEBRIS_BY_GAIT[preset.gait.gait_type]
    store = ArtifactStore(args.out)
    dtype = jnp.float64 if args.f64 else jnp.float32

    print(f"[pipeline] preset={preset.name} N={preset.horizon} "
          f"device={jax.devices()[0].device_kind} dtype={dtype.__name__}")
    result = run_pipeline(preset, store, stochastic=not args.nominal_only,
                          n_sims=args.sims, dtype=dtype,
                          whole_body_mode=args.whole_body,
                          physics_sims=args.physics_sims,
                          qp_backend=args.qp_backend, terrain=terrain)

    nom = result.nominal
    print(f"[nominal]   success={bool(nom.success)} "
          f"scp_iters={int(nom.iterations)} qp_iters={int(nom.qp_iterations)} "
          f"rho={float(nom.rho):.2e}")
    if result.stochastic is not None:
        sto = result.stochastic
        print(f"[stochastic] success={bool(sto.success)} "
              f"scp_iters={int(sto.iterations)} "
              f"qp_iters={int(sto.qp_iterations)}")
    if result.eval_stats:
        nv = result.eval_stats.get("nominal_violations")
        if nv is not None:
            print(f"[monte-carlo] sims={args.sims} "
                  f"nominal cone violations/sim={np.mean(nv):.1f}")
    if result.wb_ddp is not None:
        print(f"[whole-body ddp] cost={float(result.wb_ddp.cost):.3f} "
              f"iters={int(result.wb_ddp.iterations)}")
    if result.mc_physics is not None:
        slip = result.eval_stats["physics_slippage"]
        fell = result.eval_stats["physics_fell"]
        print(f"[physics mc] sims={args.physics_sims} "
              f"fell={int(fell.sum())}/{len(fell)} "
              f"slip mean={float(np.mean(slip)):.3f} m")

    # figures
    prob = result.problem
    U_sto = (np.asarray(result.stochastic.U)
             if result.stochastic is not None else None)
    plots.plot_contact_forces(preset.robot.foot_names, np.asarray(nom.U),
                              U_sto, preset.dt, preset.mu, save_dir=args.out)
    plots.plot_centroidal_trajectory(np.asarray(nom.X), result.warm_X,
                                     preset.dt, save_dir=args.out)
    if result.eval_stats:
        plots.plot_tracking_cost(result.eval_stats, preset.dt,
                                 save_dir=args.out)
    swing = compute_swing_trajectories(prob.plan, preset.dt_ctrl)
    plots.plot_swing_trajectories(swing, preset.robot.foot_names,
                                  preset.dt_ctrl, save_dir=args.out)
    if "physics_slippage_series" in result.eval_stats:
        plots.plot_foot_slippage(
            {"nominal": result.eval_stats["physics_slippage_series"]},
            preset.dt_ctrl, save_dir=args.out)
    if result.wb_traj is not None:
        import numpy as _np
        plots.plot_whole_body_solution(
            _np.asarray(result.wb_traj.q), _np.asarray(result.wb_traj.qdot),
            _np.asarray(result.wb_traj.tau_ff), preset.dt_ctrl,
            foot_names=preset.robot.foot_names,
            base_pos=_np.asarray(result.wb_traj.base_pos),
            save_dir=args.out)
    print(f"[artifacts] written to {args.out}/")


if __name__ == "__main__":
    main()
