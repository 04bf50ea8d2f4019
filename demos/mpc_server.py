#!/usr/bin/env python
"""MPC runtime demo: solver thread + 1 kHz control thread over the native
trajectory bus.

Exercises the deployment topology the reference approximates with npz
files and a free-running Python loop (src/simulate_solo.py:281-309):

  solver thread:  jitted SCP solves (TPU/CPU) -> cmpc_bus_publish
  control thread: native deadline ticker at dt_ctrl -> cmpc_bus_sample ->
                  closed-loop centroidal step with the sampled LQR gains

Prints solve latency, control-tick jitter, and tracking error.

    python demos/mpc_server.py --ticks 2000 --cpu
"""
import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="solo12_trot_n50")
    ap.add_argument("--ticks", type=int, default=1000)
    ap.add_argument("--resolves", type=int, default=3,
                    help="number of SCP re-solves to publish")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from centroidal_mpc_tpu.config import presets
    from centroidal_mpc_tpu.models.centroidal import CentroidalModel, dynamics_step
    from centroidal_mpc_tpu.ops.admm import QPSettings
    from centroidal_mpc_tpu.runtime import native
    from centroidal_mpc_tpu.solver.scp import solve_scp

    preset = presets.PRESETS[args.preset]
    # f32-appropriate solver tolerances (see bench.py)
    prob = presets.build_problem(
        preset, dtype=jnp.float32,
        qp=QPSettings(eps_abs=5e-4, eps_rel=5e-4, max_iter=4000,
                      adaptive_rho=False))
    N, nx, nu = prob.plan.horizon, 9, preset.robot.n_u
    bus = native.TrajectoryBus(N, nx, nu, preset.dt)

    solve = jax.jit(lambda c, x, u: solve_scp(
        prob.model, prob.plan.schedule, c, x, u, prob.scp))

    stop = threading.Event()
    solve_times = []

    def solver_thread():
        x_init = prob.X0
        for i in range(args.resolves):
            if stop.is_set():
                return
            t0 = time.perf_counter()
            sol = solve(prob.ocp, x_init, prob.U0)
            jax.block_until_ready(sol.X)
            solve_times.append(time.perf_counter() - t0)
            bus.publish(0.0, np.asarray(sol.X, np.float64),
                        np.asarray(sol.U, np.float64),
                        np.asarray(sol.K, np.float64))

    st = threading.Thread(target=solver_thread)
    st.start()

    # control loop: wait for the first plan, then tick at dt_ctrl
    while bus.sample(0.0)[0] < 0 and st.is_alive():
        time.sleep(0.001)
    tick = native.Ticker(period_s=preset.dt_ctrl)
    # plant integrates at the control rate: same centroidal model, dt_ctrl
    model_ctrl = prob.model.replace(dt=jnp.asarray(preset.dt_ctrl,
                                                   jnp.float32))
    step = jax.jit(lambda x, u, k: dynamics_step(
        model_ctrl, x, u, prob.plan.schedule.position[k],
        prob.plan.schedule.logic[k], prob.plan.schedule.orientation[k]))

    x = np.asarray(prob.X0[0], np.float64)
    track_err = []
    n_inner = int(round(preset.dt / preset.dt_ctrl))
    # stay within the plan: beyond N*dt the bus clamps to the final knot
    # (a receding-horizon deployment would re-solve and re-publish instead)
    n_ticks = min(args.ticks, N * n_inner)
    for i in range(n_ticks):
        tick.wait()
        t = i * preset.dt_ctrl
        version, x_ref, u_ff, k_fb = bus.sample(t)
        u = u_ff + k_fb @ (x - x_ref)
        track_err.append(float(np.linalg.norm(x - x_ref)))
        k = min(i // n_inner, N - 1)
        x = np.asarray(step(jnp.asarray(x, jnp.float32),
                            jnp.asarray(u, jnp.float32), k), np.float64)
    stop.set()
    st.join()

    stats = tick.stats()
    print(f"[solver ] {len(solve_times)} solves, "
          f"latency min/mean = {min(solve_times)*1e3:.1f}/"
          f"{np.mean(solve_times)*1e3:.1f} ms")
    print(f"[control] {stats['ticks']} ticks @ {preset.dt_ctrl*1e3:.1f} ms, "
          f"wakeup lateness mean/max = {stats['mean_late_ns']/1e3:.0f}us/"
          f"{stats['max_late_ns']/1e3:.0f}us")
    print(f"[tracking] mean |x - x_ref| = {np.mean(track_err):.4f}, "
          f"final = {track_err[-1]:.4f}")


if __name__ == "__main__":
    main()
