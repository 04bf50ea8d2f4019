"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost.py as
    python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id>

Each process owns one CPU device; the two processes form a 2-device
global mesh, solve a 4-scenario batch sharded 2 rows/process through
`multihost.fleet_solver`, and print the psum-reduced fleet stats (which
must agree across processes -- the collective really ran).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np
import jax.numpy as jnp


def main():
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    sys.path.insert(0, ".")
    from centroidal_mpc_tpu.config import gaits, presets
    from centroidal_mpc_tpu.ops.admm import QPSettings
    from centroidal_mpc_tpu.parallel import multihost
    from centroidal_mpc_tpu.parallel.batch import tile_ocp_config

    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    n_dev = jax.device_count()
    assert n_dev == num_procs, n_dev   # one CPU device per process

    tiny = gaits.GaitSpec(gaits.TROT, step_length=0.0, step_height=0.05,
                          step_knots=2, support_knots=1, nb_steps=1)
    preset = dataclasses.replace(presets.SOLO12_TROT, gait=tiny)
    prob = presets.build_problem(preset, dtype=jnp.float32, qp=QPSettings(
        eps_abs=1e-3, eps_rel=1e-3, max_iter=200, adaptive_rho=False))
    settings = dataclasses.replace(prob.scp, max_iterations=2,
                                   norm_method="power")

    solver, mesh = multihost.fleet_solver(prob.model, prob.plan.schedule,
                                          settings)
    # 2 local rows per process -> global batch 4
    local = 2
    X0l = np.broadcast_to(np.asarray(prob.X0),
                          (local,) + prob.X0.shape).copy()
    X0l[:, :, 0] += 0.001 * proc_id
    U0l = np.broadcast_to(np.asarray(prob.U0), (local,) + prob.U0.shape)
    cfg_l = tile_ocp_config(prob.ocp, jnp.asarray(X0l[:, 0]),
                            jnp.asarray(X0l[:, -1]), jnp.asarray(X0l))
    cfg_g, X0g, U0g = multihost.shard_local_rows(
        mesh, (cfg_l, jnp.asarray(X0l), jnp.asarray(U0l)))
    sol, stats = solver(cfg_g, X0g, U0g)
    jax.block_until_ready(sol)
    report = multihost.scaling_report(solver, (cfg_g, X0g, U0g),
                                     batch=local * num_procs, repeats=2)
    print(f"RESULT proc={proc_id} devices={n_dev} "
          f"n_success={int(np.asarray(stats['n_success']))} "
          f"qp_iters={int(np.asarray(stats['qp_iterations']))} "
          f"procs_in_report={report['processes']}", flush=True)


if __name__ == "__main__":
    main()
