"""Worker process for the multi-process jax.distributed CPU tests.

Launched by tests/test_multihost.py as
    python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id> \
        [devices_per_proc] [shape]

Each process owns `devices_per_proc` CPU devices (the launcher sets
XLA_FLAGS=--xla_force_host_platform_device_count accordingly); the
processes form a (num_procs * devices_per_proc)-device global mesh,
solve a batch sharded one scenario per device through
`multihost.fleet_solver`, and print the psum-reduced fleet stats (which
must agree across processes -- the collective really ran) plus shard
placement evidence (global device-set size, addressable shard count).

shape: 'tiny' (N=5 step-in-place) or 'bench' (the solo12_trot_n50
BASELINE horizon).
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
    devices_per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    shape = sys.argv[5] if len(sys.argv) > 5 else "tiny"
    sys.path.insert(0, ".")
    from centroidal_mpc_tpu.config import gaits, presets
    from centroidal_mpc_tpu.ops.admm import QPSettings
    from centroidal_mpc_tpu.parallel import multihost
    from centroidal_mpc_tpu.parallel.batch import tile_ocp_config

    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    n_dev = jax.device_count()
    assert n_dev == num_procs * devices_per_proc, n_dev
    assert jax.local_device_count() == devices_per_proc

    if shape == "bench":
        preset = presets.PRESETS["solo12_trot_n50"]
        qp = QPSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=400,
                        adaptive_rho=False)
    else:
        tiny = gaits.GaitSpec(gaits.TROT, step_length=0.0,
                              step_height=0.05, step_knots=2,
                              support_knots=1, nb_steps=1)
        preset = dataclasses.replace(presets.SOLO12_TROT, gait=tiny)
        qp = QPSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=200,
                        adaptive_rho=False)
    prob = presets.build_problem(preset, dtype=jnp.float32, qp=qp)
    settings = dataclasses.replace(prob.scp, max_iterations=2,
                                   norm_method="power")

    solver, mesh = multihost.fleet_solver(prob.model, prob.plan.schedule,
                                          settings)
    assert mesh.devices.size == n_dev
    # tiny: 2 rows/device (the round-2 shape, global batch 4 at 2x1);
    # bench: 1 row/device (global batch = mesh size)
    rows_per_device = 2 if shape == "tiny" else 1
    local = rows_per_device * devices_per_proc
    X0l = np.broadcast_to(np.asarray(prob.X0),
                          (local,) + prob.X0.shape).copy()
    X0l[:, :, 0] += 0.001 * proc_id
    U0l = np.broadcast_to(np.asarray(prob.U0), (local,) + prob.U0.shape)
    cfg_l = tile_ocp_config(prob.ocp, jnp.asarray(X0l[:, 0]),
                            jnp.asarray(X0l[:, -1]), jnp.asarray(X0l))
    cfg_g, X0g, U0g = multihost.shard_local_rows(
        mesh, (cfg_l, jnp.asarray(X0l), jnp.asarray(U0l)))
    # shard placement: the global array spans every device of the mesh,
    # and this process can address exactly its own rows
    assert len(X0g.sharding.device_set) == n_dev
    addr_shards = len(X0g.addressable_shards)
    assert addr_shards == devices_per_proc, addr_shards
    assert X0g.shape[0] == n_dev * rows_per_device

    sol, stats = solver(cfg_g, X0g, U0g)
    jax.block_until_ready(sol)
    report = multihost.scaling_report(solver, (cfg_g, X0g, U0g),
                                      batch=local * num_procs, repeats=2)
    print(f"RESULT proc={proc_id} devices={n_dev} "
          f"n_success={int(np.asarray(stats['n_success']))} "
          f"qp_iters={int(np.asarray(stats['qp_iterations']))} "
          f"procs_in_report={report['processes']} "
          f"addr_shards={addr_shards}", flush=True)


if __name__ == "__main__":
    main()
