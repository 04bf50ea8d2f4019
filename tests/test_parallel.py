"""Batched and mesh-sharded solving on the virtual 8-device CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config import gaits, presets
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.parallel.batch import (batched_solve,
                                               make_sharded_solver,
                                               scenario_mesh, tile_ocp_config)
from centroidal_mpc_tpu.solver.scp import solve_scp

_TINY = gaits.GaitSpec(gaits.TROT, step_length=0.0, step_height=0.05,
                       step_knots=2, support_knots=1, nb_steps=1)


def _tiny_problem():
    preset = dataclasses.replace(presets.SOLO12_TROT, gait=_TINY)
    return presets.build_problem(
        preset, dtype=jnp.float64,
        qp=QPSettings(eps_abs=1e-7, eps_rel=1e-7, max_iter=10000,
                      adaptive_rho=False))


def _batch(prob, batch):
    key = jax.random.PRNGKey(0)
    # perturb only the CoM xy position (momentum perturbations make the
    # boundary conditions ADMM-hard on short horizons)
    dx = jnp.zeros((batch, 9), jnp.float64).at[:, :2].set(
        0.005 * jax.random.normal(key, (batch, 2), jnp.float64))
    X0 = jnp.broadcast_to(prob.X0, (batch,) + prob.X0.shape) + dx[:, None, :]
    U0 = jnp.broadcast_to(prob.U0, (batch,) + prob.U0.shape)
    cfg = tile_ocp_config(prob.ocp, X0[:, 0], X0[:, -1], X0)
    return cfg, X0, U0


def test_vmap_matches_single_solve():
    prob = _tiny_problem()
    cfg, X0, U0 = _batch(prob, 4)
    batched = batched_solve(prob.model, prob.plan.schedule, cfg, X0, U0,
                            prob.scp)
    single = solve_scp(prob.model, prob.plan.schedule,
                       jax.tree.map(lambda a: a[2], cfg),
                       X0[2], U0[2], prob.scp)
    assert batched.X.shape[0] == 4
    np.testing.assert_allclose(np.asarray(batched.X[2]),
                               np.asarray(single.X), atol=1e-6)
    np.testing.assert_allclose(np.asarray(batched.U[2]),
                               np.asarray(single.U), atol=1e-6)


def test_sharded_solver_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    prob = _tiny_problem()
    mesh = scenario_mesh(8)
    solver = make_sharded_solver(mesh, prob.model, prob.plan.schedule,
                                 prob.scp)
    cfg, X0, U0 = _batch(prob, 16)
    sol, stats = solver(cfg, X0, U0)
    assert sol.X.shape == (16, prob.plan.horizon + 1, 9)
    assert int(stats["n_success"]) == 16
    # sharded result equals the unsharded vmap result
    ref = batched_solve(prob.model, prob.plan.schedule, cfg, X0, U0, prob.scp)
    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(ref.U),
                               atol=1e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args)  # compiles
    ge.dryrun_multichip(8)


def test_multihost_fleet_solver_on_virtual_mesh():
    """multihost.fleet_solver drives the same shard_map path over the
    virtual mesh; scaling_report returns per-device throughput."""
    from centroidal_mpc_tpu.parallel import multihost
    prob = _tiny_problem()
    multihost.initialize()  # no-op single process
    solver, mesh = multihost.fleet_solver(prob.model, prob.plan.schedule,
                                          prob.scp)
    assert mesh.devices.size == jax.device_count()
    cfg, X0, U0 = _batch(prob, 16)
    sharded = multihost.shard_global_batch(mesh, (cfg, X0, U0))
    sol, stats = solver(*sharded)
    assert int(stats["n_success"]) == 16
    report = multihost.scaling_report(solver, sharded, batch=16, repeats=1)
    assert report["devices"] == 8
    assert report["solves_per_s"] > 0
