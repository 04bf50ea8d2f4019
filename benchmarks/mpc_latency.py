#!/usr/bin/env python
"""MPC tick-latency study (VERDICT round 1, item 5).

Measures the honest single-tick latency of the receding-horizon MPC step
(solver/mpc.py) across window sizes, sweep methods (sequential scan vs
log-depth associative), and polish on/off, on the attached device.
Reports p50/p99 over n probes with the axon-tunnel constant subtracted
(see bench.py for the timing methodology).

    python benchmarks/mpc_latency.py --windows 10 20 30 --probes 100
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.solver.mpc import MpcController
from centroidal_mpc_tpu.solver.scp import ScpSettings

import dataclasses


def tunnel_constant():
    ready = jax.block_until_ready(jnp.zeros((1,), jnp.float32) + 1.0)
    ts = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(ready)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure(prob, window, sweep, polish, probes, max_scp_iters):
    qp = QPSettings(eps_abs=5e-4, eps_rel=5e-4, max_iter=2000,
                    adaptive_rho=False, sweep_method=sweep, polish=polish)
    settings = dataclasses.replace(
        prob.scp, qp_backend="block", norm_method="power", qp=qp,
        max_iterations=max_scp_iters)
    cfg = prob.ocp.replace(terminal_equality=False)
    ctl = MpcController(model=prob.model, schedule=prob.plan.schedule,
                        cfg=cfg, settings=settings, window=window)
    state = ctl.init_state(prob.X0, prob.U0)
    step = jax.jit(ctl.step)
    x = jnp.asarray(prob.X0[0])
    state, sol = step(state, x)
    jax.block_until_ready(sol.X)
    c = tunnel_constant()
    ts = []
    key = jax.random.PRNGKey(0)
    for i in range(probes):
        key, k = jax.random.split(key)
        x_meas = sol.X[1] + 0.002 * jax.random.normal(k, (9,), jnp.float32)
        t0 = time.perf_counter()
        state, sol = step(state, x_meas)
        jax.block_until_ready(sol.X)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) - c
    return {
        "window": window, "sweep": sweep, "polish": polish,
        "p50_ms": round(float(np.percentile(ts, 50) * 1e3), 3),
        "p99_ms": round(float(np.percentile(ts, 99) * 1e3), 3),
        "mean_qp_iters": round(float(sol.qp_iterations), 1),
        "success": bool(sol.success),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="solo12_trot_n50")
    ap.add_argument("--windows", type=int, nargs="+", default=[10, 20, 30])
    ap.add_argument("--probes", type=int, default=100)
    ap.add_argument("--scp-iters", type=int, default=1,
                    help="SCP iterations per tick (warm-started MPC re-uses "
                         "the previous linearization; 1 = LTV-MPC tick)")
    ap.add_argument("--sweeps", nargs="+", default=["scan", "assoc"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = presets.build_problem(presets.PRESETS[args.preset],
                                 dtype=jnp.float32)
    rows = []
    for w in args.windows:
        for sweep in args.sweeps:
            for polish in (False, True):
                row = measure(prob, w, sweep, polish, args.probes,
                              args.scp_iters)
                rows.append(row)
                print(json.dumps(row), flush=True)
    best = min((r for r in rows if r["success"]),
               key=lambda r: r["p99_ms"], default=None)
    print(json.dumps({"metric": "mpc_tick_p99_ms",
                      "value": best["p99_ms"] if best else None,
                      "unit": "ms", "best": best,
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
