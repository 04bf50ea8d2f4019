"""Benchmark: full SCP solves/s on one chip (BASELINE.md target: >= 1000
solves/s on solo12 trot, N=50).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.parallel.batch import batched_solve, tile_ocp_config

BASELINE_SOLVES_PER_S = 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--preset", default="solo12_trot_n50",
                    choices=sorted(presets.PRESETS))
    ap.add_argument("--backend", default="block",
                    choices=["block", "dense"])
    ap.add_argument("--latency-probes", type=int, default=30,
                    help="single-solve latency samples (0 disables)")
    ap.add_argument("--sweep", default="scan", choices=["scan", "assoc"])
    args = ap.parse_args()

    qp = QPSettings(eps_abs=5e-4, eps_rel=5e-4, max_iter=4000,
                    adaptive_rho=False, sweep_method=args.sweep)
    prob = presets.build_problem(presets.PRESETS[args.preset],
                                 dtype=jnp.float32, qp=qp)
    import dataclasses
    prob = dataclasses.replace(
        prob, scp=dataclasses.replace(prob.scp, qp_backend=args.backend,
                                      norm_method="power"))

    batch = args.batch
    key = jax.random.PRNGKey(0)
    dx = jnp.zeros((batch, 9), jnp.float32).at[:, :2].set(
        0.005 * jax.random.normal(key, (batch, 2), jnp.float32))
    X0 = jnp.broadcast_to(prob.X0, (batch,) + prob.X0.shape) + dx[:, None, :]
    U0 = jnp.broadcast_to(prob.U0, (batch,) + prob.U0.shape)
    cfg_b = tile_ocp_config(prob.ocp, X0[:, 0], X0[:, -1], X0)

    solve = jax.jit(lambda c, x, u: batched_solve(
        prob.model, prob.plan.schedule, c, x, u, prob.scp))

    sol = solve(cfg_b, X0, U0)  # compile + warm up
    jax.block_until_ready(sol)
    n_success = int(jnp.sum(sol.success))

    times = []
    for r in range(args.repeats):
        # perturb inputs so no result caching is possible
        X0r = X0 + 1e-4 * (r + 1)
        cfg_r = tile_ocp_config(prob.ocp, X0r[:, 0], X0r[:, -1], X0r)
        t0 = time.perf_counter()
        out = solve(cfg_r, X0r, U0)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_s = batch / best
    print(json.dumps({
        "metric": "scp_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }))
    # single-solve latency distribution (BASELINE.md p99 row)
    lat = []
    if args.latency_probes > 0:
        solve1 = jax.jit(lambda c, x, u: batched_solve(
            prob.model, prob.plan.schedule, c, x, u, prob.scp))
        X1 = X0[:1]
        c1 = tile_ocp_config(prob.ocp, X1[:, 0], X1[:, -1], X1)
        out = solve1(c1, X1, U0[:1])
        jax.block_until_ready(out)
        for i in range(args.latency_probes):
            X1i = X1 + 1e-4 * (i + 1)
            c1i = tile_ocp_config(prob.ocp, X1i[:, 0], X1i[:, -1], X1i)
            t0 = time.perf_counter()
            out = solve1(c1i, X1i, U0[:1])
            jax.block_until_ready(out)
            lat.append(time.perf_counter() - t0)
        lat.sort()

    # diagnostics on stderr-ish second line (driver reads line 1)
    import sys
    p50 = lat[len(lat) // 2] * 1e3 if lat else float("nan")
    p99 = lat[min(int(len(lat) * 0.99), len(lat) - 1)] * 1e3 if lat \
        else float("nan")
    print(f"# backend={args.backend} batch={batch} best={best*1e3:.1f}ms "
          f"success={n_success}/{batch} mean_qp_iters="
          f"{float(jnp.mean(sol.qp_iterations)):.0f} "
          f"latency_p50={p50:.1f}ms latency_p99={p99:.1f}ms "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
