"""Benchmark: full SCP solves/s on one chip (BASELINE.md target: >= 1000
solves/s on solo12 trot, N=50).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology (important through the axon TPU tunnel; measured
2026-08-19, revised 2026-08-21):
  * Before the first device->host readback, dispatch is asynchronous AND
    `block_until_ready` does NOT actually wait for the remote device --
    naive timing measures only the enqueue (~0.1 ms, wildly wrong).
  * After the first d2h (even a scalar int()), the process switches to a
    mode where every readback costs one ~25 ms tunnel round trip, and --
    measured 2026-08-21 once the solve itself dropped to ~15 ms -- EACH
    jitted call dispatched from Python also costs a ~28 ms tunnel round
    trip (Python-level call chains are dispatch-bound, not chip-bound).
  * Therefore the throughput metric runs k back-to-back solves inside
    ONE jitted lax.scan (cycling pre-staged inputs via a traced index so
    nothing hoists), reads back one scalar, and takes the difference
    quotient between two chain lengths: tunnel constants cancel and the
    number is pure chip time, which is what a locally-attached TPU (or a
    production serving loop that pipelines dispatch) sees.
  * The p50/p99 latency distribution is host-observed per-call time with
    the measured dispatch+readback round trip of a TRIVIAL jitted
    function subtracted -- the honest single-request latency correction
    for the tunnel (on local hardware the correction is ~0).
"""
import argparse
import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.ops.admm import QPSettings
from centroidal_mpc_tpu.parallel.batch import batched_solve, tile_ocp_config

BASELINE_SOLVES_PER_S = 1000.0


def per_call_time(solve_fn, inputs, k=10, trials=3):
    """Amortized per-solve seconds: in-jit scan chains of back-to-back
    solves at two lengths; the difference quotient cancels all tunnel
    constants (see module docstring).  `solve_fn` maps one arg-tuple to
    a solution pytree; `inputs` is a list of distinct arg-tuples, cycled
    per step via a traced index so the loop body cannot be hoisted."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *inputs)
    n_in = len(inputs)

    @functools.partial(jax.jit, static_argnums=1)
    def chain(st, kk):
        def body(carry, i):
            args = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i % n_in,
                                                       keepdims=False), st)
            sol = solve_fn(*args)
            # reduce over ALL leaves so no output (and no work feeding
            # it) is dead-code-eliminated -- same liveness as the
            # latency probe (round-2 advisor finding)
            acc = sum(l.sum().astype(jnp.float32)
                      for l in jax.tree.leaves(sol))
            return carry + acc * 1e-20, None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(kk), length=kk)
        return out

    k1, k2 = 2, 2 + k
    float(chain(stacked, k1)), float(chain(stacked, k2))  # compile

    def best(kk):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(stacked, kk))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(k2) - best(k1)) / (k2 - k1), 1e-9)


def accuracy_tiers(preset, args):
    """Accuracy-at-speed table (VERDICT round 1, item 2b): f32-on-TPU SCP
    solutions at several ADMM tolerance tiers, each measured against the
    f64 eps=1e-7+polish reference solution (solved on the host CPU backend
    -- the reference's OSQP operating point, src/scp_solver.py:62-63).
    Returns a list of {eps, polish, solves_per_s, x_err_inf, u_err_inf}.
    """
    import numpy as np
    from centroidal_mpc_tpu.solver.scp import solve_scp

    trace_only = getattr(args, "trace_only", False)
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        qp64 = QPSettings(eps_abs=1e-7, eps_rel=1e-7,
                          max_iter=args.ref_max_iter,
                          adaptive_rho=True, polish=True)
        p64 = presets.build_problem(preset, dtype=jnp.float64, qp=qp64)
        p64 = dataclasses.replace(
            p64, scp=dataclasses.replace(p64.scp, qp_backend="block"))
        if trace_only:
            jax.jit(lambda c, x, u: solve_scp(
                p64.model, p64.plan.schedule, c, x, u,
                p64.scp)).lower(p64.ocp, p64.X0, p64.U0)
            X_ref = np.zeros(p64.X0.shape)
            U_ref = np.zeros(p64.U0.shape)
        else:
            sol64 = solve_scp(p64.model, p64.plan.schedule, p64.ocp,
                              p64.X0, p64.U0, p64.scp)
            X_ref = np.asarray(sol64.X, np.float64)
            U_ref = np.asarray(sol64.U, np.float64)
            assert bool(sol64.success), "f64 reference SCP failed"

    tiers = [(5e-4, False), (1e-4, False), (1e-5, False), (1e-4, True)]
    out = []
    tier_batch = min(args.batch, 64)
    for eps, polish in tiers:
        # scheduled rho adaptation: the reference's OSQP operating point
        # is adaptive_rho=on, and fixed-rho f32 ADMM stalls below
        # eps=5e-4 (measured 0/64 converged at 1e-4 vs 64/64 in 162
        # iterations with 'always' adaptation, TPU v5e 2026-08-21)
        qp = QPSettings(eps_abs=eps, eps_rel=eps,
                        max_iter=args.qp_max_iter,
                        adaptive_rho=True, adaptive_rho_mode="always",
                        sweep_method=args.sweep,
                        factor_method=args.factor, polish=polish,
                        check_interval=args.check_interval,
                        alpha=args.alpha)
        prob = presets.build_problem(preset, dtype=jnp.float32, qp=qp)
        prob = dataclasses.replace(
            prob, scp=dataclasses.replace(prob.scp, qp_backend=args.backend,
                                          norm_method="power"))
        Xb = jnp.broadcast_to(prob.X0, (tier_batch,) + prob.X0.shape)
        Ub = jnp.broadcast_to(prob.U0, (tier_batch,) + prob.U0.shape)
        solve = jax.jit(lambda c, x, u, _p=prob: batched_solve(
            _p.model, _p.plan.schedule, c, x, u, _p.scp))
        inputs = []
        for r in range(2):
            Xr = Xb + 1e-4 * r
            inputs.append((tile_ocp_config(prob.ocp, Xr[:, 0], Xr[:, -1],
                                           Xr), Xr, Ub))
        if trace_only:
            solve.lower(*inputs[0])
            out.append({"eps": eps, "polish": polish, "traced": True})
            continue
        sol = solve(*inputs[0])
        jax.block_until_ready(sol)
        x_err = float(jnp.max(jnp.abs(
            sol.X[0].astype(jnp.float32)
            - jnp.asarray(X_ref, jnp.float32))))
        u_err = float(jnp.max(jnp.abs(
            sol.U[0].astype(jnp.float32)
            - jnp.asarray(U_ref, jnp.float32))))
        t = per_call_time(solve, inputs, max(args.chain // 2, 3), 2)
        out.append({"eps": eps, "polish": polish,
                    "solves_per_s": round(tier_batch / t, 1),
                    # tiers below the f32 ADMM floor (~1e-4 scaled
                    # residuals) report their non-convergence honestly
                    # rather than a masked error figure
                    "success_frac": round(
                        float(jnp.mean(sol.success.astype(jnp.float32))),
                        3),
                    "mean_qp_iters": round(
                        float(jnp.mean(sol.qp_iterations)), 0),
                    "x_err_inf": round(x_err, 8),
                    "u_err_inf": round(u_err, 8)})
    return out


def latency_distribution(solve1, in1, n_probes: int):
    """p50/p99 single-solve latency through the axon tunnel.

    Each probe is one jitted call that reduces the whole solution pytree
    to a scalar (keeping every output live) and reads it back.  The
    dispatch+readback round trip of a TRIVIAL jitted function is
    measured the same way and subtracted -- on a locally-attached chip
    that correction is ~0 and the raw numbers apply directly.
    """
    import numpy as np

    @jax.jit
    def probe(*a):
        sol = solve1(*a)
        return sum(l.sum().astype(jnp.float32)
                   for l in jax.tree.leaves(sol))

    noop = jax.jit(lambda x: (x + 1.0).sum())
    small = jnp.zeros((8,), jnp.float32)
    float(noop(small))
    const = []
    for _ in range(max(50, n_probes)):
        t0 = time.perf_counter()
        float(noop(small))
        const.append(time.perf_counter() - t0)
    const = np.asarray(const)
    c_tunnel = float(np.median(const))
    float(probe(*in1[0]))  # compile
    ts = []
    for i in range(n_probes):
        t0 = time.perf_counter()
        float(probe(*in1[i % len(in1)]))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) - c_tunnel
    # the noop distribution IS the pure dispatch+readback path: its tail
    # bounds how much of the probe tail is tunnel jitter vs chip time
    return (float(np.percentile(ts, 50) * 1e3),
            float(np.percentile(ts, 99) * 1e3), c_tunnel * 1e3,
            float(np.percentile(const, 99) * 1e3))


def kernel_parity(prob, inputs, sol_pallas, args):
    """Compiled-Mosaic self-certification (VERDICT round 2, item 4): the
    CI suite only ever exercises the Pallas kernels in interpret mode, so
    every bench run doubles as the compiled-kernel correctness check by
    re-solving one batch with factor_method='cholesky' (pure XLA) and
    comparing solutions.  Returns a dict recorded in the bench JSON."""
    qp_ref = dataclasses.replace(prob.scp.qp, factor_method="cholesky")
    scp_ref = dataclasses.replace(prob.scp, qp=qp_ref)
    solve_ref = jax.jit(lambda c, x, u: batched_solve(
        prob.model, prob.plan.schedule, c, x, u, scp_ref))
    sol_ref = solve_ref(*inputs[0])
    jax.block_until_ready(sol_ref)
    x_err = float(jnp.max(jnp.abs(sol_pallas.X - sol_ref.X)))
    u_err = float(jnp.max(jnp.abs(sol_pallas.U - sol_ref.U)))
    # scale-relative: X is O(0.2 m) CoM coordinates, U is O(10 N) forces
    x_rel = x_err / max(float(jnp.abs(sol_ref.X).max()), 1e-30)
    u_rel = u_err / max(float(jnp.abs(sol_ref.U).max()), 1e-30)
    it_diff = float(jnp.mean(jnp.abs(
        sol_pallas.qp_iterations.astype(jnp.float32)
        - sol_ref.qp_iterations.astype(jnp.float32))))
    tol = args.parity_tol
    if tol is None:
        tol = max(20.0 * args.eps, 1e-3)
    return {"x_err_inf": round(x_err, 8), "u_err_inf": round(u_err, 8),
            "x_err_rel": round(x_rel, 8), "u_err_rel": round(u_rel, 8),
            "mean_qp_iter_diff": round(it_diff, 2), "tol_rel": tol,
            "ok": bool(x_rel < tol and u_rel < tol)}


def build_parser():
    ap = argparse.ArgumentParser()
    # batch 128 is the measured throughput sweet spot (2026-08-21,
    # v5e: 7,076 solves/s at 128 vs 5,441 at 256 -- the XLA-side
    # iteration ops scale linearly while kernel launches do not amortize)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chain", type=int, default=10,
                    help="solves per timed chain (difference quotient)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--preset", default="solo12_trot_n50",
                    choices=sorted(presets.PRESETS))
    ap.add_argument("--backend", default="block",
                    choices=["block", "dense"])
    ap.add_argument("--latency-probes", type=int, default=200,
                    help="0 disables the latency-distribution measurement")
    ap.add_argument("--sweep", default="scan", choices=["scan", "assoc"])
    ap.add_argument("--factor", default="pallas",
                    choices=["cholesky", "thomas", "pallas",
                             "pallas_fused"],
                    help="block-tridiagonal factorization backend; "
                         "'pallas' fuses the blocked Cholesky onto the "
                         "VPU lanes (~90x the XLA scan, ops/pallas_blockqp)")
    ap.add_argument("--eps", type=float, default=5e-4,
                    help="ADMM eps_abs/eps_rel")
    ap.add_argument("--polish", action="store_true",
                    help="enable the active-set polish pass after ADMM")
    ap.add_argument("--rho", default="fixed", choices=["fixed", "always"],
                    help="fixed rho, or batched scheduled adaptation")
    ap.add_argument("--stochastic", action="store_true",
                    help="chance-constrained mode (covariance propagation "
                         "+ friction back-offs; ~1500 solves/s at batch 64)")
    ap.add_argument("--no-accuracy", action="store_true",
                    help="skip the accuracy-at-speed tier table")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the pallas-vs-cholesky kernel parity check")
    ap.add_argument("--parity-tol", type=float, default=None,
                    help="relative tolerance for the kernel parity check "
                         "(default max(20*eps, 1e-3): two ADMM runs "
                         "differing only in factorization roundoff stop "
                         "within the same eps band, so solutions "
                         "legitimately differ by O(eps); a miscompiled "
                         "kernel differs by O(1))")
    ap.add_argument("--qp-max-iter", type=int, default=4000,
                    help="ADMM iteration cap (throughput + tier solves)")
    ap.add_argument("--check-interval", type=int, default=10,
                    help="residual-check cadence: smaller stops closer "
                         "to true convergence (measured 2026-08-21, "
                         "v5e batch 128: 10 beats the OSQP-default 25 "
                         "by ~1 ms/batch; residual eval is only ~30 us)")
    ap.add_argument("--alpha", type=float, default=1.7,
                    help="ADMM over-relaxation (1.7 converges in ~92 "
                         "iters vs 96 at the OSQP-default 1.6; 1.9 "
                         "diverges on this problem family)")
    ap.add_argument("--ref-max-iter", type=int, default=20000,
                    help="ADMM iteration cap for the f64 reference solve")
    ap.add_argument("--trace-only", action="store_true",
                    help="jit-lower every configured program without "
                         "compiling/executing (CI smoke: catches tracing "
                         "regressions like the round-2 polish crash fast)")
    return ap


def run(args):
    """Everything main() does, parameterized; returns the record dict.
    Driven at tiny scale by tests/test_bench_smoke.py so every bench
    configuration is CI-traced (VERDICT round 2, item 2)."""
    qp = QPSettings(eps_abs=args.eps, eps_rel=args.eps,
                    max_iter=args.qp_max_iter,
                    adaptive_rho=(args.rho == "always"),
                    adaptive_rho_mode="always", sweep_method=args.sweep,
                    factor_method=args.factor, polish=args.polish,
                    check_interval=args.check_interval, alpha=args.alpha)
    prob = presets.build_problem(presets.PRESETS[args.preset],
                                 stochastic=args.stochastic,
                                 dtype=jnp.float32, qp=qp)
    prob = dataclasses.replace(
        prob, scp=dataclasses.replace(prob.scp, qp_backend=args.backend,
                                      norm_method="power"))

    batch = args.batch
    key = jax.random.PRNGKey(0)
    dx = jnp.zeros((batch, 9), jnp.float32).at[:, :2].set(
        0.005 * jax.random.normal(key, (batch, 2), jnp.float32))
    X0 = jnp.broadcast_to(prob.X0, (batch,) + prob.X0.shape) + dx[:, None, :]
    U0 = jnp.broadcast_to(prob.U0, (batch,) + prob.U0.shape)

    solve = jax.jit(lambda c, x, u: batched_solve(
        prob.model, prob.plan.schedule, c, x, u, prob.scp))

    # distinct pre-staged inputs so chained calls cannot alias/cache
    inputs = []
    for r in range(4):
        X0r = X0 + 1e-4 * r
        inputs.append((tile_ocp_config(prob.ocp, X0r[:, 0], X0r[:, -1], X0r),
                       X0r, U0))

    if args.trace_only:
        # lower (trace + StableHLO) every program the real bench would
        # compile; trace-time regressions raise here, no XLA compile cost
        solve.lower(*inputs[0])
        if args.latency_probes > 0:
            X1 = X0[:1]
            in1 = [(tile_ocp_config(prob.ocp, X1[:, 0], X1[:, -1], X1),
                    X1, U0[:1])]
            solve.lower(*in1[0])
        if not args.no_parity and args.factor == "pallas":
            qp_ref = dataclasses.replace(prob.scp.qp,
                                         factor_method="cholesky")
            scp_ref = dataclasses.replace(prob.scp, qp=qp_ref)
            jax.jit(lambda c, x, u: batched_solve(
                prob.model, prob.plan.schedule, c, x, u,
                scp_ref)).lower(*inputs[0])
        tiers = None
        if not args.no_accuracy:
            tiers = accuracy_tiers(presets.PRESETS[args.preset], args)
        record = {"metric": "scp_solves_per_s_per_chip", "value": 0.0,
                  "unit": "solves/s", "vs_baseline": 0.0,
                  "trace_only": True, "batch": batch,
                  "_stderr": "# trace-only run (no execution)"}
        if tiers is not None:
            record["accuracy_tiers"] = tiers
        return record

    sol = solve(*inputs[0])  # compile + warm up
    # force the synchronous tunnel mode AND check correctness up front
    n_success = int(jnp.sum(sol.success))

    t_solve = per_call_time(solve, inputs, args.chain, args.trials)
    solves_per_s = batch / t_solve

    # single-solve latency (BASELINE.md p99-within-10ms row): amortized
    # per-solve wall time at batch 1 plus the p50/p99 distribution over
    # >= latency_probes individual solves (tunnel constant subtracted --
    # a locally-attached chip has no tunnel).
    lat_ms = p50_ms = p99_ms = tunnel_p99 = float("nan")
    if args.latency_probes > 0:
        solve1 = jax.jit(lambda c, x, u: batched_solve(
            prob.model, prob.plan.schedule, c, x, u, prob.scp))
        in1 = []
        for r in range(4):
            X1 = X0[:1] + 1e-4 * r
            in1.append((tile_ocp_config(prob.ocp, X1[:, 0], X1[:, -1], X1),
                        X1, U0[:1]))
        out = solve1(*in1[0])
        jax.block_until_ready(out)
        lat_ms = per_call_time(solve1, in1, args.chain, args.trials) * 1e3
        p50_ms, p99_ms, c_tunnel_ms, tunnel_p99 = latency_distribution(
            solve1, in1, args.latency_probes)

    parity = None
    if not args.no_parity and args.factor == "pallas":
        parity = kernel_parity(prob, inputs, sol, args)

    tiers = None
    if not args.no_accuracy:
        tiers = accuracy_tiers(presets.PRESETS[args.preset], args)

    record = {
        "metric": "scp_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
        "latency_p50_ms": round(p50_ms, 3),
        "latency_p99_ms": round(p99_ms, 3),
        # pure chip time per batch-1 solve (in-jit chain difference
        # quotient: no dispatch, no tunnel) -- the p99 a locally-attached
        # deployment sees is ~this plus sub-ms host dispatch.  The
        # host-observed p99 above additionally carries the axon tunnel's
        # round-trip TAIL, bounded by tunnel_noop_p99_ms (the p99 of a
        # trivial jitted call: pure dispatch+readback path).
        "latency_chip_ms": round(lat_ms, 3),
        "tunnel_noop_p99_ms": round(tunnel_p99, 3),
        "n_success": n_success,
        "batch": batch,
    }
    if parity is not None:
        record["kernel_parity"] = parity
    if tiers is not None:
        record["accuracy_tiers"] = tiers
    record["_stderr"] = (
        f"# backend={args.backend} batch={batch} "
        f"batch_time={t_solve*1e3:.2f}ms "
        f"success={n_success}/{batch} mean_qp_iters="
        f"{float(jnp.mean(sol.qp_iterations)):.0f} "
        f"latency_single={lat_ms:.2f}ms p50={p50_ms:.2f}ms "
        f"p99={p99_ms:.2f}ms "
        f"device={jax.devices()[0].device_kind}")
    return record


def main():
    args = build_parser().parse_args()
    record = run(args)
    info = record.pop("_stderr")
    print(json.dumps(record))
    print(info, file=sys.stderr)


if __name__ == "__main__":
    main()
