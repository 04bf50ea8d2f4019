"""CPU smoke test for every bench.py configuration (VERDICT round 2, item 2).

Round 2 shipped a trace-time crash (polish=True under the batched pallas
loop) that only bench.py's accuracy-tier table exercised, so the driver's
TPU bench run died without a JSON line.  This test drives bench.run() --
the EXACT code paths of the driver bench -- at tiny scale on CPU:

  * trace-only sweep: every configuration (factor in {cholesky, thomas,
    pallas}, polish on/off, rho fixed/'always', stochastic, batch >=
    PALLAS_MIN_BATCH and batch 1, the latency probe shape, the
    kernel-parity shape, and the full accuracy_tiers table incl. the
    (1e-4, polish=True) tier that crashed round 2) is jit-LOWERED --
    trace-time regressions raise without paying XLA compile time.
  * one executed combo: the batched-pallas polish path actually runs
    end-to-end (interpret-mode kernels) on an N=9 step-in-place trot.

The trace-only sweep fails on round-2 HEAD (the vmap rank-0 ValueError
is raised during tracing).
"""
import dataclasses
import json

import pytest

import bench
from centroidal_mpc_tpu.config import gaits, presets
from centroidal_mpc_tpu.ops.blockqp import PALLAS_MIN_BATCH

TINY_NAME = "smoke_tiny_trot"


@pytest.fixture(scope="module", autouse=True)
def tiny_preset():
    """Register an N=9 trot preset so bench.run() sees it by name.

    step-in-place: a 0.12 m step in 9 knots (0.09 s) is dynamically
    infeasible and the QP never converges; step_length=0 converges the
    f64 eps=1e-7 reference QP in ~75 ADMM iterations.
    """
    gait = dataclasses.replace(gaits.SOLO12_TROT, step_length=0.0,
                               step_knots=3, support_knots=1, nb_steps=1)
    preset = dataclasses.replace(presets.SOLO12_TROT, name=TINY_NAME,
                                 gait=gait)
    assert preset.horizon == 9
    presets.PRESETS[TINY_NAME] = preset
    yield preset
    del presets.PRESETS[TINY_NAME]


def run_bench(extra):
    args = bench.build_parser().parse_args(
        ["--preset", TINY_NAME, "--chain", "2", "--trials", "1",
         "--qp-max-iter", "150", "--eps", "1e-3"] + extra)
    record = bench.run(args)
    record.pop("_stderr")
    json.dumps(record)  # the driver contract: one JSON-serializable line
    return record


SKIP_EXTRAS = ["--no-stochastic", "--no-mpc", "--no-n165",
               "--no-presets",
               "--latency-probes", "0", "--chip-latency-problems", "0"]

TRACE_COMBOS = [
    # the full default record: polish through the batched pallas loop,
    # the accuracy-tier table, kernel parity + exact, the latency-probe
    # shape, the stochastic record and the MPC tick chain (N=165 is
    # never traced -- n165_record is skipped under --trace-only)
    # the preset coverage matrix traces via --preset-matrix pointed at
    # the tiny preset (the real 4-preset matrix is full-horizon -- too
    # heavy for smoke; its solve path is identical, and the wrench6
    # family is covered by tests/test_full_horizons.py)
    ["--factor", "pallas", "--polish", "--batch", str(PALLAS_MIN_BATCH),
     "--latency-probes", "2", "--no-n165",
     "--preset-matrix", TINY_NAME],
    ["--factor", "pallas", "--rho", "always",
     "--batch", str(PALLAS_MIN_BATCH), "--no-accuracy", "--no-parity"]
    + SKIP_EXTRAS,
    ["--factor", "pallas", "--no-polish",
     "--batch", str(PALLAS_MIN_BATCH), "--no-accuracy", "--no-parity"]
    + SKIP_EXTRAS,
    ["--factor", "cholesky", "--polish", "--batch", "1", "--no-accuracy"]
    + SKIP_EXTRAS,
    ["--factor", "thomas", "--sweep", "assoc", "--batch", "2",
     "--no-accuracy"] + SKIP_EXTRAS,
]


@pytest.mark.parametrize("combo", TRACE_COMBOS,
                         ids=lambda c: "_".join(
                             a.lstrip("-") for a in c if a.startswith("--")))
def test_trace_every_bench_configuration(combo):
    rec = run_bench(["--trace-only"] + combo)
    assert rec["trace_only"] is True
    if "accuracy_tiers" in rec:
        assert len(rec["accuracy_tiers"]) == 4


@pytest.mark.slow  # ~3 min interpret-mode compile; the trace-only sweep
# above is the fast regression net (it catches the round-2 crash class)
def test_execute_pallas_polish_batched():
    """The batched pallas+polish path runs end-to-end (interpret kernels)
    and every scenario converges on the tiny problem."""
    # tiny polish budgets: the full 12x2 ALM + CG program in interpret
    # mode is a multi-10-minute XLA:CPU compile; 2x1 ALM + 2 CG
    # exercises every code path at smoke cost
    rec = run_bench(["--factor", "pallas", "--polish",
                     "--batch", str(PALLAS_MIN_BATCH), "--no-accuracy",
                     "--no-parity", "--polish-alm-iters", "2",
                     "--polish-rounds", "1", "--polish-cg-iters", "2",
                     "--polish-cg-restarts", "1"] + SKIP_EXTRAS)
    assert rec["value"] > 0
    assert rec["n_success"] == PALLAS_MIN_BATCH
