"""Real 2-process jax.distributed run on CPU (VERDICT round 1, item 4).

Exercises parallel/multihost.py end-to-end: `initialize` with an explicit
coordinator, a global 2-device mesh spanning two OS processes, process-local
shard placement (`shard_local_rows`), the shard_map fleet solver with psum
stats over the cross-process mesh, and `scaling_report`.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fleet_solve():
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    results = {}
    for i, out in enumerate(outs):
        m = re.search(r"RESULT proc=(\d) devices=(\d) n_success=(\d+) "
                      r"qp_iters=(\d+) procs_in_report=(\d)", out)
        assert m, f"no RESULT line from proc {i}:\n{out}"
        results[int(m.group(1))] = (m.group(2), m.group(3), m.group(4),
                                    m.group(5))
    assert set(results) == {0, 1}
    # psum-reduced stats agree across processes; all 4 scenarios solved;
    # both processes saw the 2-process group
    assert results[0] == results[1]
    devices, n_success, qp_iters, procs_n = results[0]
    assert devices == "2"
    assert n_success == "4"
    assert int(qp_iters) > 0
    assert procs_n == "2"
