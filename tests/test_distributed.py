"""Real multi-controller SPMD: two OS processes, one global mesh.

The single-process suite exercises 8 virtual devices; this test closes the
remaining gap to a pod slice by running ``jax.distributed`` across two
processes (4 CPU devices each) — cross-process coordination service,
global ("host", "chip") mesh, GSPMD collectives spanning the process
boundary — and asserting the sharded fit step reproduces the
single-device result bitwise-closely on every process.  (SURVEY.md §5.8;
the reference has no distributed story at all, todo-list.md:2.)
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fit_step(tmp_path):
    nprocs = 2
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # The workers configure their own platform/device-count flags.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(HERE) + os.pathsep + env.get(
        "PYTHONPATH", ""
    )
    procs = []
    outs = []
    for pid in range(nprocs):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nprocs), coord, str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    for r in results:
        assert r["process_count"] == nprocs
        assert r["global_devices"] == 8
        # Cross-process sharded step matches the single-device reference.
        np.testing.assert_allclose(
            r["loss_global"], r["loss_local"], rtol=1e-5
        )
    # Both controllers observed the identical replicated state.
    assert results[0]["loss_global"] == results[1]["loss_global"]
    np.testing.assert_allclose(
        results[0]["params0"], results[1]["params0"], atol=0
    )
