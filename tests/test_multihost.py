"""Multi-process (multi-host path) test: jax.distributed over 2 CPU
processes × 4 virtual devices, mesh-sharded analyze() equals the
single-device analysis on every process's addressable shards
(reference: the MPI-distributed das_letkf, common_mpi_scale.f90:367-512).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_analysis():
    repo = Path(__file__).resolve().parents[1]
    worker = repo / "tests" / "mh_worker.py"
    port = _free_port()
    env = dict(os.environ)
    # workers manage their own XLA_FLAGS / platform
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(repo))
        for pid in range(2)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "OK checked" in out
