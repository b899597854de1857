"""REAL multi-process mesh execution (VERDICT r3 next #4): 2 processes x
4 virtual CPU devices joined via jax.distributed.initialize, running the
(host, chip) two-level merge across the process boundary and asserting
parity with a numpy oracle (benchmarks/mp_worker.py).

Skips — with the failure mode in the skip reason — if the container
forbids the localhost coordinator (gRPC bind) or the jax build lacks
multi-process CPU support.
"""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "benchmarks" / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_host_chip_mesh_parity():
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover — container without loopback
        pytest.skip(f"cannot bind a localhost port for the coordinator: {e}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out (coordinator deadlock?)")
    for rc, out, err in outs:
        if rc != 0 and (
            "DEADLINE_EXCEEDED" in err
            or "UNAVAILABLE" in err
            or "distributed" in err and "not supported" in err.lower()
        ):
            pytest.skip(
                "jax.distributed could not form the 2-process cluster in "
                f"this container (worker stderr tail: {err[-400:]})"
            )
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
        assert "PARITY OK" in out
