"""Real two-process multihost test: jax.distributed on CPU.

SURVEY.md §5.8 / round-1 verdict: ``parallel/multihost.py`` must be
exercised against an actual multi-process ``jax.distributed`` cluster, not
just single-process semantics. Two local worker processes initialise a
coordinator, build the global (data, spatial) mesh (2 hosts × 2 local
devices), feed per-host batch shards, and check a cross-host reduction.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cpu():
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # a clean slate for the workers: no inherited device-count flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU init timed out in this environment")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNIMPLEMENTED" in out or "not supported" in out.lower()
        ):
            pytest.skip(f"jax.distributed unsupported here: {out[-200:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "global sum 112.0 ok" in out
