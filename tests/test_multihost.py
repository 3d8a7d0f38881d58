"""Multi-host (DCN) prover bring-up: two REAL OS processes rendezvous through
jax.distributed, build a global 4-device mesh (2 virtual CPU devices per
process), and prove a dp-sharded sumcheck whose stream must be bit-identical
to the single-process prover (parallel/multihost.py; SURVEY.md §5.8 row 46).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles; excluded from the smoke tier

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_prover(tmp_path):
    port = _free_port()
    env = os.environ.copy()
    # fresh CPU-only interpreters: no TPU tunnel plugin, 2 local devices each
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / "res")

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port), out],
            env=env,
            cwd=_REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)
    for pid in (0, 1):
        with open(f"{out}.{pid}") as f:
            assert f.read() == "OK"
