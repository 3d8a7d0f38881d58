"""Repo-root conftest: scrub the TPU-tunnel plugin out of TEST processes.

This image preloads jax at interpreter startup via a sitecustomize hook that
registers a remote-TPU PJRT plugin whenever PALLAS_AXON_POOL_IPS is set, and
pins JAX_PLATFORMS to that backend. Unit tests are CPU-only; the plugin's
in-process client threads are unnecessary there and implicated in mid-suite
XLA:CPU segfaults. This file runs in the pytest MASTER before xdist spawns
workers, so scrubbing os.environ here means every worker interpreter starts
WITHOUT the plugin (the master itself already loaded it — harmless, it only
coordinates). tests/conftest.py still pins the cpu platform as belt and
braces for direct single-process runs.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen is implicated in mid-suite segfaults
    # inside backend_compile (multiple compiles + dispatch threads in one
    # process); single-split codegen trades a little compile speed for
    # stability.
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags


# --------------------------------------------------------------------------
# Crash resilience: XLA:CPU in this image sporadically SEGFAULTS inside
# backend_compile in LONG-LIVED processes (location varies run to run; every
# affected test passes in a fresh process — triaged r3: not the persistent
# cache, not async dispatch, not parallel codegen, not the ctypes library,
# not the tunnel plugin). Until the jaxlib bug is fixed, reschedule a test
# whose worker crashed onto a fresh worker (pytest-xdist's crash-item hook,
# the same mechanism pytest-rerunfailures uses). Requires --max-worker-restart
# (set in pyproject addopts) so xdist respawns the worker.
# --------------------------------------------------------------------------

_CRASH_RETRIES: dict = {}
_MAX_CRASH_RETRIES = 2


def pytest_handlecrashitem(crashitem, report, sched):
    n = _CRASH_RETRIES.get(crashitem, 0)
    if n < _MAX_CRASH_RETRIES:
        _CRASH_RETRIES[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"
