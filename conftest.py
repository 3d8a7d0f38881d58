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
