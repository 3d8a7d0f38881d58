import os

# Force CPU with 8 virtual devices BEFORE jax import: sharding tests run on a
# virtual mesh; real-TPU behavior is exercised by bench.py / the driver.
# (The ambient environment pins JAX_PLATFORMS=axon — a tunneled TPU — which makes
# every test compile remotely; override it unconditionally for unit tests.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import random

import numpy as np
import pytest

# Belt and braces: if some plugin imported jax before us (see pyproject.toml
# addopts), force the platform at config level too. This raises if a non-CPU
# backend was already initialized — better a loud failure than TPU-bound tests.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "unit tests must run on CPU"

# Run CPU computations inline (no async dispatch): mid-suite XLA:CPU segfaults
# in backend_compile (LLVM JIT) correlate with executables running on
# background dispatch threads while the main thread compiles the next module.
jax.config.update("jax_cpu_enable_async_dispatch", False)

# NO persistent compile cache on CPU: XLA:CPU executable (de)serialization is
# experimental and segfaults the interpreter mid-suite (reproduced r2/r3 in
# both the read path — compilation_cache.get_executable_and_time →
# deserialize_executable — and the write path, warm or cold cache). Tests pay
# cold compiles; the TPU bench/demo keep their own per-backend cache
# (utils/runtime.enable_compile_cache, which now refuses the cpu backend).


@pytest.fixture(autouse=True)
def _seed():
    random.seed(1234)
    np.random.seed(1234)
