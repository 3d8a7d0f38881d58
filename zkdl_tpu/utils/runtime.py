"""Runtime configuration helpers (compile cache, platform selection)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compile cache. The limb-arithmetic kernels
    (especially G1 scalar-mul bodies) are expensive to compile; caching them on
    disk makes repeat runs start in seconds."""
    import jax

    if jax.default_backend() == "cpu":
        # XLA:CPU executable (de)serialization is experimental and has
        # reproducibly segfaulted the interpreter (both cache read and write
        # paths); never persist CPU executables.
        return
    if path is None:
        path = os.environ.get("ZKDL_CACHE_DIR")
    if path is None:
        root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
        # per-backend subdir: concurrent runs sharing one directory have
        # produced corrupt entries
        path = os.path.join(root, jax.default_backend())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
