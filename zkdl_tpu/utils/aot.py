"""Ahead-of-time (AOT) executable cache: persist COMPILED XLA executables.

Why this exists: the prover's kernels are huge unrolled multi-limb arithmetic
graphs (each pallas kernel body binds thousands of ops), so *tracing and
lowering* — not XLA compilation — dominates process warmup: measured ~8-15 s
per round-kernel instance and 100+ s for the fused tail graphs, ~40 min total
for the zkdl256 model even with a fully warm persistent HLO-level compile
cache (which only skips the XLA compile step, after tracing+lowering already
ran). The reference has no counterpart (CUDA binaries are fully AOT by
construction — nvcc compiles once at build time, Makefile:30); this module is
the TPU-native equivalent of that property.

``aot.jit(fn)`` is a drop-in replacement for ``jax.jit(fn)``:

- first call per (function, static args, input avals): trace + lower + compile
  once, then persist the serialized executable
  (jax.experimental.serialize_executable) under ``.jax_cache/aot/<backend>/``;
- later processes deserialize and load in <1 s per entry, skipping tracing,
  lowering, AND compilation entirely — measured 0.8 s load vs 17+ s compile
  path for one round kernel;
- cache keys include a hash of every ``zkdl_tpu/*.py`` source file plus the
  jax version, backend, and XLA flags, so ANY source change invalidates every
  AOT entry (conservative but safe — a stale executable would silently compute
  the old semantics);
- on CPU the wrapper degrades to plain ``jax.jit`` (XLA:CPU executable
  (de)serialization is unstable in this environment — see utils/runtime.py),
  so unit tests are unaffected;
- any serialize/deserialize failure falls back to the normal jit path (the
  persistent HLO cache still applies).
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle
import threading

import jax

_SRC_HASH: str | None = None
_LOCK = threading.Lock()


def _source_hash() -> str:
    """Hash of all package sources + jax version + XLA flags: the coarse code
    version for AOT keys. Computed once per process."""
    global _SRC_HASH
    if _SRC_HASH is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        h.update(jax.__version__.encode())
        h.update(os.environ.get("XLA_FLAGS", "").encode())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def cache_dir() -> str:
    root = os.environ.get("ZKDL_AOT_DIR")
    if root is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        root = os.path.join(pkg_root, ".jax_cache", "aot")
    return os.path.join(root, jax.default_backend())


def enabled() -> bool:
    if os.environ.get("ZKDL_AOT", "1") == "0":
        return False
    return jax.default_backend() != "cpu"


def _aval_key(x) -> tuple:
    import numpy as np

    if hasattr(x, "shape") and hasattr(x, "dtype"):
        sh = getattr(x, "sharding", None)
        # multi-device layouts get their own cache entries (an executable
        # compiled for one partitioning must not serve another); single-device
        # arrays all share the default key
        spec = ""
        if sh is not None and getattr(sh, "num_devices", 1) > 1:
            spec = str(sh)
        return (tuple(x.shape), str(x.dtype), spec)
    arr = np.asarray(x)
    return (tuple(arr.shape), str(arr.dtype), "")


class _AotJit:
    """jax.jit work-alike backed by the on-disk executable cache."""

    def __init__(self, fn, static_argnums=(), name: str | None = None):
        self._fn = fn
        self._static = tuple(static_argnums)
        self._name = name or getattr(fn, "__name__", "fn")
        self._plain = jax.jit(fn, static_argnums=static_argnums)
        self._sjits: dict = {}  # statics -> jitted closure over statics
        self._mem: dict = {}  # (statics, avals) -> compiled executable
        self._lock = threading.Lock()

    # plain-jit API passthroughs (used by a few probes/tests)
    def trace(self, *args, **kwargs):
        return self._plain.trace(*args, **kwargs)

    def lower(self, *args, **kwargs):
        return self._plain.lower(*args, **kwargs)

    def _jit_for(self, statics):
        jt = self._sjits.get(statics)
        if jt is None:
            if self._static:
                fn, idx = self._fn, self._static

                def closed(*dyn, _fn=fn, _idx=idx, _st=statics):
                    it = iter(dyn)
                    sit = iter(_st)
                    n_args = len(dyn) + len(_st)
                    full = [next(sit) if i in _idx else next(it) for i in range(n_args)]
                    return _fn(*full)

                jt = jax.jit(closed)
            else:
                jt = self._plain
            self._sjits[statics] = jt
        return jt

    def __call__(self, *args):
        if not enabled():
            return self._plain(*args)
        statics = tuple(args[i] for i in self._static)
        dyn = tuple(a for i, a in enumerate(args) if i not in self._static)
        leaves, treedef = jax.tree.flatten(dyn)
        if any(isinstance(l, jax.core.Tracer) for l in leaves):
            # called inside another trace: inline through the plain jit
            return self._plain(*args)
        key = (statics, tuple(_aval_key(l) for l in leaves), str(treedef))
        co = self._mem.get(key)
        if co is None:
            with self._lock:
                co = self._mem.get(key)
                if co is None:
                    co = self._load_or_build(key, statics, dyn)
                    self._mem[key] = co
        return co(*dyn)

    def _path(self, key) -> str:
        h = hashlib.sha256(repr(key).encode() + _source_hash().encode()).hexdigest()[:24]
        return os.path.join(cache_dir(), f"{self._name}-{h}.bin")

    def _load_or_build(self, key, statics, dyn):
        from jax.experimental import serialize_executable as se

        path = self._path(key)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    ser, in_tree, out_tree = pickle.load(f)
                return se.deserialize_and_load(ser, in_tree, out_tree)
            except Exception:
                pass  # corrupt/incompatible entry: rebuild below
        jt = self._jit_for(statics)
        co = jt.trace(*dyn).lower().compile()
        try:
            ser, in_tree, out_tree = se.serialize(co)
            os.makedirs(cache_dir(), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((ser, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception:
            pass  # non-serializable backend: keep the in-memory executable
        return co


def jit(fn=None, *, static_argnums=(), name: str | None = None):
    """Drop-in jax.jit replacement with the AOT executable cache. Usable as
    ``@aot.jit`` or ``aot.jit(fn, static_argnums=(...))``."""
    if fn is None:
        return functools.partial(jit, static_argnums=static_argnums, name=name)
    return _AotJit(fn, static_argnums=static_argnums, name=name)
