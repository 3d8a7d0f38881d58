"""ctypes loader for the native host-arithmetic library (zkdl_host.cpp).

Builds lazily with g++ on first use (cached as libzkdl_host.so next to the
source); all entry points degrade gracefully to the pure-Python host oracle
when the toolchain or binary is unavailable (`lib() is None`)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zkdl_host.cpp")
_SO = os.path.join(_DIR, "libzkdl_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile the shared library. Returns its path or None on failure."""
    if not force and os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def lib():
    """The loaded CDLL, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = build()
        if so is None:
            return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        for name, argtypes in [
            ("zk_fr_mont_mul_batch", [u64p, u64p, u64p, ctypes.c_size_t]),
            ("zk_fr_add_batch", [u64p, u64p, u64p, ctypes.c_size_t]),
            ("zk_fr_sub_batch", [u64p, u64p, u64p, ctypes.c_size_t]),
            ("zk_g1_scalar_mul_batch", [u64p, u64p, u64p, ctypes.c_size_t]),
            ("zk_g1_add_batch", [u64p, u64p, u64p, ctypes.c_size_t]),
            ("zk_g1_sum", [u64p, u64p, ctypes.c_size_t]),
            ("zk_g1_msm", [u64p, u64p, u64p, ctypes.c_size_t]),
        ]:
            getattr(L, name).argtypes = argtypes
            getattr(L, name).restype = None
        L.zk_g1_eq.argtypes = [u64p, u64p]
        L.zk_g1_eq.restype = ctypes.c_int
        _lib = L
        return _lib


# ---------------------------------------------------------------------------
# numpy-free int <-> limb marshalling helpers
# ---------------------------------------------------------------------------


def _ints_to_limbs(vals, n_limbs: int):
    buf = (ctypes.c_uint64 * (n_limbs * len(vals)))()
    mask = (1 << 64) - 1
    for i, v in enumerate(vals):
        v = int(v)
        for j in range(n_limbs):
            buf[n_limbs * i + j] = v & mask
            v >>= 64
    return buf


def _limbs_to_ints(buf, n_limbs: int, count: int):
    out = []
    for i in range(count):
        v = 0
        for j in reversed(range(n_limbs)):
            v = (v << 64) | buf[n_limbs * i + j]
        out.append(v)
    return out


def _points_to_limbs(pts):
    """pts: iterable of (x, y, z) int triples -> 18-u64-per-point buffer."""
    flat = []
    for (x, y, z) in pts:
        flat.extend([x, y, z])
    buf = (ctypes.c_uint64 * (18 * len(pts)))()
    mask = (1 << 64) - 1
    for i, v in enumerate(flat):
        v = int(v)
        for j in range(6):
            buf[6 * i + j] = v & mask
            v >>= 64
    return buf


def _limbs_to_points(buf, count: int):
    out = []
    for i in range(count):
        coords = []
        for c in range(3):
            v = 0
            for j in reversed(range(6)):
                v = (v << 64) | buf[18 * i + 6 * c + j]
            coords.append(v)
        out.append(tuple(coords))
    return out


# ---------------------------------------------------------------------------
# public wrappers (int-tuple API matching curve/host_g1.JacPoint semantics)
# ---------------------------------------------------------------------------


def g1_scalar_mul_batch(pts, scalars):
    """pts: list of (x,y,z) plain-int Jacobian; scalars: list of raw ints
    (< 2^256). Returns list of (x,y,z). None if native lib unavailable."""
    L = lib()
    if L is None:
        return None
    n = len(pts)
    pbuf = _points_to_limbs(pts)
    sbuf = _ints_to_limbs(scalars, 4)
    obuf = (ctypes.c_uint64 * (18 * n))()
    L.zk_g1_scalar_mul_batch(pbuf, sbuf, obuf, n)
    return _limbs_to_points(obuf, n)


def g1_msm(pts, scalars):
    """sum_i scalars[i] * pts[i] -> one (x,y,z), or None if unavailable."""
    L = lib()
    if L is None:
        return None
    pbuf = _points_to_limbs(pts)
    sbuf = _ints_to_limbs(scalars, 4)
    obuf = (ctypes.c_uint64 * 18)()
    L.zk_g1_msm(pbuf, sbuf, obuf, len(pts))
    return _limbs_to_points(obuf, 1)[0]


def g1_sum(pts):
    L = lib()
    if L is None:
        return None
    pbuf = _points_to_limbs(pts)
    obuf = (ctypes.c_uint64 * 18)()
    L.zk_g1_sum(pbuf, obuf, len(pts))
    return _limbs_to_points(obuf, 1)[0]


def g1_add_batch(ps, qs):
    L = lib()
    if L is None:
        return None
    n = len(ps)
    obuf = (ctypes.c_uint64 * (18 * n))()
    L.zk_g1_add_batch(_points_to_limbs(ps), _points_to_limbs(qs), obuf, n)
    return _limbs_to_points(obuf, n)


def g1_eq(p, q) -> bool | None:
    L = lib()
    if L is None:
        return None
    return bool(L.zk_g1_eq(_points_to_limbs([p]), _points_to_limbs([q])))


def fr_mont_mul_batch(a_vals, b_vals):
    """Montgomery products of Montgomery-form ints (out = a*b*R^-1 mod r)."""
    L = lib()
    if L is None:
        return None
    n = len(a_vals)
    obuf = (ctypes.c_uint64 * (4 * n))()
    L.zk_fr_mont_mul_batch(_ints_to_limbs(a_vals, 4), _ints_to_limbs(b_vals, 4), obuf, n)
    return _limbs_to_ints(obuf, 4, n)
