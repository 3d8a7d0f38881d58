"""Tests for the logUp lookup argument (zkdl_tpu/sumcheck/lookup.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, host
from zkdl_tpu.sumcheck import lookup
from zkdl_tpu.sumcheck.transcript import FiatShamir, SeededRng
from zkdl_tpu.tensor import fr_ops

HF = host.fr


def test_batch_inverse():
    key = jax.random.PRNGKey(0)
    x = fr_ops.random_fr(key, 16)
    x = fr.mont(x)
    inv = lookup.batch_inverse_jit(x)
    prod = fr.mul(x, inv)
    ints = fr.to_ints(np.asarray(prod))
    assert all(v == HF.one_mont for v in ints)


def test_batch_inverse_single():
    x = fr.mont(jnp.asarray(fr.from_ints([7])))
    inv = lookup.batch_inverse(x)
    assert fr.to_ints(np.asarray(fr.mul(x, inv)))[0] == HF.one_mont


def _range_instance(bits, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << bits, size=n, dtype=np.uint64)
    raw = np.zeros((n, 8), dtype=np.uint32)
    raw[:, 0] = vals.astype(np.uint32)
    a = fr.mont(jnp.asarray(raw))
    t = lookup.range_table(bits)
    m = lookup.multiplicities(vals, 1 << bits)
    return a, t, m, vals


def test_lookup_roundtrip():
    a, t, m, vals = _range_instance(bits=4, n=32)
    proof = lookup.prove(a, t, m, FiatShamir())
    ok, msg = lookup.verify(proof, table_vals=list(range(16)))
    assert ok, msg


def test_lookup_rejects_out_of_table():
    a, t, m, vals = _range_instance(bits=4, n=32)
    # corrupt one witness value to 16 (outside [0,16)) but keep m unchanged
    raw = np.zeros((32, 8), dtype=np.uint32)
    raw[:, 0] = vals.astype(np.uint32)
    raw[0, 0] = 16
    a_bad = fr.mont(jnp.asarray(raw))
    proof = lookup.prove(a_bad, t, m, FiatShamir())
    ok, msg = lookup.verify(proof, table_vals=list(range(16)))
    assert not ok


def test_lookup_rejects_wrong_multiplicities():
    a, t, m, vals = _range_instance(bits=4, n=32)
    m_bad = fr.add(m, fr.ones_mont((m.shape[0],)))
    proof = lookup.prove(a, t, m_bad, FiatShamir())
    ok, msg = lookup.verify(proof, table_vals=list(range(16)))
    assert not ok


def test_lookup_with_seeded_rng_challenges():
    a, t, m, _ = _range_instance(bits=3, n=16, seed=3)
    proof = lookup.prove(a, t, m, SeededRng(7))
    ok, msg = lookup.verify(proof, table_vals=list(range(8)))
    assert ok, msg
