"""Overflow guards on the lazy-reduction accumulators (SURVEY §5.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import planar


def test_debug_assert_below_trips(monkeypatch):
    monkeypatch.setenv("ZKDL_DEBUG_OVERFLOW", "1")
    bad = jnp.asarray(np.array([1, 1 << 30], dtype=np.uint32))
    with pytest.raises(Exception) as ei:
        planar.debug_assert_below(bad, 1 << 30, "test")
        import jax

        jax.effects_barrier()
    assert "overflow" in str(ei.value).lower() or "OverflowError" in str(ei.value)


def test_debug_assert_below_passes(monkeypatch):
    monkeypatch.setenv("ZKDL_DEBUG_OVERFLOW", "1")
    ok = jnp.asarray(np.array([1, 2, 3], dtype=np.uint32))
    planar.debug_assert_below(ok, 1 << 30, "test")
    import jax

    jax.effects_barrier()


def test_static_chunk_guard(monkeypatch):
    monkeypatch.setattr(planar, "DOT_CHUNK", 1 << 14)
    monkeypatch.setattr(planar, "FORCE_XLA_PLANAR", True)
    a = planar.ones_mont(1 << 14)
    with pytest.raises(AssertionError, match="overflow bound"):
        planar.dot(a, a)


def test_dot_under_debug_flag_still_correct(monkeypatch):
    monkeypatch.setenv("ZKDL_DEBUG_OVERFLOW", "1")
    monkeypatch.setattr(planar, "FORCE_XLA_PLANAR", True)
    from zkdl_tpu.field import fr
    from zkdl_tpu.tensor import fr_ops

    a = fr.mont(fr_ops.random_fr(__import__("jax").random.PRNGKey(0), 32))
    ap = planar.to_planar(a)
    got = planar.dot(ap, ap)
    want = fr_ops.fr_sum(fr.mul(a, a))
    assert np.array_equal(np.asarray(got), np.asarray(planar.from_planar(got[:, None])[0]))
    assert np.array_equal(np.asarray(planar.from_planar(got[:, None])[0]), np.asarray(want))
