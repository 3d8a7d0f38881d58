"""FrTensor op tests: sums, multilinear-extension folds, windowed folds, RNG."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkdl_tpu.field import fr, host
from zkdl_tpu.tensor import fr_ops

P = fr.P_INT
HF = host.fr


def rand_tensor(n):
    xs = [random.randrange(P) for _ in range(n)]
    return xs, jnp.asarray(fr.from_ints(xs))


def test_ceil_log2():
    # matches reference ceilLog2 (proof.cu:13-30)
    assert [fr_ops.ceil_log2(n) for n in [0, 1, 2, 3, 4, 5, 8, 9, 1024]] == [0, 0, 1, 2, 2, 3, 3, 4, 10]


def test_fr_sum():
    for n in [1, 2, 3, 7, 64, 100]:
        xs, t = rand_tensor(n)
        got = fr.to_ints(np.asarray(fr_ops.fr_sum(t))[None])[0]
        assert got == sum(xs) % P, n


def me_eval_host(vals, us):
    """Oracle: fold vals (mont ints) by challenges us (mont ints) pairwise."""
    vals = list(vals)
    for u in us:
        if len(vals) % 2:
            vals.append(0)
        vals = [HF.add(vals[2 * i], HF.mul(u, HF.sub(vals[2 * i + 1], vals[2 * i]))) for i in range(len(vals) // 2)]
    return vals


def test_me_eval():
    for n in [5, 8, 16, 31]:
        xs, t = rand_tensor(n)
        r = fr_ops.ceil_log2(n)
        us, u = rand_tensor(r)
        got = fr.to_ints(np.asarray(fr_ops.me_eval(t, u))[None])[0]
        assert got == me_eval_host(xs, us)[0], n


def test_partial_me_window():
    # fold the outer axis of a (rows, w) tensor; inner window preserved
    w, rows = 4, 8
    xs, t = rand_tensor(rows * w)
    us, u = rand_tensor(3)  # ceil_log2(8) = 3
    got = fr.to_ints(np.asarray(fr_ops.partial_me(t, u, w)))
    # oracle: fold rows pairwise per column
    cols = [[xs[r * w + c] for r in range(rows)] for c in range(w)]
    exp = [me_eval_host(col, us)[0] for col in cols]
    assert got == exp


def test_partial_me_odd_rows():
    # 3 rows of width 2, one challenge: windows zero-padded like reference
    w, rows = 2, 3
    xs, t = rand_tensor(rows * w)
    us, u = rand_tensor(1)
    got = fr.to_ints(np.asarray(fr_ops.partial_me(t, u, w)))
    cols = [[xs[r * w + c] for r in range(rows)] for c in range(w)]
    # after 1 fold: 2 windows remain (row01 folded, row2 folded with 0)
    exp = []
    for wi in range(2):
        for c in range(w):
            col = cols[c] + [0]
            a0, a1 = col[2 * wi], col[2 * wi + 1]
            exp.append(HF.add(a0, HF.mul(us[0], HF.sub(a1, a0))))
    assert got == exp


def test_random_fr_in_range():
    key = jax.random.PRNGKey(0)
    t = fr_ops.random_fr(key, 256)
    vals = fr.to_ints(np.asarray(t))
    assert all(v < P for v in vals)
    assert len(set(vals)) == 256


def test_random_int_centered():
    key = jax.random.PRNGKey(1)
    t = fr_ops.random_int(key, 512, 8)
    vals = fr.to_ints(np.asarray(t))
    # values are in [-128, 127] mod p
    for v in vals:
        signed = v if v < 2**16 else v - P
        assert -128 <= signed <= 127
