"""zkConv2D: quantized conv forward vs float oracle + prove/verify roundtrip."""

import jax
import numpy as np
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.models import quantize, zkconv
from zkdl_tpu.sumcheck.transcript import FiatShamir
from zkdl_tpu.tensor import fr_ops

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles; excluded from the smoke tier


def _float_conv(x, k, stride, pad):
    b, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (w + 2 * pad - kw) // stride + 1
    out = np.zeros((b, oh, ow, cout), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, k, axes=([1, 2, 3], [0, 1, 2]))
    return out


@pytest.mark.parametrize("pad,stride", [(0, 1), (1, 1), (1, 2)])
def test_conv_forward_matches_float(pad, stride):
    rng = np.random.default_rng(3)
    shape = zkconv.ConvShape(h=6, w=6, c_in=2, c_out=3, kh=3, kw=3, stride=stride, pad=pad)
    batch = 2
    x = (rng.standard_normal((batch, shape.h, shape.w, shape.c_in)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((shape.kh, shape.kw, shape.c_in, shape.c_out)) * 0.5).astype(np.float32)

    layer = zkconv.ZkConv2D.from_float(k, shape, jax.random.PRNGKey(0))
    # input as a flat (batch*H*W*C_in) field tensor at scale 2^16
    xq = quantize.float_to_fr(jax.numpy.asarray(x.reshape(-1)))
    X = fr.mont(xq.reshape(-1, 8))
    Z = layer(X, batch)

    out_p = layer.fc.out_size
    vals = fr.to_ints(np.asarray(fr.unmont(Z)))
    want = _float_conv(x.astype(np.float64), k.astype(np.float64), stride, pad)
    got = np.zeros((batch * shape.oh * shape.ow, out_p))
    for i, v in enumerate(vals):
        sv = v if v < fr.P_INT // 2 else v - fr.P_INT
        got[i // out_p, i % out_p] = sv / 2.0**32
    got = got[:, : shape.c_out].reshape(batch, shape.oh, shape.ow, shape.c_out)
    # quantization error: ~1e-4 per product term, patch_size terms
    assert np.max(np.abs(got - want)) < 1e-3


def test_conv_prove_verify():
    rng = np.random.default_rng(4)
    shape = zkconv.ConvShape(h=4, w=4, c_in=1, c_out=2, kh=3, kw=3, stride=1, pad=1)
    batch = 1
    x = (rng.standard_normal((batch, shape.h, shape.w, shape.c_in)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((shape.kh, shape.kw, shape.c_in, shape.c_out)) * 0.5).astype(np.float32)
    layer = zkconv.ZkConv2D.from_float(k, shape, jax.random.PRNGKey(1))
    X = fr.mont(quantize.float_to_fr(jax.numpy.asarray(x.reshape(-1))).reshape(-1, 8))
    Z = layer(X, batch)
    proof = layer.prove(X, Z, FiatShamir(), batch)
    ok, msg = layer.verify(proof)
    assert ok, msg


def test_conv_verify_rejects_tampered_output():
    rng = np.random.default_rng(5)
    shape = zkconv.ConvShape(h=4, w=4, c_in=1, c_out=2, kh=3, kw=3, stride=1, pad=0)
    batch = 1
    x = (rng.standard_normal((batch, shape.h, shape.w, shape.c_in)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((shape.kh, shape.kw, shape.c_in, shape.c_out)) * 0.5).astype(np.float32)
    layer = zkconv.ZkConv2D.from_float(k, shape, jax.random.PRNGKey(2))
    X = fr.mont(quantize.float_to_fr(jax.numpy.asarray(x.reshape(-1))).reshape(-1, 8))
    Z = layer(X, batch)
    Z_bad = fr.add(Z, fr.ones_mont((Z.shape[0],)))
    proof = layer.prove(X, Z_bad, FiatShamir(), batch)
    ok, _ = layer.verify(proof)
    assert not ok
