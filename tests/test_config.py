"""Config wiring: every knob must actually reach its consumer (the r2 review
found most fields decorative — these tests pin the propagation)."""

import numpy as np
import jax
import jax.numpy as jnp

from zkdl_tpu import config
from zkdl_tpu.field import fr, pallas_fr, planar
from zkdl_tpu.models import mlp, quantize, zkrelu
from zkdl_tpu.sumcheck import planar_protocols


def _restore():
    config.configure(
        scale_bits=16, relu_mag_bits=32, relu_rem_bits=16,
        use_planar_prover=True, planar_tail_n=-1,
        pallas_block_rows=64, dot_chunk=1 << 13,
    )


def test_relu_width_knobs_change_prover_behavior():
    try:
        # x = 3 * 2^20: at Q=32/R=16 (threshold 2^47) this is positive with
        # mag_rescaled = 3*2^4; at Q=8/R=8 (threshold 2^15) it's out of range,
        # and the requant shift is 8 -> different Z and different aux widths.
        x = fr.mont(jnp.asarray(fr.from_ints([3 << 20])))
        z_default, aux_default = zkrelu.forward(x)
        assert aux_default["mag_bin"].shape[0] == 32

        config.configure(relu_mag_bits=16, relu_rem_bits=8)
        assert zkrelu.Q == 16 and zkrelu.R == 8 and zkrelu.SCALE_OUT_BITS == 8
        z_small, aux_small = zkrelu.forward(x)
        assert aux_small["mag_bin"].shape[0] == 16
        assert not np.array_equal(np.asarray(z_small), np.asarray(z_default))
        # semantics at the new widths: threshold 2^23, x = 3*2^20 positive,
        # rem = 0 -> mag_rescaled = 3 * 2^12
        v = fr.to_ints(np.asarray(fr.unmont(z_small)))[0]
        assert v == 3 << 12, v
    finally:
        _restore()


def test_engine_knobs_propagate():
    try:
        config.configure(use_planar_prover=False, planar_tail_n=64,
                         dot_chunk=1 << 8, pallas_block_rows=32)
        assert mlp.USE_PLANAR_PROVER is False
        assert planar_protocols.TAIL_N == 64
        assert planar.DOT_CHUNK == 1 << 8
        assert pallas_fr.BLOCK_ROWS == 32 and pallas_fr.BLOCK == 32 * 128
    finally:
        _restore()


def test_scale_bits_reach_quantizer():
    try:
        config.configure(scale_bits=8)
        q = quantize.float_to_fr(jnp.asarray(np.array([1.0], dtype=np.float32)))
        assert fr.to_ints(np.asarray(q).reshape(-1, 8))[0] == 1 << 8
    finally:
        _restore()
