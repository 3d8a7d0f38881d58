"""Typed runtime configuration (SURVEY.md §5.6 rebuild item).

The reference hardcodes every knob as a compile-time constant: thread counts
(fr-tensor.cuh:17, g1-tensor.cuh:11), tile width (zkfc.cuh:14), quantization
scale 2^16 (zkfc.cu:65), ReLU bit widths Q=32/R=16 (zkrelu.cu:74-77), GPU arch
(Makefile:15). Here the same knobs are one frozen dataclass, overridable per
process via environment variables (ZKDL_<FIELD>) or programmatically with
`configure(...)` before first use.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class Config:
    # quantization (zkfc.cu:65; zkrelu.cu:74-77)
    scale_bits: int = 16  # fixed-point scale 2^16
    relu_mag_bits: int = 32  # Q: rescaled-magnitude width
    relu_rem_bits: int = 16  # R: remainder width (15 magnitude + sign)

    # prover engine
    use_planar_prover: bool = True  # planar/pallas hot path (models/mlp.py)
    # committed-aux soundness tier: Pedersen-commit + open the ReLU witness
    # tensors (docs/SOUNDNESS.md gap #1); costs extra commit/open work per layer
    commit_aux: bool = False
    # hand-off size to the fused (n, 8) tail provers; -1 = auto per backend
    # (0 on TPU — planar rounds all the way; 1024 on CPU — scan tails)
    planar_tail_n: int = -1
    pallas_block_rows: int = 64  # sublane rows per pallas block (x128 lanes)
    dot_chunk: int = 1 << 13  # lazy-reduction chunk (overflow-safe <= 2^13)

    # multi-chip defaults (parallel/)
    mesh_dp: int = 0  # 0 = infer from jax.device_count()
    mesh_tp: int = 1

    # transcript
    fiat_shamir_label: bytes = b"zkdl-tpu-v1"

    @classmethod
    def from_env(cls) -> "Config":
        kwargs = {}
        for f in dataclasses.fields(cls):
            env = os.environ.get("ZKDL_" + f.name.upper())
            if env is None:
                continue
            if f.type in ("int", int):
                kwargs[f.name] = int(env)
            elif f.type in ("bool", bool):
                kwargs[f.name] = env.lower() not in ("0", "false", "")
            elif f.type in ("bytes", bytes):
                kwargs[f.name] = env.encode()
            else:
                kwargs[f.name] = env
        return cls(**kwargs)


_CONFIG: Config | None = None


def get() -> Config:
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = Config.from_env()
    return _CONFIG


def configure(**overrides) -> Config:
    """Set process-wide config (call before the first prover use)."""
    global _CONFIG
    base = get()
    _CONFIG = dataclasses.replace(base, **overrides)
    _apply(_CONFIG)
    return _CONFIG


def _apply(cfg: Config) -> None:
    """Propagate config into the modules that read module-level constants.

    Call `configure(...)` BEFORE the first prover/forward use: width and
    chunk knobs feed jitted kernels as static arguments or trace-time
    constants, so later reconfiguration of dot_chunk/pallas_block_rows can
    leave stale compiled graphs for already-used shapes."""
    from .field import pallas_fr, planar
    from .models import mlp, quantize, zkrelu
    from .sumcheck import planar_protocols

    mlp.USE_PLANAR_PROVER = cfg.use_planar_prover
    mlp.COMMIT_AUX = cfg.commit_aux
    planar_protocols.TAIL_N = cfg.planar_tail_n
    if (zkrelu.Q, zkrelu.R) != (cfg.relu_mag_bits, cfg.relu_rem_bits):
        zkrelu.set_widths(cfg.relu_mag_bits, cfg.relu_rem_bits)
    quantize.SCALE_BITS = cfg.scale_bits
    quantize.SCALE = 1 << cfg.scale_bits
    planar.DOT_CHUNK = cfg.dot_chunk
    pallas_fr.BLOCK_ROWS = cfg.pallas_block_rows
    pallas_fr.BLOCK = cfg.pallas_block_rows * 128
