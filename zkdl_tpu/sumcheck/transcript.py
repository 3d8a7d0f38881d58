"""Challenge generation: Fiat-Shamir transcript, reproducible RNG, and a
reference-compatible mt19937 stream.

The reference draws every challenge from a host Mersenne-Twister seeded by
random_device (random_vec, /root/reference/proof.cu:3-11) — non-reproducible and
not Fiat-Shamir. Here all three modes are deterministic and replicated (every
host derives identical challenges — the multi-host design's "communication-free
transcript", SURVEY.md §5.8):

- FiatShamir: BLAKE2s sponge over absorbed proof bytes; challenges depend on
  prior prover messages (fixes reference caveat §0.2).
- SeededRng: mt19937 with an explicit seed; exact replica of the reference's
  random_vec limb layout (8 uniform u32 draws, last one mod 1944954707), so a
  recorded reference transcript (seeds + streams) can be replayed bit-exactly.
- Replay: challenges loaded from a recorded file.

Challenges are produced as uint32[n, 8] Montgomery-representation Fr arrays
(the reference feeds raw mt19937 limbs directly into Montgomery-domain math, so
"the challenge" IS the Montgomery representation; we preserve that)."""

from __future__ import annotations

import hashlib
from typing import Iterable

import jax.numpy as jnp
import numpy as np

from ..field import fr

P_TOP = fr.P_TOP_LIMB


class MT19937:
    """Minimal mt19937-32 replica (C++ std::mt19937 compatible)."""

    N, M = 624, 397
    MATRIX_A = 0x9908B0DF
    UPPER, LOWER = 0x80000000, 0x7FFFFFFF

    def __init__(self, seed: int = 5489):
        self.mt = [0] * self.N
        self.mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self.N):
            self.mt[i] = (1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
        self.idx = self.N

    def next_u32(self) -> int:
        if self.idx >= self.N:
            for i in range(self.N):
                y = (self.mt[i] & self.UPPER) | (self.mt[(i + 1) % self.N] & self.LOWER)
                self.mt[i] = self.mt[(i + self.M) % self.N] ^ (y >> 1)
                if y & 1:
                    self.mt[i] ^= self.MATRIX_A
            self.idx = 0
        y = self.mt[self.idx]
        self.idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y


class ChallengeSource:
    def random_vec(self, n: int) -> jnp.ndarray:  # (n, 8) u32
        raise NotImplementedError

    def absorb(self, data: bytes) -> None:  # no-op outside Fiat-Shamir
        pass

    def absorb_array(self, arr) -> None:
        self.absorb(np.asarray(arr).tobytes())


class SeededRng(ChallengeSource):
    """random_vec-compatible stream (proof.cu:3-11): 8 u32 draws per element,
    last limb reduced mod the top limb of p."""

    def __init__(self, seed: int = 5489):
        self.rng = MT19937(seed)

    def random_vec(self, n: int) -> jnp.ndarray:
        out = np.empty((n, 8), dtype=np.uint32)
        for i in range(n):
            limbs = [self.rng.next_u32() for _ in range(8)]
            limbs[7] %= P_TOP
            out[i] = limbs
        return jnp.asarray(out)


class FiatShamir(ChallengeSource):
    """BLAKE2s-based sponge: state <- H(state || absorbed); squeeze counter-mode."""

    def __init__(self, label: bytes = b"zkdl-tpu-v1"):
        self.state = hashlib.blake2s(label).digest()
        self.counter = 0

    def absorb(self, data: bytes) -> None:
        self.state = hashlib.blake2s(self.state + data).digest()

    def random_vec(self, n: int) -> jnp.ndarray:
        out = np.empty((n, 8), dtype=np.uint32)
        for i in range(n):
            block = hashlib.blake2s(self.state + self.counter.to_bytes(8, "little")).digest()
            self.counter += 1
            limbs = np.frombuffer(block, dtype=np.uint32).copy()
            limbs[7] %= P_TOP
            out[i] = limbs
        return jnp.asarray(out)


class Replay(ChallengeSource):
    """Replays a recorded challenge stream (for bit-exact comparisons)."""

    def __init__(self, arrays: Iterable[np.ndarray]):
        self.arrays = [np.asarray(a, dtype=np.uint32).reshape(-1, 8) for a in arrays]
        self.pos = 0
        self.flat = np.concatenate(self.arrays) if self.arrays else np.zeros((0, 8), np.uint32)

    def random_vec(self, n: int) -> jnp.ndarray:
        out = self.flat[self.pos : self.pos + n]
        assert out.shape[0] == n, "replay stream exhausted"
        self.pos += n
        return jnp.asarray(out)
