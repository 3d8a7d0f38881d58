"""Generic committed-witness binding (closes docs/SOUNDNESS.md known gap #1).

Every multi-proof circuit in this framework forwards MLE evaluation claims
between sub-proofs: a sumcheck reduces a statement about tensor T to "T's MLE
at point u equals y", and a *different* sub-proof (or the verifier's own
equation) consumes y. Without a binding layer a malicious prover may answer
each point with a different tensor. The reference has no counterpart — it
discards every proof unverified (/root/reference/zkfc.cu:139-144) — and the
MLP chain solves this with GKR-style point-anchoring (models/mlp.py). For the
attention/softmax circuit family, whose claim graph is a DAG rather than a
chain, this module provides the committed-witness tier instead:

  * the prover Pedersen-commits every witness tensor (Committer.commit) and
    absorbs all commitments into the transcript BEFORE the first challenge;
  * every forwarded claim (tensor, point, value) becomes a commitment opening
    (Committer.open) carried in the proof;
  * the verifier (Checker) validates each opening against the commitment and
    hands the now-*bound* value to the circuit equations.

Bit-tensor recombinations need no extra sumcheck: for a bit-decomposed tensor
B (bit index on the LOW log_w variables, element index high — the layout of
zkrelu._expand_aux and zksoftmax._bits_tensor), the fixed evaluation point
w with w_j = 2^(2^j) / (1 + 2^(2^j)) satisfies

    eq(w, k) = C * 2^k,   C = prod_j (1 - w_j) = prod_j 1/(1 + 2^(2^j)),

so ONE opening of B at (w || u) proves C * sum_k 2^k B_k(u) — the recombined
value at u, scaled by the public constant C (pow2_point). Similarly the
all-ones point extracts the single top bit row (top_point), which yields
signed recombinations (sign bit carries weight -2^(w-1)).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host
from ..tensor import fr_ops
from . import pedersen

HF = host.fr


# ---------------------------------------------------------------------------
# fixed recombination points
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def pow2_point(log_w: int) -> tuple[tuple[int, ...], int]:
    """((w_0..w_{log_w-1}) Montgomery ints, C Montgomery int) such that the
    eq-weights at w over k in [0, 2^log_w) are exactly C * 2^k."""
    pts = []
    c = HF.one_mont
    for j in range(log_w):
        two_pow = HF.mont(1 << (1 << j))
        denom_inv = HF.inv(HF.add(HF.one_mont, two_pow))
        pts.append(HF.mul(two_pow, denom_inv))
        c = HF.mul(c, denom_inv)
    return tuple(pts), c


@functools.lru_cache(maxsize=None)
def top_point(log_w: int) -> tuple[int, ...]:
    """All-ones point: eq-weights select the top bit row k = 2^log_w - 1."""
    return tuple(HF.one_mont for _ in range(log_w))


def _point_to_device(pts: tuple[int, ...]) -> jax.Array:
    # pts are Montgomery-representation ints (the codebase's int convention,
    # sc.scalars_to_ints); store their limbs verbatim.
    if not pts:
        return jnp.zeros((0, 8), dtype=jnp.uint32)
    return jnp.asarray(fr.from_ints(list(pts)))


@functools.lru_cache(maxsize=None)
def pow2_point_dev(log_w: int) -> jax.Array:
    return _point_to_device(pow2_point(log_w)[0])


@functools.lru_cache(maxsize=None)
def top_point_dev(log_w: int) -> jax.Array:
    return _point_to_device(top_point(log_w))


# ---------------------------------------------------------------------------
# prover side
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Opening:
    name: str  # committed tensor this opening is against
    point: jax.Array  # (r, 8) Montgomery, r == log2(padded size)
    proof: pedersen.FoldOpening


@dataclasses.dataclass
class WitnessSet:
    """The committed-witness payload carried inside a proof object."""

    coms: dict  # name -> pedersen.RowCommitments
    log_sizes: dict  # name -> log2 of the padded tensor size
    openings: dict  # label -> Opening


def _gens_for(log_n: int) -> pedersen.Generators:
    # NUMS generators: dlogs unknown to everyone (incl. the prover committing
    # its own witnesses), so the commitments are binding under DL. A PRNG-
    # derived vector (pedersen.aux_generators) would let any prover regenerate
    # the dlogs and open to arbitrary values.
    return pedersen.nums_generators(1 << ((log_n + 1) // 2))


class Committer:
    """Prover-side builder. Usage:

        wc = Committer()
        wc.commit("S", S)            # ... every witness tensor, BEFORE draws
        wc.absorb(challenges)
        ... run sub-proofs ...
        wc.open("sm.S@u_rec", "S", u_rec)   # one per forwarded claim
        proof.witness = wc.witness_set()
    """

    def __init__(self):
        self._tensors: dict[str, jax.Array] = {}
        self._gens: dict[str, pedersen.Generators] = {}
        self.coms: dict[str, pedersen.RowCommitments] = {}
        self.log_sizes: dict[str, int] = {}
        self.openings: dict[str, Opening] = {}
        self._absorbed = False

    def commit(self, name: str, t: jax.Array) -> None:
        assert name not in self.coms, f"duplicate witness {name}"
        assert not self._absorbed, "commit after absorb breaks the transcript"
        log_n = fr_ops.ceil_log2(t.shape[0])
        t = fr_ops.pad_to(t, 1 << log_n)
        gens = _gens_for(log_n)
        self._tensors[name] = t
        self._gens[name] = gens
        self.coms[name] = pedersen.commit(gens, t)
        self.log_sizes[name] = log_n

    def absorb(self, challenges) -> None:
        """Absorb every commitment (insertion order) before the first draw."""
        self._absorbed = True
        for name in self.coms:
            pts = self.coms[name].points
            challenges.absorb_array(pts.x)
            challenges.absorb_array(pts.y)
            challenges.absorb_array(pts.z)

    def open(self, label: str, name: str, point: jax.Array) -> jax.Array:
        """Open `name` at `point` ((log_n, 8) mont). Returns the opened MLE
        value ((8,) mont) — the MLE of the revealed fold at the point's low
        coordinates (== t's MLE at the full point)."""
        assert label not in self.openings, f"duplicate opening {label}"
        t, gens, com = self._tensors[name], self._gens[name], self.coms[name]
        assert point.shape[0] == self.log_sizes[name], (
            label, point.shape, self.log_sizes[name])
        proof = pedersen.open_reveal(gens, t, com, point)
        self.openings[label] = Opening(name, point, proof)
        log_gen = fr_ops.ceil_log2(gens.size)
        return fr_ops.me_eval(proof.t_folded, point[:log_gen])

    def open_recombined(self, label: str, name: str, u: jax.Array, log_w: int) -> None:
        """Open a bit tensor at (pow2_point || u): the opening value is
        C(log_w) * (recombined value at u)."""
        pt = jnp.concatenate([pow2_point_dev(log_w), u], axis=0)
        self.open(label, name, pt)

    def open_top_bit(self, label: str, name: str, u: jax.Array, log_w: int) -> None:
        """Open a bit tensor at (top_point || u): value = top bit row's MLE at u."""
        pt = jnp.concatenate([top_point_dev(log_w), u], axis=0)
        self.open(label, name, pt)

    def witness_set(self) -> WitnessSet:
        return WitnessSet(dict(self.coms), dict(self.log_sizes), dict(self.openings))


# ---------------------------------------------------------------------------
# verifier side
# ---------------------------------------------------------------------------


class Checker:
    """Validates openings lazily (each exactly once) and exposes bound values.

    Every accessor raises BindingError on a bad opening, a label/tensor
    mismatch, or a point mismatch — the caller converts that into a verify
    failure."""

    def __init__(self, ws: WitnessSet):
        self.ws = ws
        self._checked: set[str] = set()

    def value(self, label: str, name: str, point_ints: list[int]) -> int:
        """Bound MLE value of committed tensor `name` at `point_ints`
        (Montgomery ints, low variables first), proven by opening `label`.

        The generator vector is regenerated from len(point_ints) alone — no
        attacker-controlled size metadata decides which NUMS points bind the
        commitment."""
        op = self.ws.openings.get(label)
        if op is None:
            raise BindingError(f"missing opening {label}")
        if op.name != name:
            raise BindingError(f"{label}: opens {op.name}, expected {name}")
        got_pt = fr.to_ints(np.asarray(op.point).reshape(-1, 8))
        if got_pt != list(point_ints):
            raise BindingError(f"{label}: opened at a different point")
        log_gen = (len(point_ints) + 1) // 2
        if label not in self._checked:
            com = self.ws.coms.get(name)
            if com is None:
                # attacker-controlled dict: a missing commitment is a clean
                # rejection, not a KeyError crash
                raise BindingError(f"{label}: no commitment for {name}")
            gens = pedersen.nums_generators(1 << log_gen)
            ok, msg = pedersen.verify_reveal(op.proof, gens, com, got_pt)
            if not ok:
                raise BindingError(f"{label}: binding: {msg}")
            self._checked.add(label)
        value = fr_ops.me_eval(jnp.asarray(op.proof.t_folded), op.point[:log_gen])
        return fr.to_ints(np.asarray(value)[None])[0]

    def recombined(self, label: str, name: str, u_ints: list[int], log_w: int) -> int:
        """Bound recombined value sum_k 2^k B_k(u) of bit tensor `name`."""
        pts, c = pow2_point(log_w)
        raw = self.value(label, name, list(pts) + list(u_ints))
        return HF.mul(raw, HF.inv(c))

    def top_bit(self, label: str, name: str, u_ints: list[int], log_w: int) -> int:
        """Bound MLE value of the top bit row at u."""
        return self.value(label, name, list(top_point(log_w)) + list(u_ints))

    def require(self, label: str, name: str, point_ints: list[int],
                expected: int, what: str) -> None:
        """Check a forwarded claim equals the bound opening value."""
        got = self.value(label, name, point_ints)
        if got != expected:
            raise BindingError(f"{what}: claim != committed opening")


class BindingError(Exception):
    pass
