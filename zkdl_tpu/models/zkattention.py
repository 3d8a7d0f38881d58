"""zkAttention: verifiable quantized single-head attention block (NEW).

The reference proves only Linear+ReLU MLPs (/root/reference/README.md:12); this
extends the GKR/sumcheck circuit family to an attention block (BASELINE.json
config 5), reusing the framework's primitives end to end:

  Q~ = rescale(X @ Wq)        K~ = rescale(X @ Wk)       V~ = rescale(X @ Wv)
  S~ = rescale(Q~ @ K~^T)
  P  = softmax-aux(S~ / sqrt(d))      # prover-supplied, row-stochastic at 2^16
  O~ = rescale(P @ V~)
  Y  = rescale(O~ @ Wo)

Proof obligations per block (everything at fixed point, scale 2^16 between
stages so the signed-48-bit invariant of zkrelu.cu:18 always holds):
  1. Four committed-weight matmul sumchecks + Pedersen openings (zkfc.prove)
     for Wq, Wk, Wv, Wo.
  2. Two witness-witness matmul sumchecks (Q~K~^T and P V~) — the same
     inner-product sumcheck, no opening (both operands are prover activations
     whose claims chain into adjacent proofs).
  3. Five zkRescale proofs (binary sumchecks + recombination + Hadamard).
  4. Softmax well-formedness AND exp-consistency of P via the full
     quantized-softmax circuit proof (models/zksoftmax.py): argmax selection,
     48-bit distance decomposition, bucket clipping, a logUp exp-table lookup
     tying e = EXPTAB[d], the exact-division relation e*2^16 = P*E + r with
     range-proved remainders, and row-sum slack — the zkLLM-style lookup
     design. (The earlier range+normalization-only SoftmaxProof remains below
     for the cheap variant.)

Layout conventions match zkFC: matrices are row-major flattened (rows*cols, 8)
Montgomery tensors, dims padded to powers of two.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..commit import witness as wcommit
from ..field import fr
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from . import quantize, zkfc, zkrelu, zkrescale, zksoftmax

P_RANGE_BITS = 17  # P entries lie in [0, 2^16] — 17 bits cover the closed range


# ---------------------------------------------------------------------------
# softmax auxiliary-input generation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _softmax_aux_core(S: jax.Array, rows: int, cols: int, d_model: int):
    """S: (rows*cols, 8) mont at scale 2^16 (signed). Returns P (rows*cols, 8)
    mont at scale 2^16 with exact row sums of 2^16, plus raw u32 P values."""
    from ..field import mp

    x = fr.unmont(S)
    pos = mp._gte(jnp.broadcast_to(jnp.asarray(zkrelu._POS_MAX), x.shape), x)
    neg_mag = fr.neg(x)
    lo = jnp.where(pos, x[:, 0], neg_mag[:, 0])
    hi = jnp.where(pos, x[:, 1], neg_mag[:, 1])
    mag = lo.astype(jnp.float32) + hi.astype(jnp.float32) * jnp.float32(2.0**32)
    val = jnp.where(pos, mag, -mag) / jnp.float32(quantize.SCALE)
    logits = (val / jnp.float32(np.sqrt(d_model))).reshape(rows, cols)

    # stable softmax
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - mx)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    q = jnp.floor(p * jnp.float32(quantize.SCALE)).astype(jnp.int32)  # (rows, cols)
    resid = jnp.int32(quantize.SCALE) - jnp.sum(q, axis=1)  # >= 0
    am = jnp.argmax(q, axis=1)
    q = q + (jax.nn.one_hot(am, cols, dtype=jnp.int32) * resid[:, None])
    q = q.astype(jnp.uint32)
    P = fr.mont(fr_ops.from_u32(q.reshape(-1)))
    return P, q


def softmax_aux(S: jax.Array, rows: int, cols: int, d_model: int,
                real_rows: int | None = None):
    """Generate the prover's P. Padding rows (>= real_rows) are replaced by
    2^16 * e_0 so every row of the padded matrix sums to exactly 2^16."""
    P, q = _softmax_aux_core(S, rows, cols, d_model)
    if real_rows is not None and real_rows < rows:
        q = np.asarray(q)
        q[real_rows:] = 0
        q[real_rows:, 0] = quantize.SCALE
        P = fr.mont(fr_ops.from_u32(jnp.asarray(q.reshape(-1))))
    return P, np.asarray(q)


@jax.jit
def p_range_bits(P: jax.Array) -> jax.Array:
    """17-bit LSB-first decomposition of P's raw values -> (n*17, 8) bit tensor
    (field elements), for the binary sumcheck + recombination fold."""
    n = P.shape[0]
    vals = fr.unmont(P)[:, 0]  # entries < 2^17 live in limb 0
    shifts = jnp.arange(P_RANGE_BITS, dtype=jnp.uint32)
    bits = (vals[:, None] >> shifts) & jnp.uint32(1)
    return fr.select(
        (bits == 1).reshape(-1),
        fr.ones_mont((n * P_RANGE_BITS,)),
        fr.zeros((n * P_RANGE_BITS,)),
    )


# ---------------------------------------------------------------------------
# witness-witness matmul sumcheck (no commitment opening)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MatmulProof:
    u_rows: jax.Array
    u_k: jax.Array
    u_cols: jax.Array
    ip_polys: jax.Array  # (log k, 3, 8)
    ip_finals: jax.Array  # (2, 8): A'(u_k), B'(u_k)
    z_claim: jax.Array  # (8,) C(u_cols || u_rows)


def matmul_prove(A: jax.Array, B: jax.Array, C: jax.Array,
                 rows: int, k: int, cols: int, challenges: ChallengeSource) -> MatmulProof:
    """Prove C = A @ B for prover-known A (rows x k) and B (k x cols), all
    row-major flattened Montgomery tensors. Identical round structure to
    zkFC::prove (zkfc.cu:128-145) minus the Pedersen opening."""
    u_rows = challenges.random_vec(fr_ops.ceil_log2(rows))
    u_k = challenges.random_vec(fr_ops.ceil_log2(k))
    u_cols = challenges.random_vec(fr_ops.ceil_log2(cols))
    ip_polys, ip_finals, z_claim = zkfc._fc_prove_core(
        A, B, C, u_rows, u_k, u_cols, k, cols
    )
    challenges.absorb_array(ip_polys)
    challenges.absorb_array(z_claim)
    return MatmulProof(u_rows, u_k, u_cols, ip_polys, ip_finals, z_claim)


def matmul_verify(proof: MatmulProof) -> tuple[bool, str]:
    u_k = sc.scalars_to_ints(proof.u_k)
    claim = sc.scalars_to_ints(proof.z_claim[None])[0]
    res = sc.inner_product_verify(sc.polys_to_ints(proof.ip_polys), u_k, claim)
    if not res.ok:
        return False, res.reason
    fa, fb = sc.scalars_to_ints(proof.ip_finals)
    if not sc.inner_product_check_final(res, fa, fb):
        return False, "final product mismatch"
    return True, ""


# ---------------------------------------------------------------------------
# softmax well-formedness proof
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SoftmaxProof:
    # range: binary sumcheck over the 17-bit decomposition + recombination fold
    u_bin: jax.Array
    v_bin: jax.Array
    bin_polys: jax.Array
    bin_final: jax.Array
    u_rec: jax.Array
    bits_at_u: jax.Array  # (17, 8) recombination claims
    # normalization: <P(u_row, .), 1> == 2^16
    u_row: jax.Array
    u_col: jax.Array
    ip_polys: jax.Array
    ip_finals: jax.Array  # (2, 8): P'(u_col), 1


@functools.partial(jax.jit, static_argnums=(7,))
def _softmax_prove_core(P, bits, u_bin, v_bin, u_rec, u_row, u_col, cols):
    bin_polys, bin_final = sc.binary_prove_scan(bits, u_bin, v_bin)
    bits_at_u = fr_ops.partial_me(bits, u_rec, P_RANGE_BITS)
    P_row_folded = fr_ops.partial_me(P, u_row, cols)
    ones = fr.ones_mont((cols,))
    ip_polys, ip_finals = sc.inner_product_prove_scan(P_row_folded, ones, u_col)
    return bin_polys, bin_final, bits_at_u, ip_polys, ip_finals


def softmax_prove(P: jax.Array, rows: int, cols: int, challenges: ChallengeSource) -> SoftmaxProof:
    n = rows * cols
    log_n = fr_ops.ceil_log2(n)
    bits = p_range_bits(P)
    u_bin = challenges.random_vec(log_n + 5)  # 16n < 17n <= 32n = 2^(log_n+5)
    v_bin = challenges.random_vec(log_n + 5)
    u_rec = challenges.random_vec(log_n)
    u_row = challenges.random_vec(fr_ops.ceil_log2(rows))
    u_col = challenges.random_vec(fr_ops.ceil_log2(cols))
    bin_polys, bin_final, bits_at_u, ip_polys, ip_finals = _softmax_prove_core(
        P, bits, u_bin, v_bin, u_rec, u_row, u_col, cols
    )
    proof = SoftmaxProof(u_bin, v_bin, bin_polys, bin_final, u_rec, bits_at_u,
                         u_row, u_col, ip_polys, ip_finals)
    challenges.absorb_array(bin_polys)
    challenges.absorb_array(ip_polys)
    return proof


def softmax_verify(proof: SoftmaxProof) -> tuple[bool, str]:
    from ..field import host

    HF = host.fr
    res = sc.binary_verify(
        sc.polys_to_ints(proof.bin_polys),
        sc.scalars_to_ints(proof.u_bin),
        sc.scalars_to_ints(proof.v_bin),
        sc.scalars_to_ints(proof.bin_final[None])[0],
    )
    if not res.ok:
        return False, "range: " + res.reason
    # normalization: the initial sum claim must be exactly mont(2^16)
    want = HF.mont(quantize.SCALE)
    res = sc.inner_product_verify(
        sc.polys_to_ints(proof.ip_polys), sc.scalars_to_ints(proof.u_col), want
    )
    if not res.ok:
        return False, "norm: " + res.reason
    fa, fb = sc.scalars_to_ints(proof.ip_finals)
    if fb != HF.one_mont:
        return False, "norm: ones-vector final != 1"
    if not sc.inner_product_check_final(res, fa, fb):
        return False, "norm: final product mismatch"
    return True, ""


# ---------------------------------------------------------------------------
# the attention block
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ZkAttention:
    """Single-head attention block with committed projection weights.
    seq and d_model must be powers of two (pad upstream like everything else)."""

    seq: int
    d_model: int
    wq: zkfc.ZkFC
    wk: zkfc.ZkFC
    wv: zkfc.ZkFC
    wo: zkfc.ZkFC

    @classmethod
    def from_float(cls, seq: int, wq: np.ndarray, wk: np.ndarray, wv: np.ndarray,
                   wo: np.ndarray, key: jax.Array) -> "ZkAttention":
        keys = jax.random.split(key, 4)
        fcs = [zkfc.ZkFC.from_float(w, k) for w, k in zip((wq, wk, wv, wo), keys)]
        d = fcs[0].in_size
        assert all(f.in_size == d and f.out_size == d for f in fcs)
        return cls(seq, d, *fcs)

    def forward(self, X: jax.Array):
        """X: (seq*d_model, 8) mont at scale 2^16. Returns (Y, trace dict with
        every intermediate + rescale aux — the witness for prove())."""
        s, d = self.seq, self.d_model
        tr: dict = {"X": X}
        Qr = self.wq(X); tr["Q_raw"] = Qr
        Q, tr["q_aux"] = zkrescale.forward(Qr); tr["Q"] = Q
        Kr = self.wk(X); tr["K_raw"] = Kr
        K, tr["k_aux"] = zkrescale.forward(Kr); tr["K"] = K
        Vr = self.wv(X); tr["V_raw"] = Vr
        V, tr["v_aux"] = zkrescale.forward(Vr); tr["V"] = V

        Kt = _transpose(K, s, d)
        tr["Kt"] = Kt
        # witness-witness matmul: S_raw = Q (s x d) @ K^T (d x s), scale 2^32
        Sr = zkfc.field_matmul_jit(Q, Kt, d, s); tr["S_raw"] = Sr
        S, tr["s_aux"] = zkrescale.forward(Sr); tr["S"] = S

        wit = zksoftmax.softmax_witness(S, s, s, d)
        P = wit["P_mont"]
        tr["P"] = P; tr["P_raw_vals"] = wit["P"].reshape(s, s); tr["sm_wit"] = wit

        Or = zkfc.field_matmul_jit(P, V, s, d); tr["O_raw"] = Or
        O, tr["o_aux"] = zkrescale.forward(Or); tr["O"] = O

        Yr = self.wo(O); tr["Y_raw"] = Yr
        Y, tr["y_aux"] = zkrescale.forward(Yr); tr["Y"] = Y
        return Y, tr

    def prove(self, tr: dict, challenges: ChallengeSource,
              commit_witness: bool = False) -> "ZkAttentionProof":
        s, d = self.seq, self.d_model
        if not commit_witness:
            fc_q = zkfc.prove(self.wq, tr["X"], tr["Q_raw"], challenges)
            rs_q = zkrescale.prove(tr["Q_raw"], tr["q_aux"], challenges)
            fc_k = zkfc.prove(self.wk, tr["X"], tr["K_raw"], challenges)
            rs_k = zkrescale.prove(tr["K_raw"], tr["k_aux"], challenges)
            fc_v = zkfc.prove(self.wv, tr["X"], tr["V_raw"], challenges)
            rs_v = zkrescale.prove(tr["V_raw"], tr["v_aux"], challenges)
            mm_s = matmul_prove(tr["Q"], tr["Kt"], tr["S_raw"], s, d, s, challenges)
            rs_s = zkrescale.prove(tr["S_raw"], tr["s_aux"], challenges)
            sm = zksoftmax.prove(tr["S"], tr["sm_wit"], s, s, d, challenges)
            mm_o = matmul_prove(tr["P"], tr["V"], tr["O_raw"], s, s, d, challenges)
            rs_o = zkrescale.prove(tr["O_raw"], tr["o_aux"], challenges)
            fc_y = zkfc.prove(self.wo, tr["O"], tr["Y_raw"], challenges)
            rs_y = zkrescale.prove(tr["Y_raw"], tr["y_aux"], challenges)
            return ZkAttentionProof(fc_q, rs_q, fc_k, rs_k, fc_v, rs_v,
                                    mm_s, rs_s, sm, mm_o, rs_o, fc_y, rs_y)

        # --- committed-witness tier -------------------------------------
        # Commit EVERY intermediate tensor + rescale/softmax aux before the
        # first challenge; every forwarded claim in the proof DAG becomes a
        # verified Pedersen opening (commit/witness.py module docstring).
        wc = wcommit.Committer()
        for nm in ("X", "Q_raw", "Q", "K_raw", "K", "V_raw", "V",
                   "S_raw", "S", "O_raw", "O", "Y_raw", "Y"):
            wc.commit(f"at.{nm}", tr[nm])
        for tag in ("q", "k", "v", "s", "o", "y"):
            zkrescale.commit_witness(wc, tr[f"{tag}_aux"], f"at.{tag}.")
        zksoftmax.commit_witness(wc, tr["S"], tr["sm_wit"], s, s,
                                 prefix="at.sm.", s_name="at.S")
        wc.absorb(challenges)

        def fc_open(tag, proof_fc, x_name, z_name):
            wc.open(f"at.{tag}.fa", x_name,
                    jnp.concatenate([proof_fc.u_in, proof_fc.u_bs], axis=0))
            wc.open(f"at.{tag}.z", z_name,
                    jnp.concatenate([proof_fc.u_out, proof_fc.u_bs], axis=0))

        def mm_open(tag, proof_mm, a_name, b_name, c_name, b_transposed):
            # When the right operand entered the matmul TRANSPOSED (K^T), its
            # MLE point in terms of the committed row-major tensor has its
            # halves swapped: Kt(u_cols||u_k) == K(u_k||u_cols).
            wc.open(f"at.{tag}.fa", a_name,
                    jnp.concatenate([proof_mm.u_k, proof_mm.u_rows], axis=0))
            b_pt = ([proof_mm.u_k, proof_mm.u_cols] if b_transposed
                    else [proof_mm.u_cols, proof_mm.u_k])
            wc.open(f"at.{tag}.fb", b_name, jnp.concatenate(b_pt, axis=0))
            wc.open(f"at.{tag}.z", c_name,
                    jnp.concatenate([proof_mm.u_cols, proof_mm.u_rows], axis=0))

        fc_q = zkfc.prove(self.wq, tr["X"], tr["Q_raw"], challenges)
        fc_open("fc_q", fc_q, "at.X", "at.Q_raw")
        rs_q = zkrescale.prove_committed(tr["Q_raw"], tr["Q"], tr["q_aux"],
                                         wc, "at.q.", challenges, "at.Q_raw", "at.Q")
        fc_k = zkfc.prove(self.wk, tr["X"], tr["K_raw"], challenges)
        fc_open("fc_k", fc_k, "at.X", "at.K_raw")
        rs_k = zkrescale.prove_committed(tr["K_raw"], tr["K"], tr["k_aux"],
                                         wc, "at.k.", challenges, "at.K_raw", "at.K")
        fc_v = zkfc.prove(self.wv, tr["X"], tr["V_raw"], challenges)
        fc_open("fc_v", fc_v, "at.X", "at.V_raw")
        rs_v = zkrescale.prove_committed(tr["V_raw"], tr["V"], tr["v_aux"],
                                         wc, "at.v.", challenges, "at.V_raw", "at.V")
        mm_s = matmul_prove(tr["Q"], tr["Kt"], tr["S_raw"], s, d, s, challenges)
        mm_open("mm_s", mm_s, "at.Q", "at.K", "at.S_raw", b_transposed=True)
        rs_s = zkrescale.prove_committed(tr["S_raw"], tr["S"], tr["s_aux"],
                                         wc, "at.s.", challenges, "at.S_raw", "at.S")
        sm = zksoftmax.prove(tr["S"], tr["sm_wit"], s, s, d, challenges,
                             witness=wc, prefix="at.sm.", s_name="at.S")
        mm_o = matmul_prove(tr["P"], tr["V"], tr["O_raw"], s, s, d, challenges)
        mm_open("mm_o", mm_o, "at.sm.P", "at.V", "at.O_raw", b_transposed=False)
        rs_o = zkrescale.prove_committed(tr["O_raw"], tr["O"], tr["o_aux"],
                                         wc, "at.o.", challenges, "at.O_raw", "at.O")
        fc_y = zkfc.prove(self.wo, tr["O"], tr["Y_raw"], challenges)
        fc_open("fc_y", fc_y, "at.O", "at.Y_raw")
        rs_y = zkrescale.prove_committed(tr["Y_raw"], tr["Y"], tr["y_aux"],
                                         wc, "at.y.", challenges, "at.Y_raw", "at.Y")

        # public anchors: the committed X / Y are opened at fresh points the
        # verifier re-evaluates against the claimed public tensors
        u_x = challenges.random_vec(fr_ops.ceil_log2(tr["X"].shape[0]))
        wc.open("at.X@anchor", "at.X", u_x)
        u_y = challenges.random_vec(fr_ops.ceil_log2(tr["Y"].shape[0]))
        wc.open("at.Y@anchor", "at.Y", u_y)

        return ZkAttentionProof(fc_q, rs_q, fc_k, rs_k, fc_v, rs_v,
                                mm_s, rs_s, sm, mm_o, rs_o, fc_y, rs_y,
                                witness=wc.witness_set(), u_x=u_x, u_y=u_y)

    def verify(self, proof: "ZkAttentionProof",
               X: jax.Array | None = None,
               Y: jax.Array | None = None,
               transcript: ChallengeSource | None = None) -> tuple[bool, str]:
        """Verify the block proof. Committed-witness proofs additionally bind
        every forwarded claim to the witness commitments and (when X/Y are
        given) anchor the committed input/output to the public tensors.

        transcript: a FRESH ChallengeSource of the prove-time mode. When
        given (committed proofs only), the verifier re-derives the entire
        challenge stream — witness-commitment absorption in canonical order,
        every draw, every message absorb — and rejects any proof whose
        challenge vectors weren't transcript-derived. Without it, evaluation
        points are trusted from the proof (tamper evidence, not soundness
        against a malicious prover)."""
        if transcript is not None:
            if proof.witness is None:
                return False, "transcript replay requires a committed-witness proof"
            err = self._replay_transcript(proof, transcript)
            if err:
                return False, f"transcript: {err}"
        if proof.witness is not None:
            return self._verify_committed(proof, X, Y)
        if X is not None or Y is not None:
            return False, "public anchors require a committed-witness proof"
        checks = [
            ("fc_q", lambda: zkfc.verify(self.wq.com, proof.fc_q)),
            ("rs_q", lambda: zkrescale.verify(proof.rs_q)),
            ("fc_k", lambda: zkfc.verify(self.wk.com, proof.fc_k)),
            ("rs_k", lambda: zkrescale.verify(proof.rs_k)),
            ("fc_v", lambda: zkfc.verify(self.wv.com, proof.fc_v)),
            ("rs_v", lambda: zkrescale.verify(proof.rs_v)),
            ("mm_s", lambda: matmul_verify(proof.mm_s)),
            ("rs_s", lambda: zkrescale.verify(proof.rs_s)),
            ("softmax", lambda: zksoftmax.verify(proof.sm)),
            ("mm_o", lambda: matmul_verify(proof.mm_o)),
            ("rs_o", lambda: zkrescale.verify(proof.rs_o)),
            ("fc_y", lambda: zkfc.verify(self.wo.com, proof.fc_y)),
            ("rs_y", lambda: zkrescale.verify(proof.rs_y)),
        ]
        for name, check in checks:
            ok, msg = check()
            if not ok:
                return False, f"{name}: {msg}"
        return True, ""

    def _replay_transcript(self, proof: "ZkAttentionProof",
                           transcript: ChallengeSource) -> str | None:
        """Mirror the committed prove() draw/absorb schedule exactly:
        commitments (canonical insertion order), then per stage the sub-proof
        draws and message absorbs (fc: u_bs/u_in/u_out + ip_polys/z_claim;
        rescale: the 7 zkReLU draws + polys, then u1/v1 + sa_polys, u2/v2 +
        sm_polys; matmul: u_rows/u_k/u_cols + ip_polys/z_claim; softmax:
        zksoftmax.replay_transcript), finally the u_x/u_y public anchors.
        Openings never touch the transcript."""
        s = self.seq
        names = ["at.X", "at.Q_raw", "at.Q", "at.K_raw", "at.K", "at.V_raw",
                 "at.V", "at.S_raw", "at.S", "at.O_raw", "at.O", "at.Y_raw", "at.Y"]
        for tag in ("q", "k", "v", "s", "o", "y"):
            names += [f"at.{tag}.{x}" for x in ("sign", "mag", "rem", "abs")]
        names += zksoftmax.witness_names(s, s, prefix="at.sm.", s_name="at.S")
        err = zksoftmax.absorb_witness_coms(transcript, proof.witness, names)
        if err:
            return err

        def draw_eq(tag, stored):
            arr = np.asarray(stored).reshape(-1, 8)
            got = np.asarray(transcript.random_vec(arr.shape[0]))
            return None if np.array_equal(got, arr) else f"{tag} not transcript-derived"

        def fc_rp(tag, p):
            e = draw_eq(f"{tag}.u_bs", p.u_bs) or draw_eq(f"{tag}.u_in", p.u_in) \
                or draw_eq(f"{tag}.u_out", p.u_out)
            if e:
                return e
            transcript.absorb_array(p.ip_polys)
            transcript.absorb_array(p.z_claim)
            return None

        def mm_rp(tag, p):
            e = draw_eq(f"{tag}.u_rows", p.u_rows) or draw_eq(f"{tag}.u_k", p.u_k) \
                or draw_eq(f"{tag}.u_cols", p.u_cols)
            if e:
                return e
            transcript.absorb_array(p.ip_polys)
            transcript.absorb_array(p.z_claim)
            return None

        def rs_rp(tag, p):
            b = p.base
            for nm, st in (("u_z", b.u_z_bin), ("v_z", b.v_z_bin),
                           ("u_r", b.u_r_bin), ("v_r", b.v_r_bin),
                           ("u_rec", b.u_recover), ("u_hp", b.u_hp),
                           ("v_hp", b.v_hp)):
                e = draw_eq(f"{tag}.{nm}", st)
                if e:
                    return e
            transcript.absorb_array(b.mag_polys)
            transcript.absorb_array(b.rem_polys)
            transcript.absorb_array(b.hp_polys)
            e = draw_eq(f"{tag}.u1", p.u1) or draw_eq(f"{tag}.v1", p.v1)
            if e:
                return e
            transcript.absorb_array(p.sa_polys)
            e = draw_eq(f"{tag}.u2", p.u2) or draw_eq(f"{tag}.v2", p.v2)
            if e:
                return e
            transcript.absorb_array(p.sm_polys)
            return None

        err = fc_rp("fc_q", proof.fc_q) or rs_rp("rs_q", proof.rs_q) \
            or fc_rp("fc_k", proof.fc_k) or rs_rp("rs_k", proof.rs_k) \
            or fc_rp("fc_v", proof.fc_v) or rs_rp("rs_v", proof.rs_v) \
            or mm_rp("mm_s", proof.mm_s) or rs_rp("rs_s", proof.rs_s) \
            or zksoftmax.replay_transcript(proof.sm, transcript) \
            or mm_rp("mm_o", proof.mm_o) or rs_rp("rs_o", proof.rs_o) \
            or fc_rp("fc_y", proof.fc_y) or rs_rp("rs_y", proof.rs_y)
        if err:
            return err
        if proof.u_x is None or proof.u_y is None:
            return "missing public anchor points"
        return draw_eq("u_x", proof.u_x) or draw_eq("u_y", proof.u_y)

    def _verify_committed(self, proof: "ZkAttentionProof",
                          X: jax.Array | None,
                          Y: jax.Array | None) -> tuple[bool, str]:
        from ..field import host

        HF = host.fr
        ck = wcommit.Checker(proof.witness)
        ints = sc.scalars_to_ints

        def fc_bind(tag, fc_proof, com, x_name, z_name):
            ok, msg = zkfc.verify(com, fc_proof)
            if not ok:
                return f"{tag}: {msg}"
            fa = ints(fc_proof.ip_finals)[0]
            try:
                ck.require(f"at.{tag}.fa", x_name,
                           ints(fc_proof.u_in) + ints(fc_proof.u_bs), fa,
                           f"{tag} input final")
                ck.require(f"at.{tag}.z", z_name,
                           ints(fc_proof.u_out) + ints(fc_proof.u_bs),
                           ints(fc_proof.z_claim[None])[0], f"{tag} output claim")
            except wcommit.BindingError as e:
                return f"{tag}: {e}"
            return None

        def mm_bind(tag, mm_proof, a_name, b_name, c_name, b_transposed):
            ok, msg = matmul_verify(mm_proof)
            if not ok:
                return f"{tag}: {msg}"
            fa, fb = ints(mm_proof.ip_finals)
            b_pt = (ints(mm_proof.u_k) + ints(mm_proof.u_cols) if b_transposed
                    else ints(mm_proof.u_cols) + ints(mm_proof.u_k))
            try:
                ck.require(f"at.{tag}.fa", a_name,
                           ints(mm_proof.u_k) + ints(mm_proof.u_rows), fa,
                           f"{tag} left final")
                ck.require(f"at.{tag}.fb", b_name, b_pt, fb, f"{tag} right final")
                ck.require(f"at.{tag}.z", c_name,
                           ints(mm_proof.u_cols) + ints(mm_proof.u_rows),
                           ints(mm_proof.z_claim[None])[0], f"{tag} output claim")
            except wcommit.BindingError as e:
                return f"{tag}: {e}"
            return None

        steps = [
            fc_bind("fc_q", proof.fc_q, self.wq.com, "at.X", "at.Q_raw"),
            zkrescale.verify_committed(proof.rs_q, ck, "at.q.", "at.Q_raw", "at.Q"),
            fc_bind("fc_k", proof.fc_k, self.wk.com, "at.X", "at.K_raw"),
            zkrescale.verify_committed(proof.rs_k, ck, "at.k.", "at.K_raw", "at.K"),
            fc_bind("fc_v", proof.fc_v, self.wv.com, "at.X", "at.V_raw"),
            zkrescale.verify_committed(proof.rs_v, ck, "at.v.", "at.V_raw", "at.V"),
            mm_bind("mm_s", proof.mm_s, "at.Q", "at.K", "at.S_raw", True),
            zkrescale.verify_committed(proof.rs_s, ck, "at.s.", "at.S_raw", "at.S"),
            zksoftmax.verify(proof.sm, checker=ck, prefix="at.sm.", s_name="at.S"),
            mm_bind("mm_o", proof.mm_o, "at.sm.P", "at.V", "at.O_raw", False),
            zkrescale.verify_committed(proof.rs_o, ck, "at.o.", "at.O_raw", "at.O"),
            fc_bind("fc_y", proof.fc_y, self.wo.com, "at.O", "at.Y_raw"),
            zkrescale.verify_committed(proof.rs_y, ck, "at.y.", "at.Y_raw", "at.Y"),
        ]
        names = ["fc_q", "rs_q", "fc_k", "rs_k", "fc_v", "rs_v", "mm_s",
                 "rs_s", "softmax", "mm_o", "rs_o", "fc_y", "rs_y"]
        for name, res in zip(names, steps):
            if res is None:
                continue
            if isinstance(res, tuple):
                ok, msg = res
                if not ok:
                    return False, f"{name}: {msg}"
            else:
                return False, str(res)

        # public anchors
        try:
            if X is not None:
                want = ints(fr_ops.me_eval(X, proof.u_x)[None])[0]
                got = ck.value("at.X@anchor", "at.X", ints(proof.u_x))
                if got != want:
                    return False, "public X anchor mismatch"
            else:
                ck.value("at.X@anchor", "at.X", ints(proof.u_x))
            if Y is not None:
                want = ints(fr_ops.me_eval(Y, proof.u_y)[None])[0]
                got = ck.value("at.Y@anchor", "at.Y", ints(proof.u_y))
                if got != want:
                    return False, "public Y anchor mismatch"
        except wcommit.BindingError as e:
            return False, f"anchor: {e}"
        return True, ""


@dataclasses.dataclass
class ZkAttentionProof:
    fc_q: zkfc.ZkFCProof
    rs_q: zkrelu.ZkReluProof
    fc_k: zkfc.ZkFCProof
    rs_k: zkrelu.ZkReluProof
    fc_v: zkfc.ZkFCProof
    rs_v: zkrelu.ZkReluProof
    mm_s: MatmulProof
    rs_s: zkrelu.ZkReluProof
    sm: "zksoftmax.ZkSoftmaxProof"
    mm_o: MatmulProof
    rs_o: zkrelu.ZkReluProof
    fc_y: zkfc.ZkFCProof
    rs_y: zkrelu.ZkReluProof
    # committed-witness tier (None = claim-forwarding mode); in committed
    # proofs the rs_* fields hold zkrescale.RescaleBinding objects instead
    witness: "wcommit.WitnessSet | None" = None
    u_x: jax.Array | None = None  # public-input anchor point
    u_y: jax.Array | None = None  # public-output anchor point

    def block_until_ready(self):
        rs = self.rs_y
        jax.block_until_ready(rs.hp_polys if hasattr(rs, "hp_polys") else rs.base.hp_polys)
        return self


@functools.partial(jax.jit, static_argnums=(1, 2))
def _transpose(M: jax.Array, rows: int, cols: int) -> jax.Array:
    return M.reshape(rows, cols, 8).transpose(1, 0, 2).reshape(rows * cols, 8)
