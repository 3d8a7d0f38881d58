"""Blinded (hiding) Pedersen commitment tier.

The reference commitment has no hiding term (/root/reference/commitment.cu:29-41);
commit_blinded adds C_row = G^sigma * H^b with NUMS H. Pins: hiding (equal
tensors, different blinder keys -> different, unlinkable points), opening
correctness through the unblinding check, and rejection of a wrong blinder
fold.
"""

import jax
import jax.numpy as jnp
import numpy as np

from zkdl_tpu.commit import pedersen
from zkdl_tpu.field import fr
from zkdl_tpu.sumcheck import protocols as sc
from zkdl_tpu.tensor import fr_ops


def _setup(n=16):
    gens = pedersen.setup(jax.random.PRNGKey(3), 4)
    t = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(4), n))
    return gens, t


def test_blinded_commit_hides():
    gens, t = _setup()
    c1 = pedersen.commit_blinded(gens, t, jax.random.PRNGKey(10))
    c2 = pedersen.commit_blinded(gens, t, jax.random.PRNGKey(11))
    plain = pedersen.commit(gens, t)
    from zkdl_tpu.curve import convert

    a1 = convert.affine_from_device(c1.points)
    a2 = convert.affine_from_device(c2.points)
    ap = convert.affine_from_device(plain.points)
    assert a1 != a2, "same tensor, different blinders must differ"
    assert a1 != ap and a2 != ap, "blinded must differ from unblinded"


def test_blinded_open_verifies():
    gens, t = _setup()
    com = pedersen.commit_blinded(gens, t, jax.random.PRNGKey(10))
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(5), 4))
    proof, b_fold = pedersen.open_blinded(gens, t, com, u)
    u_ints = sc.scalars_to_ints(u)
    want = sc.scalars_to_ints(fr_ops.me_eval(t, u)[None])[0]
    ok, msg = pedersen.verify_open_blinded(
        proof, com.public, u_ints, sc.scalars_to_ints(b_fold[None])[0],
        expected_value=want,
    )
    assert ok, msg


def test_blinded_open_rejects_wrong_blinder_fold():
    gens, t = _setup()
    com = pedersen.commit_blinded(gens, t, jax.random.PRNGKey(10))
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(5), 4))
    proof, b_fold = pedersen.open_blinded(gens, t, com, u)
    u_ints = sc.scalars_to_ints(u)
    bad = (sc.scalars_to_ints(b_fold[None])[0] + 1) % fr.P_INT
    ok, msg = pedersen.verify_open_blinded(proof, com.public, u_ints, bad)
    assert not ok and "unblinded" in msg


def test_blinded_open_rejects_tampered_value():
    gens, t = _setup()
    com = pedersen.commit_blinded(gens, t, jax.random.PRNGKey(10))
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(5), 4))
    proof, b_fold = pedersen.open_blinded(gens, t, com, u)
    u_ints = sc.scalars_to_ints(u)
    want = sc.scalars_to_ints(fr_ops.me_eval(t, u)[None])[0]
    ok, msg = pedersen.verify_open_blinded(
        proof, com.public, u_ints, sc.scalars_to_ints(b_fold[None])[0],
        expected_value=(want + 1) % fr.P_INT,
    )
    assert not ok
