"""Pedersen commitment tests: commit correctness vs oracle, open/verify
round-trip, tamper rejection."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkdl_tpu.commit import pedersen
from zkdl_tpu.curve import convert, g1, host_g1
from zkdl_tpu.field import fr, host
from zkdl_tpu.sumcheck import protocols as sc
from zkdl_tpu.tensor import fr_ops

HF = host.fr


def setup_gens(n, seed=0):
    return pedersen.setup(jax.random.PRNGKey(seed), n)


def test_commit_matches_oracle():
    gen_size, m = 4, 2
    gens = setup_gens(gen_size)
    xs = [random.randrange(fr.P_INT) for _ in range(gen_size * m)]
    t = jnp.asarray(fr.from_ints(xs))  # mont-form elements with value unmont(x)
    com = pedersen.commit(gens, t)
    gen_pts = convert.jac_from_device(gens)
    com_pts = convert.jac_from_device(com)
    for row in range(m):
        exp = host_g1.IDENTITY
        for i in range(gen_size):
            s = HF.unmont(xs[row * gen_size + i])
            exp = host_g1.add(exp, host_g1.scalar_mul(gen_pts[i], s))
        assert host_g1.eq_points(com_pts[row], exp), row


def test_open_verify_roundtrip():
    gen_size, m = 4, 4  # t size 16, u length 4 (2 row bits + 2 in bits)
    gens = setup_gens(gen_size, seed=1)
    xs = [random.randrange(fr.P_INT) for _ in range(gen_size * m)]
    t = jnp.asarray(fr.from_ints(xs))
    com = pedersen.commit(gens, t)
    us = [random.randrange(fr.P_INT) for _ in range(4)]
    u = jnp.asarray(fr.from_ints(us))
    proof = pedersen.open(gens, t, com, u)
    ok, msg = pedersen.verify_open(proof, us)
    assert ok, msg
    ok, msg = pedersen.verify_open_against_com(proof, com, us)
    assert ok, msg
    # final scalar == MLE of t at u
    from tests.test_sumcheck import mle_host

    assert sc.scalars_to_ints(proof.final_scalar[None])[0] == mle_host(xs, us)


def test_open_rejects_tampered_final():
    gen_size, m = 4, 2
    gens = setup_gens(gen_size, seed=2)
    xs = [random.randrange(fr.P_INT) for _ in range(gen_size * m)]
    t = jnp.asarray(fr.from_ints(xs))
    com = pedersen.commit(gens, t)
    us = [random.randrange(fr.P_INT) for _ in range(3)]
    u = jnp.asarray(fr.from_ints(us))
    proof = pedersen.open(gens, t, com, u)
    bad = jnp.asarray(fr.from_ints([HF.add(sc.scalars_to_ints(proof.final_scalar[None])[0], HF.one_mont)]))[0]
    proof.final_scalar = bad
    ok, _ = pedersen.verify_open(proof, us)
    assert not ok


def test_open_rejects_wrong_commitment():
    gen_size, m = 4, 2
    gens = setup_gens(gen_size, seed=3)
    xs = [random.randrange(fr.P_INT) for _ in range(gen_size * m)]
    ys = [random.randrange(fr.P_INT) for _ in range(gen_size * m)]
    t = jnp.asarray(fr.from_ints(xs))
    t2 = jnp.asarray(fr.from_ints(ys))
    com2 = pedersen.commit(gens, t2)  # commitment to different data
    us = [random.randrange(fr.P_INT) for _ in range(3)]
    u = jnp.asarray(fr.from_ints(us))
    proof = pedersen.open(gens, t, com2, u)  # com_at from wrong com
    # the opening's fold-consistency must break against t's cross terms
    ok, _ = pedersen.verify_open(proof, us)
    assert not ok
