"""Pedersen commitment tests: commit correctness vs oracle, fast (dlog) path vs
opaque path point-equality, open/verify round-trip, tamper rejection."""

import dataclasses
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
    gen_pts = convert.jac_from_device(gens.points)
    com_pts = convert.jac_from_device(com.points)
    for row in range(m):
        exp = host_g1.IDENTITY
        for i in range(gen_size):
            s = HF.unmont(xs[row * gen_size + i])
            exp = host_g1.add(exp, host_g1.scalar_mul(gen_pts[i], s))
        assert host_g1.eq_points(com_pts[row], exp), row


def test_fast_path_equals_opaque_path():
    """The dlog shortcut must produce group-identical commitments and opening
    proofs to the generic G1-tensor path."""
    gen_size, m = 4, 4
    gens = setup_gens(gen_size, seed=9)
    opaque = pedersen.Generators(points=gens.points, dlogs=None)
    xs = [random.randrange(fr.P_INT) for _ in range(gen_size * m)]
    t = jnp.asarray(fr.from_ints(xs))
    com_fast = pedersen.commit(gens, t)
    com_opaque = pedersen.commit(opaque, t)
    for a, b in zip(convert.jac_from_device(com_fast.points), convert.jac_from_device(com_opaque.points)):
        assert host_g1.eq_points(a, b)

    us = [random.randrange(fr.P_INT) for _ in range(4)]
    u = jnp.asarray(fr.from_ints(us))
    pf = pedersen.open(gens, t, com_fast, u)
    po = pedersen.open(opaque, t, com_opaque, u)
    assert (np.asarray(pf.final_scalar) == np.asarray(po.final_scalar)).all()
    for rf, ro in zip(pf.round_points, po.round_points):
        for a, b in zip(convert.jac_from_device(rf), convert.jac_from_device(ro)):
            assert host_g1.eq_points(a, b)
    fgf = convert.jac_from_device(g1.G1Jac(pf.final_gen.x[None], pf.final_gen.y[None], pf.final_gen.z[None]))[0]
    fgo = convert.jac_from_device(g1.G1Jac(po.final_gen.x[None], po.final_gen.y[None], po.final_gen.z[None]))[0]
    assert host_g1.eq_points(fgf, fgo)
    caf = convert.jac_from_device(g1.G1Jac(pf.com_at_u_row.x[None], pf.com_at_u_row.y[None], pf.com_at_u_row.z[None]))[0]
    cao = convert.jac_from_device(g1.G1Jac(po.com_at_u_row.x[None], po.com_at_u_row.y[None], po.com_at_u_row.z[None]))[0]
    assert host_g1.eq_points(caf, cao)


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
