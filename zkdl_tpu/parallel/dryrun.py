"""Multi-chip dry run: one sharded proving step on tiny shapes.

Exercised by __graft_entry__.dryrun_multichip with N virtual CPU devices: builds
a (dp, tp) mesh, runs the dp+tp sharded field matmul forward, the zkReLU forward
(dp), and a dp-sharded inner-product sumcheck with modular psum round reductions,
and checks the sumcheck output is bit-identical to the single-device prover."""

from __future__ import annotations

import numpy as np


def run(n_devices: int) -> None:
    import os

    import jax

    # jax is preloaded at interpreter startup in this image (a site .pth hook),
    # so JAX_PLATFORMS in the environment may not have taken effect. Decide
    # WITHOUT calling jax.devices() (that would initialize the wrong backend and
    # lock it in): if the config doesn't already select cpu, force an N-device
    # virtual CPU platform before first backend use.
    platforms = str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))
    primary = platforms.split(",")[0].strip()
    if primary != "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        )
        jax.config.update("jax_platforms", "cpu")
        # the site preload hook may have initialized the non-cpu backend
        # already; drop it so the cpu platform (re)initializes with the flags.
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..field import fr
    from ..models import quantize, zkfc, zkrelu
    from ..sumcheck import protocols as sc
    from ..tensor import fr_ops
    from . import sharded

    assert len(jax.devices()) >= n_devices, (len(jax.devices()), n_devices)
    if n_devices % 2 == 0 and n_devices > 1:
        mesh_shape = (n_devices // 2, 2)
    else:
        mesh_shape = (n_devices, 1)
    mesh = sharded.make_mesh(n_devices, mesh_shape)
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]

    rng = np.random.default_rng(0)
    in_s, out_s = 16, 16
    batch = max(4 * dp, 8)

    W_np = (rng.standard_normal((in_s, out_s)) * 0.3).astype(np.float32)
    X_np = rng.standard_normal((batch, in_s)).astype(np.float32)
    W = quantize.load_weights(W_np)
    X = fr.mont(quantize.load_input(X_np))

    # place shards
    X = jax.device_put(X, NamedSharding(mesh, P("dp")))
    W3 = W.reshape(in_s, out_s, 8)
    W3 = jax.device_put(W3, NamedSharding(mesh, P(None, "tp")))

    # dp+tp sharded forward matmul
    Z = sharded.sharded_field_matmul(mesh, X, W3.reshape(-1, 8), in_s, out_s)
    Z_ref = zkfc.field_matmul_jit(jax.device_get(X), W, in_s, out_s)
    assert (np.asarray(Z) == np.asarray(Z_ref)).all(), "sharded matmul mismatch"

    # dp-sharded zkReLU forward (pure elementwise -> shards trivially)
    Z_dp = jax.device_put(Z, NamedSharding(mesh, P("dp")))
    A, aux = jax.jit(zkrelu.forward)(Z_dp)

    # dp-sharded inner-product sumcheck with modular psum reductions
    n = Z.shape[0]
    key = jax.random.PRNGKey(1)
    b = fr_ops.random_fr(key, n)
    u = fr_ops.random_fr(jax.random.PRNGKey(2), fr_ops.ceil_log2(n))
    a_dp = jax.device_put(Z, NamedSharding(mesh, P("dp")))
    b_dp = jax.device_put(b, NamedSharding(mesh, P("dp")))
    polys, finals = sharded.sharded_inner_product_prove(mesh, a_dp, b_dp, u)
    polys_ref, finals_ref = jax.jit(sc.inner_product_prove)(jax.device_get(Z), b, u)
    assert (np.asarray(polys) == np.asarray(polys_ref)).all(), "sharded sumcheck polys differ"
    assert (np.asarray(finals) == np.asarray(finals_ref)).all(), "sharded sumcheck finals differ"

    jax.block_until_ready((polys, finals, A, aux["sign"]))

    # FULL sharded 2-layer model: every sumcheck dp-sharded (binary, hadamard,
    # ip, folds, commitment partial sums), proof stream bit-identical to the
    # single-device prover, then verified.
    from zkdl_tpu.models import mlp as mlp_mod
    from zkdl_tpu.sumcheck.transcript import SeededRng
    from . import model as pmodel

    dp_mesh = sharded.make_mesh(n_devices, (n_devices,), names=("dp",))
    rngm = np.random.default_rng(7)
    dims = [16, 16, 16]
    weights = [
        (rngm.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    import warnings

    prev = mlp_mod.USE_PLANAR_PROVER
    try:
        model = mlp_mod.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
        Xm = fr.mont(quantize.load_input(rngm.standard_normal((batch, dims[0])).astype(np.float32)))
        # reference stream from the planar unchained prover (CPU-friendly
        # compiles; stream-identical to the (n, 8) prover — tests assert)
        mlp_mod.USE_PLANAR_PROVER = True
        Yp, Zp, Ap, auxp = model.infer(Xm)
        proof_ref = model.prove(Xm, Yp, Zp, Ap, auxp, SeededRng(7), chain=False)
        # sharded prover consumes the mont-tensor aux (zkrelu.forward)
        mlp_mod.USE_PLANAR_PROVER = False
        Y, Zl, Al, auxl = model.infer(Xm)
        proof_sh = pmodel.prove_sharded(model, Xm, Y, Zl, Al, auxl, dp_mesh, SeededRng(7))
        from zkdl_tpu.io import proof_io

        ref_arrays: dict = {}
        sh_arrays: dict = {}
        proof_io._flatten(proof_ref, "p", ref_arrays, None)
        proof_io._flatten(proof_sh, "p", sh_arrays, None)
        assert sorted(ref_arrays) == sorted(sh_arrays)
        for k in ref_arrays:
            assert np.array_equal(np.asarray(ref_arrays[k]), np.asarray(sh_arrays[k])), (
                f"sharded model proof stream differs at {k}"
            )
        ok, msg = model.verify(proof_sh)
        assert ok, f"sharded model proof failed verification: {msg}"

        # CHAINED + COMMITTED-AUX tier, distributed (the default soundness
        # tier): sharded prover stream-identical to the single-device planar
        # chained prover, including the NUMS aux commitments and revealed-fold
        # openings, then verified with full transcript replay.
        mlp_mod.USE_PLANAR_PROVER = True
        ref_c = model.prove(Xm, Yp, Zp, Ap, auxp, SeededRng(9), chain=True, commit_aux=True)
        mlp_mod.USE_PLANAR_PROVER = False
        sh_c = pmodel.prove_sharded(
            model, Xm, Y, Zl, Al, auxl, dp_mesh, SeededRng(9), chain=True, commit_aux=True
        )
        refc_arrays: dict = {}
        shc_arrays: dict = {}
        proof_io._flatten(ref_c, "p", refc_arrays, None)
        proof_io._flatten(sh_c, "p", shc_arrays, None)
        assert sorted(refc_arrays) == sorted(shc_arrays)
        for k in refc_arrays:
            assert np.array_equal(np.asarray(refc_arrays[k]), np.asarray(shc_arrays[k])), (
                f"sharded chained+committed proof stream differs at {k}"
            )
        ok, msg = model.verify(sh_c, X=Xm, Y_hat=Y, transcript=SeededRng(9))
        assert ok, f"sharded chained+committed proof failed verification: {msg}"
    finally:
        mlp_mod.USE_PLANAR_PROVER = prev

    print(
        f"dryrun_multichip OK: mesh={dict(mesh.shape)} batch={batch} n={n}; "
        f"full 2-layer sharded model prove+verify on dp={n_devices} stream-identical "
        f"(unchained AND chained+committed-aux tiers)"
    )
