"""Worker process for tests/test_multihost.py: joins a 2-process JAX
distributed runtime (2 virtual CPU devices per process -> 4 global), proves a
dp-sharded binary sumcheck over the global DCN-spanning mesh, and checks the
stream is bit-identical to the purely-local single-device prover.

Run: python multihost_worker.py <process_id> <coordinator_port> <out_prefix>
"""

import os
import sys


def main() -> int:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from zkdl_tpu.parallel import multihost

    multihost.init_distributed(f"127.0.0.1:{port}", 2, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from zkdl_tpu.field import fr
    from zkdl_tpu.parallel import model as pmodel
    from zkdl_tpu.sumcheck import protocols as sc
    from zkdl_tpu.tensor import fr_ops

    mesh = multihost.global_mesh(dp=4, tp=1)

    # deterministic witness + challenges: every process derives the same data
    # (the "communication-free transcript" property)
    n, r = 256, 8
    bits = np.asarray(jax.random.bernoulli(jax.random.PRNGKey(5), 0.5, (n,)))
    a_np = np.asarray(fr.select(jnp.asarray(bits), fr.ones_mont((n,)), fr.zeros((n,))))
    u_np = np.asarray(fr.mont(fr_ops.random_fr(jax.random.PRNGKey(6), r)))
    v_np = np.asarray(fr.mont(fr_ops.random_fr(jax.random.PRNGKey(7), r)))

    a_g = multihost.global_sharded(mesh, a_np)
    u_g = multihost.global_replicated(mesh, u_np)
    v_g = multihost.global_replicated(mesh, v_np)

    polys, final = pmodel.sharded_binary_prove(mesh, a_g, u_g, v_g)
    polys_np, final_np = np.asarray(polys), np.asarray(final)

    # purely-local reference on this process's device 0
    ref_polys, ref_final = sc.binary_prove(jnp.asarray(a_np), jnp.asarray(u_np), jnp.asarray(v_np))

    ok = np.array_equal(polys_np, np.asarray(ref_polys)) and np.array_equal(
        final_np, np.asarray(ref_final)
    )
    with open(f"{out}.{pid}", "w") as f:
        f.write("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
