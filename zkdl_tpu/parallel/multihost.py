"""Multi-host (multi-process / DCN) scaffolding for the distributed prover.

SURVEY.md §5.8 / inventory row 46. The reference has no distributed layer at
all (multi-GPU is listed as future work, /root/reference/README.md:135); the
single-host sharded prover (parallel/model.py) already expresses every
reduction as mesh collectives over a named "dp" axis, so scaling past one
host is a *mesh-construction* problem, not a protocol problem:

- **Process bring-up**: `init_distributed()` wraps `jax.distributed.initialize`
  (coordinator rendezvous). After it, `jax.devices()` is the GLOBAL device
  list and any `Mesh` built from it spans all hosts; `shard_map` + the modular
  `psum_fr` collectives work unchanged.
- **Mesh layout**: `global_mesh()` lays devices out so that the high bits of
  the dp axis are the DCN (cross-host) dimension and the low bits are local
  ICI/host-internal devices. The sharded sumcheck binds LOW index bits first
  (parallel/model.py docstring): all heavy per-round traffic is ONE small
  modular psum per round coefficient — a few hundred bytes — so DCN latency,
  not bandwidth, is the only cross-host cost; the data-parallel tensor blocks
  themselves never move.
- **Transcript**: every process derives identical challenges (deterministic
  host-side FiatShamir/SeededRng, transcript.py) — communication-free, no
  broadcast needed.
- **Input distribution**: `global_sharded()` builds a global array from
  host-local (or replicated-host) numpy data without gathering it anywhere.

Verified by `tests/test_multihost.py`: two real OS processes, each with two
virtual CPU devices, rendezvous through `init_distributed`, prove a sharded
sumcheck over the 4-device global mesh, and the emitted stream is
bit-identical to the single-process prover (the canonical-collectives
guarantee, collectives.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Join the multi-process JAX runtime; returns (process_index, count).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can configure purely via
    environment. A no-op (returns (0, 1)) when neither arguments nor env
    request multiple processes — single-host runs need no changes."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if not coordinator_address or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(dp: int = 0, tp: int = 1) -> Mesh:
    """Build a (dp, tp) mesh over ALL processes' devices, DCN-aware.

    Device order puts the process (DCN) dimension on the HIGH bits of dp:
    dp index = host_index * local_dp + local_index. Combined with the
    sharded prover's low-bits-first round order, cross-host communication is
    only the per-round coefficient psum and the final residue gather."""
    devs = jax.devices()
    n = len(devs)
    if dp <= 0:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    # jax.devices() is already grouped by process (process 0's devices first),
    # which is exactly the host-major dp layout we want.
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def global_sharded(mesh: Mesh, data: np.ndarray, axis: str = "dp") -> jax.Array:
    """Create a global dp-sharded array from numpy data available on each
    process (replicated input data — e.g. deterministic witness generation —
    or a full copy on every host). Each process materializes only the shards
    its local devices own; nothing is gathered."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])


def global_replicated(mesh: Mesh, data: np.ndarray) -> jax.Array:
    """Fully-replicated global array (challenges, folded operands, weights)."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])
