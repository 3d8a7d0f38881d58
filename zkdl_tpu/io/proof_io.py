"""Proof serialization and prover checkpoint/resume.

The reference has no proof persistence at all — prove() outputs are discarded
(/root/reference/zkfc.cu:139-144, SURVEY.md §0.1) and nothing supports stopping
and resuming a long proving run (§5.4). Here:

- ``dump_proof``/``load_proof``: portable serialization of any proof dataclass
  tree (nested dataclasses / lists / jax or numpy arrays) to one ``.npz``
  file. Arrays are stored raw (uint32 limb tensors); structure is recorded as
  a JSON skeleton, so files round-trip losslessly and are inspectable.
- ``ProofCheckpoint``: layer-granular checkpoint for the backwards MLP proving
  loop — after each layer proof the completed prefix and the transcript state
  are persisted; ``resume`` restarts from the first unproven layer with the
  exact challenge stream (FiatShamir state or counted RNG draws replayed).

G1 points ride along as their Jacobian uint32 limb tensors (pytree leaves), so
no curve-specific code is needed here.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(obj: Any, path: str, arrays: dict, skeleton: Any):
    """Recursively flatten dataclasses/lists/tuples/dicts; arrays go to
    `arrays` keyed by path, structure into the returned skeleton."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        fields = {}
        for f in dataclasses.fields(obj):
            fields[f.name] = _flatten(getattr(obj, f.name), f"{path}.{f.name}", arrays, skeleton)
        return {"__dc__": type(obj).__module__ + ":" + type(obj).__qualname__, "fields": fields}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple (e.g. G1Jac)
        fields = {
            name: _flatten(getattr(obj, name), f"{path}.{name}", arrays, skeleton)
            for name in obj._fields
        }
        return {"__nt__": type(obj).__module__ + ":" + type(obj).__qualname__, "fields": fields}
    if isinstance(obj, (list, tuple)):
        items = [_flatten(x, f"{path}[{i}]", arrays, skeleton) for i, x in enumerate(obj)]
        return {"__seq__": "tuple" if isinstance(obj, tuple) else "list", "items": items}
    if isinstance(obj, dict):
        return {"__map__": {k: _flatten(v, f"{path}.{k}", arrays, skeleton) for k, v in obj.items()}}
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return {"__lit__": obj}
    arr = np.asarray(obj)
    arrays[path] = arr
    return {"__arr__": path, "dtype": str(arr.dtype), "shape": list(arr.shape)}


_DC_REGISTRY: dict[str, type] = {}


def _resolve_dc(tag: str) -> type:
    if tag in _DC_REGISTRY:
        return _DC_REGISTRY[tag]
    mod_name, qual = tag.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    obj: Any = mod
    for part in qual.split("."):
        obj = getattr(obj, part)
    _DC_REGISTRY[tag] = obj
    return obj


def _unflatten(node: Any, arrays: dict, to_device: bool):
    if "__dc__" in node:
        cls = _resolve_dc(node["__dc__"])
        kwargs = {k: _unflatten(v, arrays, to_device) for k, v in node["fields"].items()}
        return cls(**kwargs)
    if "__nt__" in node:
        cls = _resolve_dc(node["__nt__"])
        kwargs = {k: _unflatten(v, arrays, to_device) for k, v in node["fields"].items()}
        return cls(**kwargs)
    if "__seq__" in node:
        items = [_unflatten(x, arrays, to_device) for x in node["items"]]
        return tuple(items) if node["__seq__"] == "tuple" else items
    if "__map__" in node:
        return {k: _unflatten(v, arrays, to_device) for k, v in node["__map__"].items()}
    if "__lit__" in node:
        return node["__lit__"]
    arr = arrays[node["__arr__"]]
    if to_device:
        import jax.numpy as jnp

        return jnp.asarray(arr)
    return arr


def dump_proof(proof: Any, path: str) -> None:
    """Serialize a proof tree to `path` (.npz)."""
    arrays: dict[str, np.ndarray] = {}
    skeleton = _flatten(proof, "p", arrays, None)
    payload = {f"a{i}": arr for i, (k, arr) in enumerate(sorted(arrays.items()))}
    keymap = {k: f"a{i}" for i, (k, _) in enumerate(sorted(arrays.items()))}
    buf = io.BytesIO()
    np.savez_compressed(buf, __skeleton__=np.frombuffer(
        json.dumps({"tree": skeleton, "keys": keymap}).encode(), dtype=np.uint8
    ), **payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_proof(path: str, to_device: bool = False) -> Any:
    """Load a proof tree written by dump_proof."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__skeleton__"]).decode())
        arrays = {k: z[v] for k, v in meta["keys"].items()}
        return _unflatten(meta["tree"], arrays, to_device)


# ---------------------------------------------------------------------------
# layer-granular checkpoint/resume for the MLP proving loop
# ---------------------------------------------------------------------------


class ProofCheckpoint:
    """Persist the backwards proving loop layer by layer.

    Usage:
        ckpt = ProofCheckpoint(dir_path)
        proof = mlp_prove_with_checkpoint(model, ..., ckpt)
    On restart, completed layer proofs are loaded from disk, the transcript is
    brought to the identical state by re-absorbing the recorded streams, and
    proving continues with the first missing layer. Works with any
    ChallengeSource whose draws are deterministic given the absorbed history
    (FiatShamir, SeededRng).
    """

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, kind: str, idx: int) -> str:
        return os.path.join(self.dir, f"{kind}_{idx:03d}.npz")

    def has(self, kind: str, idx: int) -> bool:
        return os.path.exists(self._path(kind, idx))

    def save(self, kind: str, idx: int, proof: Any) -> None:
        dump_proof(proof, self._path(kind, idx))

    def load(self, kind: str, idx: int, to_device: bool = True) -> Any:
        return load_proof(self._path(kind, idx), to_device=to_device)


def prove_mlp_checkpointed(model, X, Y_hat, Z_list, A_list, aux_list, challenges,
                           ckpt: ProofCheckpoint, chain: bool | None = None,
                           commit_aux: bool | None = None):
    """mlp.MLP.prove with per-layer checkpointing (same proof order/streams:
    output layer first, then (relu_i, fc_i) backwards, demo.cu:128-137).

    Defaults mirror MLP.prove: chained on the planar prover, committed aux per
    config. Resuming replays checkpointed layers through the transcript (same
    draw counts + absorbs) so the continuation's challenges are identical to an
    uninterrupted run; chain points are reconstructed from the loaded proofs
    (fc[i+1].u_in||u_bs and relu[i].u_recover are stored in the proof)."""
    import jax.numpy as jnp

    from ..models import mlp as mlp_mod
    from ..models import zkfc, zkrelu

    if chain is None:
        chain = mlp_mod.USE_PLANAR_PROVER
    if chain and not mlp_mod.USE_PLANAR_PROVER:
        raise ValueError("chained proofs require the planar prover")
    if commit_aux is None:
        commit_aux = mlp_mod.COMMIT_AUX
    if commit_aux and not chain:
        raise ValueError("committed aux requires chained mode")
    mlp_mod.absorb_statement(challenges, model.layers, X, Y_hat)
    fc_prove = zkfc.prove_planar if mlp_mod.USE_PLANAR_PROVER else zkfc.prove
    relu_prove = zkrelu.prove_planar if mlp_mod.USE_PLANAR_PROVER else zkrelu.prove
    n = len(model.layers)
    fc_proofs: list = [None] * n
    relu_proofs: list = [None] * (n - 1)

    def fc_step(i, Xi, Zi, z_point=None):
        if ckpt.has("fc", i):
            p = ckpt.load("fc", i)
            _replay_fc(challenges, p, draw_all=z_point is None)
            return p
        if mlp_mod.USE_PLANAR_PROVER:
            p = fc_prove(model.layers[i], Xi, Zi, challenges, z_point=z_point)
        else:
            p = fc_prove(model.layers[i], Xi, Zi, challenges)
        ckpt.save("fc", i, p)
        return p

    def relu_step(i, chain_point=None):
        if ckpt.has("relu", i):
            p = ckpt.load("relu", i)
            _replay_relu(challenges, p)
            return p
        if chain_point is not None:
            aux_com = zkrelu.commit_aux(aux_list[i]) if commit_aux else None
            p = zkrelu.prove_planar(
                Z_list[i], aux_list[i], challenges, chain_point=chain_point, aux_com=aux_com
            )
        else:
            p = relu_prove(Z_list[i], aux_list[i], challenges)
        ckpt.save("relu", i, p)
        return p

    fc_proofs[n - 1] = fc_step(n - 1, A_list[n - 2] if n >= 2 else X, Y_hat)
    for i in range(n - 2, -1, -1):
        if chain:
            w = jnp.concatenate([fc_proofs[i + 1].u_in, fc_proofs[i + 1].u_bs], axis=0)
            relu_proofs[i] = relu_step(i, chain_point=w)
            fc_proofs[i] = fc_step(
                i, A_list[i - 1] if i > 0 else X, Z_list[i],
                z_point=relu_proofs[i].u_recover,
            )
        else:
            relu_proofs[i] = relu_step(i)
            fc_proofs[i] = fc_step(i, A_list[i - 1] if i > 0 else X, Z_list[i])
    return mlp_mod.MLPProof(fc_proofs, relu_proofs)


def _replay_fc(challenges, p, draw_all: bool = True) -> None:
    """Advance the transcript exactly as proving this fc layer did: same
    challenge draws (counts from the saved proof's own vectors) and absorbs.
    Chained fc layers (draw_all=False) drew only u_in — their z-point came
    from the adjacent ReLU (zkfc.prove_planar z_point path)."""
    if draw_all:
        challenges.random_vec(p.u_bs.shape[0])
    challenges.random_vec(p.u_in.shape[0])
    if draw_all:
        challenges.random_vec(p.u_out.shape[0])
    challenges.absorb_array(p.ip_polys)
    challenges.absorb_array(p.z_claim)


def _replay_relu(challenges, p) -> None:
    if getattr(p, "aux_coms", None) is not None:
        from ..models import zkrelu

        zkrelu._absorb_aux_coms(challenges, p.aux_coms)
    for u in (p.u_z_bin, p.v_z_bin, p.u_r_bin, p.v_r_bin, p.u_recover, p.u_hp, p.v_hp):
        challenges.random_vec(u.shape[0])
    if getattr(p, "aux_coms", None) is not None:
        challenges.random_vec(p.w_q.shape[0])
        challenges.random_vec(p.w_r.shape[0])
    challenges.absorb_array(p.mag_polys)
    challenges.absorb_array(p.rem_polys)
    challenges.absorb_array(p.hp_polys)
    if getattr(p, "a_polys", None) is not None:
        challenges.absorb_array(p.a_polys)
