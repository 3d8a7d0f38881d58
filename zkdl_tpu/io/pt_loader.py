"""TorchScript .pt model/tensor loading (pure-Python host I/O).

Replaces the reference's LibTorch C++ path (torch::jit::load / torch::load,
/root/reference/demo.cu:40-95) with the Python torch CPU runtime (host-side
only; no torch in any compute path). Semantics match load_model: iterate
numeric submodule attributes "0", "1", ..., skip modules without a `weight`
(ReLU), take each Linear weight and *transpose* it to (in, out)."""

from __future__ import annotations

import numpy as np


def load_mlp_weights(model_path: str) -> list[np.ndarray]:
    """Returns float32 weight matrices transposed to (in, out), in layer order."""
    import torch

    m = torch.jit.load(model_path, map_location="cpu")
    weights: list[np.ndarray] = []
    i = 0
    while True:
        name = str(i)
        if not hasattr(m, name):
            break
        sub = getattr(m, name)
        if hasattr(sub, "weight"):
            w = sub.weight.detach().cpu().numpy()
            weights.append(np.ascontiguousarray(w.T.astype(np.float32)))
        i += 1
    if not weights:
        raise ValueError(f"no Linear weights found in {model_path}")
    for a, b in zip(weights, weights[1:]):
        if a.shape[1] != b.shape[0]:
            raise ValueError("Incompatible layer sizes")
    return weights


def load_tensor(tensor_path: str) -> np.ndarray:
    """Load a tensor saved via the reference's save_tensor wrapper
    (/root/reference/model.py:4-8): a scripted Module with parameter "0"."""
    import torch

    m = torch.jit.load(tensor_path, map_location="cpu")
    for name, p in m.named_parameters():
        return p.detach().cpu().numpy().astype(np.float32)
    raise ValueError(f"no parameter found in {tensor_path}")
