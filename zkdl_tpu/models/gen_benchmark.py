"""Generate benchmark MLPs (TorchScript) mirroring /root/reference/model.py.

Usage: python -m zkdl_tpu.models.gen_benchmark [outdir] [--small]

Produces traced_model.pt, sample_input.pt, sample_output.pt. The full model is
the 18.2M-param zkDL benchmark (784 -> 1000 -> 1773 x4 -> 1124 -> 1000, bias-free,
ReLU, batch 256; model.py:14-30,39). --small emits a 2-layer 64-wide model for
tests (BASELINE config 1)."""

from __future__ import annotations

import os
import sys


def save_tensor(t, fn):
    import torch
    import torch.nn as nn

    m = nn.Module()
    par = nn.Parameter(t)
    m.register_parameter("0", par)
    torch.jit.script(m).save(fn)


def generate(outdir: str, small: bool = False, seed: int = 0, batch: int | None = None):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    if small:
        dims = [64, 64, 64]
        batch = batch or 4
    else:
        dims = [784, 1000, 1773, 1773, 1773, 1773, 1773, 1124, 1000]
        batch = batch or 256
    layers = []
    for i in range(len(dims) - 1):
        layers.append(nn.Linear(dims[i], dims[i + 1], bias=False))
        if i < len(dims) - 2:
            layers.append(nn.ReLU())
    model = nn.Sequential(*layers)
    model.eval()

    sample_input = torch.randn(batch, dims[0])
    with torch.no_grad():
        sample_output = model(sample_input)

    os.makedirs(outdir, exist_ok=True)
    save_tensor(sample_input, os.path.join(outdir, "sample_input.pt"))
    save_tensor(sample_output, os.path.join(outdir, "sample_output.pt"))
    traced = torch.jit.trace(model, sample_input[:1])
    traced.save(os.path.join(outdir, "traced_model.pt"))
    return os.path.join(outdir, "traced_model.pt")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0] if args else "bench_model"
    generate(outdir, small="--small" in sys.argv)
    print(f"wrote {outdir}/traced_model.pt, sample_input.pt, sample_output.pt")
