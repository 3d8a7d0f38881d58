"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: prover seconds per data point (the reference's benchmark unit,
/root/reference/demo.cu:140). Baseline: 0.1 s/point for the 18M-param
batch-256 zkDL-256 config on a V100 (BASELINE.md). vs_baseline is
baseline_seconds / our_seconds (>1 means faster than the reference).

The benchmark config is chosen by BENCH_CONFIG env:
  zkdl256   — 8-layer 18M-param model, batch 256 (the HEADLINE benchmark;
              default). Reference: <0.1 s/pt claimed, 0.03 s/pt on the
              benchmark figure (BASELINE.md).
  zkdl1     — same 18M model, batch 1 (reference benchmark.png: 7.21 s).
  zkdl256_committed — zkdl256 with the committed-aux soundness tier
              (NUMS witness commitments + revealed-fold openings; no
              reference counterpart — its prover discards proofs unverified).
  zkdl256_interleaved — zkdl256 with round-interleaved Fiat-Shamir (textbook
              sumcheck FS order; one host round-trip per round).
  attention — single-head attention block (seq 128, d_model 128), committed
              weights + softmax circuit (BASELINE config 5; no reference
              counterpart).
  micro     — 2-layer 64-wide MLP, batch 4 (fast smoke).
  mid       — 4-layer, batch 32.

Secondary metrics (proof bytes, host-verify seconds) go to stderr; set
BENCH_RECORD=1 to also fold them into MICROBENCH.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


ZKDL_DIMS = [784, 1000, 1773, 1773, 1773, 1773, 1773, 1124, 1000]


def _proof_bytes(proof) -> int:
    import tempfile

    from zkdl_tpu.io import proof_io

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        path = f.name
    try:
        proof_io.dump_proof(proof, path)
        return os.path.getsize(path)
    finally:
        if os.path.exists(path):
            os.unlink(path)


def _record(config: str, extras: dict) -> None:
    for k, v in extras.items():
        log(f"{k} = {v}")
    if os.environ.get("BENCH_RECORD") != "1":
        return
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "MICROBENCH.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.setdefault("configs", {})[config] = extras
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")


def bench_mlp(config: str):
    import jax

    from zkdl_tpu.field import fr
    from zkdl_tpu.models import mlp, quantize

    rng = np.random.default_rng(0)
    commit_aux = config == "zkdl256_committed"
    interleave = config == "zkdl256_interleaved"
    if config.startswith("zkdl256"):
        dims, batch = ZKDL_DIMS, 256
        baseline_spp = 0.1  # README.md:30 claim (figure point: 0.03)
    elif config == "zkdl1":
        dims, batch = ZKDL_DIMS, 1
        baseline_spp = 7.21  # reference images/benchmark.png, batch-1 point
    elif config == "mid":
        dims, batch = [128, 256, 256, 128], 32
        baseline_spp = 0.1  # scaled proxy; recorded for trend tracking only
    else:
        dims, batch = [64, 64, 64], 4
        baseline_spp = 0.1  # proxy

    t0 = time.perf_counter()
    # torch nn.Linear default init (the reference benchmark model,
    # /root/reference/model.py:14-30: kaiming_uniform(a=sqrt(5)) => bound
    # 1/sqrt(fan_in)); per-layer gain < 1 keeps every pre-activation inside
    # the protocol's 2^47 magnitude bound (zkrelu.cu:18). N(0, 0.3^2) weights
    # at fan-in 1773 (gain ~12.6x/layer) overflow the bound by layer 4 and the
    # verifier (correctly) rejects the recombination identity.
    weights = [
        rng.uniform(-1.0, 1.0, (dims[i], dims[i + 1])).astype(np.float32)
        / np.sqrt(dims[i]).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    jax.block_until_ready(model.layers[-1].com.points.x)
    log(f"model built ({model.n_params} params): {time.perf_counter() - t0:.1f}s")
    X_np = rng.standard_normal((batch, dims[0])).astype(np.float32)
    X = fr.mont(quantize.load_input(X_np))

    kwargs = {}
    if commit_aux:
        kwargs["commit_aux"] = True
    if interleave:
        kwargs["interleave"] = True

    # warmup (compile)
    t0 = time.perf_counter()
    proof, spp = mlp.prove_timed(model, X, batch, **kwargs)
    log(f"warmup (compile) done: {time.perf_counter() - t0:.1f}s, spp={spp:.4f}")
    # timed run
    proof, spp = mlp.prove_timed(model, X, batch, **kwargs)
    log(f"steady-state spp={spp:.4f}")

    extras = {"prover_spp_s": spp}
    try:
        t0 = time.perf_counter()
        extras["proof_bytes"] = _proof_bytes(proof)
        log(f"proof serialization: {time.perf_counter() - t0:.1f}s")
        Y_hat = model.infer(X)[0]
        t0 = time.perf_counter()
        from zkdl_tpu.sumcheck.transcript import FiatShamir

        ok, msg = model.verify(proof, X=X, Y_hat=Y_hat, transcript=FiatShamir(),
                               interleaved=interleave)
        extras["verify_s"] = round(time.perf_counter() - t0, 3)
        extras["verify_ok"] = bool(ok)
        log(f"host verify: {extras['verify_s']}s ok={ok} {msg}")
    except Exception as e:  # metrics must never sink the headline number
        log(f"secondary metrics failed: {e!r}")
    _record(config, extras)
    return spp, baseline_spp


def bench_attention(config: str):
    import jax

    from zkdl_tpu.field import fr
    from zkdl_tpu.models import quantize, zkattention
    from zkdl_tpu.sumcheck.transcript import FiatShamir

    seq, d_model = 128, 128
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    ws = [(rng.standard_normal((d_model, d_model)) * 0.2).astype(np.float32) for _ in range(4)]
    attn = zkattention.ZkAttention.from_float(seq, *ws, key=jax.random.PRNGKey(0))
    X = fr.mont(quantize.load_input(rng.standard_normal((seq, d_model)).astype(np.float32)))
    log(f"attention block built (seq={seq}, d={d_model}): {time.perf_counter() - t0:.1f}s")

    def run():
        Y, tr = attn.forward(X)
        jax.block_until_ready(Y)
        t0 = time.perf_counter()
        proof = attn.prove(tr, FiatShamir(), commit_witness=True)
        proof.block_until_ready()
        return Y, proof, time.perf_counter() - t0

    _, _, dt = run()
    log(f"warmup (compile) done: {dt:.1f}s")
    Y, proof, dt = run()
    spp = dt / seq
    log(f"steady-state: {dt:.2f}s total, {spp:.4f} s/row")
    extras = {"prover_s_total": round(dt, 3), "prover_s_per_row": spp}
    try:
        extras["proof_bytes"] = _proof_bytes(proof)
        t0 = time.perf_counter()
        ok, msg = attn.verify(proof, X=X, Y=Y, transcript=FiatShamir())
        extras["verify_s"] = round(time.perf_counter() - t0, 3)
        extras["verify_ok"] = bool(ok)
        log(f"host verify: {extras['verify_s']}s ok={ok} {msg}")
    except Exception as e:
        log(f"secondary metrics failed: {e!r}")
    _record(config, extras)
    # no reference number exists for attention; report vs the zkdl256 claim
    # scaled per row as a trend anchor only
    return spp, 0.1


def main():
    config = os.environ.get("BENCH_CONFIG", "zkdl256")

    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    if config == "attention":
        spp, baseline_spp = bench_attention(config)
        metric = "prover_seconds_per_row[attention]"
    else:
        spp, baseline_spp = bench_mlp(config)
        metric = f"prover_seconds_per_data_point[{config}]"

    print(json.dumps({
        "metric": metric,
        "value": spp,
        "unit": "s/point",
        "vs_baseline": baseline_spp / spp if spp > 0 else None,
    }))


if __name__ == "__main__":
    main()
