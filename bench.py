#!/usr/bin/env python
"""Benchmark: eval sequences/sec/chip, MFT (A+V+L), batch=32.

This is the BASELINE.json north-star metric.  The reference publishes no
throughput numbers (SURVEY.md §6); the CPU baseline is the reference
computation (torch, per-timestep Python-loop MFN — the same structure the
reference runs) measured on this host via tests/torch_oracle.py, cached in
bench_baseline_cpu.json.  `vs_baseline` is the TPU/CPU speedup ratio
(target: >= 20x).

Usage:
  python bench.py                  # measure on the default JAX device (TPU)
  python bench.py --measure-baseline   # re-measure + cache the CPU baseline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline_cpu.json")

# Representative SEND shapes: ~160 one-second windows per video (2.7 min),
# linguistic 5-s windows hold up to ~32 word vectors, acoustic/image a few
# frames per 1-s window (SURVEY.md §2.1; comment "(batch_size, 39, 33, 300)"
# at reference MFT/models.py:113).
BATCH = 32
T = 160
FRAMES = {"linguistic": 32, "acoustic": 4, "image": 4}
MODS = ("acoustic", "image", "linguistic")


def make_host_batch(cfg, seed=0):
    rs = np.random.RandomState(seed)
    data = {m: rs.randn(BATCH, T, FRAMES[m], cfg.mod_dimension[m])
            .astype(np.float32) for m in MODS}
    lengths = [T - (i % 5) for i in range(BATCH)]
    mask = np.zeros((BATCH, T, 1), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    return data, mask


def measure_tpu(n_warmup=5, n_iter=50):
    import jax
    import jax.numpy as jnp
    from multimodal_transformer_tpu.models import build_model, default_config

    cfg = default_config("MFT", MODS, mask_mode="key_query")
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(0))
    data_np, mask_np = make_host_batch(cfg)
    data = {m: jnp.asarray(v) for m, v in data_np.items()}
    mask = jnp.asarray(mask_np)
    if os.environ.get("MMTX_BF16", "1") != "0":
        # bf16 serving mode is the default production eval config
        # (~1.7-2x on v5e; |output diff| ~1e-3, CCC within 0.05 abs —
        # tests/test_engine.py::test_bf16_batched_eval_close_to_fp32).
        # MMTX_BF16=0 benches the fp32 path.
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), t)
        params, data, mask = cast(params), cast(data), mask.astype(
            jnp.bfloat16)

    fwd = jax.jit(lambda p, d, m: apply(p, d, m, rng=None))
    for _ in range(n_warmup):
        out = fwd(params, data, mask)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(params, data, mask)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    dev = jax.devices()[0]
    return BATCH * n_iter / dt, str(dev)


def measure_cpu_baseline(n_iter=2):
    """Reference-structure computation in torch on CPU (same shapes)."""
    import torch
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch_oracle as oracle
    import jax

    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.ops.mfn_core import HIDDEN_DIM, MEM_DIM

    cfg = default_config("MFT", MODS)
    init, _ = build_model(cfg)
    params = jax.tree_util.tree_map(np.asarray,
                                    init(jax.random.PRNGKey(0)))
    data, mask_np = make_host_batch(cfg)
    mask = torch.from_numpy(mask_np)

    torch.set_num_threads(os.cpu_count() or 8)
    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            fronts = oracle.t_frontend(params, data, MODS)
            head = params["Transformer"]
            mfn_in = {}
            for m in MODS:
                e = oracle.t_linear(head[f"embed_{m}"], fronts[m])
                e = oracle.t_encoder(head[f"transformer_{m}"], e, mask)
                mfn_in[m] = e.numpy()
            pred = oracle.t_mfn(head["mfn"], mfn_in, MODS, HIDDEN_DIM,
                                MEM_DIM)
            _ = pred * mask
        dt = time.perf_counter() - t0
    return BATCH * n_iter / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    if args.measure_baseline or not os.path.exists(BASELINE_CACHE):
        baseline = measure_cpu_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_seq_per_s": baseline, "batch": BATCH, "T": T,
                       "frames": FRAMES,
                       "what": "torch reference-structure MFT fwd, CPU"},
                      f, indent=1)
    else:
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)["cpu_seq_per_s"]

    seq_per_s, dev = measure_tpu(n_iter=args.iters)
    print(json.dumps({
        "metric": "eval sequences/sec/chip (MFT AVL, batch=32)",
        "value": round(seq_per_s, 2),
        "unit": "seq/s/chip",
        "vs_baseline": round(seq_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
