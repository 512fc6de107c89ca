#!/usr/bin/env python
"""Eval-plateau closure (VERDICT r4 next #1): ablation shares + executed
FLOPs for the PRODUCTION eval step (full MFT A+V+L forward, B=32, T=160,
bf16, fused kernels ON — exactly bench.py's instrument).

The train plateau was closed in round 4 with temporary-kernel-edit
ablations (ops/dispatch.py); this script applies the same discipline to
the eval side, which until now had only the bdq negative:

  1. ms/fwd for variants, ABAB-alternated in ONE process (dispatch and
     the kernels read env at trace time, so each variant is a fresh
     trace of the same public op):
       base     — production kernels, ref softmax, real LN
       sm_skip  — MMTX_ENC_SOFTMAX=skip: every kernel softmax becomes a
                  uniform 1/T scale (WRONG numerics, measurement only)
       ln_skip  — MMTX_ABLATE_ENC_LN=1: every kernel LayerNorm becomes a
                  bare affine (WRONG numerics, measurement only)
     base - variant bounds that stage's share of the full eval step.
  2. XLA cost-analysis FLOPs of the chained program with the fused
     encoder kernel ON vs OFF — what the printed MFU's numerator
     actually contains (Mosaic attaches a cost estimate for the
     pallas_call; the jnp trace is XLA's own count) — next to the
     ANALYTIC counted/executed split:
       counted  (algorithmic) encoder p@v = 2*T^2*D per layer;
       executed p@v = av_group x counted (the g=4 head-group packing
       runs [g*T,T]@[T,g*d_k] dots whose off-diagonal blocks are
       discarded — ops/pallas/encoder.py _attention_tile).

Timing: the repo rule (weight-perturb chained fori_loop, host-fetch,
slope between 50/400 chain lengths — sub-ms deltas need >=300 steps).

Measured v5e 2026-08-20 (recorded in ops/dispatch.py "eval plateau"):
see that table for the session numbers this script produced.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 32
N1, N2 = 50, 400
MODS = ("acoustic", "image", "linguistic")

VARIANTS = {
    "base": {"MMTX_ENC_SOFTMAX": "ref", "MMTX_ABLATE_ENC_LN": "0"},
    "sm_skip": {"MMTX_ENC_SOFTMAX": "skip", "MMTX_ABLATE_ENC_LN": "0"},
    "ln_skip": {"MMTX_ENC_SOFTMAX": "ref", "MMTX_ABLATE_ENC_LN": "1"},
}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()

    cfg = default_config("MFT", MODS, mask_mode="key_query")
    init, apply = build_model(cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    params = cast(init(jax.random.PRNGKey(0)))
    data_np, mask_np = bench.make_host_batch(cfg, batch=B)
    data = cast({m: jnp.asarray(v) for m, v in data_np.items()})
    mask = jnp.asarray(mask_np).astype(jnp.bfloat16)
    dt = jnp.bfloat16
    eps = jnp.asarray(1e-30, dt)

    def make_chain(n):
        def chain(params, data, mask):
            def body(_, carry):
                s = jnp.sum(carry).astype(dt) * eps
                p = dict(params)
                for m in MODS:
                    cnn = dict(p[f"cnn_{m}"])
                    conv = dict(cnn["conv1d"])
                    conv["weight"] = conv["weight"] + s
                    cnn["conv1d"] = conv
                    p[f"cnn_{m}"] = cnn
                return apply(p, data, mask, rng=None)
            return lax.fori_loop(0, n, body,
                                 jnp.zeros(mask.shape, mask.dtype))
        return jax.jit(chain).lower(params, data, mask).compile()

    def flops_of(c):
        try:
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca["flops"]) if ca and ca.get("flops") else None
        except Exception:
            return None

    def slope():
        times = []
        for n in (N1, N2):
            c = make_chain(n)
            np.asarray(c(params, data, mask))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(c(params, data, mask))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return (times[1] - times[0]) / (N2 - N1) * 1e3

    # --- 2. FLOP accounting first (one compile per path, reused) --------
    os.environ["MMTX_ENC_SOFTMAX"] = "ref"
    os.environ["MMTX_ABLATE_ENC_LN"] = "0"
    c_on = make_chain(N1)
    f_on = flops_of(c_on)
    os.environ["MMTX_PALLAS_ENCODER"] = "0"
    f_off = flops_of(make_chain(N1))
    os.environ["MMTX_PALLAS_ENCODER"] = "1"
    T, D = 160, 256
    pv_counted = 2 * T * T * D * 6 * 3          # per seq: 6 layers x 3 encs
    print(f"flops/batch kernels ON:  {f_on:.4g}"
          f"  ({f_on / B / 1e9:.3f} GFLOP/seq)" if f_on else
          "flops/batch kernels ON: n/a", flush=True)
    print(f"flops/batch kernels OFF: {f_off:.4g}"
          f"  ({f_off / B / 1e9:.3f} GFLOP/seq)" if f_off else
          "flops/batch kernels OFF: n/a", flush=True)
    print(f"analytic counted p@v/seq: {pv_counted / 1e9:.3f} GFLOP; "
          f"g=4 packing executes 3x more: "
          f"+{3 * pv_counted / 1e9:.3f} GFLOP/seq", flush=True)

    # --- 1. ablation shares, ABAB ---------------------------------------
    order = ["base", "sm_skip", "base", "sm_skip", "ln_skip", "base",
             "ln_skip"]
    results = {}
    for v in order:
        os.environ.update(VARIANTS[v])
        ms = slope()
        results.setdefault(v, []).append(ms)
        print(f"full eval fwd, variant={v:8s}: {ms:.4f} ms", flush=True)
    base = min(results["base"])
    for v in ("sm_skip", "ln_skip"):
        best = min(results[v])
        print(f"{v}: share >= {base - best:.4f} ms of {base:.4f} "
              f"({(base - best) / base * 100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
