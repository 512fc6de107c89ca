#!/usr/bin/env python
"""Training-step throughput for MFT (A+V+L) on TPU, honestly timed.

Unlike the eval bench (which must manufacture a cross-iteration
dependency), training chains NATURALLY: step i+1 consumes step i's params
and optimizer state, so a `lax.scan` over steps inside one jitted program
is both the idiomatic TPU training loop and an artifact-free measurement.
Per-step time is the slope between two scan lengths (cancels the tunnel
RTT + transfer constants; host-fetch timing per the repo timing rule).

Covers the full reference recipe: dropout ON (per-step folded rng), Adam +
coupled weight decay, sum-MSE/denom loss (engine/train_engine.py:60-72).

Dropout impl A/B (v5e, same session, this script): threefry 32.6 ms/step
vs hash 17.6 ms/step (1.86x) — set MMTX_DROPOUT_IMPL=threefry|hash to
reproduce (default hash, ops/basic.py).

Dropout-OFF mixed floor (v5e, same session, jnp paths MMTX_PALLAS=0):
dropout ON 14.496 vs OFF 12.743 ms/step — the TOTAL dropout cost (fmix32
mask gen + apply, fwd+bwd, all sites) is ~1.75 ms/step on the jnp path.
KERNEL-path dropout cost (round 4, MMTX_ABLATE_DROPOUT=1, default kernels
mixed): 9.470 -> 8.225 ms/step, i.e. ~1.25 ms/step — the in-kernel fmix32
generation recovers ~0.5 ms of the jnp path's 1.75; the remaining 1.25 is
mask generation (attn-prob site = 62% of all bits, generated in the fwd
kernel AND regenerated in the bwd recompute) + applies + the jnp-path
front-end/MFN/head sites.

Usage: python examples/bench_train.py [--fp32] [--batch 32]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

T = 160
FRAMES = {"linguistic": 32, "acoustic": 4, "image": 4}
MODS = ("acoustic", "image", "linguistic")
V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 training (default bf16 activations via "
                         "bf16 batch; params/opt stay fp32)")
    ap.add_argument("--mixed", action="store_true",
                    help="mixed-precision: cast params to bf16 INSIDE the "
                         "loss (fwd/bwd matmuls run bf16 on the MXU), "
                         "fp32 master params + Adam untouched")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chains", type=int, nargs=2, default=(10, 60),
                    metavar=("N1", "N2"))
    ap.add_argument("--family", default="MFT",
                    help="model family to bench (diagnostic: B2-Trans is "
                         "scan-free, isolates the MFN/LSTM scan cost)")
    ap.add_argument("--no_dropout", action="store_true",
                    help="diagnostic: train with rng=None (dropout off) "
                         "to isolate the RNG/mask cost from scan latency. "
                         "NOTE: with the Pallas kernels ON this dispatches "
                         "their remat custom_vjps inside this script's "
                         "60-step scan chain, whose XLA compile exhausts "
                         "host RAM — run with MMTX_PALLAS=0 (the jnp "
                         "paths), which is also the cleaner A/B against "
                         "the dropout-ON jnp training path")
    args = ap.parse_args()

    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.engine.optim import select_adam
    # MMTX_FLAT_ADAM=1 A/Bs the flat-moment optimizer layout e2e here
    adam_init, adam_update, _ = select_adam()
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)
    # long-chain scans are compile-dominated on the remote backend; cache
    # them like the CLI does so repeat A/Bs pay the compile once
    enable_compile_cache()

    B = args.batch
    cfg = default_config(args.family, MODS, mask_mode="key_query")
    init_fn, apply_fn = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(1))
    opt_state = adam_init(params)

    rs = np.random.RandomState(0)
    data = {m: jnp.asarray(rs.randn(B, T, FRAMES[m], cfg.mod_dimension[m])
                           .astype(np.float32)) for m in MODS}
    target = jnp.asarray(rs.randn(B, T, 1).astype(np.float32))
    mask_np = np.zeros((B, T, 1), np.float32)
    for i in range(B):
        mask_np[i, :T - (i % 5)] = 1.0
    mask = jnp.asarray(mask_np)
    denom = jnp.asarray(mask_np.sum())
    if not args.fp32:
        data = {m: v.astype(jnp.bfloat16) for m, v in data.items()}

    # data/target/mask are jit ARGUMENTS, not closure captures: captured
    # concrete arrays get inlined as stablehlo.constants — at B=32 fp32
    # that is ~290 MB of constants in the program, which blows the remote
    # tunnel's compile-upload limit (HTTP 413) and bloats every compile.
    def one_step(dtm, carry, key):
        data, target, mask, denom = dtm
        params, opt_state = carry
        def loss_fn(p):
            if args.mixed:
                # grads flow through the cast -> arrive fp32 at the master
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), p)
            pred = apply_fn(p, data, mask,
                            rng=None if args.no_dropout else key)
            d = (pred - target)
            return jnp.sum((d * d).astype(jnp.float32)) / denom
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(params, grads, opt_state, 1e-4,
                                        weight_decay=1e-4)
        return (params, opt_state), loss

    dtm = (data, target, mask, denom)

    def make(n):
        def prog(params, opt_state, key, dtm):
            keys = jax.random.split(key, n)
            (params, opt_state), losses = lax.scan(
                functools.partial(one_step, dtm), (params, opt_state), keys)
            return params, opt_state, losses[-1]
        return jax.jit(prog, donate_argnums=(0, 1))

    # FLOP count of ONE step (scan body counted once by XLA cost analysis)
    flops = None
    try:
        c = make(1).lower(params, opt_state, jax.random.PRNGKey(0),
                          dtm).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        if ca and ca.get("flops"):
            flops = float(ca["flops"])
    except Exception:
        pass

    n1, n2 = args.chains
    times = {}
    state = (params, opt_state)
    for n in (n1, n2):
        prog = make(n).lower(*state, jax.random.PRNGKey(0), dtm).compile()
        # warmup; donation is fine — each run threads the returned state
        # into the next call, so no stale buffers are ever reused
        p2, o2, loss = prog(*state, jax.random.PRNGKey(0), dtm)
        np.asarray(loss)
        state = (p2, o2)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            p2, o2, loss = prog(*state, jax.random.PRNGKey(r + 1), dtm)
            np.asarray(loss)
            best = min(best, time.perf_counter() - t0)
            state = (p2, o2)
        times[n] = best

    per_step = (times[n2] - times[n1]) / (n2 - n1)
    seq_per_s = B / per_step
    mode = "fp32" if args.fp32 else (
        "mixed(bf16 compute)" if args.mixed else "bf16-batch")
    drop = "OFF" if args.no_dropout else "ON"
    line = (f"{args.family} AVL train step, B={B} T={T} {mode}, "
            f"dropout {drop}: "
            f"{per_step * 1e3:.3f} ms/step = {seq_per_s:,.0f} seq/s")
    if flops:
        line += (f"  (program {flops / 1e9:.1f} GFLOP/step, "
                 f"MFU {flops / per_step / V5E_BF16_PEAK:.1%})")
    print(line)
    print(f"final loss after chains: {float(np.asarray(loss)):.4f}")


if __name__ == "__main__":
    main()
