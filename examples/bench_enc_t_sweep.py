#!/usr/bin/env python
"""Long-T sweep for the encoder kernel paths (VERDICT r4 next #2).

The fused encoder kernel keeps each video's whole [h*T, T] attention
working set in VMEM, so its footprint is quadratic in T; the reference
handles any T via torch's dynamic shapes (reference
MFT/multiTransformer.py:27-31).  This script answers, with measurements on
the real chip:

  1. --mode fit   : where does each fused kernel stop COMPILING?  Runs the
                    eval / train-fwd / train-bwd kernels at the guard's
                    tile_b — and, with --force, at tile_b=1 even where the
                    guard (ops/pallas/encoder.py fused_encoder_fits) says
                    no-fit — recording compile-ok vs Mosaic VMEM failure.
                    This calibrates _VMEM_GUARD.
  2. --mode eval  : throughput A/B of the three encoder paths
                    (fused kernel / jnp / jnp+flash-attention) per T.
  3. --mode train : step-time A/B (fused train kernels vs jnp autodiff)
                    per T, dropout ON (hash impl), Adam step included.

Instrument: ONE MFT-dims encoder stage (6 layers, D=256, d_ff=128, h=8) at
B=8 — the component the T-question is about; timing follows the repo rule
(weight-perturb chained iterations for eval, naturally-chained scan for
train, host-fetch timing, slope between two chain lengths).  Path selection
flips the MMTX_PALLAS_* env vars between jit traces (dispatch reads them at
trace time); one process, one TPU.

Output: one JSON line per (mode, T, path).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, FF, N_LAYERS, H = 256, 128, 6, 8

ENV = {
    "fused": {"MMTX_PALLAS_ENCODER": "1", "MMTX_PALLAS_ATTN": "0"},
    "jnp": {"MMTX_PALLAS_ENCODER": "0", "MMTX_PALLAS_ATTN": "0"},
    "flash": {"MMTX_PALLAS_ENCODER": "0", "MMTX_PALLAS_ATTN": "1"},
}

# n2-n1 >= 300 at EVERY T (repo timing rule: sub-ms stages need long
# chains; the first sweep attempt with 20-150-step deltas produced
# negative slopes from tunnel RTT jitter)
EVAL_CHAINS = {160: (50, 400), 320: (50, 400), 448: (50, 400),
               512: (50, 400), 640: (50, 400), 1280: (30, 330)}
TRAIN_CHAINS = {160: (10, 110), 256: (10, 110), 320: (10, 110),
                448: (8, 88), 512: (8, 80), 640: (6, 56), 1280: (4, 24)}


def _chains(table, T):
    return table.get(T, (5, 25) if T > 640 else (10, 60))


def set_path(path):
    os.environ.update(ENV[path])


def make_inputs(B, T, dtype, seed=0):
    import jax.numpy as jnp
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32)).astype(dtype)
    mask = np.zeros((B, T, 1), np.float32)
    for i in range(B):
        mask[i, :T - (i % 5)] = 1.0
    return x, jnp.asarray(mask)


def _perturb(params, s):
    """Add s to layer-0's q weight — a top-of-graph dependency that stops
    XLA folding chain iterations (bench.py methodology)."""
    p = dict(params)
    layers = list(p["layers"])
    l0 = dict(layers[0])
    sa = dict(l0["self_attn"])
    lins = list(sa["linears"])
    l00 = dict(lins[0])
    l00["weight"] = l00["weight"] + s
    lins[0] = l00
    sa["linears"] = lins
    l0["self_attn"] = sa
    layers[0] = l0
    p["layers"] = layers
    return p


def bench_eval(params, B, T, path):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multimodal_transformer_tpu.ops.attention import encoder_stack

    set_path(path)
    x, mask = make_inputs(B, T, jnp.bfloat16)
    eps = jnp.asarray(1e-30, x.dtype)

    def make(n):
        def chain(params, x, mask):
            def body(_, carry):
                s = jnp.sum(carry).astype(x.dtype) * eps
                return encoder_stack(_perturb(params, s), x, mask, h=H,
                                     rng=None, dropout_p=0.0,
                                     mask_mode="key_query").astype(x.dtype)
            return lax.fori_loop(0, n, body, jnp.zeros_like(x))
        return jax.jit(chain).lower(params, x, mask).compile()

    n1, n2 = _chains(EVAL_CHAINS, T)
    times = []
    for n in (n1, n2):
        c = make(n)
        np.asarray(c(params, x, mask))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(c(params, x, mask))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    per = (times[1] - times[0]) / (n2 - n1)
    return {"mode": "eval", "T": T, "path": path, "B": B,
            "ms_per_fwd": round(per * 1e3, 4),
            "seq_per_s": round(B / per, 1), "chains": [n1, n2]}


def bench_train(params, B, T, path):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multimodal_transformer_tpu.engine.optim import adam_init, adam_update
    from multimodal_transformer_tpu.ops.attention import encoder_stack

    set_path(path)
    # fresh device copy: the chained program donates params/opt_state, so
    # the caller's shared tree must not be the donated buffer (the next
    # (T, path) cell would read deleted arrays)
    params = jax.tree_util.tree_map(jnp.array, params)
    x, mask = make_inputs(B, T, jnp.bfloat16)
    rs = np.random.RandomState(1)
    target = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    denom = jnp.sum(mask) * D
    opt_state = adam_init(params)

    def one_step(xtm, carry, key):
        x, target, mask, denom = xtm
        params, opt_state = carry

        def loss_fn(p):
            p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
            y = encoder_stack(p, x, mask, h=H, rng=key, dropout_p=0.1,
                              mask_mode="key_query")
            d = (y.astype(jnp.float32) - target) * mask
            return jnp.sum(d * d) / denom

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(params, grads, opt_state, 1e-4,
                                        weight_decay=1e-4)
        return (params, opt_state), loss

    xtm = (x, target, mask, denom)

    def make(n):
        def prog(params, opt_state, key, xtm):
            keys = jax.random.split(key, n)
            (params, opt_state), losses = lax.scan(
                functools.partial(one_step, xtm), (params, opt_state), keys)
            return params, opt_state, losses[-1]
        return jax.jit(prog, donate_argnums=(0, 1))

    n1, n2 = _chains(TRAIN_CHAINS, T)
    times = {}
    state = (params, opt_state)
    for n in (n1, n2):
        prog = make(n).lower(*state, jax.random.PRNGKey(0), xtm).compile()
        p2, o2, loss = prog(*state, jax.random.PRNGKey(0), xtm)
        np.asarray(loss)
        state = (p2, o2)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            p2, o2, loss = prog(*state, jax.random.PRNGKey(r + 1), xtm)
            np.asarray(loss)
            best = min(best, time.perf_counter() - t0)
            state = (p2, o2)
        times[n] = best
    per = (times[n2] - times[n1]) / (n2 - n1)
    return {"mode": "train", "T": T, "path": path, "B": B,
            "ms_per_step": round(per * 1e3, 4), "chains": [n1, n2]}


def probe_fit(params, B, T, force):
    """Compile-and-run probes for the three fused kernels at this T,
    reporting the guard's verdict next to reality."""
    import jax
    import jax.numpy as jnp
    import multimodal_transformer_tpu.ops.pallas.encoder as penc

    set_path("fused")
    x, mask = make_inputs(B, T, jnp.bfloat16)
    Tp = T + (-T) % 8
    its = 2
    verdicts = {
        "guard_eval_tile": penc.eval_kernel_tile_b(B, Tp, D, FF, its, H),
        "guard_train_tile": penc.train_kernel_tile_b(B, Tp, D, FF, its, H),
        "guard_bwd_tile": penc.bwd_kernel_tile_b(B, Tp, D, FF, its, H),
    }

    def attempt(name, fn):
        try:
            fn()
            verdicts[name] = "ok"
        except Exception as e:  # Mosaic VMEM failures arrive as XlaRuntimeError
            verdicts[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"

    tb_e = verdicts["guard_eval_tile"] or (1 if force else 0)
    if tb_e:
        attempt("eval_compile", lambda: np.asarray(
            penc.encoder_stack_fused(params, x, mask, h=H, tile_b=tb_e,
                                     interpret=False)))
    tb_t = verdicts["guard_train_tile"] or (1 if force else 0)
    if tb_t:
        seeds = penc.dropout_seed_table(jax.random.PRNGKey(0), N_LAYERS)
        attempt("train_fwd_compile", lambda: np.asarray(
            penc._train_fwd_impl(params["layers"], x, mask, h=H,
                                 dropout_p=0.1, seeds=seeds, tile_b=tb_t,
                                 interpret=False)[0]))
    tb_b = verdicts["guard_bwd_tile"] or (1 if force else 0)
    if tb_b and tb_t:
        # force the full custom_vjp grad path at the chosen tiles (the
        # pickers would otherwise raise where the guard says no-fit)
        orig_b, orig_t = penc.bwd_kernel_tile_b, penc.train_kernel_tile_b
        penc.bwd_kernel_tile_b = lambda *a, **k: tb_b
        penc.train_kernel_tile_b = lambda *a, **k: tb_t
        try:
            seeds = penc.dropout_seed_table(jax.random.PRNGKey(0), N_LAYERS)

            def loss(ls):
                y = penc.encoder_stack_fused_train(ls, x, mask, H, 0.1,
                                                   seeds)
                return jnp.sum((y * mask).astype(jnp.float32))

            attempt("train_bwd_compile", lambda: np.asarray(
                jax.tree_util.tree_leaves(
                    jax.grad(loss)(params["layers"]))[0]))
        finally:
            penc.bwd_kernel_tile_b = orig_b
            penc.train_kernel_tile_b = orig_t
    return {"mode": "fit", "T": T, "B": B, **verdicts}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="eval",
                    choices=["eval", "train", "fit"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ts", type=int, nargs="+",
                    default=[160, 320, 448, 512, 640, 1280])
    ap.add_argument("--paths", nargs="+",
                    default=["fused", "jnp", "flash"])
    ap.add_argument("--force", action="store_true",
                    help="fit mode: probe at tile_b=1 even where the guard "
                         "declines (finds the true Mosaic boundary)")
    args = ap.parse_args()

    import jax
    from multimodal_transformer_tpu.ops.attention import encoder_init
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()

    params = encoder_init(jax.random.PRNGKey(0), D, FF, N_LAYERS)

    for T in args.ts:
        if args.mode == "fit":
            print(json.dumps(probe_fit(params, args.batch, T, args.force)),
                  flush=True)
            continue
        for path in args.paths:
            if args.mode == "train" and path == "flash":
                continue  # flash never dispatches under dropout training
            try:
                row = (bench_eval if args.mode == "eval" else bench_train)(
                    params, args.batch, T, path)
            except Exception as e:
                row = {"mode": args.mode, "T": T, "path": path,
                       "error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
