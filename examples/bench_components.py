#!/usr/bin/env python
"""Component-level latency budget of the MFT forward on TPU (slope-timed).

Times each pipeline stage with the honest methodology (chained fori_loop,
the previous output perturbing the stage's WEIGHTS so every op is
carry-dependent with ~zero perturbation traffic, host-fetch timing, slope
between two chain lengths) to show where the forward actually spends its
time.  Stages: front-end (CNN+highway x3 mods), per-mod embed + 6-layer
encoder (x3), MFN recurrence + head, full model.

Usage: python examples/bench_components.py [--bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, T = 32, 160
FRAMES = {"linguistic": 32, "acoustic": 4, "image": 4}
MODS = ("acoustic", "image", "linguistic")
N1, N2 = 20, 120  # long chains: slope delta must be >> the ~1-2 ms RTT jitter


def slope(make_prog, args, n1=N1, n2=N2):
    def timed(n):
        c = jax.jit(make_prog(n)).lower(*args).compile()
        np.asarray(jax.tree_util.tree_leaves(c(*args))[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(c(*args))[0])
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(n2) - timed(n1)) / (n2 - n1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 serving mode (the default; explicit alias)")
    args_cli = ap.parse_args()

    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.models.frontend import frontend_apply
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.basic import linear
    from multimodal_transformer_tpu.ops.mfn_core import mfn_scan

    cfg = default_config("MFT", MODS, mask_mode="key_query")
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    data = {m: jnp.asarray(rs.randn(B, T, FRAMES[m], cfg.mod_dimension[m])
                           .astype(np.float32)) for m in MODS}
    mask_np = np.ones((B, T, 1), np.float32)
    mask = jnp.asarray(mask_np)
    if not args_cli.fp32:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), t)
        params, data, mask = cast(params), cast(data), mask.astype(
            jnp.bfloat16)
    dt = data[MODS[0]].dtype
    eps = jnp.asarray(1e-30, dt)
    head = params["Transformer"]

    results = {}

    # Chaining rule (same as bench.py): perturb the stage's WEIGHTS with a
    # scalar from the previous output, never its big input tensors —
    # input-perturbation re-materializes the inputs every iteration (pure
    # artifact, ~0.4 ms/fwd over the full model @ B=32) while a weight
    # perturbation costs ~µs and still makes every op carry-dependent.
    # The carry must also consume EVERY modality's output or DCE deletes
    # the unused branches (an early version fed only acoustic back and
    # measured 0.002 ms for a 57-GFLOP stage).
    def _perturb_conv(params, s):
        p = dict(params)
        for m in MODS:
            cnn = dict(p[f"cnn_{m}"])
            conv = dict(cnn["conv1d"])
            conv["weight"] = conv["weight"] + s
            cnn["conv1d"] = conv
            p[f"cnn_{m}"] = cnn
        return p

    # 1. front-end: dict [B,T,F,D] -> dict [B,T,E]
    def mk_front(n):
        def prog(params, data):
            def body(_, carry):
                p = _perturb_conv(params, jnp.sum(carry).astype(dt) * eps)
                outs = frontend_apply(p, data, MODS, rng=None)
                return sum(o[:, :, :1] for o in outs.values())
            return lax.fori_loop(0, n, body,
                                 jnp.zeros((B, T, 1), dt))
        return prog
    results["front-end (3 mods)"] = slope(mk_front, (params, data))

    # 2. embed + encoders (3 x 6 layers) on [B,T,E] inputs
    fr = frontend_apply(params, data, MODS, rng=None)
    fr = {m: v.block_until_ready() for m, v in fr.items()}

    def _perturb_embed(head, s):
        h = dict(head)
        for m in MODS:
            emb = dict(h[f"embed_{m}"])
            emb["weight"] = emb["weight"] + s
            h[f"embed_{m}"] = emb
        return h

    def mk_enc(n):
        def prog(head, fr, mask):
            def body(_, carry):
                h = _perturb_embed(head, jnp.sum(carry).astype(dt) * eps)
                outs = []
                for m in MODS:
                    e = linear(h[f"embed_{m}"], fr[m])
                    outs.append(encoder_stack(
                        h[f"transformer_{m}"], e, mask,
                        mask_mode="key_query"))
                return outs[0] + outs[1] + outs[2]
            return lax.fori_loop(0, n, body, jnp.zeros((B, T, 256), dt))
        return prog
    results["embed + 3x6-layer encoders"] = slope(mk_enc, (head, fr, mask))

    # 3. MFN recurrence + output head on [B,T,256] inputs
    enc = {m: jnp.asarray(rs.randn(B, T, 256), dt) for m in MODS}

    def mk_mfn(n):
        def prog(head, enc):
            def body(_, carry):
                s = jnp.sum(carry).astype(dt) * eps
                mfn = dict(head["mfn"])
                for m in MODS:
                    lstm = dict(mfn[f"lstm_{m}"])
                    lstm["weight_ih"] = lstm["weight_ih"] + s
                    mfn[f"lstm_{m}"] = lstm
                return mfn_scan(mfn, enc, MODS)
            return lax.fori_loop(0, n, body, jnp.zeros((B, T, 1), dt))
        return prog
    results["MFN recurrence + head"] = slope(mk_mfn, (head, enc))

    # 3.5 embed + encoders + MFN composed, from precomputed front-end
    # outputs (isolates the front-end-in-context cost vs FULL)
    def mk_enc_mfn(n):
        def prog(head, fr, mask):
            def body(_, carry):
                h = _perturb_embed(head, jnp.sum(carry).astype(dt) * eps)
                mfn_in = {}
                for m in MODS:
                    e = linear(h[f"embed_{m}"], fr[m])
                    mfn_in[m] = encoder_stack(
                        h[f"transformer_{m}"], e, mask,
                        mask_mode="key_query")
                return mfn_scan(h["mfn"], mfn_in, MODS) * mask
            return lax.fori_loop(0, n, body, jnp.zeros((B, T, 1), dt))
        return prog
    results["embed+enc+MFN composed"] = slope(mk_enc_mfn, (head, fr, mask))

    # 4. full model
    def mk_full(n):
        def prog(params, data, mask):
            def body(_, carry):
                p = _perturb_conv(params, jnp.sum(carry).astype(dt) * eps)
                return apply(p, data, mask, rng=None)
            return lax.fori_loop(0, n, body, jnp.zeros(mask.shape,
                                                       mask.dtype))
        return prog
    results["FULL forward"] = slope(mk_full, (params, data, mask))

    from multimodal_transformer_tpu.ops.dispatch import pallas_enabled
    mode = "fp32" if args_cli.fp32 else "bf16"
    print(f"MFT AVL component budget, B={B} T={T} {mode}, "
          f"kernels: MFN={pallas_enabled('mfn')} "
          f"encoder={pallas_enabled('encoder')} "
          f"wembed={pallas_enabled('wembed')} on {jax.devices()[0]}")
    for name, ms in results.items():
        print(f"  {name:30s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
