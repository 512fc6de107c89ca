#!/usr/bin/env python
"""Component-level latency budget of the MFT TRAINING step on TPU.

Times each pipeline stage's forward+backward with the honest methodology
(chained fori_loop where a tiny SGD update threads the stage's own grads
back into its weights — every iteration is carry-dependent and the
update costs ~2 HBM passes over the stage params, negligible vs the
fwd+bwd; host-fetch timing; slope between two chain lengths).  Dropout
is ON (hash impl default) with a per-iteration folded key so mask bits
are not loop-invariant.

Stages: front-end fwd+bwd, embed + 3x6-layer encoders fwd+bwd, MFN
recurrence+head fwd+bwd, FULL loss fwd+bwd (no optimizer), FULL train
step with Adam (= examples/bench_train.py's measurand).

Usage: python examples/bench_train_components.py [--fp32|--mixed]
       [--no_dropout]
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
N1, N2 = 20, 120


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
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 activations (CLI default); default bf16 data")
    ap.add_argument("--mixed", action="store_true",
                    help="--mixed_precision recipe: fp32 masters, bf16 "
                         "compute (stage params cast inside the loss)")
    ap.add_argument("--no_dropout", action="store_true")
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
    target = jnp.asarray(rs.rand(B, T, 1).astype(np.float32))
    if not args_cli.fp32:
        data = {m: v.astype(jnp.bfloat16) for m, v in data.items()}
    use_rng = not args_cli.no_dropout
    head = params["Transformer"]

    lr = jnp.asarray(1e-30, jnp.float32)  # chaining update, ~no-op numerics

    def sgd(p, g):
        return jax.tree_util.tree_map(lambda w, d: w - lr * d.astype(w.dtype),
                                      p, g)

    def key_for(i):
        return jax.random.fold_in(jax.random.PRNGKey(42), i)

    def cmp_cast(p):
        # --mixed: grads w.r.t. fp32 masters THROUGH the bf16 cast, like
        # bench_train.py / train.py --mixed_precision
        if not args_cli.mixed:
            return p
        return jax.tree_util.tree_map(
            lambda w: w.astype(jnp.bfloat16)
            if w.dtype == jnp.float32 else w, p)

    results = {}

    # 1. front-end fwd+bwd (no dropout at eval... keep rng to match train)
    def mk_front(n):
        def prog(params, data):
            def body(i, p):
                def loss_fn(p):
                    outs = frontend_apply(
                        cmp_cast(p), data, MODS,
                        rng=key_for(i) if use_rng else None)
                    return sum(jnp.sum(o * o) for o in outs.values())
                g = jax.grad(loss_fn)(p)
                return sgd(p, g)
            return lax.fori_loop(0, n, body, params)
        return prog
    results["front-end fwd+bwd"] = slope(mk_front, (params, data))

    # 2. embed + encoders fwd+bwd on precomputed front-end outputs
    fr = frontend_apply(params, data, MODS, rng=None)
    fr = {m: v.block_until_ready() for m, v in fr.items()}

    def mk_enc(n):
        def prog(head, fr, mask):
            def body(i, h):
                def loss_fn(h):
                    h = cmp_cast(h)
                    s = 0.0
                    rngs = (jax.random.split(key_for(i), 3)
                            if use_rng else [None] * 3)
                    for j, m in enumerate(MODS):
                        e = linear(h[f"embed_{m}"], fr[m])
                        o = encoder_stack(h[f"transformer_{m}"], e, mask,
                                          mask_mode="key_query",
                                          rng=rngs[j] if use_rng else None,
                                          dropout_p=0.1 if use_rng else 0.0)
                        s = s + jnp.sum(o * o)
                    return s
                g = jax.grad(loss_fn)(h)
                return sgd(h, g)
            return lax.fori_loop(0, n, body, head)
        return prog
    results["embed+3x6enc fwd+bwd"] = slope(mk_enc, (head, fr, mask))

    # 3. MFN recurrence + head fwd+bwd
    dt = data[MODS[0]].dtype
    enc = {m: jnp.asarray(rs.randn(B, T, 256), np.float32).astype(dt)
           for m in MODS}

    def mk_mfn(n):
        def prog(head, enc):
            def body(i, h):
                def loss_fn(h):
                    h = cmp_cast(h)
                    o = mfn_scan(h["mfn"], enc, MODS,
                                 rng=key_for(i) if use_rng else None)
                    return jnp.sum(o * o)
                g = jax.grad(loss_fn)(h)
                return sgd(h, g)
            return lax.fori_loop(0, n, body, head)
        return prog
    results["MFN+head fwd+bwd"] = slope(mk_mfn, ({"mfn": head["mfn"]}, enc))

    # 4. FULL loss fwd+bwd (no optimizer)
    def mk_full(n):
        def prog(params, data, mask, target):
            def body(i, p):
                def loss_fn(p):
                    pred = apply(cmp_cast(p), data, mask,
                                 rng=key_for(i) if use_rng else None)
                    d = (pred - target) * mask
                    return jnp.sum(d * d) / jnp.sum(mask)
                g = jax.grad(loss_fn)(p)
                return sgd(p, g)
            return lax.fori_loop(0, n, body, params)
        return prog
    results["FULL fwd+bwd (sgd chain)"] = slope(
        mk_full, (params, data, mask, target))

    from multimodal_transformer_tpu.ops.dispatch import pallas_enabled
    mode = "fp32" if args_cli.fp32 else (
        "mixed(bf16 compute)" if args_cli.mixed else "bf16-data")
    print(f"MFT AVL TRAIN component budget, B={B} T={T} {mode} "
          f"dropout={'on' if use_rng else 'off'}, kernels: "
          f"MFN={pallas_enabled('mfn')} encoder={pallas_enabled('encoder')} "
          f"wembed={pallas_enabled('wembed')} on {jax.devices()[0]}")
    for name, ms in results.items():
        print(f"  {name:28s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
