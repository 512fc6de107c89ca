#!/usr/bin/env python
"""One-process softmax ablation on the fused-encoder eval stage (TPU).

Bounds the masked softmax's share of the fused encoder-stack kernel by
alternating MMTX_ENC_SOFTMAX in {ref, skip, ref, skip} around FRESH
traces (the env var is read at trace time inside the kernel), with the
repo's honest timing: weight-perturb chained fori_loop, host-fetch
timing, slope between 50/400 chain lengths (sub-ms stages need chain
deltas >= ~300 steps — see ops/dispatch.py "measurement hygiene").

'skip' replaces softmax with a uniform 1/T scale — WRONG numerics, a
bound only.  Measured (v5e, B=32, T=160, bf16, idle host): ref
1.163/1.177 ms vs skip 0.949/0.965 ms -> the full softmax is ~18% of
the stage; the removable part (the row-max pass, =nomax) was separately
measured e2e-neutral, so this is a documented plateau, not a to-do.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, T = 32, 160
MODS = ("acoustic", "image", "linguistic")
N1, N2 = 50, 400


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
    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.basic import linear

    cfg = default_config("MFT", MODS, mask_mode="key_query")
    init, _ = build_model(cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), init(jax.random.PRNGKey(0)))
    head = params["Transformer"]
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    fr = {m: jnp.asarray(rs.randn(B, T, cfg.window_embed_size[m]), dt)
          for m in MODS}
    mask = jnp.ones((B, T, 1), dt)
    eps = jnp.asarray(1e-30, dt)

    def _perturb_embed(h0, s):
        h = dict(h0)
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

    for variant in ("ref", "skip", "ref", "skip"):
        os.environ["MMTX_ENC_SOFTMAX"] = variant
        ms = slope(mk_enc, (head, fr, mask))
        print(f"encoder stage, softmax={variant:6s}: {ms:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
