#!/usr/bin/env python
"""Honest (chained-dependency, slope-timed) micro-bench of the fused
encoder-stack Pallas kernel vs the jnp/XLA path, on TPU.

Methodology (the repo timing rule, CLAUDE.md): each candidate runs n full
6-layer stacks inside one jitted lax.fori_loop where step i+1's FIRST
LAYER qkv WEIGHT is perturbed by a scalar derived from step i's output —
a top-of-graph dependency with ~zero perturbation traffic; results are
fetched to host; per-forward ms is the slope between two chain lengths.

Two hard-won lessons encoded here (ops/dispatch.py table):
  * chain deltas must be LONG (n2-n1 >= ~300 steps for a ~0.5 ms stage) —
    with 100-step deltas the ~15 ms tunnel-RTT jitter produced "1.5x"
    verdicts in both directions for the same binary;
  * cross-process absolute times drift +-15%; compare variants within ONE
    process, and treat the END-TO-END idle-host A/B (bench.py with
    MMTX_PALLAS_ENCODER=0/1) as the decisive number.

Usage: python examples/bench_encoder_kernel.py  (on the TPU backend)
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

from multimodal_transformer_tpu.ops.attention import (encoder_init,
                                                      encoder_stack)
from multimodal_transformer_tpu.ops.pallas.encoder import encoder_stack_fused

B, T, D, h, F, N = 32, 160, 256, 8, 128, 6
N1, N2 = 50, 400


def main():
    params = encoder_init(jax.random.PRNGKey(0), D, F, N)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    mask_np = np.ones((B, T, 1), np.float32)
    for i in range(B):
        mask_np[i, T - (i % 5):] = 0.0
    mask = jnp.asarray(mask_np)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t)
    params, x = cast(params), cast(x)
    mask = mask.astype(jnp.bfloat16)
    dt = x.dtype
    eps = jnp.asarray(1e-30, dt)

    def perturb(p, s):
        p = dict(p)
        l0 = dict(p["layers"][0])
        sa = dict(l0["self_attn"])
        lin = [dict(q) for q in sa["linears"]]
        lin[0] = dict(lin[0], weight=lin[0]["weight"] + s)
        sa["linears"] = lin
        l0["self_attn"] = sa
        p["layers"] = [l0] + list(p["layers"][1:])
        return p

    def mk(fn):
        def make(n):
            def prog(params, x, mask):
                def body(_, carry):
                    s = jnp.sum(carry).astype(dt) * eps
                    return fn(perturb(params, s), x, mask)
                return lax.fori_loop(0, n, body, jnp.zeros((B, T, D), dt))
            return prog
        return make

    def slope(make, args, n1=N1, n2=N2, reps=4):
        def timed(n):
            c = jax.jit(make(n)).lower(*args).compile()
            np.asarray(c(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(c(*args))
                best = min(best, time.perf_counter() - t0)
            return best
        return (timed(n2) - timed(n1)) / (n2 - n1) * 1e3

    args = (params, x, mask)
    t_ref = slope(mk(lambda p, xx, m: encoder_stack(
        p, xx, m, h=h, rng=None, dropout_p=0.0, mask_mode="key_query")),
        args)
    print(f"jnp/XLA 6-layer encoder      : {t_ref:.3f} ms")
    for g in (4, 2, 8):
        t = slope(mk(lambda p, xx, m, g=g: encoder_stack_fused(
            p, xx, m, h=h, av_group=g)), args)
        star = "  <- default" if g == 4 else ""
        print(f"fused kernel av_group={g}     : {t:.3f} ms "
              f"({t_ref / t:.2f}x){star}")


if __name__ == "__main__":
    main()
