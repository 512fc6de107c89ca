#!/usr/bin/env python
"""Optimizer-step cost on TPU: tree-Adam vs flat-Adam, honestly timed.

The train step's ~0.8 ms "misc" share (9.47 total − 1.55 front-end −
6.26 encoders − 0.85 MFN/head, examples/bench_train.py component budget)
includes the Adam update over the MFT param tree (~400 leaves, many tiny:
biases, LayerNorm vectors).  Two hypotheses this script separates:

  * tree-Adam: `engine/optim.py adam_update` as-is — XLA sees ~400
    independent elementwise chains; if horizontal fusion is poor, each
    tiny tensor pays dispatch latency and tile-padding bandwidth;
  * flat-Adam: the SAME math over ONE concatenated fp32 vector
    (`engine/optim.py flat_adam_update`, bit-exact per element —
    elementwise math is layout-blind).  Its production price is one
    grads-concat + one params-concat/split per step, INCLUDED in the
    measured number (tree-in/tree-out signature).

Timing per the repo rule: steps chained naturally (params/opt-state
carried through a lax.scan), slope between two chain lengths, host-fetch
to synchronize.  grads are re-derived from the carried params each step
(g0 + 1e-12*p) so the per-step concat cannot be hoisted out of the loop.

ROUND-4 VERDICT (v5e, this script, full MFT AVL tree — 350 leaves,
7.82 M params / 31.3 MB fp32, chains 50/400):

  tree-Adam   0.437 ms/step
  flat-Adam   2.537 ms/step   -> flat LOSES 5.8x: the per-step
                                 ravel/unravel (~700 small slice/update
                                 copies for 350 leaves) costs far more
                                 than whatever dispatch overhead it
                                 removes.  XLA's horizontal fusion of
                                 the tree update is already decent:
                                 0.437 measured vs 0.267 ms HBM floor
                                 (219 MB/step @ 819 GB/s), so the
                                 optimizer's total remaining headroom
                                 is ~0.17 ms of the 9.47 ms train step.

  -> tree-Adam stays the default; MMTX_FLAT_ADAM=1 kept as tested,
     documented code (bit-exact, tests/test_engine.py).  This also
     accounts for the train step's "misc" share: ~0.44 ms Adam + loss +
     casts + rng folding.

Usage: python examples/bench_optim.py [--chains N1 N2]
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


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def make_chained(runner):
    """jit cache per (static) chain length."""
    cache = {}

    def f(n, *a):
        if n not in cache:
            cache[n] = jax.jit(lambda *aa: runner(n, *aa))
        return cache[n](*a)
    return f


def timeit(fn, args, n1, n2):
    """Slope timing between two chain lengths (cancels RTT + transfer)."""
    fetch(fn(n1, *args))   # compile n1
    fetch(fn(n2, *args))   # compile n2
    t0 = time.perf_counter()
    fetch(fn(n1, *args))
    t1 = time.perf_counter()
    fetch(fn(n2, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, nargs=2, default=(50, 400),
                    metavar=("N1", "N2"))
    args = ap.parse_args()
    n1, n2 = args.chains

    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.engine.optim import (
        adam_init, adam_update, flat_adam_init, flat_adam_update)
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache()
    cfg = default_config("MFT", ("acoustic", "image", "linguistic"))
    init, _ = build_model(cfg)
    params = init(jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(l.size for l in leaves)
    print(f"param tree: {len(leaves)} leaves, {n_params / 1e6:.2f} M params,"
          f" {n_params * 4 / 1e6:.1f} MB fp32")

    # param-shaped grad seed; inside the chain grads are re-derived from
    # the CARRIED params (top-of-graph dependency) so nothing is hoisted
    g0 = jax.tree_util.tree_map(lambda p: p * 1e-3 + 1e-4, params)
    lr = jnp.float32(1e-4)

    def deps_grads(g0, p):
        return jax.tree_util.tree_map(lambda g, pp: g + 1e-12 * pp, g0, p)

    def runner_tree(n, params, st, g0):
        def body(c, _):
            p, s = c
            p, s = adam_update(p, deps_grads(g0, p), s, lr)
            return (p, s), ()
        (p, _), _ = lax.scan(body, (params, st), None, length=n)
        return p

    def runner_flat(n, params, st, g0):
        def body(c, _):
            p, s = c
            p, s = flat_adam_update(p, deps_grads(g0, p), s, lr)
            return (p, s), ()
        (p, _), _ = lax.scan(body, (params, st), None, length=n)
        return p

    ms_tree = timeit(make_chained(runner_tree),
                     (params, adam_init(params), g0), n1, n2)
    print(f"tree-Adam:  {ms_tree:.3f} ms/step")
    ms_flat = timeit(make_chained(runner_flat),
                     (params, flat_adam_init(params), g0), n1, n2)
    print(f"flat-Adam:  {ms_flat:.3f} ms/step (incl. per-step "
          f"concat/split, tree-in/tree-out)")

    bytes_step = n_params * 4 * 7  # read p,g,m,v; write p,m,v
    print(f"HBM floor ({bytes_step / 1e6:.0f} MB/step @ 819 GB/s): "
          f"{bytes_step / 819e9 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
