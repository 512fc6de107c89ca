#!/usr/bin/env python
"""Honest (chained-dependency, slope-timed) timing of the MFN recurrence
variants on TPU.

Round 1 timed each variant with per-call dispatch over the remote tunnel;
VERDICT round 1 asked for a re-measurement.  Methodology (same as bench.py):
each candidate runs n full forwards inside one jitted lax.fori_loop where
step i+1's LSTM input-projection WEIGHTS (every modality) consume step i's
output — a top-of-graph dependency (no overlap, no loop-invariant hoisting)
whose perturbation traffic is ~µs.  Perturbing the [B,T,D] input tensors
instead re-materializes ~15 MB/iteration — the measurement artifact the
CLAUDE.md timing rule forbids (it biased early round-2 A/B verdicts).  The
result is fetched to host (the remote backend's block_until_ready returns
early); per-forward ms is the slope between two chain lengths (cancels
tunnel RTT + transfer).

Usage: python examples/bench_mfn_kernel.py  (on the TPU backend)
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

from multimodal_transformer_tpu.ops.basic import linear
from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan
from multimodal_transformer_tpu.ops.pallas.mfn_kernel import (
    mfn_scan_pallas, mfn_scan_pallas_aligned, mfn_scan_pallas_packed)

MODS = ("acoustic", "image", "linguistic")
B, T, D = 32, 160, 256
# long chains: the tunnel adds ~27 ms RTT with ~1-2 ms jitter per fetch, so
# the inter-length delta must be >> the jitter for a stable slope
N1, N2 = 20, 120


def head(params, hs, mems):
    feats = jnp.concatenate([hs, mems], axis=2)
    return linear(params["out_fc2"],
                  jax.nn.relu(linear(params["out_fc1"], feats)))


def candidates():
    return {
        "lax.scan": lambda p, d: mfn_scan(p, d, MODS),
        "pallas-unpadded": lambda p, d: head(p, *mfn_scan_pallas(p, d, MODS)),
        "pallas-aligned": lambda p, d: head(
            p, *mfn_scan_pallas_aligned(p, d, MODS)),
        "pallas-packed": lambda p, d: head(
            p, *mfn_scan_pallas_packed(p, d, MODS)),
    }


def time_chained(fn, params, inputs):
    def timed(n):
        def prog(params, inputs):
            def body(_, carry):
                s = jnp.sum(carry) * jnp.asarray(1e-30, carry.dtype)
                p = dict(params)
                for m in MODS:  # weight-perturb chaining (see docstring)
                    lstm = dict(p[f"lstm_{m}"])
                    lstm["weight_ih"] = lstm["weight_ih"] + s
                    p[f"lstm_{m}"] = lstm
                return fn(p, inputs)
            return lax.fori_loop(0, n, body,
                                 jnp.zeros((B, T, 1),
                                           inputs[MODS[0]].dtype))

        c = jax.jit(prog).lower(params, inputs).compile()
        np.asarray(c(params, inputs))  # warmup + fetch
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(c(params, inputs))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(N2) - timed(N1)) / (N2 - N1) * 1e3


def main():
    params = mfn_init(jax.random.PRNGKey(0), MODS, {m: D for m in MODS}, 1)
    rs = np.random.RandomState(0)
    inputs = {m: jnp.asarray(rs.randn(B, T, D).astype(np.float32))
              for m in MODS}
    print(f"MFN recurrence, B={B} T={T} AVL fp32 "
          f"on {jax.devices()[0]}, slope between n={N1} and n={N2}")
    for name, fn in candidates().items():
        ms = time_chained(fn, params, inputs)
        print(f"  {name:18s} {ms:7.3f} ms/forward")


if __name__ == "__main__":
    main()
