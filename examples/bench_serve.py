"""Warm serving-latency benchmark for `serve.ValencePredictor`.

Measures what a deployment actually sees: wall-clock per-request latency of
a warmed-up predictor answering one-video requests (the reference has no
serving path at all — its eval is research code at bs=1,
`MFT/train.py:199-257`).

Methodology notes for this environment:
- `predict_padded` already fetches results to host (`np.asarray`), which is
  the only reliable completion barrier on the remote-tunnel backend
  (CLAUDE.md timing rule), so plain wall timing around it is correct.
- Request latency over the axon tunnel includes network RTT and ~MB/s
  payload shipping that a production (local-chip, PCIe) deployment would
  not pay.  We measure the RTT floor (a warmed trivial-program round-trip)
  and report the remainder (`beyond_rtt_ms`) together with the request
  payload size so the transfer-bound share is visible: device compute for
  a B=1/T=160 MFT forward is ~2 ms (examples/bench_components.py), so
  locally the warm request would be transfer+compute, single-digit ms.

Run:  python examples/bench_serve.py [--requests 30] [--windows 160]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_transformer_tpu.models import build_model, default_config  # noqa: E402
from multimodal_transformer_tpu.serve import ValencePredictor  # noqa: E402

FRAMES = {"linguistic": 32, "acoustic": 4, "image": 4}
MODS = ("acoustic", "image", "linguistic")


def _percentiles(xs):
    xs = np.asarray(xs, np.float64)
    return {f"p{p}": round(float(np.percentile(xs, p)), 2)
            for p in (50, 90, 95)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=30)
    ap.add_argument("--windows", type=int, default=160,
                    help="rating windows in the request video (~2.7 min)")
    ap.add_argument("--family", default="MFT")
    args = ap.parse_args()

    cfg = default_config(args.family, MODS, mask_mode="key_query")
    init, _ = build_model(cfg)
    params = init(jax.random.PRNGKey(0))
    # batch_size=1: the latency-optimized instance (one video per program).
    pred = ValencePredictor(cfg, params, batch_size=1, bf16=True)

    rs = np.random.RandomState(0)
    W = args.windows
    data = {m: rs.randn(1, W, FRAMES[m], cfg.mod_dimension[m])
            .astype(np.float32) for m in MODS}

    # RTT floor: warmed trivial program round-trip (compile outside timing).
    tiny = jax.jit(lambda x: x + 1)
    np.asarray(tiny(jnp.zeros((8,), jnp.float32)))
    rtt = []
    for _ in range(args.requests):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.zeros((8,), jnp.float32)))
        rtt.append((time.perf_counter() - t0) * 1e3)

    # Warm the one bucket program this request shape uses.
    pred.predict_padded(data, [W])
    lat = []
    for _ in range(args.requests):
        t0 = time.perf_counter()
        traces = pred.predict_padded(data, [W])
        lat.append((time.perf_counter() - t0) * 1e3)
    assert len(traces) == 1 and traces[0].shape == (W,)

    lp, rp = _percentiles(lat), _percentiles(rtt)
    payload_mb = sum(v.nbytes for v in data.values()) / 1e6
    print(json.dumps({
        "family": args.family, "windows": W, "requests": args.requests,
        "warm_request_ms": lp, "tunnel_rtt_floor_ms": rp,
        "beyond_rtt_ms_p50": round(lp["p50"] - rp["p50"], 2),
        "payload_mb": round(payload_mb, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
