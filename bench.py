#!/usr/bin/env python
"""Benchmark: eval sequences/sec/chip, MFT (A+V+L), batch=32.

This is the BASELINE.json north-star metric.  The reference publishes no
throughput numbers (SURVEY.md §6); the CPU baseline is the reference
computation (torch, per-timestep Python-loop MFN — the same structure the
reference runs) measured on this host via tests/torch_oracle.py, cached in
bench_baseline_cpu.json.  `vs_baseline` is the TPU/CPU speedup ratio
(target: >= 20x).

Usage:
  python bench.py                  # measure on the default JAX device (TPU)
  python bench.py --measure-baseline   # re-measure + cache the CPU baseline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline_cpu.json")

# Representative SEND shapes: ~160 one-second windows per video (2.7 min),
# linguistic 5-s windows hold up to ~32 word vectors, acoustic/image a few
# frames per 1-s window (SURVEY.md §2.1; comment "(batch_size, 39, 33, 300)"
# at reference MFT/models.py:113).
BATCH = 32
T = 160
FRAMES = {"linguistic": 32, "acoustic": 4, "image": 4}
MODS = ("acoustic", "image", "linguistic")


def make_host_batch(cfg, seed=0, batch=None):
    B = batch or BATCH
    rs = np.random.RandomState(seed)
    data = {m: rs.randn(B, T, FRAMES[m], cfg.mod_dimension[m])
            .astype(np.float32) for m in MODS}
    lengths = [T - (i % 5) for i in range(B)]
    mask = np.zeros((B, T, 1), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    return data, mask


V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak FLOP/s
V5E_FP32_PEAK = V5E_BF16_PEAK / 4  # fp32 matmuls run ~4x slower on the MXU


def wait_tpu_ready(total_wait_s: float = 900, probe_timeout_s: float = 120):
    """Block until the (remote-tunnel) TPU actually executes work.

    The axon tunnel's remote end can go unreachable for tens of minutes
    (device list still returns instantly — only execution/fetch hangs), so
    a raw bench run would hang, not fail.  Probe with a tiny
    compile+execute+fetch in a killable subprocess; retry inside the
    window.  Returns True when healthy, False if the window expires.
    Override the window with MMTX_BENCH_WAIT (seconds, 0 = single probe).
    """
    import subprocess
    total_wait_s = float(os.environ.get("MMTX_BENCH_WAIT", total_wait_s))
    # The probe must FAIL (not silently pass) if jax fell back to CPU — a
    # CPU fallback would otherwise publish CPU throughput as seq/s/chip.
    probe = ("import jax, jax.numpy as jnp, numpy as np; "
             "assert jax.default_backend() != 'cpu', jax.default_backend(); "
             "x = jnp.ones((8, 8)); print(float(np.asarray(x.sum())))")
    deadline = time.monotonic() + total_wait_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout_s,
                               capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print("bench: TPU tunnel not serving, retrying in 60 s "
              f"(deadline in {deadline - time.monotonic():.0f} s)",
              file=sys.stderr)
        time.sleep(60)


def measure_tpu(n_chain=(10, 40), n_slopes=3, batch=None):
    """Steady-state eval throughput with CHAINED iterations, slope-timed.

    Round-1's loop dispatched n independent async calls and blocked only on
    the last — over the remote tunnel that overlapped/elided work and
    produced >100%-MFU numbers (VERDICT round 1).  Honest methodology:

      * one jitted program runs n forwards in a lax.fori_loop where step
        i+1's CONV WEIGHTS (every modality) are perturbed by a scalar
        derived from step i's output — a real, un-foldable dependency at
        the very top of the graph, so XLA can neither overlap iterations
        nor hoist anything (the front-end matmuls' weight operand changes
        every iteration, and all downstream stages consume the front-end).
        Perturbing the weights instead of the inputs (the first honest
        variant) avoids re-materializing ~300 MB of input tensors per
        iteration — pure measurement artifact worth ~0.4 ms/fwd @ B=32;
      * timing fetches the result to host (np.asarray) — on the remote
        backend block_until_ready() returns before execution finishes;
      * per-forward time is the SLOPE between two chain lengths, which
        cancels the constant tunnel RTT + transfer overhead;
      * the slope is measured n_slopes (>=3) INDEPENDENT times
        (best-of-2 per chain length per slope to clip RTT spikes) so the
        artifact carries a variance band — BENCH_r04's -2.3% eval wiggle
        vs r03 was uninterpretable without one (VERDICT r4 #4).

    Returns (seq_per_s_runs: list, mfu_of_median, flops_per_batch, device).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multimodal_transformer_tpu.models import build_model, default_config

    B = batch or BATCH
    cfg = default_config("MFT", MODS, mask_mode="key_query")
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(0))
    data_np, mask_np = make_host_batch(cfg, batch=B)
    data = {m: jnp.asarray(v) for m, v in data_np.items()}
    mask = jnp.asarray(mask_np)
    if os.environ.get("MMTX_BF16", "1") != "0":
        # bf16 serving mode is the default production eval config
        # (~1.7-2x on v5e; |output diff| ~1e-3, CCC within 0.05 abs —
        # tests/test_engine.py::test_bf16_batched_eval_close_to_fp32).
        # MMTX_BF16=0 benches the fp32 path.
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), t)
        params, data, mask = cast(params), cast(data), mask.astype(
            jnp.bfloat16)

    eps = jnp.asarray(1e-30, data[MODS[0]].dtype)
    dt = data[MODS[0]].dtype

    def make_chain(n):
        def chain(params, data, mask):
            def body(_, carry):
                # feed the previous output back into EVERY modality's conv
                # weights: numerically a no-op (sum(pred)*1e-30 underflows
                # against unit-scale weights) but a hard data dependency at
                # the top of the graph — the front-end matmuls' weight
                # operand changes every iteration, so nothing is
                # loop-invariant and nothing overlaps.  The perturbation
                # itself rewrites only ~0.7 M weight elements (~4 µs).
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

    n1, n2 = n_chain
    assert n1 < n2, f"slope timing needs n1 < n2, got {n_chain}"
    # FLOP count read off the first chained program itself: XLA's cost
    # analysis counts a While body once (not x trip count), so the chained
    # program reports the same total as one forward — verified on v5e
    # round-5 session: 161.1 GFLOP @ B=32 with the fused encoder kernels
    # ON (Mosaic CostEstimate) vs 162.8 with them OFF (XLA's own count) =
    # 5.03/5.09 GFLOP/seq, consistent with the analytic estimate; the
    # per-iteration weight perturbation adds ~2 MFLOP, 0.001% noise.
    # Reusing the chain avoids a third ~10-40 s remote compile that
    # round-2 previously spent on an unchained forward.
    flops_per_batch = None
    compiled = {}
    for n in (n1, n2):
        compiled[n] = make_chain(n)
        if flops_per_batch is None:
            try:
                ca = compiled[n].cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                if ca and ca.get("flops"):
                    flops_per_batch = float(ca["flops"])
            except Exception:
                pass
        np.asarray(compiled[n](params, data, mask))  # warmup + fetch

    def timed(n):
        best = float("inf")
        for _ in range(2):   # best-of-2 clips tunnel RTT spikes per run
            t0 = time.perf_counter()
            np.asarray(compiled[n](params, data, mask))
            best = min(best, time.perf_counter() - t0)
        return best

    runs = []
    for _ in range(max(n_slopes, 1)):
        per_fwd = (timed(n2) - timed(n1)) / (n2 - n1)
        runs.append(B / per_fwd)
    med = sorted(runs)[len(runs) // 2]
    peak = (V5E_BF16_PEAK if os.environ.get("MMTX_BF16", "1") != "0"
            else V5E_FP32_PEAK)  # MFU against the roofline actually in use
    mfu = (flops_per_batch * (med / B) / peak
           if flops_per_batch else None)
    dev = jax.devices()[0]
    return runs, mfu, flops_per_batch, str(dev)


def measure_train(n_chain=(10, 60), n_slopes=3, batch=None):
    """Training-step time on the production recipe (mixed precision, all
    default kernels, dropout ON, hash impl) — the examples/bench_train.py
    methodology: steps chain NATURALLY (step i+1 consumes step i's params +
    opt state) in a lax.scan, per-step time is the slope between two scan
    lengths, timing is by host fetch.  The slope is measured n_slopes
    independent times (variance band, VERDICT r4 #4).  Returns
    (ms_per_step_runs: list, train_mfu_of_median, flops_per_step).
    train_mfu is against the bf16 peak (the matmuls run bf16 under the
    mixed recipe; fp32 master params/optimizer)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from multimodal_transformer_tpu.engine.optim import adam_init, adam_update
    from multimodal_transformer_tpu.models import build_model, default_config

    B = batch or BATCH
    cfg = default_config("MFT", MODS, mask_mode="key_query")
    init_fn, apply_fn = build_model(cfg)
    params = init_fn(jax.random.PRNGKey(1))
    opt_state = adam_init(params)
    rs = np.random.RandomState(0)
    data = {m: jnp.asarray(rs.randn(B, T, FRAMES[m], cfg.mod_dimension[m])
                           .astype(np.float32)).astype(jnp.bfloat16)
            for m in MODS}
    target = jnp.asarray(rs.randn(B, T, 1).astype(np.float32))
    mask_np = np.zeros((B, T, 1), np.float32)
    for i in range(B):
        mask_np[i, :T - (i % 5)] = 1.0
    mask = jnp.asarray(mask_np)
    denom = jnp.asarray(mask_np.sum())

    def one_step(dtm, carry, key):
        data, target, mask, denom = dtm
        params, opt_state = carry

        def loss_fn(p):
            # mixed recipe: bf16 compute, fp32 masters (grads flow through
            # the cast and arrive fp32 at the master params)
            p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
            pred = apply_fn(p, data, mask, rng=key)
            d = pred - target
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

    n1, n2 = n_chain
    # one compiled program per chain length; donation threads state through
    # every run, so repeats stay artifact-free
    progs, state = {}, (params, opt_state)
    for n in (n1, n2):
        progs[n] = make(n).lower(*state, jax.random.PRNGKey(0),
                                 dtm).compile()
        p2, o2, loss = progs[n](*state, jax.random.PRNGKey(0), dtm)
        np.asarray(loss)  # warmup + fetch
        state = (p2, o2)

    def timed(n, state, r):
        best = float("inf")
        for k in range(2):
            t0 = time.perf_counter()
            p2, o2, loss = progs[n](*state, jax.random.PRNGKey(10 * r + k),
                                    dtm)
            np.asarray(loss)
            best = min(best, time.perf_counter() - t0)
            state = (p2, o2)
        return best, state

    runs = []
    for r in range(max(n_slopes, 1)):
        t1, state = timed(n1, state, 2 * r)
        t2, state = timed(n2, state, 2 * r + 1)
        runs.append((t2 - t1) / (n2 - n1) * 1e3)
    med = sorted(runs)[len(runs) // 2]
    mfu = flops / (med * 1e-3) / V5E_BF16_PEAK if flops else None
    return runs, mfu, flops


def measure_cpu_baseline(n_iter=2):
    """Reference-structure computation in torch on CPU (same shapes)."""
    import torch
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch_oracle as oracle
    import jax

    from multimodal_transformer_tpu.models import build_model, default_config
    from multimodal_transformer_tpu.ops.mfn_core import HIDDEN_DIM, MEM_DIM

    cfg = default_config("MFT", MODS)
    init, _ = build_model(cfg)
    params = jax.tree_util.tree_map(np.asarray,
                                    init(jax.random.PRNGKey(0)))
    data, mask_np = make_host_batch(cfg)
    mask = torch.from_numpy(mask_np)

    torch.set_num_threads(os.cpu_count() or 8)
    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            fronts = oracle.t_frontend(params, data, MODS)
            head = params["Transformer"]
            mfn_in = {}
            for m in MODS:
                e = oracle.t_linear(head[f"embed_{m}"], fronts[m])
                e = oracle.t_encoder(head[f"transformer_{m}"], e, mask)
                mfn_in[m] = e.numpy()
            pred = oracle.t_mfn(head["mfn"], mfn_in, MODS, HIDDEN_DIM,
                                MEM_DIM)
            _ = pred * mask
        dt = time.perf_counter() - t0
    return BATCH * n_iter / dt


def main():
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--iters", type=int, default=40,
                    help="longer of the two chained program lengths")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if args.iters < 3:
        ap.error("--iters must be >= 3 (the short chain is "
                 "max(iters//4, 2) and slope timing needs it strictly "
                 "shorter than --iters)")

    if args.measure_baseline or not os.path.exists(BASELINE_CACHE):
        baseline = measure_cpu_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_seq_per_s": baseline, "batch": BATCH, "T": T,
                       "frames": FRAMES,
                       "what": "torch reference-structure MFT fwd, CPU"},
                      f, indent=1)
    else:
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)["cpu_seq_per_s"]

    B = args.batch or BATCH
    if not wait_tpu_ready():
        print(json.dumps({
            "metric": f"eval sequences/sec/chip (MFT AVL, batch={B})",
            "value": 0, "unit": "seq/s/chip", "vs_baseline": 0,
            "error": "TPU tunnel unreachable (execution probe timed out "
                     "for the whole MMTX_BENCH_WAIT window)"}))
        sys.exit(1)
    runs, mfu, flops_per_batch, dev = measure_tpu(
        n_chain=(max(args.iters // 4, 2), args.iters), batch=B)
    med = sorted(runs)[len(runs) // 2]
    # spread: (max-min)/median over the independent slope repeats — the
    # band that makes round-over-round deltas interpretable (a delta inside
    # the band is tunnel noise, outside it a real regression)
    line = {
        "metric": f"eval sequences/sec/chip (MFT AVL, batch={B})",
        "value": round(med, 2),
        "unit": "seq/s/chip",
        "vs_baseline": round(med / baseline, 2),
        "spread_pct": round((max(runs) - min(runs)) / med * 100, 2),
        "runs": [round(r, 1) for r in runs],
    }
    if mfu is not None:
        line["mfu"] = round(mfu, 4)
        line["flops_per_seq"] = round(flops_per_batch / B)
        # executed-FLOP utilization (VERDICT r4 next #1): the fused
        # encoder kernel's g=4 head-group p@v packing executes av_group x
        # the counted p@v FLOPs (2*T^2*D per layer, 18 layers; the
        # discarded off-diagonal blocks are real MXU passes) — neither
        # XLA's count nor Mosaic's CostEstimate includes them (measured
        # ON 5.034 vs OFF 5.089 GFLOP/seq, examples/bench_eval_ablation
        # .py), so utilization of passes actually issued is higher than
        # the algorithmic mfu above.
        pv_extra = 3 * (2 * T * T * 256) * 18 * B
        line["mfu_executed"] = round(
            mfu * (flops_per_batch + pv_extra) / flops_per_batch, 4)
    # training-path metrics in the same line (VERDICT r3 #3) so a flat
    # round can't hide behind the eval number; production recipe (mixed +
    # default kernels, dropout ON).  MMTX_BENCH_TRAIN=0 skips (eval-only).
    if os.environ.get("MMTX_BENCH_TRAIN", "1") != "0":
        try:
            t_runs, train_mfu, _ = measure_train(batch=B)
            t_med = sorted(t_runs)[len(t_runs) // 2]
            line["train_ms_per_step"] = round(t_med, 3)
            line["train_spread_pct"] = round(
                (max(t_runs) - min(t_runs)) / t_med * 100, 2)
            line["train_runs"] = [round(r, 3) for r in t_runs]
            if train_mfu is not None:
                line["train_mfu"] = round(train_mfu, 4)
        except Exception as e:  # train bench must never zero the eval metric
            line["train_error"] = f"{type(e).__name__}: {e}"[:200]
    line["device"] = dev
    print(json.dumps(line))


if __name__ == "__main__":
    main()
