#!/usr/bin/env python
"""On-TPU kernel numerics harness (VERDICT r4 weak #3 / next #3).

The test suite forces CPU, so every Pallas test runs in interpret mode;
this script is the HARDWARE evidence: at production shapes (B=32, T=160,
both fp32 and bf16) it asserts fused-kernel-vs-jnp parity for forward AND
gradients, on the real chip, for every dispatched kernel family:

  * encoder eval        (encoder_stack_fused vs jnp, rng=None)
  * encoder train       (in-kernel hash dropout fwd + fused bwd vs jnp
                         autodiff under the SAME fmix32 mask bits)
  * MFN eval            (full-recurrence kernel vs lax.scan)
  * MFN train           (mfn_train fwd+bwd kernels vs jnp, same mask bits)
  * window-embed        (fused_window_embed_highway custom_vjp vs jnp)
  * flash attention     (blockwise kernel + remat vjp vs dense jnp)

Each check flips only its own MMTX_PALLAS_* env var between jit traces
(dispatch reads env at trace time), so both sides run THE SAME public op.
Metric: max|a-b| over valid positions / (max|ref| + 1e-9) — a global-scale
relative error, robust at near-zero elements; for grads, the worst leaf.

Bounds are the measured v5e numbers (recorded next to each bound,
session 2026-08-20) with ~2.5x headroom; the BOUNDS table documents what
the residuals are (rounding-schedule divergence between XLA's bf16-pass
matmul policy and the kernels' fp32 VMEM accumulators, amplified by
depth) and the CPU-interpret control (worst leaf 9.3e-6 at these shapes)
that proves the algorithms identical.  The comparison bounds accumulated
rounding, it does NOT expect bit equality (CLAUDE.md: MXU bf16 precision
is exactly what CPU interpret tests cannot see).

Exit 0 with a final "PASS" line, or 1 with the failing rows.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, T = 32, 160
D, FF, NL, H = 256, 128, 6, 8


def relerr(a, b, mask=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if mask is not None:
        a, b = a * mask, b * mask
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def tree_relerr(ta, tb):
    """Worst per-leaf global-scale relative error, with each leaf's
    denominator FLOORED at 1e-3 x the largest leaf magnitude in the
    reference tree.  Without the floor, analytically-ZERO gradients
    poison the metric: the K-projection bias (self_attn.linears[1].bias)
    has exactly zero gradient by softmax shift-invariance (adding a
    constant vector to every key shifts each score row by a per-query
    constant, which softmax cancels), so both paths produce ~1e-6
    numerical noise there and a per-leaf max-rel reads O(1) on a
    difference of two zeros (first harness run measured 1.8 'error' on
    exactly that leaf, at every shape, on CPU too)."""
    import jax
    la = jax.tree_util.tree_leaves(ta)
    lb = jax.tree_util.tree_leaves(tb)
    assert len(la) == len(lb)
    gmax = max(float(np.max(np.abs(np.asarray(b, np.float64)))) for b in lb)
    worst = 0.0
    for a, b in zip(la, lb):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        den = max(float(np.max(np.abs(b))), 1e-3 * gmax) + 1e-30
        worst = max(worst, float(np.max(np.abs(a - b))) / den)
    return worst


def _mask(B, T):
    m = np.zeros((B, T, 1), np.float32)
    for i in range(B):
        m[i, :T - (i % 5)] = 1.0
    return m


def check_encoder(jit, dtype, results):
    import jax
    import jax.numpy as jnp
    from multimodal_transformer_tpu.ops.attention import (encoder_init,
                                                          encoder_stack)

    params = encoder_init(jax.random.PRNGKey(0), D, FF, NL)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32)).astype(dtype)
    mask_np = _mask(B, T)
    mask = jnp.asarray(mask_np).astype(dtype)

    def run_eval():
        return np.asarray(jit(lambda p, x, m: encoder_stack(
            p, x, m, h=H, rng=None, dropout_p=0.0,
            mask_mode="key_query").astype(jnp.float32))(params, x, mask))

    os.environ["MMTX_PALLAS_ENCODER"] = "1"
    got = run_eval()
    os.environ["MMTX_PALLAS_ENCODER"] = "0"
    want = run_eval()
    results.append(("encoder eval", str(dtype.__name__), relerr(
        got, want, mask_np)))

    # train: loss + grads through the dropout kernels (hash impl default)
    g = jnp.asarray(rs.randn(B, T, D).astype(np.float32) * mask_np)
    rng = jax.random.PRNGKey(3)

    def loss_fn(p, x):
        pc = jax.tree_util.tree_map(lambda a: a.astype(dtype), p)
        y = encoder_stack(pc, x, mask.astype(dtype), h=H, rng=rng,
                          dropout_p=0.1, mask_mode="key_query")
        return jnp.sum((y.astype(jnp.float32) * g))

    fp = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)

    def run_train():
        f = jit(lambda p, x: jax.value_and_grad(loss_fn, argnums=(0, 1))(
            p, x))
        (loss, (gp, gx)) = f(fp, x)
        return (float(loss), jax.tree_util.tree_map(np.asarray, gp),
                np.asarray(gx))

    os.environ["MMTX_PALLAS_ENCODER"] = "1"
    l1, gp1, gx1 = run_train()
    os.environ["MMTX_PALLAS_ENCODER"] = "0"
    l0, gp0, gx0 = run_train()
    results.append((
        "encoder train", str(dtype.__name__),
        max(abs(l1 - l0) / (abs(l0) + 1e-9), tree_relerr(gp1, gp0),
            relerr(gx1, gx0))))


def check_mfn(jit, dtype, results):
    import jax
    import jax.numpy as jnp
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan

    mods = ("acoustic", "image", "linguistic")
    dims = {"acoustic": 256, "image": 256, "linguistic": 256}
    params = mfn_init(jax.random.PRNGKey(1), list(mods), dims, 1)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    rs = np.random.RandomState(1)
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              .astype(dtype) for m in mods}

    def run_eval():
        return np.asarray(jit(lambda p, i: mfn_scan(
            p, i, mods, rng=None).astype(jnp.float32))(params, inputs))

    os.environ["MMTX_PALLAS_MFN"] = "1"
    os.environ["MMTX_PALLAS_MFN_TRAIN"] = "1"
    got = run_eval()
    os.environ["MMTX_PALLAS_MFN"] = "0"
    os.environ["MMTX_PALLAS_MFN_TRAIN"] = "0"
    want = run_eval()
    results.append(("mfn eval", str(dtype.__name__), relerr(got, want)))

    g = jnp.asarray(rs.randn(B, T, 1).astype(np.float32))
    rng = jax.random.PRNGKey(5)
    fp = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)

    def loss_fn(p, i):
        pc = jax.tree_util.tree_map(lambda a: a.astype(dtype), p)
        return jnp.sum(mfn_scan(pc, i, mods, rng=rng).astype(jnp.float32)
                       * g)

    def run_train():
        f = jit(lambda p, i: jax.value_and_grad(loss_fn, argnums=(0, 1))(
            p, i))
        loss, (gp, gi) = f(fp, inputs)
        return (float(loss), jax.tree_util.tree_map(np.asarray, gp),
                jax.tree_util.tree_map(np.asarray, gi))

    os.environ["MMTX_PALLAS_MFN"] = "1"
    os.environ["MMTX_PALLAS_MFN_TRAIN"] = "1"
    l1, gp1, gi1 = run_train()
    os.environ["MMTX_PALLAS_MFN"] = "0"
    os.environ["MMTX_PALLAS_MFN_TRAIN"] = "0"
    l0, gp0, gi0 = run_train()
    results.append((
        "mfn train", str(dtype.__name__),
        max(abs(l1 - l0) / (abs(l0) + 1e-9), tree_relerr(gp1, gp0),
            tree_relerr(gi1, gi0))))


def check_wembed(jit, dtype, results):
    import jax
    import jax.numpy as jnp
    from multimodal_transformer_tpu.ops.basic import (conv1d_window_embed,
                                                      highway)
    from multimodal_transformer_tpu.ops.pallas.window_embed import (
        window_embed_highway_trainable)
    from multimodal_transformer_tpu.utils.torch_init import (conv1d_init,
                                                             linear_init)

    W, F, Din, E = T, 32, 300, 300   # linguistic production dims
    kc, kp, kg = jax.random.split(jax.random.PRNGKey(2), 3)
    conv_p = conv1d_init(kc, Din, E, 2)
    hw_p = {"linear_projection": linear_init(kp, E, E),
            "linear_gate": linear_init(kg, E, E)}
    cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(dtype), t)
    conv_p, hw_p = cast(conv_p), cast(hw_p)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, W, F, Din).astype(np.float32)).astype(dtype)
    g = jnp.asarray(rs.randn(4, W, E).astype(np.float32))

    def loss(fused):
        def f(cp, hp, x):
            cpc, hpc = cast(cp), cast(hp)
            # the grad-capable public path is the custom_vjp wrapper
            # (Pallas forward + jnp-remat backward); the raw pallas_call
            # has no VJP rule by design
            y = (window_embed_highway_trainable(cpc, hpc, x) if fused
                 else highway(hpc, conv1d_window_embed(cpc, x)))
            return jnp.sum(y.astype(jnp.float32) * g)
        return f

    cp32, hp32 = (jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), t)
                  for t in (conv_p, hw_p))
    out_k = jit(lambda *a: jax.value_and_grad(loss(True),
                                              argnums=(0, 1))(*a))(
        cp32, hp32, x)
    out_j = jit(lambda *a: jax.value_and_grad(loss(False),
                                              argnums=(0, 1))(*a))(
        cp32, hp32, x)
    lk, (gck, ghk) = out_k
    lj, (gcj, ghj) = out_j
    results.append((
        "window-embed fwd+grad", str(dtype.__name__),
        max(abs(float(lk) - float(lj)) / (abs(float(lj)) + 1e-9),
            tree_relerr(gck, gcj), tree_relerr(ghk, ghj))))


def check_flash(jit, dtype, results):
    import jax
    import jax.numpy as jnp
    from multimodal_transformer_tpu.ops.attention import (
        mha_init, multi_head_attention)

    p = mha_init(jax.random.PRNGKey(4), D)
    p = jax.tree_util.tree_map(lambda a: a.astype(dtype), p)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32)).astype(dtype)
    mask_np = _mask(B, T)
    mask = jnp.asarray(mask_np).astype(dtype)
    g = jnp.asarray(rs.randn(B, T, D).astype(np.float32) * mask_np)
    fp = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), p)

    def loss_fn(p, x):
        pc = jax.tree_util.tree_map(lambda a: a.astype(dtype), p)
        y = multi_head_attention(pc, x, x, x, mask, h=H, rng=None,
                                 dropout_p=0.0, mask_mode="key_query")
        return jnp.sum(y.astype(jnp.float32) * g)

    def run():
        f = jit(lambda p, x: jax.value_and_grad(loss_fn, argnums=(0, 1))(
            p, x))
        loss, (gp, gx) = f(fp, x)
        return (float(loss), jax.tree_util.tree_map(np.asarray, gp),
                np.asarray(gx))

    os.environ["MMTX_PALLAS_ATTN"] = "1"
    l1, gp1, gx1 = run()
    os.environ["MMTX_PALLAS_ATTN"] = "0"
    l0, gp0, gx0 = run()
    results.append((
        "flash attn fwd+grad", str(dtype.__name__),
        max(abs(l1 - l0) / (abs(l0) + 1e-9), tree_relerr(gp1, gp0),
            relerr(gx1, gx0))))


# Bounds = the v5e session-measured value (2026-08-20, recorded inline)
# x ~2.5 headroom.  What the numbers ARE: both paths run the same
# algorithm — verified to worst-leaf 9.3e-6 at these exact shapes
# (B=32, T=160, 6 layers, dropout 0.1) in CPU interpret mode where both
# sides share one fp32 arithmetic — so the on-hardware residual is the
# two paths' different ROUNDING SCHEDULES: XLA lowers f32 matmuls to
# bf16 MXU passes (DEFAULT policy) while the kernels keep fp32
# accumulators in VMEM, and a grad leaf 6 layers deep accumulates that
# per-matmul divergence over ~24 fwd+bwd passes (hence train >> eval,
# bf16 > fp32).  The harness's protective value is structural: wrong
# mask bits / tile indexing / seed wiring read O(1) on this metric
# (the first run caught exactly such a signal and traced it to a
# metric artifact — see tree_relerr), while rounding reads <=0.2.
BOUNDS = {
    ("encoder eval", "float32"): 3e-3,     # measured 1.09e-3
    ("encoder eval", "bfloat16"): 4e-2,    # measured 1.20e-2
    ("encoder train", "float32"): 2e-1,    # measured 7.89e-2
    ("encoder train", "bfloat16"): 4e-1,   # measured 1.52e-1
    ("mfn eval", "float32"): 2e-3,         # measured 4.47e-5
    ("mfn eval", "bfloat16"): 6e-2,        # measured 6.70e-3
    ("mfn train", "float32"): 4e-3,        # measured 2.10e-4
    ("mfn train", "bfloat16"): 4e-1,       # measured 1.81e-1 (160-step
                                           #   recurrence amplification)
    ("window-embed fwd+grad", "float32"): 1e-3,   # measured 3.27e-4
    ("window-embed fwd+grad", "bfloat16"): 8e-2,  # measured 3.32e-2
    ("flash attn fwd+grad", "float32"): 6e-3,     # measured 2.50e-3
    ("flash attn fwd+grad", "bfloat16"): 6e-2,    # measured 2.55e-2
}


def main():
    import jax
    import jax.numpy as jnp
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()

    # NOTE on the fp32 rows: both paths run at production matmul
    # precision (XLA DEFAULT lowers f32 matmuls to bf16 MXU passes, the
    # kernels' dots carry fp32 accumulators with bf16-pass operands), so
    # the fp32 comparison includes XLA's precision POLICY divergence
    # (~1e-3 scale), not pure arithmetic differences — the bounds below
    # reflect that.  Pinning jax_default_matmul_precision="float32" to
    # remove it was tried and REJECTED: the pin propagates into the
    # Pallas dots and Mosaic fails to compile ("Bad lhs type"), and
    # production never runs pinned anyway.
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"FAIL: needs a TPU backend, got {backend!r}")
        sys.exit(1)
    dev = str(jax.devices()[0])

    results = []
    for dtype in (jnp.float32, jnp.bfloat16):
        for check in (check_encoder, check_mfn, check_wembed, check_flash):
            check(jax.jit, dtype, results)

    print(f"# kernel parity on {dev} (B={B}, T={T}); "
          "metric: max|kernel-jnp| / max|jnp|")
    ok = True
    for name, dt, err in results:
        bound = BOUNDS[(name, dt)]
        status = "ok" if err <= bound else "FAIL"
        ok &= err <= bound
        print(f"{status:4s} {name:24s} {dt:9s} measured={err:.3e} "
              f"bound={bound:.0e}")
    print("PASS: all fused kernels match the jnp path on hardware"
          if ok else "FAIL: kernel/jnp divergence beyond bounds")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
