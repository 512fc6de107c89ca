"""Fused N-layer pre-norm encoder stack as ONE Pallas kernel.

The encoder stage is the MFT forward's dominant cost (71% of the forward,
examples/bench_components.py) and is HBM-bound in the XLA path: every
layer round-trips x through LayerNorm/qkv/scores/softmax/out/FFN HBM
buffers (~1.3 GB/fwd at B=32 — scores [B,h,T,T] alone are ~40 MB/layer).
This kernel keeps the activation RESIDENT IN VMEM across all N layers:

  * grid = (batch_tiles, n_layers): TPU grid steps run sequentially, so a
    fp32 VMEM scratch carries x across the layer dimension with zero HBM
    round-trips; layer l's weights stream in as [1, ...] blocks (Pallas
    double-buffers the next layer's weights during compute);
  * per batch tile, x is loaded once (l==0) and written once (l==N-1,
    after the final norm) — total HBM traffic is ~20x lower than XLA's;
  * matmul inputs stay in the serving dtype (bf16) with fp32 accumulation
    (MXU native); LayerNorm, softmax, and the residual stream are fp32;
  * attention is computed whole (no blockwise running-max machinery — at
    SEND scale T<=~400 the [T,T] scores fit VMEM trivially; the blockwise
    flash kernel in attention.py measured 2x SLOWER for exactly this
    reason, ops/dispatch.py table).

Math parity (reference MFT/multiTransformer.py:22-116 via ops/attention.py
and ops/norm.py): quirky LayerNorm (unbiased std, eps on the std), h-head
attention with where()-masking, pre-norm sublayers, final norm.  Masking is
the clean "key_query" mode ONLY: in that mode valid outputs are invariant
to T/B padding (padded keys are masked out; padded query rows and padded
videos produce finite garbage that every caller masks downstream), which is
what lets the wrapper pad T to a sublane multiple and B to the tile size.
The reference-quirk "query" mode depends on padding amounts by design and
stays on the jnp path (it is the bs=1 parity path, never the perf path).

Eval + dropout-free training (custom_vjp below rematerializes the backward
through the jnp encoder_stack, like window_embed.py); training with
dropout keeps the jnp path — same gating as the flash kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _ln(x, a, b, eps=1e-6):
    """The quirky reference LayerNorm in fp32 (ops/norm.py semantics)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mean
    n = x.shape[-1]
    var = jnp.sum(d * d, axis=-1, keepdims=True) / (n - 1)
    return a * d / (jnp.sqrt(var) + eps) + b


def _kernel(x_ref, kmask_ref, qmask_ref,
            ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            ln2a_ref, ln2b_ref, wff1_ref, bff1_ref, wff2_ref, bff2_ref,
            fnorm_ref, out_ref, x_s, qkv_s, attn_s,
            *, tile_b: int, T: int, D: int, h: int, n_layers: int,
            av_group: int):
    l = pl.program_id(1)
    R = tile_b * T
    d_k = D // h
    cdt = x_ref.dtype
    inv_sqrt_dk = jnp.float32(1.0) / jnp.sqrt(jnp.float32(d_k))

    @pl.when(l == 0)
    def _():
        x_s[:] = x_ref[:].reshape(R, D).astype(jnp.float32)

    x = x_s[:]
    # ---- sublayer 0: self-attention ----
    xn = _ln(x, ln1a_ref[0], ln1b_ref[0])
    qkv = jnp.dot(xn.astype(cdt), wqkv_ref[0],
                  preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv_s[:] = qkv.astype(cdt)
    # Attention, one video at a time, with all h heads PACKED along the
    # sublane axis.  Measured on v5e (B=32, T=160, D=256, bf16, slope
    # timing, same-process ranking): packed ~1.5-2x faster than the
    # per-(video,head) loop — issue a few big MXU ops + 1 softmax per
    # video instead of 8 tiny lane-sliced ones per head.  The p@v
    # head-group size matters: av_group=8 (every head against every
    # head's v) leaves the stack at micro-PARITY with XLA and +12% e2e;
    # av_group=4 (full 128 output lanes at half the over-compute) is the
    # sweet spot at d_k=32 — +27-31% e2e over the XLA encoder path
    # (ops/dispatch.py table).
    for b in range(tile_b):
        rows = slice(b * T, (b + 1) * T)
        qm = qmask_ref[rows, :]                     # [T, 1]
        km = kmask_ref[0, b:b + 1, :]               # [1, T]
        qkvb = qkv_s[rows, :]
        # scores for all h heads stacked on sublanes -> ONE mask+softmax
        parts = []
        for head in range(h):
            q = qkvb[:, head * d_k:(head + 1) * d_k]
            k = qkvb[:, D + head * d_k:D + (head + 1) * d_k]
            parts.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        s = jnp.concatenate(parts, axis=0) * inv_sqrt_dk   # [h*T, T]
        qm_t = jnp.concatenate([qm] * h, axis=0)           # [h*T, 1]
        s = jnp.where(qm_t == 0, NEG_INF, s)    # reference query quirk
        s = jnp.where(km == 0, NEG_INF, s)      # clean key masking
        p = jax.nn.softmax(s, axis=-1).astype(cdt)
        # p @ v packed in head-GROUPS of g: one [g*T, T] @ [T, g*d_k] dot
        # computes a g-head group's p against its g heads' v; the g
        # diagonal blocks are the wanted outputs.  g x the FLOPs of
        # per-head dots, but g*d_k output lanes (g=4, d_k=32 -> full 128
        # lanes) and h/g issues instead of h.
        g = av_group
        outs = []
        for grp in range(h // g):
            pg = p[grp * g * T:(grp + 1) * g * T, :]         # [g*T, T]
            vg = qkvb[:, 2 * D + grp * g * d_k:
                      2 * D + (grp + 1) * g * d_k]           # [T, g*d_k]
            O = jnp.dot(pg, vg,
                        preferred_element_type=jnp.float32)  # [g*T, g*d_k]
            outs.extend(O[i * T:(i + 1) * T, i * d_k:(i + 1) * d_k]
                        for i in range(g))
        attn_s[rows, :] = jnp.concatenate(outs, axis=1).astype(cdt)
    attn = jnp.dot(attn_s[:], wout_ref[0],
                   preferred_element_type=jnp.float32) + bout_ref[0]
    x = x + attn
    # ---- sublayer 1: feed-forward ----
    xn = _ln(x, ln2a_ref[0], ln2b_ref[0])
    mid = jnp.dot(xn.astype(cdt), wff1_ref[0],
                  preferred_element_type=jnp.float32) + bff1_ref[0]
    mid = jnp.maximum(mid, 0.0).astype(cdt)
    ff = jnp.dot(mid, wff2_ref[0],
                 preferred_element_type=jnp.float32) + bff2_ref[0]
    x_s[:] = x + ff

    @pl.when(l == n_layers - 1)
    def _():
        y = _ln(x_s[:], fnorm_ref[0:1, :], fnorm_ref[1:2, :])
        out_ref[:] = y.astype(out_ref.dtype).reshape(tile_b, T, D)


def _pack_weights(params, dtype):
    """Stack per-layer torch-layout weights into streaming-friendly arrays.

    Linears are [out, in] (torch); the kernel wants [in, out] row-major."""
    layers = params["layers"]

    def stack(getter, transpose=False):
        ws = [getter(lp) for lp in layers]
        ws = [w.T if transpose else w for w in ws]
        out = jnp.stack(ws).astype(dtype)
        # vectors become [N, 1, len]: Pallas blocks of (1, 1, len) satisfy
        # the last-two-dims rule (1 == full middle dim)
        return out[:, None, :] if out.ndim == 2 else out

    wq = stack(lambda lp: lp["self_attn"]["linears"][0]["weight"], True)
    wk = stack(lambda lp: lp["self_attn"]["linears"][1]["weight"], True)
    wv = stack(lambda lp: lp["self_attn"]["linears"][2]["weight"], True)
    wqkv = jnp.concatenate([wq, wk, wv], axis=2)            # [N, D, 3D]
    bqkv = jnp.concatenate(
        [stack(lambda lp: lp["self_attn"]["linears"][i]["bias"])
         for i in range(3)], axis=2)                         # [N, 1, 3D]
    return {
        "ln1a": stack(lambda lp: lp["sublayer"][0]["norm"]["a_2"]),
        "ln1b": stack(lambda lp: lp["sublayer"][0]["norm"]["b_2"]),
        "wqkv": wqkv, "bqkv": bqkv,
        "wout": stack(lambda lp: lp["self_attn"]["linears"][3]["weight"],
                      True),
        "bout": stack(lambda lp: lp["self_attn"]["linears"][3]["bias"]),
        "ln2a": stack(lambda lp: lp["sublayer"][1]["norm"]["a_2"]),
        "ln2b": stack(lambda lp: lp["sublayer"][1]["norm"]["b_2"]),
        "wff1": stack(lambda lp: lp["feed_forward"]["w_1"]["weight"], True),
        "bff1": stack(lambda lp: lp["feed_forward"]["w_1"]["bias"]),
        "wff2": stack(lambda lp: lp["feed_forward"]["w_2"]["weight"], True),
        "bff2": stack(lambda lp: lp["feed_forward"]["w_2"]["bias"]),
        "fnorm": jnp.stack([params["norm"]["a_2"],
                            params["norm"]["b_2"]]).astype(jnp.float32),
        # all vector entries above are [N, 1, len]; fnorm is [2, D]

    }


def _pick_tile_b(B: int, T: int, D: int) -> int:
    # fp32 carry + cdt qkv/attn scratches + weight/in/out double buffers
    # must fit ~12 MB of the 16 MB VMEM; per-video bytes dominate at 4*T*D
    # (carry) + 2*T*3D (qkv) + 2*T*D (attn) + 2*T*D (in/out blocks).
    # tile_b=16/32 at SEND scale fail Mosaic compile (VMEM overflow), and
    # larger tiles would only cut weight re-streaming, which is already
    # negligible (~4 MB/layer-pass ≈ 20 us of HBM time total) — the kernel
    # sits at ~65% of its FLOP roofline, the rest is softmax/LN VPU work.
    per_b = T * D * (4 + 6 + 2 + 4)
    budget = 9 * 1024 * 1024
    tb = max(1, min(8, budget // per_b))
    while B % tb and tb > 1:        # avoid padding when a divisor is close
        tb -= 1
    return tb


def encoder_stack_fused(params, x, mask, *, h: int = 8,
                        tile_b: int | None = None,
                        av_group: int | None = None,
                        interpret: bool = False):
    """Fused key_query-mode encoder stack.  x: [B, T, D]; mask: [B, T, 1].

    Returns [B, T, D] matching ops.attention.encoder_stack(...,
    mask_mode="key_query", rng=None) on valid (mask==1) positions; padded
    positions hold finite garbage exactly like the jnp path's."""
    B, T0, D = x.shape
    n_layers = len(params["layers"])
    if D % h:
        raise ValueError(f"D={D} not divisible by h={h}")
    pad_t = (-T0) % 8
    T = T0 + pad_t
    if tile_b is None:
        tile_b = _pick_tile_b(B, T, D)
    pad_b = (-B) % tile_b
    Bp = B + pad_b

    # masks stay fp32: Mosaic has no bf16 vector compare, and they are tiny
    m2 = mask[..., 0].astype(jnp.float32)           # [B, T0]
    if pad_t or pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, pad_t), (0, 0)))
        m2 = jnp.pad(m2, ((0, pad_b), (0, pad_t)))
    qmask = m2.reshape(Bp * T, 1)
    w = _pack_weights(params, x.dtype)
    n_tiles = Bp // tile_b

    grid = (n_tiles, n_layers)
    R = tile_b * T

    def wspec(block):  # one layer's weights per l-step
        return pl.BlockSpec((1,) + block, lambda b, l: (l,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    d_k = D // h
    if av_group is None:
        # full 128 output lanes at the least over-compute (the packed
        # p@v dot costs av_group x the per-head FLOPs)
        av_group = max(1, min(h, 128 // d_k))
    while h % av_group:
        av_group -= 1
    F = w["wff1"].shape[2]
    out = pl.pallas_call(
        functools.partial(_kernel, tile_b=tile_b, T=T, D=D, h=h,
                          n_layers=n_layers, av_group=av_group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, T, D), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, T), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b, l: (b, 0),
                         memory_space=pltpu.VMEM),
            wspec((1, D)), wspec((1, D)),                 # ln1 a/b
            wspec((D, 3 * D)), wspec((1, 3 * D)),         # qkv
            wspec((D, D)), wspec((1, D)),                 # out proj
            wspec((1, D)), wspec((1, D)),                 # ln2 a/b
            wspec((D, F)), wspec((1, F)),                 # ff1
            wspec((F, D)), wspec((1, D)),                 # ff2
            pl.BlockSpec((2, D), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),        # final norm
        ],
        out_specs=pl.BlockSpec((tile_b, T, D), lambda b, l: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, D), jnp.float32),     # x carry across layers
            pltpu.VMEM((R, 3 * D), x.dtype),     # qkv
            pltpu.VMEM((R, D), x.dtype),         # attention output accum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=n_layers * (2 * Bp * T * D * (4 * D + 2 * F)
                              + 4 * Bp * T * T * D),
            bytes_accessed=(Bp * T * D * 2 * x.dtype.itemsize
                            + n_tiles * n_layers
                            * (4 * D * D + 2 * D * F) * x.dtype.itemsize),
            transcendentals=n_layers * Bp * T * T,
        ),
        interpret=interpret,
    )(x, m2.reshape(n_tiles, tile_b, T), qmask,
      w["ln1a"], w["ln1b"], w["wqkv"], w["bqkv"], w["wout"], w["bout"],
      w["ln2a"], w["ln2b"], w["wff1"], w["bff1"], w["wff2"], w["bff2"],
      w["fnorm"])
    return out[:B, :T0, :]


# ------------------------------------------------------------- training path
# custom_vjp: Pallas forward, backward rematerialized through the jnp
# encoder_stack (dropout-free key_query mode), mirroring window_embed.py.

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def encoder_stack_fused_trainable(params, x, mask, h):
    return encoder_stack_fused(params, x, mask, h=h)


def _jnp_reference(params, x, mask, h):
    from ..attention import encoder_stack
    return encoder_stack(params, x, mask, h=h, rng=None, dropout_p=0.0,
                         mask_mode="key_query")


def _fwd(params, x, mask, h):
    return encoder_stack_fused(params, x, mask, h=h), (params, x, mask)


def _bwd(h, res, g):
    params, x, mask = res
    _, vjp = jax.vjp(lambda p, xx, mm: _jnp_reference(p, xx, mm, h),
                     params, x, mask)
    return vjp(g)


encoder_stack_fused_trainable.defvjp(_fwd, _bwd)
