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

Three entry points (gating in ops/attention.py encoder_stack):
  * encoder_stack_fused — eval forward (this kernel);
  * encoder_stack_fused_trainable — dropout-free training: Pallas forward,
    backward rematerialized through the jnp encoder_stack (custom_vjp);
  * encoder_stack_fused_train — dropout training (round 2+): Pallas forward
    with IN-KERNEL fmix32 hash dropout + per-layer fused Pallas backward
    (_bwd_kernel), dispatched at both fp32 and bf16/mixed.  The round-1
    statement "training with dropout keeps the jnp path" is superseded.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _ln(x, a, b, eps=1e-6):
    """The quirky reference LayerNorm in fp32 (ops/norm.py semantics).

    MMTX_ABLATE_ENC_LN=1 is a measurement-only ablation (WRONG numerics):
    it replaces every kernel LayerNorm with the bare affine a*x + b —
    deleting the mean/var row reductions, the sqrt, and the divide — to
    bound the LN share of kernel time (the eval-plateau closure,
    ops/dispatch.py)."""
    if os.environ.get("MMTX_ABLATE_ENC_LN") == "1":
        from ..dispatch import warn_ablation
        warn_ablation("MMTX_ABLATE_ENC_LN",
                      "kernel LayerNorms become bare affines")
        return a * x + b
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mean
    n = x.shape[-1]
    var = jnp.sum(d * d, axis=-1, keepdims=True) / (n - 1)
    return a * d / (jnp.sqrt(var) + eps) + b


def _kernel(x_ref, kmask_ref,
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
    # Pre-scale q by 1/sqrt(d_k) here (one [R, D] pass) instead of scaling
    # the [h*T, T] scores every video (h*T*T >> R*D/tile_b of VPU work).
    qkv_s[:, :D] = (qkv[:, :D] * inv_sqrt_dk).astype(cdt)
    qkv_s[:, D:] = qkv[:, D:].astype(cdt)
    attn_s[:] = _attention_tile(
        qkv_s, kmask_ref, tile_b=tile_b, T=T, D=D, h=h, av_group=av_group,
        inv_sqrt_dk=inv_sqrt_dk, cdt=cdt, prescaled_q=True).astype(cdt)
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


def _bdq_extra(g: int, n_stacks: int) -> int:
    """Extra live cdt elements per video the MMTX_ENC_SCORE=bdq layout
    keeps in VMEM, in units of T*D (ADVICE r3): each head-group's
    block-diagonal stack is [g*T, g*d_k] -> summed over h/g groups that is
    g*T*D elements; the forward builds 1 stack family (q), the backward 2
    (q + do).  0 when bdq is off or single-group (the stacks degenerate)."""
    if g > 1 and os.environ.get("MMTX_ENC_SCORE", "perhead") == "bdq":
        return n_stacks * g
    return 0


def _pick_tile_b(B: int, T: int, D: int, extra_cdt: int = 0) -> int:
    # fp32 carry + cdt qkv/attn scratches + weight/in/out double buffers
    # must fit ~12 MB of the 16 MB VMEM; per-video bytes dominate at 4*T*D
    # (carry) + 2*T*3D (qkv) + 2*T*D (attn) + 2*T*D (in/out blocks).
    # tile_b=16/32 at SEND scale fail Mosaic compile (VMEM overflow), and
    # larger tiles would only cut weight re-streaming, which is already
    # negligible (~4 MB/layer-pass ≈ 20 us of HBM time total) — the kernel
    # sits at ~65% of its FLOP roofline, the rest is softmax/LN VPU work.
    # extra_cdt: additional live cdt elements per video in T*D units
    # (the bdq score-stack buffers, _bdq_extra).
    per_b = T * D * (4 + 6 + 2 + 4 + 2 * extra_cdt)
    budget = 9 * 1024 * 1024
    tb = max(1, min(8, budget // per_b))
    while B % tb and tb > 1:        # avoid padding when a divisor is close
        tb -= 1
    return tb


# ------------------------------------------------------- shape fit guards
# The fused kernels hold each video's FULL [h*T, T] attention working set
# in VMEM (scores fp32 + probs cdt — deliberately no blockwise machinery,
# module docstring), so their footprint is quadratic in T while the tile
# pickers above only model the linear per-video terms the T=160 tuning
# needed.  At long T the pickers would floor at tile_b=1 and the kernel
# would Mosaic-fail on VMEM overflow instead of falling back (VERDICT r4
# missing #2).  These guards model the tile_b=1 footprint INCLUDING the
# quadratic terms and tell the dispatch gate (ops/attention.py) to decline
# onto the jnp path — which handles any T — when nothing fits.
#
# Budget calibration — MEASURED on v5e, round 5 (bench_enc_t_sweep.py
# --mode fit --force + /tmp tile probes; bf16, D=256, F=128, h=8, 6
# layers).  Compile map (ok / FAIL):
#   eval:   160/tile8 ok, 320/4 ok, 448/2 ok, 448/4 FAIL, 512/1 ok,
#           512/2 FAIL, 640/1 FAIL
#   train fwd: 160/4 ok, 320/2 ok, 448/1 ok, 448/2 FAIL, 512/1 ok,
#           640/1 FAIL
#   train bwd: 160/2 ok, 160/4 FAIL, 224/1 ok, 256/1 ok, 320/1 FAIL
# The model below separates ALL 15 points: the quadratic working set
# prices at ~4 bytes/elem (Mosaic reuses the fp32 scores buffer for the
# probs — pricing scores+probs separately mispredicts eval 512/1 as
# no-fit), and each kernel's guard sits between its largest PROVEN-ok
# modeled footprint and its smallest PROVEN-fail one, so every tile the
# guard emits maps onto (or below) a compile-verified configuration:
#   eval:  largest ok 512/1 = 12,856,832 / smallest FAIL 512/2 =
#          14,953,984; 13.5 MiB also pushes the unprobed 448/3
#          (14,167,552) down to the proven 448/2
#   train: ok 512/1 = 14,167,552 / FAIL 448/2 = 14,626,304 -> 14,300,000
#   bwd:   ok 256/1 = 13,392,896 / FAIL 320/1 = 18,404,352 -> 15 MiB

_GUARD_EVAL = int(13.5 * 1024 * 1024)
_GUARD_TRAIN = 14_300_000
_GUARD_BWD = 15 * 1024 * 1024


def _weight_bufs(D: int, F: int, itemsize: int) -> int:
    """Double-buffered per-layer weight blocks (qkv/out/ff1/ff2 + vectors)."""
    return 2 * (4 * D * D + 2 * D * F + 11 * D + F) * itemsize


def _attn_tmps(T: int, D: int, h: int) -> int:
    """Per-video attention working set: the [h*T, T] fp32 scores buffer
    (probs overwrite it — measured, see calibration above) + the grouped
    p@v output block [g*T, g*d_k] fp32.  Reused across the unrolled
    per-video loop (sequential liveness), so counted once."""
    d_k = max(D // h, 1)
    g = max(1, min(h, 128 // d_k))
    while h % g:
        g -= 1
    return h * T * T * 4 + g * T * (g * d_k) * 4


def eval_kernel_tile_b(B: int, T: int, D: int, F: int, itemsize: int,
                       h: int = 8, extra_cdt: int = 0) -> int:
    """tile_b for encoder_stack_fused, or 0 when even tile_b=1 exceeds the
    VMEM guard (callers fall back to the jnp path).  T is the PADDED length
    (sublane multiple).  Identical to _pick_tile_b at SEND scale (T=160 ->
    tile_b=8, total modeled 8.1 MB)."""
    tb = _pick_tile_b(B, T, D, extra_cdt)
    per_b = T * D * (4 + 6 + 2 + 4 + 2 * extra_cdt)
    fixed = _weight_bufs(D, F, itemsize) + _attn_tmps(T, D, h)
    while tb >= 1 and tb * per_b + fixed > _GUARD_EVAL:
        tb -= 1
    return max(tb, 0)


def train_kernel_tile_b(B: int, T: int, D: int, F: int, itemsize: int,
                        h: int = 8, extra_cdt: int = 0) -> int:
    """tile_b for the dropout-train forward kernel, or 0 when nothing fits.
    Identical to _pick_tile_b_train at SEND scale (T=160 -> tile_b=4)."""
    tb = _pick_tile_b_train(B, T, D, itemsize, extra_cdt)
    per_b = T * D * (4 + 8 + (3 + 4 + extra_cdt) * itemsize)
    fixed = _weight_bufs(D, F, itemsize) + _attn_tmps(T, D, h)
    while tb >= 1 and tb * per_b + fixed > _GUARD_TRAIN:
        tb -= 1
    return max(tb, 0)


def bwd_kernel_tile_b(B: int, T: int, D: int, F: int, itemsize: int,
                      h: int, extra_cdt: int = 0) -> int:
    """tile_b for the per-layer backward kernel, or 0 when nothing fits.
    _pick_tile_b_bwd's per_b already carries the tile-scaled [h*R, T]
    prob/keep stashes; the fixed part adds weight+grad blocks and the
    transient quadratic grad temporaries (dp etc).  Identical to
    _pick_tile_b_bwd at SEND scale (T=160 -> tile_b=2)."""
    tb = _pick_tile_b_bwd(B, T, D, F, itemsize, h, extra_cdt)
    per_b = T * (D * ((3 + 1 + 1 + 1 + 3 + extra_cdt) * itemsize
                      + 2 * 4 + 3 * 4 * 2)
                 + F * 4 + h * T * (4 + itemsize))
    # weight blocks + the 12 revisited grad output blocks (fp32) + dp/dpd
    # transient quadratic temps in the attention grad loop
    fixed = (_weight_bufs(D, F, itemsize)
             + (4 * D * D + 2 * D * F + 11 * D + F) * 4
             + 2 * h * T * T * 4)
    while tb >= 1 and tb * per_b + fixed > _GUARD_BWD:
        tb -= 1
    return max(tb, 0)


def fused_encoder_fits(B: int, T0: int, D: int, F: int, itemsize: int,
                       h: int = 8, training: bool = False) -> bool:
    """Dispatch-gate predicate: can the fused kernel path run shape
    [B, T0, D] (unpadded T0) without overflowing VMEM at tile_b >= 1?
    training=True additionally requires the dropout-train forward AND the
    per-layer backward to fit (the custom_vjp needs both)."""
    T = T0 + (-T0) % 8
    g = max(1, min(h, 128 // max(D // h, 1)))
    while h % g:
        g -= 1
    extra_f = _bdq_extra(g, 1)
    if eval_kernel_tile_b(B, T, D, F, itemsize, h, extra_f) < 1:
        return False
    if training:
        if train_kernel_tile_b(B, T, D, F, itemsize, h, extra_f) < 1:
            return False
        if bwd_kernel_tile_b(B, T, D, F, itemsize, h,
                             _bdq_extra(g, 2)) < 1:
            return False
    return True


def encoder_stack_fused(params, x, mask, *, h: int = 8,
                        tile_b: int | None = None,
                        av_group: int | None = None,
                        interpret: bool | None = None):
    """Fused key_query-mode encoder stack.  x: [B, T, D]; mask: [B, T, 1].

    Returns [B, T, D] matching ops.attention.encoder_stack(...,
    mask_mode="key_query", rng=None) on valid (mask==1) positions; padded
    positions hold finite garbage exactly like the jnp path's."""
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    B, T0, D = x.shape
    n_layers = len(params["layers"])
    if D % h:
        raise ValueError(f"D={D} not divisible by h={h}")
    d_k = D // h
    if av_group is None:
        # full 128 output lanes at the least over-compute (the packed
        # p@v dot costs av_group x the per-head FLOPs)
        av_group = max(1, min(h, 128 // d_k))
    while h % av_group:
        av_group -= 1
    pad_t = (-T0) % 8
    T = T0 + pad_t
    if tile_b is None:
        if interpret:   # no VMEM limit in interpret mode (CPU tests)
            tile_b = _pick_tile_b(B, T, D,
                                  extra_cdt=_bdq_extra(av_group, 1))
        else:
            F_ff = params["layers"][0]["feed_forward"]["w_1"][
                "weight"].shape[0]
            tile_b = eval_kernel_tile_b(B, T, D, F_ff, x.dtype.itemsize, h,
                                        _bdq_extra(av_group, 1))
            if tile_b < 1:
                raise ValueError(
                    f"encoder_stack_fused: shape B={B} T={T} D={D} exceeds "
                    "the VMEM fit guard (the [h*T,T] attention working set "
                    "is quadratic in T) — use the jnp encoder_stack path "
                    "(the ops.attention dispatch gate does this "
                    "automatically)")
    pad_b = (-B) % tile_b
    Bp = B + pad_b

    # masks stay fp32: Mosaic has no bf16 vector compare, and they are tiny
    m2 = mask[..., 0].astype(jnp.float32)           # [B, T0]
    if pad_t or pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, pad_t), (0, 0)))
        m2 = jnp.pad(m2, ((0, pad_b), (0, pad_t)))
    w = _pack_weights(params, x.dtype)
    n_tiles = Bp // tile_b

    grid = (n_tiles, n_layers)
    R = tile_b * T

    def wspec(block):  # one layer's weights per l-step
        return pl.BlockSpec((1,) + block, lambda b, l: (l,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

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
    )(x, m2.reshape(n_tiles, tile_b, T),
      w["ln1a"], w["ln1b"], w["wqkv"], w["bqkv"], w["wout"], w["bout"],
      w["ln2a"], w["ln2b"], w["wff1"], w["bff1"], w["wff2"], w["bff2"],
      w["fnorm"])
    return out[:B, :T0, :]


# ------------------------------------------------------------- training path
# Two training entry points:
#   * encoder_stack_fused_trainable — dropout-free remat custom_vjp (Pallas
#     forward, backward rematerialized through the jnp encoder_stack), kept
#     for the rng=None path where it costs nothing at eval;
#   * encoder_stack_fused_train — the REAL training path (dropout ON):
#     Pallas forward with IN-KERNEL hash dropout (the counter-based fmix32
#     masks of ops/basic.py, regenerable from (seed, flat position) alone —
#     the design reason that impl exists) that also spills each layer's
#     input activation to HBM, plus a per-layer fused Pallas BACKWARD
#     kernel that recomputes the layer's internals in VMEM (flash-style),
#     regenerates the same dropout masks, and accumulates weight grads
#     across batch tiles via output revisiting.  This replaces the remat
#     custom_vjp for dropout training: XLA's autodiff of the jnp path
#     materializes [B,h,T,T] score/softmax/mask tensors three times per
#     layer in HBM; here they never leave VMEM in either direction.

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


# ---------------------------------------------- dropout-training path
# In-kernel hash dropout: the fmix32 keep-mask of ops/basic.py
# hash_keep_mask, regenerated from (site seed, flat position in the
# UNPADDED jnp-path tensor).  Mask bits are bit-identical to the jnp
# hash-dropout path, so forward values and gradients on valid positions
# match the jnp encoder_stack under MMTX_DROPOUT_IMPL=hash.

def _fmix(idx_u32, seed_u32):
    """murmur3 fmix32 over a position counter with the seed injected up
    front — MUST mirror basic.hash_keep_mask's mixing."""
    h = idx_u32 * jnp.uint32(0x9E3779B1) + seed_u32
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _keep(seed_u32, idx_u32, p: float):
    """fmix32 Bernoulli(1-p) keep mask — MUST mirror basic.hash_keep_mask."""
    threshold = jnp.uint32(min(int(round(p * 2.0 ** 32)), 2 ** 32 - 1))
    return _fmix(idx_u32, seed_u32) >= threshold


def _hash4_sites() -> bool:
    """Trace-time: the hash4 multi-bit dropout impl is selected — the
    kernels must then generate basic.hash4_keep_rows' block-layout bits
    so the fwd/bwd kernel paths stay bit-paired with the jnp path."""
    from ..basic import _dropout_impl
    return _dropout_impl() == "hash4"


def _keep4(seed, idx4, p: float):
    """Four keep bytes per fmix32 evaluation (basic.hash4_keep_rows block
    layout): [rows, w4] quarter indices -> [rows, 4*w4] keep mask, block
    k = byte k of the hash, lane-concatenated.  The bytes are concatenated
    BEFORE the threshold compare: Mosaic cannot lane-concat i1 vectors
    (bitcast_vreg i1->i32 is invalid), so concat uint32 bytes, compare
    once — same bits as basic.hash4_keep_rows."""
    from ..basic import hash4_threshold
    h = _fmix(idx4, seed)
    t8 = jnp.uint32(hash4_threshold(p))
    return jnp.concatenate(
        [(h >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
         for k in range(4)], axis=-1) >= t8


def _row_keep(seed, tile_i, tile_b: int, T: int, T0: int, width: int,
              p: float, b_off: int = 0):
    """Keep mask for a [B, T0, width] row dropout site over this tile's
    [tile_b*T, width] rows, honoring the dropout impl: per-element fmix32
    ("hash"), or 4-bits-per-hash ("hash4"; a width % 4 != 0 site degrades
    to the per-element stream exactly like basic.dropout does)."""
    if _hash4_sites() and width % 4 == 0:
        w4 = width // 4
        bloc = jax.lax.broadcasted_iota(jnp.int32, (tile_b, T, w4), 0)
        t = jax.lax.broadcasted_iota(jnp.int32, (tile_b, T, w4), 1)
        c4 = jax.lax.broadcasted_iota(jnp.int32, (tile_b, T, w4), 2)
        gb = b_off + tile_i * tile_b + bloc
        idx4 = ((gb * T0 + t) * w4 + c4).reshape(tile_b * T,
                                                 w4).astype(jnp.uint32)
        return _keep4(seed, idx4, p)
    return _keep(seed, _row_site_idx(tile_i, tile_b, T, T0, width,
                                     b_off=b_off), p)


def _attn_keep(seed, gb, h: int, T: int, T0: int, p: float,
               head0: int = 0, nh: int | None = None):
    """Keep mask for the [B, h, T0, T0] attn-prob dropout site of video gb
    in the packed [nh*T, T] score layout, impl-aware like _row_keep.  This
    site is 62% of all mask bits — the hash4 impl's main target."""
    nh = h if nh is None else nh
    if _hash4_sites() and T0 % 4 == 0:
        from ..basic import hash4_threshold
        T0q, Tq = T0 // 4, T // 4
        head = head0 + jax.lax.broadcasted_iota(jnp.int32, (nh, T, Tq), 0)
        tq = jax.lax.broadcasted_iota(jnp.int32, (nh, T, Tq), 1)
        c4 = jax.lax.broadcasted_iota(jnp.int32, (nh, T, Tq), 2)
        idx4 = (((gb * h + head) * T0 + tq) * T0q + c4).reshape(
            nh * T, Tq).astype(jnp.uint32)
        hh = _fmix(idx4, seed)
        t8 = jnp.uint32(hash4_threshold(p))
        # concat uint32 bytes, compare once (Mosaic cannot lane-concat or
        # pad i1 vectors); pad bytes are 0 < t8 -> False keep bits on
        # padded key columns, which the key mask zeroes anyway
        by = jnp.concatenate(
            [((hh >> jnp.uint32(8 * k)) & jnp.uint32(0xFF))[:, :T0q]
             for k in range(4)], axis=-1)
        if T > T0:
            by = jnp.pad(by, ((0, 0), (0, T - T0)))
        return by >= t8
    return _keep(seed, _attn_site_idx(gb, h, T, T0, head0, nh), p)


def _row_site_idx(tile_i, tile_b: int, T: int, T0: int, width: int,
                  b_off: int = 0):
    """Flat jnp-tensor positions for a [B, T0, width] dropout site, laid out
    over this tile's [tile_b*T, width] rows (padded positions get aliased
    garbage indices — their values are discarded downstream).  b_off: the
    GLOBAL index of this call's first video (nonzero when the whole-stack
    backward runs the batch in chunks — mask bits are keyed by global
    video position, so each chunk must know where it starts)."""
    bloc = jax.lax.broadcasted_iota(jnp.int32, (tile_b, T, width), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (tile_b, T, width), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (tile_b, T, width), 2)
    gb = b_off + tile_i * tile_b + bloc
    idx = (gb * T0 + t) * width + c
    return idx.reshape(tile_b * T, width).astype(jnp.uint32)


def _attn_site_idx(gb, h: int, T: int, T0: int, head0: int = 0,
                   nh: int | None = None):
    """Flat positions for the [B, h, T0, T0] attention-prob dropout site of
    one video gb, for heads [head0, head0+nh) in the packed [nh*T, T]
    score-group layout."""
    nh = h if nh is None else nh
    head = head0 + jax.lax.broadcasted_iota(jnp.int32, (nh, T, T), 0)
    tq = jax.lax.broadcasted_iota(jnp.int32, (nh, T, T), 1)
    tk = jax.lax.broadcasted_iota(jnp.int32, (nh, T, T), 2)
    idx = ((gb * h + head) * T0 + tq) * T0 + tk
    return idx.reshape(nh * T, T).astype(jnp.uint32)


def _drop(x, seed, idx, p: float):
    """Inverted dropout with the in-kernel mask (identity when p == 0)."""
    if p == 0.0:
        return x
    return jnp.where(_keep(seed, idx, p), x / (1.0 - p), 0.0)


def _drop_site(x, seed, tile_i, tile_b: int, T: int, T0: int, p: float,
               b_off: int = 0):
    """Inverted dropout on a [tile_b*T, width] row site with impl-aware
    mask bits (_row_keep); identity when p == 0."""
    if p == 0.0:
        return x
    keep = _row_keep(seed, tile_i, tile_b, T, T0, x.shape[-1], p,
                     b_off=b_off)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def _seed(seeds_ref, l, site: int):
    return seeds_ref[l, site].astype(jnp.uint32)


def _masked_softmax(s):
    """Row softmax over already-masked fp32 scores, with an optional
    no-row-max variant (MMTX_ENC_SOFTMAX) — measured e2e-NEUTRAL, so the
    default stays jax.nn.softmax (zero numerics change vs the jnp path).

    The experiment (v5e, B=32, T=160): in an isolated 6-layer-stack
    micro-bench, dropping the row-max reduce+broadcast looked like -17%
    (0.435 -> 0.360 ms, = ablating the whole softmax, i.e. exp/sum/div
    hide under MXU work) — but the decisive one-process alternating
    full-model A/B showed PARITY within noise (ref 1.98 vs nomax
    1.96 ms across 3 interleaved rounds): in context the max pass
    overlaps other work.  Negative result recorded; the variant stays as
    an opt-in knob for other shapes/hardware.

    MMTX_ENC_SOFTMAX=nomax computes

      e = exp(min(s, 60) - 8);  p = e / (sum(e) + 1e-30)

    (scalar clamp instead of the row-max reduction: no overflow for any
    input since sum(e) < T*e^52 << fp32 max; matches the max-subtracted
    form to fp32 rounding on realistic LN'd-activation scores; masked
    lanes exp(NEG_INF-8) = 0 exactly; ALL-masked rows — padded videos in
    a padded batch tile — yield p = 0 instead of uniform 1/T garbage, so
    the train kernels' grad accumulators can never see NaN from them).
    =skip is an ablation ONLY (wrong numerics) bounding the softmax's
    share of kernel time.  Both the fwd tile and the bwd recompute call
    this, so training fwd/bwd always see bit-identical probs."""
    sm = os.environ.get("MMTX_ENC_SOFTMAX", "ref")
    if sm == "nomax":
        e = jnp.exp(jnp.minimum(s, 60.0) - 8.0)
        return e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)
    if sm == "skip":
        from ..dispatch import warn_ablation
        warn_ablation("MMTX_ENC_SOFTMAX=skip",
                      "kernel softmaxes become uniform scalings")
        return s * (1.0 / s.shape[-1])
    return jax.nn.softmax(s, axis=-1)


def _blockdiag_stack(slab, g: int, T: int, d_k: int):
    """[T, g*d_k] head-group slab -> [g*T, g*d_k] BLOCK-DIAGONAL stack:
    head j's d_k lanes land in row-block j / lane-block j, zeros elsewhere.

    One full-contraction dot of the stack against the group's counterpart
    slab then computes all g heads' [T, T] products directly in the packed
    row layout (the zero blocks annihilate cross-head terms exactly): at
    d_k=32, g=4 that is 2x fewer MXU passes than g per-head k=32 dots
    (which waste 3/4 of the MXU's 128 contraction rows) and deletes the
    g-way concat.  The build itself is VPU work over [g*T, g*d_k] — a net
    LOSS where the stack is used once (forward path, measured -19% e2e),
    a win only where it amortizes over >= 2 dots (backward loop)."""
    gT = g * T
    rep = jnp.broadcast_to(slab[None], (g, T, g * d_k)).reshape(gT, g * d_k)
    rb = jax.lax.broadcasted_iota(jnp.int32, (gT, g * d_k), 0) // T
    lb = jax.lax.broadcasted_iota(jnp.int32, (gT, g * d_k), 1) // d_k
    return jnp.where(rb == lb, rep, jnp.zeros((), rep.dtype))


def _diag_unstack(O, g: int, T: int, d_k: int):
    """[g*T, g*d_k] group-dot output -> [T, g*d_k] diagonal blocks: lane
    block j comes from row block j.  Two layouts (MMTX_ENC_EXTRACT):

      * "slice" — g unaligned [T, d_k] lane slices + concat (d_k=32 lane
        offsets force VPU lane rotations per slice);
      * "masksum" — reshape to [g, T, g*d_k], zero the off-diagonal lane
        blocks, sum over the g row blocks: one select + one reduce over
        lane-aligned [T, 128] tiles.  Bit-exact (x + 0.0 == x in fp32,
        and the masked terms are exact zeros).

    ROUND-4 VERDICT: NEUTRAL on both paths (v5e, same-session A/Bs) —
    train 9.496 vs 9.470 ms/step (bench_train --mixed, 300-step chains),
    eval 16,137 vs 16,185-16,237 seq/s (bench.py) — the unaligned lane
    slices were never a measurable cost.  Default stays "slice"."""
    if os.environ.get("MMTX_ENC_EXTRACT", "slice") == "slice":
        return jnp.concatenate(
            [O[j * T:(j + 1) * T, j * d_k:(j + 1) * d_k] for j in range(g)],
            axis=1)
    gd = g * d_k
    O3 = O.reshape(g, T, gd)
    rb = jax.lax.broadcasted_iota(jnp.int32, (g, T, gd), 0)
    lb = jax.lax.broadcasted_iota(jnp.int32, (g, T, gd), 2) // d_k
    return jnp.sum(jnp.where(rb == lb, O3, jnp.zeros((), O.dtype)), axis=0)


def _blockdiag_stack_tile(slab, tile_b: int, g: int, T: int, d_k: int):
    """[tile_b*T, g*d_k] group slab -> [tile_b*g*T, g*d_k]: per-video
    block-diagonal stacks (_blockdiag_stack), built in ONE vectorized
    broadcast+select over the whole batch tile instead of per video inside
    an issue-bound loop.  Video b's stack is rows [b*g*T, (b+1)*g*T)."""
    gd = g * d_k
    gT = tile_b * g * T
    rep = jnp.broadcast_to(slab.reshape(tile_b, 1, T, gd),
                           (tile_b, g, T, gd)).reshape(gT, gd)
    rb = jax.lax.broadcasted_iota(jnp.int32, (gT, gd), 0) // T % g
    lb = jax.lax.broadcasted_iota(jnp.int32, (gT, gd), 1) // d_k
    return jnp.where(rb == lb, rep, jnp.zeros((), rep.dtype))


def _attention_tile(qkv_s, kmask_ref, *, tile_b, T, D, h,
                    av_group, inv_sqrt_dk, tile_i=None, T0=None,
                    seed0=None, dropout_p=0.0, cdt=jnp.bfloat16,
                    prescaled_q=False, p_out=None, k0_out=None,
                    b_off: int = 0):
    """Per-video packed attention over one batch tile (shared fwd helper,
    optionally with the in-kernel hash dropout on the attention probs).
    No query-row masking (see the module docstring: padded-query rows are
    bounded garbage in key_query mode, masked downstream).  With
    prescaled_q the writer already folded 1/sqrt(d_k) into q's lanes of
    qkv_s.

    Scores run as h per-head k=d_k dots packed on sublanes -> ONE masked
    softmax per video; p @ v runs in head-GROUPS of g=av_group (one
    [g*T, T] @ [T, g*d_k] dot per group whose g diagonal blocks are the
    wanted outputs — g x the per-head FLOPs but full 128 output lanes at
    d_k=32).  A block-diagonal-q score variant (ONE full-contraction dot
    per group, _blockdiag_stack) was measured 19% SLOWER e2e on v5e
    (12.9k vs 15.9k seq/s): the VPU select building the stacks costs
    more than the saved MXU passes on this forward path (it stays in the
    backward kernel, where each stack amortizes over two uses and the
    loop is issue-bound).

    With p_out / k0_out (VMEM refs, [tile_b*h*T, T]), stashes each
    video's pre-dropout probs (fp32) and keep-mask bits (0/1 in the
    ref's dtype) so a backward kernel can reuse them instead of paying
    the score dots + softmax + fmix32 mask generation a second time.

    Returns the [R, D] concatenated head outputs (fp32)."""
    d_k = D // h
    g = av_group
    # MMTX_ENC_SCORE=bdq: score dots as block-diagonal-q group dots with
    # the stacks built ONCE per tile at the qkv read (vectorized over all
    # videos), not per video inside the loop (the -19% round-2 attempt).
    # ROUND-4 VERDICT: measured and LOSES on both paths (eval -6.6%,
    # train -5.6%; numbers + analysis in ops/dispatch.py) — kept as the
    # documented negative result; default stays perhead.
    # Per group: q_bd [g*T, g*d_k] block-diag rows x k_g [T, g*d_k] dense
    # lanes -> [g*T, T] per-head scores in the packed sublane layout the
    # softmax already wants.  Contraction depth g*d_k=128 (vs d_k=32
    # wasting 3/4 of the MXU's contraction rows), exact M=g*T sublane
    # tiling (5x128 vs per-head 160 -> 2 padded tiles), and h/g dot
    # issues per video instead of h.  Zeros in the stack contribute exact
    # fp32 zeros, so scores are BIT-IDENTICAL to the per-head path.
    bdq = os.environ.get("MMTX_ENC_SCORE", "perhead") == "bdq" and g > 1
    if bdq:
        gd = g * d_k
        qbd = [_blockdiag_stack_tile(qkv_s[:, grp * gd:(grp + 1) * gd],
                                     tile_b, g, T, d_k)
               for grp in range(h // g)]
    outs_rows = []
    for b in range(tile_b):
        rows = slice(b * T, (b + 1) * T)
        km = kmask_ref[0, b:b + 1, :]
        qkvb = qkv_s[rows, :]
        parts = []
        if bdq:
            for grp in range(h // g):
                gd = g * d_k
                kg = qkvb[:, D + grp * gd:D + (grp + 1) * gd]
                parts.append(jax.lax.dot_general(
                    qbd[grp][b * g * T:(b + 1) * g * T, :], kg,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))   # [g*T, T]
        else:
            for head in range(h):
                q = qkvb[:, head * d_k:(head + 1) * d_k]
                k = qkvb[:, D + head * d_k:D + (head + 1) * d_k]
                parts.append(jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
        s = jnp.concatenate(parts, axis=0)                 # [h*T, T]
        if not prescaled_q:
            s = s * inv_sqrt_dk
        s = jnp.where(km == 0, NEG_INF, s)
        p = _masked_softmax(s)
        if p_out is not None:
            p_out[b * h * T:(b + 1) * h * T, :] = p
        if dropout_p > 0.0:
            gb = b_off + tile_i * tile_b + b
            k0 = _attn_keep(seed0, gb, h, T, T0, dropout_p)
            if k0_out is not None:
                k0_out[b * h * T:(b + 1) * h * T, :] = k0.astype(
                    k0_out.dtype)
            p = jnp.where(k0, p / (1.0 - dropout_p), 0.0)
        pd = p.astype(cdt)
        outs = []
        for grp in range(h // g):
            pg = pd[grp * g * T:(grp + 1) * g * T, :]
            vg = qkvb[:, 2 * D + grp * g * d_k:
                      2 * D + (grp + 1) * g * d_k]
            O = jnp.dot(pg, vg, preferred_element_type=jnp.float32)
            outs.append(_diag_unstack(O, g, T, d_k) if g > 1 else O)
        outs_rows.append(jnp.concatenate(outs, axis=1)
                         if len(outs) > 1 else outs[0])
    return jnp.concatenate(outs_rows, axis=0)


def _train_kernel(x_ref, kmask_ref,
                  ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  ln2a_ref, ln2b_ref, wff1_ref, bff1_ref, wff2_ref, bff2_ref,
                  seeds_ref, out_ref, saved_ref, x_s, qkv_s,
                  *, tile_b: int, T: int, T0: int, D: int, h: int,
                  n_layers: int, av_group: int, dropout_p: float, B: int):
    """Forward with in-kernel hash dropout; spills each layer's input
    (the fp32 carry) to saved_ref for the backward kernels.  No final
    norm — the caller applies it in jnp so autodiff owns its params."""
    del B
    i, l = pl.program_id(0), pl.program_id(1)
    R = tile_b * T
    d_k = D // h
    cdt = x_ref.dtype
    inv_sqrt_dk = jnp.float32(1.0) / jnp.sqrt(jnp.float32(d_k))

    @pl.when(l == 0)
    def _():
        x_s[:] = x_ref[:].reshape(R, D).astype(jnp.float32)

    saved_ref[:] = x_s[:].reshape(1, tile_b, T, D)

    x = x_s[:]
    xn = _ln(x, ln1a_ref[0], ln1b_ref[0])
    qkv = jnp.dot(xn.astype(cdt), wqkv_ref[0],
                  preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv_s[:, :D] = (qkv[:, :D] * inv_sqrt_dk).astype(cdt)
    qkv_s[:, D:] = qkv[:, D:].astype(cdt)
    attn_c = _attention_tile(
        qkv_s, kmask_ref, tile_b=tile_b, T=T, D=D, h=h,
        av_group=av_group, inv_sqrt_dk=inv_sqrt_dk, tile_i=i, T0=T0,
        seed0=_seed(seeds_ref, l, 0), dropout_p=dropout_p, cdt=cdt,
        prescaled_q=True)
    attn = jnp.dot(attn_c.astype(cdt), wout_ref[0],
                   preferred_element_type=jnp.float32) + bout_ref[0]
    x = x + _drop_site(attn, _seed(seeds_ref, l, 1), i, tile_b, T, T0,
                       dropout_p)
    xn = _ln(x, ln2a_ref[0], ln2b_ref[0])
    mid = jnp.dot(xn.astype(cdt), wff1_ref[0],
                  preferred_element_type=jnp.float32) + bff1_ref[0]
    mid = jnp.maximum(mid, 0.0)
    mid = _drop_site(mid, _seed(seeds_ref, l, 2), i, tile_b, T, T0,
                     dropout_p)
    ff = jnp.dot(mid.astype(cdt), wff2_ref[0],
                 preferred_element_type=jnp.float32) + bff2_ref[0]
    x_s[:] = x + _drop_site(ff, _seed(seeds_ref, l, 3), i, tile_b, T, T0,
                            dropout_p)

    @pl.when(l == n_layers - 1)
    def _():
        out_ref[:] = x_s[:].reshape(tile_b, T, D)


def _ln_bwd(x, a, g, eps: float = 1e-6):
    """VJP of the quirky LayerNorm.  x, g: [R, D] fp32; a: [1, D].

    Returns (dx, da, db) with da/db summed over rows; var==0 rows (all-pad
    zeros) are guarded to contribute exact zeros instead of 0/0 NaNs."""
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) / (n - 1)
    s = jnp.sqrt(var)
    denom = s + eps
    ga = g * a
    dd = ga / denom
    dden = -jnp.sum(ga * d, axis=-1, keepdims=True) / (denom * denom)
    dvar = jnp.where(var > 0, dden / (2.0 * s), 0.0)
    dd = dd + d * (2.0 * dvar / (n - 1))
    dx = dd - jnp.mean(dd, axis=-1, keepdims=True)
    da = jnp.sum(g * (d / denom), axis=0, keepdims=True)
    db = jnp.sum(g, axis=0, keepdims=True)
    return dx, da, db


def _bwd_kernel(x_ref, dy_ref, kmask_ref,
                ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                ln2a_ref, ln2b_ref, wff1_ref, bff1_ref, wff2_ref, bff2_ref,
                seeds_ref,
                dx_ref, dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref,
                dwout_ref, dbout_ref, dln2a_ref, dln2b_ref,
                dwff1_ref, dbff1_ref, dwff2_ref, dbff2_ref,
                qkv_s, xn1_s, o_s, x1_s, xn2_s, midp_s, dx1_s, p_s, k0_s,
                dqkv_s,
                *, tile_b: int, T: int, T0: int, D: int, F: int, h: int,
                av_group: int, dropout_p: float, cdt):
    """One encoder layer's backward over one batch tile: recompute the
    forward internals in VMEM from the saved layer input, emit dx and
    accumulate weight grads across tiles.  The attention recompute
    stashes each video's pre-dropout probs + keep bits (p_s / k0_s), so
    the grad loop pays the score dots + softmax + fmix32 mask generation
    ONCE instead of twice."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                    dbout_ref, dln2a_ref, dln2b_ref, dwff1_ref, dbff1_ref,
                    dwff2_ref, dbff2_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    R = tile_b * T
    x = x_ref[:].reshape(R, D)
    dy = dy_ref[:].reshape(R, D)
    dx = _layer_bwd_core(
        x, dy, kmask_ref,
        ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        ln2a_ref, ln2b_ref, wff1_ref, bff1_ref, wff2_ref, bff2_ref,
        seeds_ref,
        dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
        dln2a_ref, dln2b_ref, dwff1_ref, dbff1_ref, dwff2_ref, dbff2_ref,
        qkv_s, xn1_s, o_s, x1_s, xn2_s, midp_s, dx1_s, p_s, k0_s, dqkv_s,
        lrow=0, tile_i=i, tile_b=tile_b, T=T, T0=T0, D=D, F=F, h=h,
        av_group=av_group, dropout_p=dropout_p, cdt=cdt)
    dx_ref[:] = dx.reshape(tile_b, T, D)


def _layer_bwd_core(x, dy, kmask_ref,
                    ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref,
                    bout_ref, ln2a_ref, ln2b_ref, wff1_ref, bff1_ref,
                    wff2_ref, bff2_ref, seeds_ref,
                    dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                    dbout_ref, dln2a_ref, dln2b_ref, dwff1_ref, dbff1_ref,
                    dwff2_ref, dbff2_ref,
                    qkv_s, xn1_s, o_s, x1_s, xn2_s, midp_s, dx1_s, p_s, k0_s,
                    dqkv_s,
                    *, lrow, tile_i, tile_b: int, T: int, T0: int, D: int,
                    F: int, h: int, av_group: int, dropout_p: float, cdt,
                    b_off: int = 0):
    """Shared per-tile layer-backward body (the math of _bwd_kernel),
    callable from both the per-layer kernel (lrow=0: the seeds block is
    one row) and the whole-stack kernel (lrow = the traced actual-layer
    index into the full [N, 4] SMEM seed table).  Accumulates weight
    grads into the d*_ref refs (callers zero them at the first visit)
    and returns dx [tile_b*T, D] fp32."""
    i = tile_i
    R = tile_b * T
    d_k = D // h
    inv_sqrt_dk = jnp.float32(1.0) / jnp.sqrt(jnp.float32(d_k))
    keep = 1.0 - dropout_p

    def row_keep(site: int, width: int):
        return _row_keep(_seed(seeds_ref, lrow, site), i, tile_b, T, T0,
                         width, dropout_p, b_off=b_off)

    # ---- recompute forward through the layer ----
    if os.environ.get("MMTX_ABLATE_BWD_RECOMPUTE") == "1":
        from ..dispatch import warn_ablation
        warn_ablation("MMTX_ABLATE_BWD_RECOMPUTE",
                      "the backward's forward recompute becomes fills")
        # measurement-only ablation (WRONG numerics): replace the whole
        # recompute with near-free fills to bound what ANY forward-state
        # stash scheme could save (= the ceiling where every stash load
        # from HBM were free).  Grad math downstream runs unchanged.
        # ROUND-4 VERDICT (v5e, bench_train --mixed): 9.470 -> 7.980
        # ms/step, i.e. the recompute ceiling is 1.49 ms — BELOW the
        # ~1.9 ms HBM round-trip cost of actually stashing the state it
        # regenerates (closure arithmetic in ops/dispatch.py).  The
        # recompute stays; stash schemes are structurally negative here.
        xc = x.astype(cdt)
        xn1_s[:] = xc
        qkv_s[:, :D] = xc
        qkv_s[:, D:2 * D] = xc
        qkv_s[:, 2 * D:] = xc
        o_s[:] = xc
        x1_s[:] = x
        xn2_s[:] = xc
        midp_s[:] = jnp.broadcast_to(x[:, :1], (R, F)) + 0.01
        p_s[:] = jnp.full(p_s.shape, 1.0 / T, p_s.dtype)
        if dropout_p > 0.0:
            k0_s[:] = jnp.ones(k0_s.shape, k0_s.dtype)
    else:
        xn1 = _ln(x, ln1a_ref[0], ln1b_ref[0])
        xn1_s[:] = xn1.astype(cdt)
        qkv = jnp.dot(xn1_s[:], wqkv_ref[0],
                      preferred_element_type=jnp.float32) + bqkv_ref[0]
        # prescaled q, exactly like the forward kernels — the recomputed
        # scores/probs are then bit-identical to the forward's
        qkv_s[:, :D] = (qkv[:, :D] * inv_sqrt_dk).astype(cdt)
        qkv_s[:, D:] = qkv[:, D:].astype(cdt)
        attn_c = _attention_tile(
            qkv_s, kmask_ref, tile_b=tile_b, T=T, D=D, h=h,
            av_group=av_group, inv_sqrt_dk=inv_sqrt_dk, tile_i=i, T0=T0,
            seed0=_seed(seeds_ref, lrow, 0), dropout_p=dropout_p, cdt=cdt,
            prescaled_q=True, p_out=p_s,
            k0_out=k0_s if dropout_p > 0.0 else None, b_off=b_off)
        o_s[:] = attn_c.astype(cdt)
        attn = jnp.dot(o_s[:], wout_ref[0],
                       preferred_element_type=jnp.float32) + bout_ref[0]
        x1 = x + _drop_site(attn, _seed(seeds_ref, lrow, 1), i, tile_b, T,
                            T0, dropout_p, b_off=b_off)
        x1_s[:] = x1
        xn2 = _ln(x1, ln2a_ref[0], ln2b_ref[0])
        xn2_s[:] = xn2.astype(cdt)
        midp = jnp.dot(xn2_s[:], wff1_ref[0],
                       preferred_element_type=jnp.float32) + bff1_ref[0]
        midp_s[:] = midp

    # ---- feed-forward sublayer backward ----
    if dropout_p > 0.0:
        k3 = row_keep(3, D)
        dff = jnp.where(k3, dy / keep, 0.0)
    else:
        dff = dy
    midp = midp_s[:]
    mid = jnp.maximum(midp, 0.0)
    mid_d = _drop_site(mid, _seed(seeds_ref, lrow, 2), i, tile_b, T, T0,
                       dropout_p, b_off=b_off)
    dwff2_ref[:] += jax.lax.dot_general(
        mid_d.astype(cdt), dff.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbff2_ref[:] += jnp.sum(dff, axis=0, keepdims=True)
    dmid = jax.lax.dot_general(          # dff @ W2^T without a relayout
        dff.astype(cdt), wff2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_p > 0.0:
        k2 = row_keep(2, F)
        dmid = jnp.where(k2, dmid / keep, 0.0)
    dmidp = jnp.where(midp > 0, dmid, 0.0)
    dwff1_ref[:] += jax.lax.dot_general(
        xn2_s[:], dmidp.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbff1_ref[:] += jnp.sum(dmidp, axis=0, keepdims=True)
    dxn2 = jax.lax.dot_general(
        dmidp.astype(cdt), wff1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx1_ln, da2, db2 = _ln_bwd(x1_s[:], ln2a_ref[0], dxn2)
    dln2a_ref[:] += da2
    dln2b_ref[:] += db2
    dx1_s[:] = dy + dx1_ln

    # ---- attention sublayer backward ----
    if dropout_p > 0.0:
        k1 = row_keep(1, D)
        dattn = jnp.where(k1, dx1_s[:] / keep, 0.0)
    else:
        dattn = dx1_s[:]
    dwout_ref[:] += jax.lax.dot_general(
        o_s[:], dattn.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbout_ref[:] += jnp.sum(dattn, axis=0, keepdims=True)
    do = jax.lax.dot_general(
        dattn.astype(cdt), wout_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    xn2_s[:] = do.astype(cdt)     # xn2 no longer needed: reuse for do

    # Attention backward per video, heads in block-diagonal GROUPS of g
    # (_blockdiag_stack): each of the four per-head grad dot families
    # (dpd, dv, dq, dk) becomes ONE full-contraction (or
    # full-output-lane) dot per group, and the probs/keep bits come from
    # the recompute's stash (p_s/k0_s) rather than a second score
    # dot + softmax + mask generation (this backward is issue-bound, not
    # MXU-bound, in bf16 — fewer issues is the whole game).
    g = av_group
    # MMTX_ENC_SCORE=bdq: the per-video q/do block-diag stack builds move
    # out of the issue-bound loop into two vectorized tile-wide builds per
    # group (_blockdiag_stack_tile) — same elementwise work, 2*tile_b x
    # fewer VPU issue sites; bit-identical values.
    bdq = (os.environ.get("MMTX_ENC_SCORE", "perhead") == "bdq"
           and g > 1)
    if bdq:
        gd = g * d_k
        qst_all = [_blockdiag_stack_tile(qkv_s[:, grp * gd:(grp + 1) * gd],
                                         tile_b, g, T, d_k)
                   for grp in range(h // g)]
        dost_all = [_blockdiag_stack_tile(
            xn2_s[:, grp * gd:(grp + 1) * gd], tile_b, g, T, d_k)
            for grp in range(h // g)]
    for b in range(tile_b):
        rows = slice(b * T, (b + 1) * T)
        qkvb = qkv_s[rows, :]
        dob = xn2_s[rows, :]                               # [T, D] cdt
        dqs, dks, dvs = [], [], []
        for grp in range(h // g):
            c0, c1 = grp * g * d_k, (grp + 1) * g * d_k
            kg = qkvb[:, D + c0:D + c1]                    # [T, g*d_k]
            vg = qkvb[:, 2 * D + c0:2 * D + c1]
            if bdq:
                gr = slice(b * g * T, (b + 1) * g * T)
                qstack = qst_all[grp][gr, :]
                dostack = dost_all[grp][gr, :]
            elif g == 1:
                qstack = qkvb[:, c0:c1]
                dostack = dob[:, c0:c1]
            else:
                qstack = _blockdiag_stack(qkvb[:, c0:c1], g, T, d_k)
                dostack = _blockdiag_stack(dob[:, c0:c1], g, T, d_k)
            prows = slice(b * h * T + grp * g * T,
                          b * h * T + (grp + 1) * g * T)
            p = p_s[prows, :]                              # [g*T, T] fp32
            if dropout_p > 0.0:
                k0 = k0_s[prows, :] != 0
                pd = jnp.where(k0, p / keep, 0.0)
            else:
                pd = p
            # dpd = block-diag(do) @ v^T: row-block j = do_j @ v_j^T
            dpd = jax.lax.dot_general(
                dostack, vg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [g*T, T]
            # dv lane-block j = pd_j^T @ do_j (rows contract; the zero
            # row-blocks of dostack annihilate cross-head terms)
            dvs.append(jax.lax.dot_general(
                pd.astype(cdt), dostack, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # [T, g*d_k]
            if dropout_p > 0.0:
                dp = jnp.where(k0, dpd / keep, 0.0)
            else:
                dp = dpd
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            # dq (wrt the UNSCALED q) = (ds * inv_sqrt_dk) @ k: diagonal
            # blocks of one [g*T, T] @ [T, g*d_k] dot (p@v-style packing)
            dq_full = jnp.dot((ds * inv_sqrt_dk).astype(cdt), kg,
                              preferred_element_type=jnp.float32)
            dqs.append(_diag_unstack(dq_full, g, T, d_k)
                       if g > 1 else dq_full)              # [T, g*d_k]
            # dk lane-block j = ds_j^T @ q_scaled_j  (= dsc_j^T @ q_j)
            dks.append(jax.lax.dot_general(
                ds.astype(cdt), qstack, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # [T, g*d_k]
        dqkv_s[rows, :] = jnp.concatenate(
            [jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
             jnp.concatenate(dvs, axis=1)], axis=1).astype(cdt)

    # Trailing qkv-projection grads ONCE per tile (K=R-deep dots) instead
    # of per video: 3 dot issues instead of 3*tile_b, each with a fuller
    # MXU contraction.  fp32-accumulated; only dbqkv's summands round
    # through cdt (bf16 in mixed) vs the old per-video fp32 sums.
    dwqkv_ref[:] += jax.lax.dot_general(
        xn1_s[:], dqkv_s[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[:] += jnp.sum(dqkv_s[:], axis=0, keepdims=True,
                            dtype=jnp.float32)
    x1_s[:] = jax.lax.dot_general(
        dqkv_s[:], wqkv_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dx_ln, da1, db1 = _ln_bwd(x, ln1a_ref[0], x1_s[:])
    dln1a_ref[:] += da1
    dln1b_ref[:] += db1
    return dx1_s[:] + dx_ln


def dropout_seed_table(rng, n_layers: int):
    """[N, 4] int32 site-seed table replicating the jnp encoder_stack's key
    chain — split(rng, N) per layer, split(layer_key, 4) per dropout site
    (attn probs, attn out, ff mid, ff out) — hashed by basic.hash_seed.
    int32 for SMEM; the kernels bitcast back to uint32."""
    from ..basic import hash_seed
    rows = [jnp.stack([hash_seed(k) for k in jax.random.split(lk, 4)])
            for lk in jax.random.split(rng, n_layers)]
    return jax.lax.bitcast_convert_type(jnp.stack(rows), jnp.int32)


def _pick_tile_b_train(B: int, T: int, D: int, itemsize: int,
                       extra_cdt: int = 0) -> int:
    # x_s fp32 carry + qkv_s + saved/in/out blocks (double-buffered);
    # extra_cdt = bdq stack elements per video in T*D units (_bdq_extra)
    per_b = T * D * (4 + 8 + (3 + 4 + extra_cdt) * itemsize)
    tb = max(1, min(8, (8 * 1024 * 1024) // per_b))
    while B % tb and tb > 1:
        tb -= 1
    return tb


def _prep_padded(x, mask, tile_b):
    """Shared T/B padding + mask reshapes for the train-path kernels."""
    B, T0, D = x.shape
    pad_t = (-T0) % 8
    T = T0 + pad_t
    pad_b = (-B) % tile_b
    Bp = B + pad_b
    m2 = mask[..., 0].astype(jnp.float32)
    if pad_t or pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, pad_t), (0, 0)))
        m2 = jnp.pad(m2, ((0, pad_b), (0, pad_t)))
    return x, m2, T, Bp


def _train_fwd_impl(layers, x, mask, *, h, dropout_p, seeds,
                    tile_b=None, av_group=None, interpret=None):
    if interpret is None:
        interpret = _train_interpret()
    B, T0, D = x.shape
    n_layers = len(layers)
    d_k = D // h
    if av_group is None:
        av_group = max(1, min(h, 128 // d_k))
    while h % av_group:
        av_group -= 1
    if tile_b is None:
        if interpret:
            tile_b = _pick_tile_b_train(B, T0, D, x.dtype.itemsize,
                                        extra_cdt=_bdq_extra(av_group, 1))
        else:
            F_ff = layers[0]["feed_forward"]["w_1"]["weight"].shape[0]
            Tp = T0 + (-T0) % 8
            tile_b = train_kernel_tile_b(B, Tp, D, F_ff, x.dtype.itemsize,
                                         h, _bdq_extra(av_group, 1))
            if tile_b < 1:
                raise ValueError(
                    f"encoder train kernel: shape B={B} T={Tp} D={D} "
                    "exceeds the VMEM fit guard — use the jnp path (the "
                    "ops.attention dispatch gate does this automatically)")
    x_p, m2, T, Bp = _prep_padded(x, mask, tile_b)
    w = _pack_weights({"layers": layers,
                       "norm": {"a_2": jnp.zeros(D), "b_2": jnp.zeros(D)}},
                      x.dtype)
    n_tiles = Bp // tile_b
    R = tile_b * T

    def wspec(block):
        return pl.BlockSpec((1,) + block, lambda b, l: (l,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    F = w["wff1"].shape[2]
    out, saved = pl.pallas_call(
        functools.partial(_train_kernel, tile_b=tile_b, T=T, T0=T0, D=D,
                          h=h, n_layers=n_layers, av_group=av_group,
                          dropout_p=dropout_p, B=B),
        grid=(n_tiles, n_layers),
        in_specs=[
            pl.BlockSpec((tile_b, T, D), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, T), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((1, D)), wspec((1, D)),
            wspec((D, 3 * D)), wspec((1, 3 * D)),
            wspec((D, D)), wspec((1, D)),
            wspec((1, D)), wspec((1, D)),
            wspec((D, F)), wspec((1, F)),
            wspec((F, D)), wspec((1, D)),
            pl.BlockSpec((n_layers, 4), lambda b, l: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, T, D), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, T, D), lambda b, l: (l, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, T, D), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, Bp, T, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.VMEM((R, 3 * D), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        # model FLOPs (no g-overcompute), same convention as the eval
        # kernel's estimate — feeds XLA cost analysis so bench.py's
        # train_mfu sees the work hidden inside the custom call
        cost_estimate=pl.CostEstimate(
            flops=n_layers * (2 * Bp * T * D * (4 * D + 2 * F)
                              + 4 * Bp * T * T * D),
            bytes_accessed=(Bp * T * D * 4 * (2 + n_layers)
                            + n_tiles * n_layers
                            * (4 * D * D + 2 * D * F) * x.dtype.itemsize),
            transcendentals=n_layers * Bp * T * T,
        ),
        interpret=interpret,
    )(x_p, m2.reshape(n_tiles, tile_b, T),
      w["ln1a"], w["ln1b"], w["wqkv"], w["bqkv"], w["wout"], w["bout"],
      w["ln2a"], w["ln2b"], w["wff1"], w["bff1"], w["wff2"], w["bff2"],
      seeds)
    return out[:B, :T0, :], saved


def _pick_tile_b_bwd(B: int, T: int, D: int, F: int, itemsize: int,
                     h: int, extra_cdt: int = 0) -> int:
    # scratches (qkv/xn1/o/xn2/dqkv cdt; x1/dx1 + midp fp32; p_s fp32 +
    # k0_s cdt attention stashes) + x/dy/dx blocks; extra_cdt = bdq stack
    # elements per video in T*D units (2 families here: q + do stacks)
    per_b = T * (D * ((3 + 1 + 1 + 1 + 3 + extra_cdt) * itemsize
                      + 2 * 4 + 3 * 4 * 2)
                 + F * 4 + h * T * (4 + itemsize))
    tb = max(1, min(8, (7 * 1024 * 1024) // per_b))
    while B % tb and tb > 1:
        tb -= 1
    return tb


def _layer_bwd_call(wl, seeds_row, x_l, dy, m2, *, h, dropout_p, T0, B,
                    cdt, av_group, interpret=False, tile_b=None):
    """Run the fused backward for ONE layer over all batch tiles.

    x_l, dy: [Bp, T, D] fp32 (padded); m2: [Bp, T] fp32.  Returns
    (dx [Bp, T, D] fp32, tuple of packed weight grads)."""
    Bp, T, D = x_l.shape
    F = wl["wff1"].shape[2]
    if tile_b is None:
        if interpret:
            tile_b = _pick_tile_b_bwd(Bp, T, D, F, jnp.dtype(cdt).itemsize,
                                      h, extra_cdt=_bdq_extra(av_group, 2))
        else:
            tile_b = bwd_kernel_tile_b(Bp, T, D, F, jnp.dtype(cdt).itemsize,
                                       h, _bdq_extra(av_group, 2))
            if tile_b < 1:
                raise ValueError(
                    f"encoder bwd kernel: shape B={Bp} T={T} D={D} exceeds "
                    "the VMEM fit guard — use the jnp path (the "
                    "ops.attention dispatch gate does this automatically)")
    n_tiles = Bp // tile_b
    R = tile_b * T

    def wspec(block):
        return pl.BlockSpec((1,) + block, lambda i: (0,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    def gspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_b=tile_b, T=T, T0=T0, D=D, F=F,
                          h=h, av_group=av_group, dropout_p=dropout_p,
                          cdt=cdt),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((1, D)), wspec((1, D)),
            wspec((D, 3 * D)), wspec((1, 3 * D)),
            wspec((D, D)), wspec((1, D)),
            wspec((1, D)), wspec((1, D)),
            wspec((D, F)), wspec((1, F)),
            wspec((F, D)), wspec((1, D)),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            gspec((1, D)), gspec((1, D)),                  # dln1 a/b
            gspec((D, 3 * D)), gspec((1, 3 * D)),          # dqkv
            gspec((D, D)), gspec((1, D)),                  # dout proj
            gspec((1, D)), gspec((1, D)),                  # dln2 a/b
            gspec((D, F)), gspec((1, F)),                  # dff1
            gspec((F, D)), gspec((1, D)),                  # dff2
        ],
        out_shape=[jax.ShapeDtypeStruct((Bp, T, D), jnp.float32)] + [
            jax.ShapeDtypeStruct(s, jnp.float32) for s in
            [(1, D), (1, D), (D, 3 * D), (1, 3 * D), (D, D), (1, D),
             (1, D), (1, D), (D, F), (1, F), (F, D), (1, D)]],
        scratch_shapes=[
            pltpu.VMEM((R, 3 * D), cdt),    # qkv
            pltpu.VMEM((R, D), cdt),        # xn1
            pltpu.VMEM((R, D), cdt),        # o (attn pre-out-proj)
            pltpu.VMEM((R, D), jnp.float32),  # x1, reused for d_xn1
            pltpu.VMEM((R, D), cdt),        # xn2, reused for d_o
            pltpu.VMEM((R, F), jnp.float32),  # ff mid pre-relu
            pltpu.VMEM((R, D), jnp.float32),  # dx1
            pltpu.VMEM((h * R, T), jnp.float32),  # p_s: pre-dropout probs
            pltpu.VMEM((h * R, T) if dropout_p > 0.0 else (8, 128),
                       cdt),                  # k0_s: keep bits (0/1)
            pltpu.VMEM((R, 3 * D), cdt),      # dqkv staging for tile dots
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        # model-FLOPs convention: one layer's backward = 2x its forward
        # (the in-VMEM recompute is rematerialization, not model work —
        # keeps train_mfu comparable to the jnp-path 413-GFLOP basis)
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * Bp * T * D * (4 * D + 2 * F)
                       + 4 * Bp * T * T * D),
            bytes_accessed=(3 * Bp * T * D * 4
                            + n_tiles * (4 * D * D + 2 * D * F)
                            * jnp.dtype(cdt).itemsize),
            transcendentals=Bp * T * T,
        ),
        interpret=interpret,
    )(x_l, dy, m2.reshape(n_tiles, tile_b, T),
      wl["ln1a"], wl["ln1b"], wl["wqkv"], wl["bqkv"], wl["wout"],
      wl["bout"], wl["ln2a"], wl["ln2b"], wl["wff1"], wl["bff1"],
      wl["wff2"], wl["bff2"], seeds_row)
    return outs[0], tuple(outs[1:])


def _stack_bwd_kernel(saved_ref, g0_ref, kmask_ref,
                      ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref,
                      bout_ref, ln2a_ref, ln2b_ref, wff1_ref, bff1_ref,
                      wff2_ref, bff2_ref, seeds_ref,
                      dx_ref, dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref,
                      dwout_ref, dbout_ref, dln2a_ref, dln2b_ref,
                      dwff1_ref, dbff1_ref, dwff2_ref, dbff2_ref,
                      dy_s, qkv_s, xn1_s, o_s, x1_s, xn2_s, midp_s, dx1_s,
                      p_s, k0_s, dqkv_s,
                      *, tile_b: int, T: int, T0: int, D: int, F: int,
                      h: int, av_group: int, dropout_p: float, cdt,
                      n_layers: int, b_off: int = 0):
    """The WHOLE stack's backward as one kernel: grid (n_layers, n_tiles)
    with the layer dimension OUTER (reversed via the block index maps) and
    the batch-tile dimension INNER.  dy never round-trips HBM between
    layers — a [Bp*T, D] fp32 VMEM scratch carries every tile's dy across
    the layer steps (vs the per-layer path's 2 x (n_layers-1) x Bp*T*D*4
    bytes of dy traffic + n_layers pallas_call launches).  Weight grads
    accumulate across the CONSECUTIVE inner tile revisits exactly like the
    per-layer kernel (zeroed at i == 0, flushed when the layer block
    changes), so the summation order — and hence the numerics — match the
    per-layer path at equal tile_b.

    ROUND-4 VERDICT: measured NO WIN (ops/dispatch.py): tile_b=1
    full-batch −4.2%, 2-chunk tile_b=2 parity (−0.3%) vs the per-layer
    loop — launches + dy traffic were never the binding cost.  Default
    stays per-layer; opt-in MMTX_ENC_BWD=stack (+MMTX_ENC_BWD_CHUNKS)."""
    l, i = pl.program_id(0), pl.program_id(1)
    lrev = n_layers - 1 - l
    R = tile_b * T

    @pl.when(i == 0)
    def _():
        for ref in (dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                    dbout_ref, dln2a_ref, dln2b_ref, dwff1_ref, dbff1_ref,
                    dwff2_ref, dbff2_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    @pl.when(l == 0)
    def _():
        dy_s[pl.ds(i * R, R), :] = g0_ref[:].reshape(R, D)

    x = saved_ref[:].reshape(R, D)
    dy = dy_s[pl.ds(i * R, R), :]
    dx = _layer_bwd_core(
        x, dy, kmask_ref,
        ln1a_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        ln2a_ref, ln2b_ref, wff1_ref, bff1_ref, wff2_ref, bff2_ref,
        seeds_ref,
        dln1a_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
        dln2a_ref, dln2b_ref, dwff1_ref, dbff1_ref, dwff2_ref, dbff2_ref,
        qkv_s, xn1_s, o_s, x1_s, xn2_s, midp_s, dx1_s, p_s, k0_s, dqkv_s,
        lrow=lrev, tile_i=i, tile_b=tile_b, T=T, T0=T0, D=D, F=F, h=h,
        av_group=av_group, dropout_p=dropout_p, cdt=cdt, b_off=b_off)
    dy_s[pl.ds(i * R, R), :] = dx

    @pl.when(l == n_layers - 1)
    def _():
        dx_ref[:] = dx.reshape(tile_b, T, D)


def _pick_tile_b_stack(Bp: int, T: int, D: int, F: int, itemsize: int,
                       h: int, extra_cdt: int = 0) -> int:
    """tile_b for the whole-stack backward: the per-layer kernel's per-tile
    footprint (_pick_tile_b_bwd) plus the FIXED [Bp*T, D] fp32 dy carry and
    the double-buffered grad/weight layer blocks.  Returns 0 when even
    tile_b=1 does not fit — the caller then falls back to the per-layer
    path (bigger-T shapes where the dy carry alone eats VMEM)."""
    per_b = T * (D * ((3 + 1 + 1 + 1 + 3 + extra_cdt) * itemsize
                      + 2 * 4 + 3 * 4 * 2)
                 + F * 4 + h * T * (4 + itemsize))
    wcount = D * 3 * D + D * D + 2 * D * F + 8 * D + 3 * D + F
    fixed = Bp * T * D * 4 + 2 * wcount * (4 + itemsize)
    # 14 MB: the same effective envelope the per-layer path compiles at
    # (~14.1 MB estimated) — at SEND scale this resolves to 2 chunks of
    # B=16 at tile_b=2 (measured configuration, see dispatch.py)
    budget = 14 * 1024 * 1024
    if budget <= fixed:
        return 0
    tb = min(8, (budget - fixed) // per_b)
    while tb and Bp % tb:
        tb -= 1
    return int(tb)


def _stack_bwd_call(w, seeds, saved, g, m2, *, h, dropout_p, T0, cdt,
                    av_group, interpret=False, tile_b=None, b_off=0):
    """Run the fused whole-stack backward (ONE pallas_call for all layers
    x all batch tiles).  saved: [N, Bp, T, D] fp32 layer inputs from the
    forward; g: [Bp, T, D] fp32 initial dy; m2: [Bp, T] fp32.  Returns
    (dx [Bp, T, D] fp32, tuple of 12 stacked [N, ...] weight grads)."""
    n_layers, Bp, T, D = saved.shape
    F = w["wff1"].shape[2]
    if tile_b is None:
        tile_b = _pick_tile_b_stack(Bp, T, D, F, jnp.dtype(cdt).itemsize, h,
                                    extra_cdt=_bdq_extra(av_group, 2))
    n_tiles = Bp // tile_b
    R = tile_b * T
    N = n_layers

    def wspec(block):
        return pl.BlockSpec(
            (1,) + block,
            lambda l, i: (N - 1 - l,) + (0,) * len(block),
            memory_space=pltpu.VMEM)

    gspec = wspec   # grad blocks stream per-layer exactly like weights

    gshapes = [(1, D), (1, D), (D, 3 * D), (1, 3 * D), (D, D), (1, D),
               (1, D), (1, D), (D, F), (1, F), (F, D), (1, D)]
    outs = pl.pallas_call(
        functools.partial(_stack_bwd_kernel, tile_b=tile_b, T=T, T0=T0,
                          D=D, F=F, h=h, av_group=av_group,
                          dropout_p=dropout_p, cdt=cdt, n_layers=n_layers,
                          b_off=b_off),
        grid=(n_layers, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_b, T, D),
                         lambda l, i: (N - 1 - l, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, T, D), lambda l, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, T), lambda l, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((1, D)), wspec((1, D)),
            wspec((D, 3 * D)), wspec((1, 3 * D)),
            wspec((D, D)), wspec((1, D)),
            wspec((1, D)), wspec((1, D)),
            wspec((D, F)), wspec((1, F)),
            wspec((F, D)), wspec((1, D)),
            pl.BlockSpec((n_layers, 4), lambda l, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, T, D), lambda l, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [gspec(s) for s in gshapes],
        out_shape=[jax.ShapeDtypeStruct((Bp, T, D), jnp.float32)] + [
            jax.ShapeDtypeStruct((n_layers,) + s, jnp.float32)
            for s in gshapes],
        scratch_shapes=[
            pltpu.VMEM((Bp * T, D), jnp.float32),   # dy carry, ALL tiles
            pltpu.VMEM((R, 3 * D), cdt),    # qkv
            pltpu.VMEM((R, D), cdt),        # xn1
            pltpu.VMEM((R, D), cdt),        # o (attn pre-out-proj)
            pltpu.VMEM((R, D), jnp.float32),  # x1, reused for d_xn1
            pltpu.VMEM((R, D), cdt),        # xn2, reused for d_o
            pltpu.VMEM((R, F), jnp.float32),  # ff mid pre-relu
            pltpu.VMEM((R, D), jnp.float32),  # dx1
            pltpu.VMEM((h * R, T), jnp.float32),  # p_s: pre-dropout probs
            pltpu.VMEM((h * R, T) if dropout_p > 0.0 else (8, 128),
                       cdt),                  # k0_s: keep bits (0/1)
            pltpu.VMEM((R, 3 * D), cdt),      # dqkv staging for tile dots
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        # model-FLOPs convention: the stack backward = 2x the stack forward
        # (same basis as the per-layer estimate, n_layers of them)
        cost_estimate=pl.CostEstimate(
            flops=n_layers * 2 * (2 * Bp * T * D * (4 * D + 2 * F)
                                  + 4 * Bp * T * T * D),
            bytes_accessed=((2 + n_layers) * Bp * T * D * 4
                            + n_tiles * n_layers
                            * (4 * D * D + 2 * D * F)
                            * jnp.dtype(cdt).itemsize),
            transcendentals=n_layers * Bp * T * T,
        ),
        interpret=interpret,
    )(saved, g, m2.reshape(n_tiles, tile_b, T),
      w["ln1a"], w["ln1b"], w["wqkv"], w["bqkv"], w["wout"],
      w["bout"], w["ln2a"], w["ln2b"], w["wff1"], w["bff1"],
      w["wff2"], w["bff2"], seeds)
    return outs[0], tuple(outs[1:])


def _unpack_layer_grads(gl, D):
    (dln1a, dln1b, dwqkv, dbqkv, dwout, dbout, dln2a, dln2b,
     dwff1, dbff1, dwff2, dbff2) = gl

    def lin(w, b):
        return {"weight": w.T, "bias": b[0]}   # packed [in,out] -> torch

    return {
        "self_attn": {"linears": [
            lin(dwqkv[:, :D], dbqkv[:, :D]),
            lin(dwqkv[:, D:2 * D], dbqkv[:, D:2 * D]),
            lin(dwqkv[:, 2 * D:], dbqkv[:, 2 * D:]),
            lin(dwout, dbout),
        ]},
        "feed_forward": {"w_1": lin(dwff1, dbff1), "w_2": lin(dwff2, dbff2)},
        "sublayer": [{"norm": {"a_2": dln1a[0], "b_2": dln1b[0]}},
                     {"norm": {"a_2": dln2a[0], "b_2": dln2b[0]}}],
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def encoder_stack_fused_train(layers, x, mask, h, dropout_p, seeds):
    """Training-path fused encoder stack WITHOUT the final norm (the caller
    applies torch_layer_norm in jnp so autodiff owns its params).

    Forward runs the Pallas stack with in-kernel hash dropout; backward
    runs the per-layer fused Pallas backward kernels.  Matches the jnp
    encoder_stack under MMTX_DROPOUT_IMPL=hash on valid positions (same
    fmix32 mask bits; see tests/test_pallas_kernels.py)."""
    out, _ = _train_fwd_impl(layers, x, mask, h=h, dropout_p=dropout_p,
                             seeds=seeds)
    return out


def _train_fwd_rule(layers, x, mask, h, dropout_p, seeds):
    out, saved = _train_fwd_impl(layers, x, mask, h=h, dropout_p=dropout_p,
                                 seeds=seeds)
    return out, (layers, x, mask, seeds, saved)


def _train_bwd_rule(h, dropout_p, res, g):
    import numpy as np
    layers, x, mask, seeds, saved = res
    B, T0, D = x.shape
    n_layers, Bp, T, _ = saved.shape
    w = _pack_weights({"layers": layers,
                       "norm": {"a_2": jnp.zeros(D), "b_2": jnp.zeros(D)}},
                      x.dtype)
    m2 = mask[..., 0].astype(jnp.float32)
    m2 = jnp.pad(m2, ((0, Bp - B), (0, T - T0)))
    d_k = D // h
    av_group = max(1, min(h, 128 // d_k))
    while h % av_group:
        av_group -= 1
    dy = jnp.pad(g.astype(jnp.float32), ((0, Bp - B), (0, T - T0), (0, 0)))
    F = w["wff1"].shape[2]
    # MMTX_ENC_BWD=stack|perlayer: whole-stack fused backward (dy
    # VMEM-resident across layers) vs the per-layer loop.  The stack's dy
    # carry covers every batch tile, so at full Bp the VMEM budget forces
    # tile_b=1 — measured SLOWER than the per-layer path's tile_b=2
    # (9.867 vs 9.470 ms/step, v5e MFT mixed).  Instead the batch runs in
    # CHUNKS sized so the stack call keeps the per-layer path's tile_b:
    # n_chunks x the launches (still << n_layers of them) and the dy carry
    # shrinks by n_chunks.  MMTX_ENC_BWD_CHUNKS forces the chunk count
    # (A/B + tests); falls back to per-layer when no chunking fits.
    its = jnp.dtype(x.dtype).itemsize
    extra = _bdq_extra(av_group, 2)
    use_stack = os.environ.get("MMTX_ENC_BWD", "perlayer") == "stack"
    n_chunks = 0
    if use_stack:
        tb_ref = _pick_tile_b_bwd(Bp, T, D, F, its, h, extra_cdt=extra)
        nc_env = os.environ.get("MMTX_ENC_BWD_CHUNKS")
        for nc in ((int(nc_env),) if nc_env else (1, 2, 4, 8)):
            bc = Bp // nc
            if Bp % nc or bc % tb_ref:
                continue
            if _pick_tile_b_stack(bc, T, D, F, its, h,
                                  extra_cdt=extra) >= tb_ref:
                n_chunks = nc
                break
        if n_chunks == 0:
            use_stack = False
    if use_stack:
        wl = {k: v for k, v in w.items() if k != "fnorm"}
        bc = Bp // n_chunks
        dxs, gss = [], []
        for c in range(n_chunks):
            sl = slice(c * bc, (c + 1) * bc)
            dxc, gsc = _stack_bwd_call(
                wl, seeds, saved[:, sl], dy[sl], m2[sl], h=h,
                dropout_p=dropout_p, T0=T0, cdt=x.dtype,
                av_group=av_group, interpret=_train_interpret(),
                tile_b=tb_ref, b_off=c * bc)
            dxs.append(dxc)
            gss.append(gsc)
        dy = dxs[0] if n_chunks == 1 else jnp.concatenate(dxs, axis=0)
        gs = gss[0] if n_chunks == 1 else tuple(
            functools.reduce(lambda a, b: a + b, parts)
            for parts in zip(*gss))
        grads = [_unpack_layer_grads(tuple(a[l] for a in gs), D)
                 for l in range(n_layers)]
    else:
        grads = [None] * n_layers
        for l in reversed(range(n_layers)):
            wl = {k: v[l:l + 1] for k, v in w.items() if k != "fnorm"}
            dy, gl = _layer_bwd_call(
                wl, seeds[l:l + 1], saved[l], dy, m2, h=h,
                dropout_p=dropout_p, T0=T0, B=B, cdt=x.dtype,
                av_group=av_group, interpret=_train_interpret())
            grads[l] = _unpack_layer_grads(gl, D)
    dx = dy[:B, :T0, :].astype(x.dtype)
    return (grads, dx, jnp.zeros_like(mask),
            np.zeros(seeds.shape, dtype=jax.dtypes.float0))


encoder_stack_fused_train.defvjp(_train_fwd_rule, _train_bwd_rule)


def _train_interpret() -> bool:
    """The train path runs in interpret mode off-TPU (CPU tests)."""
    from ..dispatch import interpret_default
    return interpret_default()
