"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_transformer_tpu.ops.basic import conv1d_window_embed, highway
from multimodal_transformer_tpu.ops.attention import (mha_init,
                                                      multi_head_attention)
from multimodal_transformer_tpu.ops.pallas.attention import (
    flash_attention_masked)
from multimodal_transformer_tpu.ops.pallas.window_embed import (
    fused_window_embed_highway)
from multimodal_transformer_tpu.utils.torch_init import (conv1d_init,
                                                         linear_init)


def test_fused_window_embed_matches_jnp():
    key = jax.random.PRNGKey(0)
    B, W, F, D, E = 2, 5, 4, 24, 16
    kc, kp, kg = jax.random.split(key, 3)
    conv_p = conv1d_init(kc, D, E, 2)
    hw_p = {"linear_projection": linear_init(kp, E, E),
            "linear_gate": linear_init(kg, E, E)}
    x = jnp.asarray(np.random.RandomState(0).randn(B, W, F, D)
                    .astype(np.float32))
    want = highway(hw_p, conv1d_window_embed(conv_p, x))
    got = fused_window_embed_highway(conv_p, hw_p, x, tile_n=4,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_fused_window_embed_tile_padding():
    """N = B*W not divisible by tile_n must still be exact."""
    key = jax.random.PRNGKey(1)
    B, W, F, D, E = 3, 7, 3, 8, 8  # N=21, tile 8 -> pad 3
    kc, kp, kg = jax.random.split(key, 3)
    conv_p = conv1d_init(kc, D, E, 2)
    hw_p = {"linear_projection": linear_init(kp, E, E),
            "linear_gate": linear_init(kg, E, E)}
    x = jnp.asarray(np.random.RandomState(1).randn(B, W, F, D)
                    .astype(np.float32))
    want = highway(hw_p, conv1d_window_embed(conv_p, x))
    got = fused_window_embed_highway(conv_p, hw_p, x, tile_n=8,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_flash_attention_matches_dense_on_valid_rows():
    rs = np.random.RandomState(2)
    BH, T, dk = 4, 10, 8
    q = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32))
    k = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32))
    v = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32))
    kmask = np.ones((BH, T), np.float32)
    kmask[1, 7:] = 0
    kmask[3, 4:] = 0
    got = flash_attention_masked(q, k, v, jnp.asarray(kmask), blk_q=4,
                                 blk_k=4, interpret=True)
    # dense reference
    s = np.einsum("bqd,bkd->bqk", np.asarray(q), np.asarray(k)) / np.sqrt(dk)
    s = np.where(kmask[:, None, :] == 0, -1e9, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bqk,bkd->bqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_flash_attention_padding_invariant():
    rs = np.random.RandomState(3)
    BH, T, dk = 2, 6, 8
    q = rs.randn(BH, T, dk).astype(np.float32)
    k = rs.randn(BH, T, dk).astype(np.float32)
    v = rs.randn(BH, T, dk).astype(np.float32)
    kmask = np.ones((BH, T), np.float32)
    base = flash_attention_masked(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(kmask),
                                  blk_q=4, blk_k=4, interpret=True)
    pad = 5
    qp = np.concatenate([q, rs.randn(BH, pad, dk).astype(np.float32)], 1)
    kp = np.concatenate([k, rs.randn(BH, pad, dk).astype(np.float32)], 1)
    vp = np.concatenate([v, rs.randn(BH, pad, dk).astype(np.float32)], 1)
    mp = np.concatenate([kmask, np.zeros((BH, pad), np.float32)], 1)
    padded = flash_attention_masked(jnp.asarray(qp), jnp.asarray(kp),
                                    jnp.asarray(vp), jnp.asarray(mp),
                                    blk_q=4, blk_k=4, interpret=True)
    np.testing.assert_allclose(np.asarray(base),
                               np.asarray(padded)[:, :T], rtol=1e-5,
                               atol=1e-5)


def test_mha_dispatch_uses_flash_and_matches(monkeypatch):
    """Force the pallas path (interpret via CPU fallback is not wired into
    dispatch, so patch pallas_enabled + interpret) and compare valid rows."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.attention as pattn

    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    orig = pattn.flash_attention_masked
    monkeypatch.setattr(
        pattn, "flash_attention_masked",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    key = jax.random.PRNGKey(4)
    B, T, D, h = 2, 9, 32, 4
    p = mha_init(key, D)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    mask = np.ones((B, T, 1), np.float32)
    mask[1, 6:] = 0
    got = multi_head_attention(p, x, x, x, jnp.asarray(mask), h=h,
                               mask_mode="key_query")
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = multi_head_attention(p, x, x, x, jnp.asarray(mask), h=h,
                                mask_mode="key_query")
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want)[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got)[1, :6],
                               np.asarray(want)[1, :6], rtol=1e-4, atol=1e-5)


def test_mfn_full_recurrence_kernel_matches_scan():
    """The single-kernel MFN recurrence (interpret mode) must match the
    lax.scan reference path exactly."""
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan
    from multimodal_transformer_tpu.ops.pallas.mfn_kernel import (
        mfn_scan_pallas)
    from multimodal_transformer_tpu.ops.basic import linear as lin

    mods = ["linguistic", "acoustic"]
    dims = {"linguistic": 24, "acoustic": 16}
    p = mfn_init(jax.random.PRNGKey(9), mods, dims, 1)
    rs = np.random.RandomState(9)
    B, T = 3, 7
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              for m in mods}
    hs, mems = mfn_scan_pallas(p, inputs, mods, interpret=True)
    feats = jnp.concatenate([hs, mems], axis=2)
    got = lin(p["out_fc2"], jax.nn.relu(lin(p["out_fc1"], feats)))
    want = mfn_scan(p, inputs, mods)  # jnp scan path (pallas MFN is opt-in)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_mfn_gate_aligned_kernel_matches_scan():
    """The 128-lane gate-aligned MFN kernel must be exact (interpret mode)."""
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan
    from multimodal_transformer_tpu.ops.pallas.mfn_kernel import (
        mfn_scan_pallas_aligned)
    from multimodal_transformer_tpu.ops.basic import linear as lin

    mods = ["linguistic", "acoustic"]
    dims = {"linguistic": 24, "acoustic": 16}
    p = mfn_init(jax.random.PRNGKey(11), mods, dims, 1)
    rs = np.random.RandomState(11)
    B, T = 2, 5
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              for m in mods}
    hs, mems = mfn_scan_pallas_aligned(p, inputs, mods, interpret=True)
    feats = jnp.concatenate([hs, mems], axis=2)
    got = lin(p["out_fc2"], jax.nn.relu(lin(p["out_fc1"], feats)))
    want = mfn_scan(p, inputs, mods)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_window_embed_trainable_grads_match_jnp(monkeypatch):
    """custom_vjp wrapper: pallas forward + jnp-rematerialized backward must
    give the same gradients as pure jnp autodiff."""
    import multimodal_transformer_tpu.ops.pallas.window_embed as we

    # run the pallas forward in interpret mode on CPU
    orig = we.fused_window_embed_highway
    monkeypatch.setattr(
        we, "fused_window_embed_highway",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    key = jax.random.PRNGKey(5)
    B, W, F, D, E = 2, 4, 3, 10, 8
    kc, kp, kg = jax.random.split(key, 3)
    conv_p = conv1d_init(kc, D, E, 2)
    hw_p = {"linear_projection": linear_init(kp, E, E),
            "linear_gate": linear_init(kg, E, E)}
    x = jnp.asarray(np.random.RandomState(5).randn(B, W, F, D)
                    .astype(np.float32))

    def loss_pallas(cp, hp, xx):
        return jnp.sum(we.window_embed_highway_trainable(cp, hp, xx) ** 2)

    def loss_jnp(cp, hp, xx):
        return jnp.sum(highway(hp, conv1d_window_embed(cp, xx)) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(conv_p, hw_p, x)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(conv_p, hw_p, x)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                                jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=str(ka))


def test_flash_attention_custom_vjp_grad_parity(monkeypatch):
    """Flash kernel forward + remat backward must match the dense jnp
    key-masked path's gradients at 1e-5 (cotangents zeroed on padded query
    rows, as every model head does via output masking)."""
    import multimodal_transformer_tpu.ops.pallas.attention as pattn

    orig = pattn.flash_attention_masked
    monkeypatch.setattr(
        pattn, "flash_attention_masked",
        lambda *a, **kw: orig(*a, **{**kw, "blk_q": 4, "blk_k": 4,
                                     "interpret": True}))

    rs = np.random.RandomState(11)
    BH, T, dk = 3, 10, 8
    q = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32))
    k = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32))
    v = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32))
    kmask_np = np.ones((BH, T), np.float32)
    kmask_np[1, 7:] = 0
    kmask_np[2, 4:] = 0
    kmask = jnp.asarray(kmask_np)
    # non-trivial cotangent, zeroed on padded (query) rows
    cot = jnp.asarray(rs.randn(BH, T, dk).astype(np.float32)) \
        * kmask[:, :, None]

    def loss_flash(q, k, v):
        return jnp.sum(pattn.flash_attention_trainable(q, k, v, kmask) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(pattn._dense_key_masked(q, k, v, kmask) * cot)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_mha_training_dispatch_flash_grad_parity(monkeypatch):
    """End-to-end MHA param gradients with the flash path dispatched
    (dropout-free training) vs the jnp path."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.attention as pattn

    orig = pattn.flash_attention_masked
    monkeypatch.setattr(
        pattn, "flash_attention_masked",
        lambda *a, **kw: orig(*a, **{**kw, "blk_q": 4, "blk_k": 4,
                                     "interpret": True}))

    key = jax.random.PRNGKey(5)
    B, T, D, h = 2, 9, 32, 4
    p = mha_init(key, D)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    mask_np = np.ones((B, T, 1), np.float32)
    mask_np[1, 6:] = 0
    mask = jnp.asarray(mask_np)

    def loss(p):
        out = multi_head_attention(p, x, x, x, mask, h=h,
                                   mask_mode="key_query",
                                   rng=jax.random.PRNGKey(0), dropout_p=0.0)
        return jnp.sum((out * mask) ** 2)

    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    got = jax.grad(loss)(p)
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = jax.grad(loss)(p)
    jax.tree_util.tree_map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5), got, want)


def test_mfn_packed_kernel_matches_scan():
    """The 5-matmul packed-step MFN kernel must be exact (interpret mode)."""
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan
    from multimodal_transformer_tpu.ops.pallas.mfn_kernel import (
        mfn_scan_pallas_packed)
    from multimodal_transformer_tpu.ops.basic import linear as lin

    mods = ["acoustic", "image", "linguistic"]
    dims = {m: 24 for m in mods}
    p = mfn_init(jax.random.PRNGKey(13), mods, dims, 1)
    rs = np.random.RandomState(13)
    B, T = 3, 7
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              for m in mods}
    hs, mems = mfn_scan_pallas_packed(p, inputs, mods, interpret=True)
    feats = jnp.concatenate([hs, mems], axis=2)
    got = lin(p["out_fc2"], jax.nn.relu(lin(p["out_fc1"], feats)))
    want = mfn_scan(p, inputs, mods)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


# ------------------------------------------------- fused encoder stack


def _enc_setup(seed, B, T, D, N, h):
    from multimodal_transformer_tpu.ops.attention import encoder_init
    params = encoder_init(jax.random.PRNGKey(seed), D, 32, N)
    # perturb layers so they differ (identical-init otherwise hides
    # layer-indexing bugs in the weight streaming)
    params["layers"] = [jax.tree_util.tree_map(
        lambda w, i=i: w + 0.01 * i, lp)
        for i, lp in enumerate(params["layers"])]
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    mask = np.ones((B, T, 1), np.float32)
    for i in range(B):
        mask[i, T - i * 3:] = 0.0  # variable padding incl. none
    return params, x, jnp.asarray(mask), np.asarray(mask)


def test_encoder_stack_fused_matches_jnp():
    """Whole fused stack (interpret) vs the jnp key_query path on valid
    positions, with variable padding and shapes that force both T- and
    B-padding inside the wrapper (T=37 -> 40, B=5 + tile_b=2 -> 6)."""
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        encoder_stack_fused)

    h = 8
    params, x, mask, mask_np = _enc_setup(0, 5, 37, 64, 3, h)
    want = encoder_stack(params, x, mask, h=h, rng=None, dropout_p=0.0,
                         mask_mode="key_query")
    got = encoder_stack_fused(params, x, mask, h=h, interpret=True,
                              tile_b=2)
    valid = mask_np[..., 0] == 1
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], rtol=1e-4,
                               atol=2e-5)


def test_encoder_stack_fused_grad_parity(monkeypatch):
    """custom_vjp wrapper: pallas forward + jnp-rematerialized backward
    must match pure jnp autodiff (loss masked downstream, as every model
    head does)."""
    import multimodal_transformer_tpu.ops.pallas.encoder as penc
    from multimodal_transformer_tpu.ops.attention import encoder_stack

    orig = penc.encoder_stack_fused
    monkeypatch.setattr(
        penc, "encoder_stack_fused",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True, "tile_b": 2}))

    h = 4
    params, x, mask, mask_np = _enc_setup(7, 3, 11, 32, 2, h)

    def loss_pallas(p, xx):
        out = penc.encoder_stack_fused_trainable(p, xx, mask, h)
        return jnp.sum((out * mask) ** 2)

    def loss_jnp(p, xx):
        out = encoder_stack(p, xx, mask, h=h, rng=None, dropout_p=0.0,
                            mask_mode="key_query")
        return jnp.sum((out * mask) ** 2)

    got = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    want = jax.grad(loss_jnp, argnums=(0, 1))(params, x)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(got),
                                jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=str(ka))


def test_encoder_stack_dispatch_uses_fused_and_matches(monkeypatch):
    """encoder_stack with the pallas encoder dispatched (key_query, no
    dropout) must match the jnp path on valid positions."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.encoder as penc
    from multimodal_transformer_tpu.ops.attention import encoder_stack

    orig = penc.encoder_stack_fused
    monkeypatch.setattr(
        penc, "encoder_stack_fused",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True, "tile_b": 2}))

    h = 8
    params, x, mask, mask_np = _enc_setup(3, 4, 13, 128, 2, h)

    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    got = encoder_stack(params, x, mask, h=h, rng=None, dropout_p=0.0,
                        mask_mode="key_query")
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = encoder_stack(params, x, mask, h=h, rng=None, dropout_p=0.0,
                         mask_mode="key_query")
    valid = mask_np[..., 0] == 1
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], rtol=1e-4,
                               atol=2e-5)


@pytest.mark.parametrize("av_group", [1, 2, 4])
def test_encoder_stack_fused_av_groups_exact(av_group):
    """Every p@v head-group packing must produce identical results (the
    group size only changes MXU shapes, not math)."""
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        encoder_stack_fused)

    h = 4
    params, x, mask, mask_np = _enc_setup(5, 3, 19, 32, 2, h)
    want = encoder_stack(params, x, mask, h=h, rng=None, dropout_p=0.0,
                         mask_mode="key_query")
    got = encoder_stack_fused(params, x, mask, h=h, interpret=True,
                              tile_b=3, av_group=av_group)
    valid = mask_np[..., 0] == 1
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], rtol=1e-4,
                               atol=2e-5)


@pytest.mark.parametrize("av_group", [2, 4, 8])
def test_encoder_stack_fused_bdq_scores_bit_exact(monkeypatch, av_group):
    """MMTX_ENC_SCORE=bdq (block-diagonal-q score dots, stacks built once
    per tile at the qkv read) must be BIT-identical to the per-head score
    path: the stack's zero lanes contribute exact fp32 zeros to the
    128-deep contraction.  Parametrized over av_group so the multi-group
    slicing (grp > 0 row/column blocks of qbd) is exercised, not just the
    single-group h//g == 1 layout (ADVICE r3)."""
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        encoder_stack_fused)

    h = 8
    params, x, mask, _ = _enc_setup(7, 5, 37, 64, 3, h)
    ref = encoder_stack_fused(params, x, mask, h=h, interpret=True,
                              tile_b=2, av_group=av_group)
    monkeypatch.setenv("MMTX_ENC_SCORE", "bdq")
    got = encoder_stack_fused(params, x, mask, h=h, interpret=True,
                              tile_b=2, av_group=av_group)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("D", [64, 256])
def test_encoder_train_kernel_bdq_grads_bit_exact(_hash_dropout,
                                                  monkeypatch, D):
    """bdq hoisting in the fused train fwd + per-layer bwd must leave loss
    and every grad leaf BIT-identical (zeros in the stacks are exact).

    D=64 gives d_k=8 -> av_group=8 = h (single group); D=256 gives the
    production d_k=32 -> av_group=4, h//g=2, exercising the grp > 0
    stack slicing in BOTH train kernels (ADVICE r3 — av_group is derived
    internally by the train entry points, so the multi-group layout is
    reached by using the production head width)."""
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused_train)

    h = 8
    params, x, mask, _ = _enc_setup(17, 4, 21, D, 2, h)
    rng = jax.random.PRNGKey(9)
    seeds = dropout_seed_table(rng, 2)
    g = jnp.asarray(np.random.RandomState(4).randn(*x.shape)
                    .astype(np.float32)) * mask

    def loss(layers):
        y = encoder_stack_fused_train(layers, x, mask, h, 0.3, seeds)
        return jnp.sum(y * g)

    ref_l, ref_g = jax.value_and_grad(loss)(params["layers"])
    monkeypatch.setenv("MMTX_ENC_SCORE", "bdq")
    got_l, got_g = jax.value_and_grad(loss)(params["layers"])
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    for a, b in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encoder_extract_masksum_bit_exact(_hash_dropout, monkeypatch):
    """MMTX_ENC_EXTRACT=masksum (mask-and-sum diagonal-block extraction in
    the grouped p@v / dq dots) must be BIT-identical to the unaligned
    slice+concat layout in eval forward AND train loss + every grad leaf
    (the masked terms are exact zeros; x + 0.0 == x)."""
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused, encoder_stack_fused_train)

    h = 8
    params, x, mask, _ = _enc_setup(23, 4, 21, 256, 2, h)  # d_k=32 -> g=4
    rng = jax.random.PRNGKey(3)
    seeds = dropout_seed_table(rng, 2)
    gcot = jnp.asarray(np.random.RandomState(6).randn(*x.shape)
                       .astype(np.float32)) * mask

    def loss(layers):
        y = encoder_stack_fused_train(layers, x, mask, h, 0.25, seeds)
        return jnp.sum(y * gcot)

    monkeypatch.setenv("MMTX_ENC_EXTRACT", "slice")
    ref_fwd = encoder_stack_fused(params, x, mask, h=h, interpret=True,
                                  tile_b=2)
    ref_l, ref_g = jax.value_and_grad(loss)(params["layers"])
    monkeypatch.setenv("MMTX_ENC_EXTRACT", "masksum")
    got_fwd = encoder_stack_fused(params, x, mask, h=h, interpret=True,
                                  tile_b=2)
    got_l, got_g = jax.value_and_grad(loss)(params["layers"])
    np.testing.assert_array_equal(np.asarray(got_fwd), np.asarray(ref_fwd))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    for a, b in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mfn_kernel_dispatch_grad_parity(monkeypatch):
    """Dropout-free training (rng=None under value_and_grad) dispatches
    the MFN kernel; its remat custom_vjp must reproduce the jnp scan's
    gradients (this exact path raised a non-differentiable pallas_call
    error before the fix)."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.mfn_kernel as mk
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan

    orig = mk.mfn_scan_pallas
    monkeypatch.setattr(
        mk, "mfn_scan_pallas",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    mods = ["linguistic", "acoustic"]
    dims = {"linguistic": 24, "acoustic": 16}
    p = mfn_init(jax.random.PRNGKey(21), mods, dims, 1)
    rs = np.random.RandomState(21)
    B, T = 2, 6
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              for m in mods}

    def loss(p, inputs):
        return jnp.sum(mfn_scan(p, inputs, mods, rng=None) ** 2)

    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    got = jax.grad(loss, argnums=(0, 1))(p, inputs)
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = jax.grad(loss, argnums=(0, 1))(p, inputs)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(got),
                                jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5, err_msg=str(ka))


# ------------------------------- fused encoder training path (dropout ON)
# The in-kernel hash dropout regenerates the fmix32 masks of
# ops/basic.py from (site seed, flat position), so the kernel path is
# bit-identical in mask bits to the jnp path under MMTX_DROPOUT_IMPL=hash.
# Grad parity uses a LINEAR loss with a random masked cotangent: a
# quadratic loss of the *normalized* output has near-zero true gradients
# (pre-norm + final-LN cancellation), so fp32 noise dominates any
# rel-comparison there — a measurement artifact, not a kernel property.


@pytest.fixture
def _hash_dropout():
    from multimodal_transformer_tpu.ops import basic
    basic.set_dropout_impl("hash")
    yield
    basic.set_dropout_impl(None)




def test_encoder_train_kernel_fwd_matches_jnp_hash_dropout(_hash_dropout):
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused_train)

    h = 8
    params, x, mask, mask_np = _enc_setup(11, 5, 37, 64, 3, h)
    rng = jax.random.PRNGKey(42)
    want = encoder_stack(params, x, mask, h=h, rng=rng, dropout_p=0.3,
                         mask_mode="key_query")
    seeds = dropout_seed_table(rng, 3)
    y = encoder_stack_fused_train(params["layers"], x, mask, h, 0.3, seeds)
    got = torch_layer_norm(params["norm"], y.astype(x.dtype))
    valid = mask_np[..., 0] == 1
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], rtol=1e-4,
                               atol=2e-5)


@pytest.mark.parametrize("dropout_p", [0.0, 0.3])
def test_encoder_train_kernel_grad_parity(_hash_dropout, dropout_p):
    """Per-layer fused Pallas backward vs jnp autodiff, dropout ON/off."""
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused_train)

    h = 8
    params, x, mask, mask_np = _enc_setup(13, 5, 21, 64, 2, h)
    rng = jax.random.PRNGKey(5)
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape)
                    .astype(np.float32)) * mask

    def loss_jnp(p, xx):
        y = encoder_stack(p, xx, mask, h=h, rng=rng, dropout_p=dropout_p,
                          mask_mode="key_query")
        return jnp.sum(y * g)

    def loss_ker(p, xx):
        seeds = dropout_seed_table(rng, len(p["layers"]))
        y = encoder_stack_fused_train(p["layers"], xx, mask, h, dropout_p,
                                      seeds)
        return jnp.sum(torch_layer_norm(p["norm"], y.astype(xx.dtype)) * g)

    want = jax.grad(loss_jnp, argnums=(0, 1))(params, x)
    got = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(got),
                                jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=str(ka))


@pytest.mark.parametrize("dropout_p", [0.0, 0.3])
def test_encoder_train_kernel_grad_parity_bf16(_hash_dropout, dropout_p):
    """bf16-activation (cdt=bf16) train kernels vs the jnp bf16 path —
    guards the --mixed_precision dispatch default (encoder_stack now
    dispatches the fused train path at BOTH dtypes).  bf16 tolerances:
    both paths round activations/dots to bf16 in different orders."""
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused_train)

    h = 8
    params, x, mask, mask_np = _enc_setup(13, 5, 21, 64, 2, h)
    x = x.astype(jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda w: w.astype(jnp.bfloat16), params)
    mask = mask.astype(jnp.bfloat16)
    rng = jax.random.PRNGKey(5)
    g = (jnp.asarray(np.random.RandomState(3).randn(*x.shape)
                     .astype(np.float32)) * mask).astype(jnp.bfloat16)

    def loss_jnp(p, xx):
        y = encoder_stack(p, xx, mask, h=h, rng=rng, dropout_p=dropout_p,
                          mask_mode="key_query")
        return jnp.sum((y * g).astype(jnp.float32))

    def loss_ker(p, xx):
        seeds = dropout_seed_table(rng, len(p["layers"]))
        y = encoder_stack_fused_train(p["layers"], xx, mask, h, dropout_p,
                                      seeds)
        out = torch_layer_norm(p["norm"], y.astype(xx.dtype))
        return jnp.sum((out * g).astype(jnp.float32))

    want = jax.grad(loss_jnp, argnums=(0, 1))(params, x)
    got = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    # bf16 paths differ systematically per element (the kernel norms and
    # accumulates in fp32 from its fp32 carry; the jnp bf16 path norms in
    # bf16), and some leaves are mathematically ZERO (the k-projection
    # bias: softmax row-grads sum to 0) so their values are pure rounding
    # noise.  Compare the CONCATENATED gradient vector: real
    # indexing/mask/seed bugs corrupt substantial leaves at O(their
    # scale) and blow the global normalized L2; bf16 noise does not.
    av = np.concatenate([np.asarray(l, np.float32).ravel()
                         for l in jax.tree_util.tree_leaves(got)])
    bv = np.concatenate([np.asarray(l, np.float32).ravel()
                         for l in jax.tree_util.tree_leaves(want)])
    l2 = float(np.linalg.norm(av - bv)) / float(np.linalg.norm(bv))
    assert l2 < 0.03, f"global normalized L2 grad error {l2:.4f}"
    # Per-leaf guard on the qkv BIAS grads (ADVICE r2): the batched
    # trailing grad dots stage dq/dk/dv through the bf16-typed dqkv_s
    # scratch, so dbqkv sums bf16-rounded summands — a bias-only drift
    # would hide inside the global L2 above.  Bound each bias leaf
    # against the jnp value with a floor tied to the global grad scale
    # (the k-projection bias grad is mathematically ZERO — softmax row
    # grads sum to 0 — so its normalized error alone is meaningless).
    gscale = float(np.linalg.norm(bv))
    dp, _ = got
    wp, _ = want
    for li, (gl, wl) in enumerate(zip(dp["layers"], wp["layers"])):
        for j in range(3):
            a = np.asarray(gl["self_attn"]["linears"][j]["bias"],
                           np.float32)
            b = np.asarray(wl["self_attn"]["linears"][j]["bias"],
                           np.float32)
            err = float(np.linalg.norm(a - b))
            bound = 0.05 * float(np.linalg.norm(b)) + 2e-3 * gscale
            assert err <= bound, (
                f"layer {li} linears[{j}] bias grad drift: "
                f"|Δ|={err:.4g} > {bound:.4g}")


@pytest.mark.parametrize("dropout_p", [0.0, 0.3])
def test_encoder_stack_bwd_matches_perlayer_bit_exact(_hash_dropout,
                                                      monkeypatch,
                                                      dropout_p):
    """MMTX_ENC_BWD=stack (whole-stack fused backward, one pallas_call)
    is the same math as the per-layer loop: at equal tile_b the weight
    grads accumulate in the same order, so every grad — params AND dx —
    must be BIT-identical.  Also covers the VMEM fallback: when
    _pick_tile_b_stack says the dy carry does not fit, stack mode silently
    uses the per-layer path (same result by construction)."""
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas import encoder as enc

    h = 8
    params, x, mask, _ = _enc_setup(17, 5, 21, 64, 3, h)
    rng = jax.random.PRNGKey(7)
    g = jnp.asarray(np.random.RandomState(4).randn(*x.shape)
                    .astype(np.float32)) * mask

    monkeypatch.setattr(enc, "_pick_tile_b_bwd", lambda *a, **k: 1)

    def loss(p, xx):
        seeds = enc.dropout_seed_table(rng, len(p["layers"]))
        y = enc.encoder_stack_fused_train(p["layers"], xx, mask, h,
                                          dropout_p, seeds)
        return jnp.sum(torch_layer_norm(p["norm"], y.astype(xx.dtype)) * g)

    monkeypatch.delenv("MMTX_ENC_BWD", raising=False)
    want = jax.grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setenv("MMTX_ENC_BWD", "stack")
    monkeypatch.setattr(enc, "_pick_tile_b_stack", lambda *a, **k: 1)
    got = jax.grad(loss, argnums=(0, 1))(params, x)
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(got),
                               jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))

    # VMEM fallback: stack requested but does not fit -> per-layer path
    monkeypatch.setattr(enc, "_pick_tile_b_stack", lambda *a, **k: 0)
    fb = jax.grad(loss, argnums=(0, 1))(params, x)
    for (ka, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(fb),
                               jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_encoder_stack_bwd_chunked_matches_perlayer(_hash_dropout,
                                                    monkeypatch):
    """Chunked whole-stack backward (MMTX_ENC_BWD_CHUNKS=2): each chunk's
    kernel must key its regenerated dropout masks by GLOBAL video index
    (b_off) — a wrong offset reuses chunk 0's mask bits and silently
    corrupts chunk 1's grads, which dropout_p=0.3 here would catch.
    Weight grads differ from the per-layer path only by fp32 summation
    association ((t0..t1)+(t2..t3) vs sequential), dx is per-video and
    stays bit-exact."""
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas import encoder as enc

    h = 8
    params, x, mask, _ = _enc_setup(23, 4, 21, 64, 2, h)
    rng = jax.random.PRNGKey(9)
    g = jnp.asarray(np.random.RandomState(6).randn(*x.shape)
                    .astype(np.float32)) * mask

    monkeypatch.setattr(enc, "_pick_tile_b_bwd", lambda *a, **k: 1)
    monkeypatch.setattr(enc, "_pick_tile_b_stack", lambda *a, **k: 1)

    def loss(p, xx):
        seeds = enc.dropout_seed_table(rng, len(p["layers"]))
        y = enc.encoder_stack_fused_train(p["layers"], xx, mask, h, 0.3,
                                          seeds)
        return jnp.sum(torch_layer_norm(p["norm"], y.astype(xx.dtype)) * g)

    monkeypatch.delenv("MMTX_ENC_BWD", raising=False)
    want_p, want_x = jax.grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setenv("MMTX_ENC_BWD", "stack")
    monkeypatch.setenv("MMTX_ENC_BWD_CHUNKS", "2")
    got_p, got_x = jax.grad(loss, argnums=(0, 1))(params, x)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got_p),
            jax.tree_util.tree_leaves_with_path(want_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-6, err_msg=str(ka))


def test_encoder_train_dispatch_hash_only(_hash_dropout, monkeypatch):
    """encoder_stack dispatches the dropout-training kernel only for the
    hash dropout impl; threefry streams keep the jnp path.  The dispatched
    path must match the jnp path (same mask bits)."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.encoder as penc
    from multimodal_transformer_tpu.ops import basic
    from multimodal_transformer_tpu.ops.attention import encoder_stack

    h = 8
    params, x, mask, mask_np = _enc_setup(17, 4, 13, 128, 2, h)
    rng = jax.random.PRNGKey(9)

    calls = []
    orig = penc.encoder_stack_fused_train

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(penc, "encoder_stack_fused_train", spy)
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    got = encoder_stack(params, x, mask, h=h, rng=rng, dropout_p=0.1,
                        mask_mode="key_query")
    assert calls, "hash dropout training should dispatch the fused kernel"
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = encoder_stack(params, x, mask, h=h, rng=rng, dropout_p=0.1,
                         mask_mode="key_query")
    valid = mask_np[..., 0] == 1
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(want)[valid], rtol=1e-4,
                               atol=2e-5)

    calls.clear()
    basic.set_dropout_impl("threefry")
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    encoder_stack(params, x, mask, h=h, rng=rng, dropout_p=0.1,
                  mask_mode="key_query")
    assert not calls, "threefry dropout must NOT dispatch the fused kernel"


def test_encoder_train_dispatch_both_dtypes(_hash_dropout, monkeypatch):
    """The fused dropout-training kernel dispatches at BOTH dtypes by
    default (the probs/keep-stash backward flipped the measured bf16
    verdict); MMTX_ENC_TRAIN_BF16=0 restores the legacy fp32-only gate."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.encoder as penc
    from multimodal_transformer_tpu.ops.attention import encoder_stack

    h = 8
    params, x, mask, _ = _enc_setup(19, 3, 11, 128, 2, h)
    xb = x.astype(jnp.bfloat16)
    pb = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), params)
    mb = mask.astype(jnp.bfloat16)
    rng = jax.random.PRNGKey(2)

    calls = []
    orig = penc.encoder_stack_fused_train

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(penc, "encoder_stack_fused_train", spy)
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: True)
    monkeypatch.delenv("MMTX_ENC_TRAIN_BF16", raising=False)
    encoder_stack(pb, xb, mb, h=h, rng=rng, dropout_p=0.1,
                  mask_mode="key_query")
    assert calls, "bf16 activations should dispatch the fused train kernel"

    calls.clear()
    monkeypatch.setenv("MMTX_ENC_TRAIN_BF16", "0")
    encoder_stack(pb, xb, mb, h=h, rng=rng, dropout_p=0.1,
                  mask_mode="key_query")
    assert not calls, "MMTX_ENC_TRAIN_BF16=0 must keep bf16 on the jnp path"
    encoder_stack(params, x, mask, h=h, rng=rng, dropout_p=0.1,
                  mask_mode="key_query")
    assert calls, "MMTX_ENC_TRAIN_BF16=0 must still dispatch fp32"


def test_masked_softmax_semantics(monkeypatch):
    """The fused kernels' opt-in no-row-max softmax (MMTX_ENC_SOFTMAX=
    nomax, measured e2e-neutral): matches jax.nn.softmax to fp32 rounding
    on realistic masked scores, clamps huge scores finitely, and maps
    ALL-masked rows (padded videos) to exactly 0 instead of uniform
    garbage (so the train kernels' grad accumulators can never see NaN
    from padded rows)."""
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        NEG_INF, _masked_softmax)

    monkeypatch.setenv("MMTX_ENC_SOFTMAX", "nomax")

    rs = np.random.RandomState(0)
    s = jnp.asarray(rs.randn(12, 16).astype(np.float32) * 5.0)
    s = s.at[:, 10:].set(NEG_INF)      # masked key columns
    s = s.at[3, :].set(NEG_INF)        # an all-masked (padded) row
    got = np.asarray(_masked_softmax(s))
    want = np.asarray(jax.nn.softmax(s, axis=-1))
    rows = np.ones(12, bool)
    rows[3] = False
    np.testing.assert_allclose(got[rows], want[rows], rtol=1e-5, atol=1e-7)
    assert np.all(got[3] == 0.0), "all-masked row must be exactly 0"
    assert np.all(got[:, 10:] == 0.0), "masked columns must be exactly 0"
    # clamp: enormous scores stay finite and still sum to ~1 per row
    hot = jnp.full((2, 8), 500.0, jnp.float32)
    p = np.asarray(_masked_softmax(hot))
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)


def test_ablate_bwd_recompute_branch_smoke(_hash_dropout, monkeypatch):
    """MMTX_ABLATE_BWD_RECOMPUTE=1 is measurement-only (intentionally
    WRONG numerics — it replaces the backward's forward recompute with
    near-free fills to bound any stash scheme, ops/dispatch.py).  This
    smoke test pins the branch against bitrot: it must still compile and
    produce finite, correctly-shaped grads, and must NOT be dispatched by
    default (the default path's grads must differ from the ablated
    ones)."""
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused_train)

    h = 8
    params, x, mask, _ = _enc_setup(13, 5, 21, 64, 2, h)
    rng = jax.random.PRNGKey(5)
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape)
                    .astype(np.float32)) * mask

    def loss_ker(p, xx):
        seeds = dropout_seed_table(rng, len(p["layers"]))
        y = encoder_stack_fused_train(p["layers"], xx, mask, h, 0.3, seeds)
        return jnp.sum(torch_layer_norm(p["norm"], y.astype(xx.dtype)) * g)

    ref = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    monkeypatch.setenv("MMTX_ABLATE_BWD_RECOMPUTE", "1")
    abl = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    ref_l = jax.tree_util.tree_leaves(ref)
    abl_l = jax.tree_util.tree_leaves(abl)
    assert len(ref_l) == len(abl_l)
    any_diff = False
    for a, b in zip(abl_l, ref_l):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.isfinite(np.asarray(a)).all()
        any_diff |= not np.array_equal(np.asarray(a), np.asarray(b))
    assert any_diff, ("ablated grads equal the real ones — the knob is "
                      "either dead or leaking into the default path")


# ------------------------------------ fused MFN training path (dropout ON)

def test_mfn_train_fused_forward_matches_scan(_hash_dropout, monkeypatch):
    """The Pallas MFN train forward (in-kernel gamma dropout) must match
    the hoisted-hash lax.scan path bit-for-bit in mask bits and to fp32
    rounding in values, through the full mfn_scan (incl. the jnp out
    head) for a 3-modality config."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan

    mods = ["linguistic", "acoustic", "image"]
    dims = {"linguistic": 24, "acoustic": 16, "image": 20}
    p = mfn_init(jax.random.PRNGKey(31), mods, dims, 1)
    rs = np.random.RandomState(31)
    B, T = 3, 7
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              for m in mods}
    rng = jax.random.PRNGKey(77)

    monkeypatch.setattr(dispatch, "pallas_enabled",
                        lambda k=None: k == "mfn_train")
    got = mfn_scan(p, inputs, mods, rng=rng)
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = mfn_scan(p, inputs, mods, rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_mfn_train_fused_grad_parity(_hash_dropout, monkeypatch):
    """The reverse-recurrence Pallas backward must reproduce the jnp
    scan's gradients (params AND inputs) with dropout ON — same fmix32
    mask bits, so this is pure VJP-math parity."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    from multimodal_transformer_tpu.ops.mfn_core import mfn_init, mfn_scan

    mods = ["linguistic", "acoustic"]
    dims = {"linguistic": 24, "acoustic": 16}
    p = mfn_init(jax.random.PRNGKey(33), mods, dims, 1)
    rs = np.random.RandomState(33)
    B, T = 2, 6
    inputs = {m: jnp.asarray(rs.randn(B, T, dims[m]).astype(np.float32))
              for m in mods}
    rng = jax.random.PRNGKey(5)

    def loss(p, inputs):
        return jnp.sum(mfn_scan(p, inputs, mods, rng=rng) ** 2)

    monkeypatch.setattr(dispatch, "pallas_enabled",
                        lambda k=None: k == "mfn_train")
    got = jax.grad(loss, argnums=(0, 1))(p, inputs)
    monkeypatch.setattr(dispatch, "pallas_enabled", lambda *a, **k: False)
    want = jax.grad(loss, argnums=(0, 1))(p, inputs)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(got),
                                jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5, err_msg=str(ka))


def test_interpret_gates_recognize_both_tpu_backends(monkeypatch):
    """Every Pallas interpret-mode gate must treat BOTH production TPU
    backend names ('tpu' and the tunneled 'axon') as real hardware —
    a miss silently runs the kernel in interpret mode on device
    (ADVICE r2, high severity)."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.encoder as penc
    import multimodal_transformer_tpu.ops.pallas.mfn_train as pmfn

    for backend in ("tpu", "axon"):
        monkeypatch.setattr(jax, "default_backend", lambda b=backend: b)
        assert pmfn._interpret() is False, backend
        assert penc._train_interpret() is False, backend
        assert dispatch._on_tpu() is True, backend
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert pmfn._interpret() is True
    assert penc._train_interpret() is True
    assert dispatch._on_tpu() is False


# ------------------------------------------------ shape fit guards (long T)


def test_fit_guard_send_scale_tiles_unchanged():
    """The footprint-aware tile pickers must reproduce the MEASURED
    SEND-scale configurations exactly (T=160, D=256, F=128, bf16): eval
    tile_b=8, train-fwd 4, per-layer bwd 2 — the production kernel shapes
    every round-2..4 perf number was measured at.  A drift here silently
    invalidates the dispatch table."""
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        bwd_kernel_tile_b, eval_kernel_tile_b, train_kernel_tile_b)

    assert eval_kernel_tile_b(32, 160, 256, 128, 2) == 8
    assert train_kernel_tile_b(32, 160, 256, 128, 2) == 4
    assert bwd_kernel_tile_b(32, 160, 256, 128, 2, 8) == 2


def test_fit_guard_declines_long_t():
    """fused_encoder_fits: True at SEND scale, False once the quadratic
    [h*T,T] VMEM working set outgrows the guard; the training path (which
    additionally needs the backward's stashes to fit) never outlives the
    eval path; fitting is monotone in T."""
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        fused_encoder_fits)

    assert fused_encoder_fits(32, 160, 256, 128, 2)
    assert fused_encoder_fits(32, 160, 256, 128, 2, training=True)
    assert not fused_encoder_fits(32, 1280, 256, 128, 2)
    assert not fused_encoder_fits(32, 1280, 256, 128, 2, training=True)

    ts = (160, 224, 320, 448, 512, 640, 1280)
    fit_e = [fused_encoder_fits(32, t, 256, 128, 2) for t in ts]
    fit_t = [fused_encoder_fits(32, t, 256, 128, 2, training=True)
             for t in ts]
    assert fit_e == sorted(fit_e, reverse=True), fit_e  # monotone decline
    assert fit_t == sorted(fit_t, reverse=True), fit_t
    assert all(e or not t for e, t in zip(fit_e, fit_t)), (fit_e, fit_t)


def test_long_t_dispatch_falls_back_to_jnp(monkeypatch):
    """With the encoder kernel force-enabled, a long-T shape must route to
    the jnp path (graceful decline, VERDICT r4 missing #2) while SEND-scale
    shapes still dispatch the kernel — on BOTH the eval and the
    dropout-training entry points."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    import multimodal_transformer_tpu.ops.pallas.encoder as penc
    from multimodal_transformer_tpu.ops.attention import (encoder_init,
                                                          encoder_stack)

    monkeypatch.setattr(dispatch, "pallas_enabled",
                        lambda *a, **k: True)

    def boom(*a, **k):
        raise AssertionError("fused kernel dispatched beyond the fit guard")

    monkeypatch.setattr(penc, "encoder_stack_fused_trainable", boom)
    monkeypatch.setattr(penc, "encoder_stack_fused_train", boom)

    h = 8
    params = encoder_init(jax.random.PRNGKey(0), 128, 64, 1)
    rs = np.random.RandomState(0)

    def run(T, rng):
        x = jnp.asarray(rs.randn(1, T, 128).astype(np.float32))
        mask = np.ones((1, T, 1), np.float32)
        mask[0, T - 5:] = 0.0
        return encoder_stack(params, x, jnp.asarray(mask), h=h, rng=rng,
                             dropout_p=0.1 if rng is not None else 0.0,
                             mask_mode="key_query")

    # long T: declines onto jnp (finite output, kernels never touched)
    assert np.isfinite(np.asarray(run(1280, None))).all()
    assert np.isfinite(np.asarray(run(1280, jax.random.PRNGKey(1)))).all()
    # SEND-scale T: the kernels ARE dispatched (the sentinel raises)
    with pytest.raises(AssertionError, match="beyond the fit guard"):
        run(160, None)
    with pytest.raises(AssertionError, match="beyond the fit guard"):
        run(160, jax.random.PRNGKey(1))


def test_flash_attn_shape_gate(monkeypatch):
    """pallas_enabled("attn", t=...): static default OFF, shape-conditional
    ON past the measured crossover (when set), env overrides beat both."""
    import multimodal_transformer_tpu.ops.dispatch as dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    monkeypatch.delenv("MMTX_PALLAS_ATTN", raising=False)
    monkeypatch.delenv("MMTX_PALLAS", raising=False)

    assert not dispatch.pallas_enabled("attn")          # static default OFF
    if dispatch.FLASH_ATTN_MIN_T is None:
        assert not dispatch.pallas_enabled("attn", t=10 ** 6)
    else:
        assert dispatch.pallas_enabled("attn", t=dispatch.FLASH_ATTN_MIN_T)
        assert not dispatch.pallas_enabled(
            "attn", t=dispatch.FLASH_ATTN_MIN_T - 1)
    monkeypatch.setenv("MMTX_PALLAS_ATTN", "0")
    assert not dispatch.pallas_enabled("attn", t=10 ** 6)  # env beats gate
    monkeypatch.setenv("MMTX_PALLAS_ATTN", "1")
    assert dispatch.pallas_enabled("attn", t=1)


def test_long_t_default_path_routes_to_flash(monkeypatch):
    """End-to-end default-gate wiring at long T (VERDICT r4 next #2): with
    NO env overrides and the default dispatch table, an eval shape past the
    fused kernel's fit boundary must land on the FLASH attention path
    (FLASH_ATTN_MIN_T=512, the measured flash>=jnp crossover), while a
    dropout-training call at the same T stays jnp (flash has no
    attention-prob dropout).  Sentinels observe which path traces; nothing
    is executed on the Pallas side."""
    import multimodal_transformer_tpu.ops.attention as attn_mod
    import multimodal_transformer_tpu.ops.dispatch as dispatch
    from multimodal_transformer_tpu.ops.attention import (encoder_init,
                                                          encoder_stack)

    assert dispatch.FLASH_ATTN_MIN_T is not None
    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    for var in ("MMTX_PALLAS", "MMTX_PALLAS_ATTN", "MMTX_PALLAS_ENCODER"):
        monkeypatch.delenv(var, raising=False)

    class FlashDispatched(Exception):
        pass

    def flash_sentinel(*a, **k):
        raise FlashDispatched

    import multimodal_transformer_tpu.ops.pallas.attention as pattn
    monkeypatch.setattr(pattn, "flash_attention_trainable", flash_sentinel)

    h = 8
    T = 640  # > eval fit boundary (512) and >= FLASH_ATTN_MIN_T
    params = encoder_init(jax.random.PRNGKey(0), 256, 128, 1)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, T, 256).astype(np.float32))
    mask = np.ones((1, T, 1), np.float32)
    mask[0, T - 5:] = 0.0
    mask = jnp.asarray(mask)

    with pytest.raises(FlashDispatched):
        encoder_stack(params, x, mask, h=h, rng=None, dropout_p=0.0,
                      mask_mode="key_query")
    # dropout training at the same T: flash must NOT dispatch; the jnp
    # path must produce a finite result
    y = encoder_stack(params, x, mask, h=h, rng=jax.random.PRNGKey(1),
                      dropout_p=0.1, mask_mode="key_query")
    assert np.isfinite(np.asarray(y)).all()
    # below the crossover (and inside the fused fit) the flash sentinel
    # must not fire either when the fused kernel is explicitly disabled
    monkeypatch.setenv("MMTX_PALLAS_ENCODER", "0")
    xs = jnp.asarray(rs.randn(1, 160, 256).astype(np.float32))
    ms = jnp.asarray(np.ones((1, 160, 1), np.float32))
    ys = encoder_stack(params, xs, ms, h=h, rng=None, dropout_p=0.0,
                      mask_mode="key_query")
    assert np.isfinite(np.asarray(ys)).all()


@pytest.fixture
def _hash4_dropout():
    from multimodal_transformer_tpu.ops import basic
    basic.set_dropout_impl("hash4")
    yield
    basic.set_dropout_impl(None)


@pytest.mark.parametrize("T", [24, 21])
def test_encoder_train_kernel_hash4_parity(_hash4_dropout, T):
    """hash4 multi-bit dropout through the fused train kernels: the
    in-kernel generators (_row_keep/_attn_keep block layout) must
    reproduce basic.hash4_keep_rows' bits exactly, so forward values AND
    grads match the jnp path.  T=24 exercises the multi-bit attn site
    (T0 % 4 == 0); T=21 exercises its documented degradation to the
    per-element stream (row sites stay multi-bit — D/F are 4-multiples)."""
    from multimodal_transformer_tpu.ops.attention import encoder_stack
    from multimodal_transformer_tpu.ops.norm import torch_layer_norm
    from multimodal_transformer_tpu.ops.pallas.encoder import (
        dropout_seed_table, encoder_stack_fused_train)

    h = 8
    params, x, mask, mask_np = _enc_setup(29, 5, T, 64, 2, h)
    rng = jax.random.PRNGKey(42)
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape)
                    .astype(np.float32)) * mask

    want_y = encoder_stack(params, x, mask, h=h, rng=rng, dropout_p=0.3,
                           mask_mode="key_query")
    seeds = dropout_seed_table(rng, 2)
    y = encoder_stack_fused_train(params["layers"], x, mask, h, 0.3, seeds)
    got_y = torch_layer_norm(params["norm"], y.astype(x.dtype))
    valid = mask_np[..., 0] == 1
    np.testing.assert_allclose(np.asarray(got_y)[valid],
                               np.asarray(want_y)[valid], rtol=1e-4,
                               atol=2e-5)

    def loss_jnp(p, xx):
        yy = encoder_stack(p, xx, mask, h=h, rng=rng, dropout_p=0.3,
                           mask_mode="key_query")
        return jnp.sum(yy * g)

    def loss_ker(p, xx):
        s = dropout_seed_table(rng, len(p["layers"]))
        yy = encoder_stack_fused_train(p["layers"], xx, mask, h, 0.3, s)
        return jnp.sum(torch_layer_norm(p["norm"], yy.astype(xx.dtype)) * g)

    want = jax.grad(loss_jnp, argnums=(0, 1))(params, x)
    got = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(got),
                                jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=str(ka))
