"""Full-model forward parity (eval mode) for all five families vs torch oracle,
plus jit/grad smoke tests.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multimodal_transformer_tpu.models import ModelConfig, build_model, default_config
from multimodal_transformer_tpu.ops.mfn_core import HIDDEN_DIM, MEM_DIM
from multimodal_transformer_tpu.models.config import MFT_EMBED_DIM

import torch_oracle as oracle

RTOL, ATOL = 2e-3, 2e-4

# Small synthetic dims so tests are fast; families keep their real embed logic.
SMALL_DIMS = {"linguistic": 12, "acoustic": 8, "image": 10, "emotient": 6}


def small_config(family, mods):
    cfg = default_config(family, mods)
    # shrink raw feature dims (window_embed stays per-family)
    object.__setattr__(cfg, "mod_dimension",
                       {m: SMALL_DIMS[m] for m in SMALL_DIMS})
    return cfg


def make_inputs(cfg, B=2, W=7, Fr=4, seed=0):
    rs = np.random.RandomState(seed)
    inputs = {m: rs.randn(B, W, Fr, cfg.mod_dimension[m]).astype(np.float32)
              for m in cfg.modalities}
    mask = np.ones((B, W, 1), np.float32)
    mask[1, 5:] = 0.0
    return inputs, mask


def run_both(family, mods, seed=0):
    cfg = small_config(family, mods)
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(seed))
    inputs, mask = make_inputs(cfg, seed=seed)
    got = np.asarray(apply(params,
                           {m: jnp.asarray(v) for m, v in inputs.items()},
                           jnp.asarray(mask)))
    return cfg, params, inputs, mask, got


def test_b2_trans_multimodal_matches_torch():
    cfg, params, inputs, mask, got = run_both("B2-Trans",
                                              ("acoustic", "image",
                                               "linguistic"))
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    fused = torch.cat([fronts[m] for m in cfg.modalities], dim=2)
    want = oracle.t_uni_full_transformer(params["Transformer"], fused,
                                         torch.from_numpy(mask))
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_sft_multimodal_matches_torch():
    cfg, params, inputs, mask, got = run_both("SFT", ("image", "linguistic"))
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    fused = torch.cat([fronts[m] for m in cfg.modalities], dim=2)
    fused = torch.tanh(oracle.t_linear(params["fusionLayer"], fused))
    want = oracle.t_uni_transformer(params["Transformer"], fused,
                                    torch.from_numpy(mask),
                                    embed_is_mlp=True)
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_sft_single_modality_uses_uni_transformer():
    cfg, params, inputs, mask, got = run_both("SFT", ("linguistic",))
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    want = oracle.t_uni_transformer(params["Transformer"],
                                    fronts["linguistic"],
                                    torch.from_numpy(mask))
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_b1_lstm_matches_torch():
    cfg, params, inputs, mask, got = run_both("B1-LSTM",
                                              ("linguistic", "image"))
    fronts = oracle.t_frontend(params, inputs, cfg.modalities,
                               relu_proj=True)
    fused = torch.cat([fronts[m] for m in cfg.modalities], dim=2)
    want = oracle.t_multi_lstm(params["LSTM"], fused, torch.from_numpy(mask))
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_b3_mfn_matches_torch():
    mods = ("acoustic", "linguistic")
    cfg, params, inputs, mask, got = run_both("B3-MFN", mods)
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    head = params["Transformer"]
    mfn_in = {m: oracle.t_linear(head[f"embed_{m}"], fronts[m]).detach().numpy()
              for m in mods}
    want = oracle.t_mfn(head["mfn"], mfn_in, mods, HIDDEN_DIM, MEM_DIM)
    want = want * torch.from_numpy(mask)
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_mft_multimodal_matches_torch():
    mods = ("acoustic", "image", "linguistic")
    cfg, params, inputs, mask, got = run_both("MFT", mods)
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    head = params["Transformer"]
    mfn_in = {}
    for m in mods:
        e = oracle.t_linear(head[f"embed_{m}"], fronts[m])
        e = oracle.t_encoder(head[f"transformer_{m}"], e,
                             torch.from_numpy(mask))
        mfn_in[m] = e.detach().numpy()
    want = oracle.t_mfn(head["mfn"], mfn_in, mods, HIDDEN_DIM, MEM_DIM)
    want = want * torch.from_numpy(mask)
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_mft_single_modality_uses_uni_transformer():
    cfg, params, inputs, mask, got = run_both("MFT", ("acoustic",))
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    want = oracle.t_uni_transformer(params["Transformer"], fronts["acoustic"],
                                    torch.from_numpy(mask))
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


@pytest.mark.parametrize("family,mods", [
    ("MFT", ("acoustic", "image", "linguistic")),
    ("SFT", ("image", "linguistic")),
    ("B1-LSTM", ("linguistic",)),
    ("B2-Trans", ("image", "linguistic")),
    ("B3-MFN", ("acoustic", "linguistic")),
])
def test_jit_and_grad(family, mods):
    """Every family must jit-compile and yield finite grads of masked MSE."""
    cfg = small_config(family, mods)
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(1))
    inputs, mask = make_inputs(cfg, seed=1)
    inputs = {m: jnp.asarray(v) for m, v in inputs.items()}
    maskj = jnp.asarray(mask)
    target = jnp.asarray(
        np.random.RandomState(2).randn(*mask.shape).astype(np.float32)) * maskj

    @jax.jit
    def loss_fn(p, rng):
        pred = apply(p, inputs, maskj, rng=rng)
        d = pred - target
        return jnp.sum(d * d)

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # dropout path (train mode) must also run under jit
    loss2 = loss_fn(params, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss2))


def test_mft_with_emotient_modality():
    """Emotient has distinct dims everywhere (raw 20 -> window embed 20 ->
    MFT embed 16 -> MFN hidden 16); ensure the full pipeline handles it."""
    import torch
    mods = ("acoustic", "emotient")
    cfg = small_config("MFT", mods)
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(6))
    inputs, mask = make_inputs(cfg, seed=6)
    got = np.asarray(apply(params,
                           {m: jnp.asarray(v) for m, v in inputs.items()},
                           jnp.asarray(mask)))
    assert got.shape == mask.shape
    fronts = oracle.t_frontend(params, inputs, cfg.modalities)
    head = params["Transformer"]
    mfn_in = {}
    for m in mods:
        e = oracle.t_linear(head[f"embed_{m}"], fronts[m])
        e = oracle.t_encoder(head[f"transformer_{m}"], e,
                             torch.from_numpy(mask))
        mfn_in[m] = e.detach().numpy()
    want = oracle.t_mfn(head["mfn"], mfn_in, mods, HIDDEN_DIM, MEM_DIM)
    want = want * torch.from_numpy(mask)
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=RTOL,
                               atol=ATOL)
