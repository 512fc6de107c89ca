"""Checkpoint conversion tests.

1. Round-trip: export_state_dict -> convert_state_dict is the identity for
   every family (multi + single modality) — exercises every key mapping.
2. Real-weights parity: convert the surviving reference checkpoint
   ModelSave/B1-LSTM/B1-LSTM-L.pth and check the JAX forward pass against an
   independent torch forward computed directly from the RAW state_dict keys
   (no converter in that path), on random window inputs.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multimodal_transformer_tpu.engine.convert import (
    convert_pth, convert_state_dict, export_state_dict, load_torch_state_dict)
from multimodal_transformer_tpu.models import build_model, default_config

REF_CKPT = "/root/reference/transformer/ModelSave/B1-LSTM/B1-LSTM-L.pth"

SMALL_DIMS = {"linguistic": 12, "acoustic": 8, "image": 10, "emotient": 6}


@pytest.mark.parametrize("family,mods,variant", [
    ("MFT", ("acoustic", "image", "linguistic"), "default"),
    ("MFT", ("linguistic",), "default"),
    ("SFT", ("image", "linguistic"), "default"),
    ("SFT", ("acoustic",), "default"),
    ("B1-LSTM", ("linguistic",), "default"),
    ("B1-LSTM", ("linguistic",), "legacy"),
    ("B2-Trans", ("image", "linguistic"), "default"),
    ("B3-MFN", ("acoustic", "linguistic"), "default"),
])
def test_export_convert_roundtrip(family, mods, variant):
    cfg = default_config(family, mods, variant=variant)
    object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
    init, _ = build_model(cfg)
    params = jax.tree_util.tree_map(np.asarray, init(jax.random.PRNGKey(7)))
    state = export_state_dict(cfg, params)
    rebuilt = convert_state_dict(cfg, state)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(rebuilt)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkpoint not mounted")
def test_real_b1_checkpoint_forward_parity():
    cfg, params, meta = convert_pth(REF_CKPT, "B1-LSTM")
    assert cfg.variant == "legacy"
    assert cfg.modalities == ("linguistic",)
    assert cfg.mod_dimension["linguistic"] == 300

    _, state = load_torch_state_dict(REF_CKPT)

    rs = np.random.RandomState(0)
    B, W, Fr, D = 2, 9, 5, 300
    x = rs.randn(B, W, Fr, D).astype(np.float32) * 0.3
    mask = np.ones((B, W, 1), np.float32)
    mask[1, 7:] = 0.0

    # ---- JAX path (converted params)
    _, apply = build_model(cfg)
    got = np.asarray(apply(params, {"linguistic": jnp.asarray(x)},
                           jnp.asarray(mask)))

    # ---- independent torch path straight from the raw state_dict
    def lin(key, v):
        return F.linear(v, torch.from_numpy(state[key + ".weight"]),
                        torch.from_numpy(state[key + ".bias"]))

    xt = torch.from_numpy(x)
    # CNN: [B*W, D, Fr] conv k=2 + maxpool  (reference CNN, models.py:57-79)
    xc = xt.reshape(B * W, Fr, D).permute(0, 2, 1)
    c = F.conv1d(xc, torch.from_numpy(state["cnn_linguistic.conv1d.weight"]),
                 torch.from_numpy(state["cnn_linguistic.conv1d.bias"]))
    pooled = F.max_pool1d(c, c.shape[2]).squeeze(2)
    # Highway, MFT-style (no ReLU on projection)
    proj = lin("highway_linguistic.linear_projection", pooled)
    gate = torch.sigmoid(lin("highway_linguistic.linear_gate", pooled))
    emb = (gate * proj + (1 - gate) * pooled).reshape(B, W, -1)
    # MultiLSTM head (reference MFT/models.py:182-220), eval mode
    e = F.relu(lin("LSTM.embed.1", emb))
    a = F.softmax(lin("LSTM.attn.2", F.relu(lin("LSTM.attn.0", e))), dim=1)
    h = torch.zeros(B, 256)
    cc = torch.zeros(B, 256)
    hs = []
    for t in range(W):
        z = (F.linear(e[:, t], torch.from_numpy(state["LSTM.lstm.weight_ih_l0"]),
                      torch.from_numpy(state["LSTM.lstm.bias_ih_l0"]))
             + F.linear(h, torch.from_numpy(state["LSTM.lstm.weight_hh_l0"]),
                        torch.from_numpy(state["LSTM.lstm.bias_hh_l0"])))
        i, f, g, o = (torch.sigmoid(z[:, :256]), torch.sigmoid(z[:, 256:512]),
                      torch.tanh(z[:, 512:768]), torch.sigmoid(z[:, 768:]))
        cc = f * cc + i * g
        h = o * torch.tanh(cc)
        hs.append(h.unsqueeze(1))
    hst = torch.cat(hs, dim=1)
    stacked = []
    for i in range(a.shape[2]):
        if i == 0:
            stacked.append(hst)
        else:
            pad = torch.zeros(B, i, 256)
            stacked.append(torch.cat([pad, hst[:, :-i, :]], dim=1))
    context = torch.sum(a.unsqueeze(2) * torch.stack(stacked, dim=-1), dim=-1)
    d = F.relu(lin("LSTM.decoder.0", context))
    want = (lin("LSTM.decoder.2", d) * torch.from_numpy(mask)).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    # sanity: outputs are in a plausible valence range and not constant
    assert np.std(got[0, :, 0]) > 1e-5
