"""Training-dynamics parity: N full optimization steps (forward + backward +
torch-Adam with coupled weight decay) must track a torch replica bit-closely
when started from identical weights on identical batches.

This closes the loop beyond forward parity: gradients, the loss scaling
(sum-MSE / sum(lengths), reference MFT/train.py:135-139), and the optimizer
update all agree, so training curves are comparable up to dropout RNG
(disabled here; documented difference in PARITY.md).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multimodal_transformer_tpu.engine.optim import adam_init, adam_update
from multimodal_transformer_tpu.models import build_model, default_config

SMALL_DIMS = {"linguistic": 10, "acoustic": 8, "image": 10, "emotient": 6}


def torch_param_tree(params):
    """JAX param pytree -> same-structure tree of torch Parameters."""
    def conv(x):
        return torch.nn.Parameter(torch.from_numpy(np.asarray(x).copy()))
    return jax.tree_util.tree_map(conv, params,
                                  is_leaf=lambda x: hasattr(x, "shape"))


def t_lin(p, x):
    return F.linear(x, p["weight"], p["bias"])


def t_norm(p, x, eps=1e-6):
    mean = x.mean(-1, keepdim=True)
    std = x.std(-1, keepdim=True)
    return p["a_2"] * (x - mean) / (std + eps) + p["b_2"]


def torch_b2_forward(tp, mods, inputs, mask):
    """B2-Trans forward in torch on the Parameter tree (eval-mode math,
    reference pipeline: CNN+Highway -> concat -> UniFullTransformer)."""
    outs = []
    for mod in mods:
        x = torch.from_numpy(inputs[mod])  # [B, W, F, D]
        B, W, Fr, D = x.shape
        conv_p = tp[f"cnn_{mod}"]["conv1d"]
        xc = x.reshape(B * W, Fr, D).permute(0, 2, 1)
        c = F.conv1d(xc, conv_p["weight"], conv_p["bias"])
        pooled = F.max_pool1d(c, c.shape[2]).squeeze(2)
        hw = tp[f"highway_{mod}"]
        proj = t_lin(hw["linear_projection"], pooled)
        gate = torch.sigmoid(t_lin(hw["linear_gate"], pooled))
        out = gate * proj + (1 - gate) * pooled
        outs.append(out.reshape(B, W, -1))
    fused = torch.cat(outs, dim=2)
    head = tp["Transformer"]
    e = t_lin(head["embed"], fused)
    mt = torch.from_numpy(mask)
    h = 8
    for layer in head["encoder"]["layers"]:
        normed = t_norm(layer["sublayer"][0]["norm"], e)
        Bq, T, Dm = normed.shape
        d_k = Dm // h
        lins = layer["self_attn"]["linears"]
        q = t_lin(lins[0], normed).view(Bq, -1, h, d_k).transpose(1, 2)
        k = t_lin(lins[1], normed).view(Bq, -1, h, d_k).transpose(1, 2)
        v = t_lin(lins[2], normed).view(Bq, -1, h, d_k).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-2, -1)) / np.sqrt(d_k)
        scores = scores.masked_fill(mt.unsqueeze(1) == 0, -1e9)
        attn = F.softmax(scores, dim=-1)
        ao = torch.matmul(attn, v).transpose(1, 2).contiguous().view(
            Bq, -1, Dm)
        e = e + t_lin(lins[3], ao)
        normed = t_norm(layer["sublayer"][1]["norm"], e)
        ff = layer["feed_forward"]
        e = e + t_lin(ff["w_2"], F.relu(t_lin(ff["w_1"], normed)))
    enc = t_norm(head["encoder"]["norm"], e)
    pred = t_lin(head["out_fc2"], F.relu(t_lin(head["out_fc1"], enc)))
    return pred * mt


def test_five_train_steps_track_torch():
    mods = ("acoustic", "linguistic")
    cfg = default_config("B2-Trans", mods)
    object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(0))
    opt_state = adam_init(params)

    tp = torch_param_tree(params)
    leaves = [l for l in jax.tree_util.tree_leaves(
        tp, is_leaf=lambda x: isinstance(x, torch.nn.Parameter))]
    topt = torch.optim.Adam(leaves, lr=1e-3, weight_decay=1e-4)

    rs = np.random.RandomState(0)
    B, T, Fr = 3, 6, 3
    lengths = [6, 5, 4]
    mask = np.zeros((B, T, 1), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1.0
    target = (rs.rand(B, T, 1).astype(np.float32) * mask)

    lr = jnp.asarray(1e-3)
    losses_j, losses_t = [], []
    for step in range(5):
        inputs = {m: rs.randn(B, T, Fr, cfg.mod_dimension[m])
                  .astype(np.float32) for m in mods}

        # --- jax step (deterministic: rng=None -> no dropout)
        def loss_fn(p):
            pred = apply(p, {m: jnp.asarray(v) for m, v in inputs.items()},
                         jnp.asarray(mask), rng=None)
            d = pred - jnp.asarray(target)
            return jnp.sum(d * d) / sum(lengths)

        lj, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr,
                                        weight_decay=1e-4)
        losses_j.append(float(lj))

        # --- torch step
        pred_t = torch_b2_forward(tp, mods, inputs, mask)
        lt = ((pred_t - torch.from_numpy(target)) ** 2).sum() / sum(lengths)
        lt.backward()
        topt.step()
        topt.zero_grad()
        losses_t.append(float(lt))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-4, atol=1e-5)
    # final params must still agree closely after 5 coupled updates
    for (kj, a), (kt, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(
                tp, is_leaf=lambda x: isinstance(x, torch.nn.Parameter))):
        np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                                   rtol=5e-3, atol=2e-4, err_msg=str(kj))
