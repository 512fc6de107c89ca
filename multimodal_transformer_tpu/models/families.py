"""The five model families, composed from the shared front-end, encoder stack,
MFN scan, and decoder heads.

Every family is a pair (init, apply):
    params = <family>_init(key, cfg)
    pred   = <family>_apply(params, cfg, inputs, mask, rng=None)  # [B, T, 1]

inputs: dict modality -> [B, W, F, D] window tensors; mask: [B, T, 1] float.
rng=None means eval mode (all dropout off), matching model.eval().

Family pipelines (SURVEY.md §2.4):
  MFT      per-mod CNN+Highway -> per-mod Linear embed -> per-mod 6-layer
           encoder -> MFN -> 1-d valence (reference MFT/models.py:81-138 +
           MFT/multiTransformer.py:250-313); single-mod falls back to
           UniTransformer (MFT/models.py:101-104).
  SFT      CNN+Highway -> concat -> Linear(total->512)+tanh -> NLPTransformer
           (SFT/models.py:81-142); single-mod -> UniTransformer.
  B1-LSTM  CNN+Highway(ReLU proj, BERT-1024 linguistic) -> concat ->
           MultiLSTM head (B1-LSTM/models.py:79-133).
  B2-Trans CNN+Highway -> concat -> UniFullTransformer (encoder + linear
           header, B2-Trans/models.py:81-136) for any number of modalities.
  B3-MFN   like MFT but per-mod encoders skipped: Linear embed -> MFN
           (B3-MFN/multiTransformer.py:250-306); single-mod -> UniTransformer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import encoder_init, encoder_stack
from ..ops.basic import linear
from ..ops.mfn_core import mfn_init, mfn_scan
from ..utils.torch_init import linear_init
from .config import MFT_EMBED_DIM, ModelConfig
from .frontend import frontend_apply, frontend_init
from .heads import (
    multi_lstm_apply, multi_lstm_init, uni_full_transformer_apply,
    uni_full_transformer_init, uni_transformer_apply, uni_transformer_init,
)


def _split_rng(rng, n):
    return jax.random.split(rng, n) if rng is not None else [None] * n


# --------------------------------------------------------------------- MFT

def mft_init(key, cfg: ModelConfig):
    mods = cfg.modalities
    k_front, k_head = jax.random.split(key)
    params = frontend_init(k_front, mods, cfg.mod_dimension,
                           cfg.window_embed_size)
    if len(mods) > 1:
        keys = jax.random.split(k_head, 2 * len(mods) + 1)
        head = {}
        for i, mod in enumerate(mods):
            head[f"embed_{mod}"] = linear_init(
                keys[2 * i], cfg.window_embed_size[mod], MFT_EMBED_DIM[mod])
            head[f"transformer_{mod}"] = encoder_init(
                keys[2 * i + 1], MFT_EMBED_DIM[mod], 128, 6)
        head["mfn"] = mfn_init(keys[-1], mods, MFT_EMBED_DIM, output_dim=1)
        params["Transformer"] = head
    else:
        params["Transformer"] = uni_transformer_init(k_head,
                                                     cfg.total_embed_size)
    return params


def mft_apply(params, cfg: ModelConfig, inputs, mask, rng=None):
    mods = cfg.modalities
    r_front, r_head = _split_rng(rng, 2)
    outs = frontend_apply(params, inputs, mods, rng=r_front)
    head = params["Transformer"]
    if len(mods) > 1:
        rngs = _split_rng(r_head, len(mods) + 1)
        # NOTE: running the three structurally-identical per-modality
        # encoders as one modality-batched stack was measured NEUTRAL at
        # B=32 and slower at B=128 (XLA already interleaves the branches;
        # the stage is HBM-bound, not dispatch-bound) — see
        # ops/attention.py encoder_stack_batched for the measured verdict.
        mfn_in = {}
        for mod, mod_rng in zip(mods, rngs[:-1]):
            e = linear(head[f"embed_{mod}"], outs[mod])
            mfn_in[mod] = encoder_stack(head[f"transformer_{mod}"], e,
                                        mask, h=8, rng=mod_rng,
                                        mask_mode=cfg.mask_mode)
        pred = mfn_scan(head["mfn"], mfn_in, mods, rng=rngs[-1])
        return pred * mask
    return uni_transformer_apply(head, outs[mods[0]], mask, rng=r_head,
                                 mask_mode=cfg.mask_mode)


# --------------------------------------------------------------------- SFT

def sft_init(key, cfg: ModelConfig, fuse_embed_size: int = 512):
    mods = cfg.modalities
    k_front, k_fuse, k_head = jax.random.split(key, 3)
    params = frontend_init(k_front, mods, cfg.mod_dimension,
                           cfg.window_embed_size)
    if len(mods) > 1:
        params["fusionLayer"] = linear_init(k_fuse, cfg.total_embed_size,
                                            fuse_embed_size)
        params["Transformer"] = uni_transformer_init(k_head, fuse_embed_size)
    else:
        # the reference still creates fusionLayer but never uses it
        params["fusionLayer"] = linear_init(k_fuse, cfg.total_embed_size,
                                            fuse_embed_size)
        params["Transformer"] = uni_transformer_init(k_head,
                                                     cfg.total_embed_size)
    return params


def sft_apply(params, cfg: ModelConfig, inputs, mask, rng=None):
    mods = cfg.modalities
    r_front, r_head = _split_rng(rng, 2)
    outs = frontend_apply(params, inputs, mods, rng=r_front)
    if len(mods) > 1:
        fused = jnp.concatenate([outs[m] for m in mods], axis=2)
        fused = jnp.tanh(linear(params["fusionLayer"], fused))
        return uni_transformer_apply(params["Transformer"], fused, mask,
                                     rng=r_head, mask_mode=cfg.mask_mode,
                                     embed_is_mlp=True)
    return uni_transformer_apply(params["Transformer"], outs[mods[0]], mask,
                                 rng=r_head, mask_mode=cfg.mask_mode)


# ----------------------------------------------------------------- B1-LSTM

def b1_lstm_init(key, cfg: ModelConfig):
    mods = cfg.modalities
    k_front, k_head = jax.random.split(key)
    params = frontend_init(k_front, mods, cfg.mod_dimension,
                           cfg.window_embed_size)
    if cfg.variant == "legacy":
        # MFT-style MultiLSTM defaults (reference MFT/models.py:151-176)
        params["LSTM"] = multi_lstm_init(k_head, cfg.total_embed_size,
                                         embed_dim=128, h_dim=256)
    else:
        params["LSTM"] = multi_lstm_init(k_head, cfg.total_embed_size)
    return params


def b1_lstm_apply(params, cfg: ModelConfig, inputs, mask, rng=None):
    mods = cfg.modalities
    r_front, r_head = _split_rng(rng, 2)
    legacy = cfg.variant == "legacy"
    outs = frontend_apply(params, inputs, mods, rng=r_front,
                          relu_proj=not legacy)
    fused = (jnp.concatenate([outs[m] for m in mods], axis=2)
             if len(mods) > 1 else outs[mods[0]])
    if legacy:
        return multi_lstm_apply(params["LSTM"], fused, mask, rng=r_head,
                                embed_dropout=0.1, decoder_dropout=0.0,
                                mask_mode=cfg.mask_mode)
    return multi_lstm_apply(params["LSTM"], fused, mask, rng=r_head,
                            mask_mode=cfg.mask_mode)


# ---------------------------------------------------------------- B2-Trans

def b2_trans_init(key, cfg: ModelConfig):
    mods = cfg.modalities
    k_front, k_head = jax.random.split(key)
    params = frontend_init(k_front, mods, cfg.mod_dimension,
                           cfg.window_embed_size)
    params["Transformer"] = uni_full_transformer_init(k_head,
                                                      cfg.total_embed_size)
    return params


def b2_trans_apply(params, cfg: ModelConfig, inputs, mask, rng=None):
    mods = cfg.modalities
    r_front, r_head = _split_rng(rng, 2)
    outs = frontend_apply(params, inputs, mods, rng=r_front)
    fused = (jnp.concatenate([outs[m] for m in mods], axis=2)
             if len(mods) > 1 else outs[mods[0]])
    return uni_full_transformer_apply(params["Transformer"], fused, mask,
                                      rng=r_head, mask_mode=cfg.mask_mode)


# ----------------------------------------------------------------- B3-MFN

def b3_mfn_init(key, cfg: ModelConfig):
    mods = cfg.modalities
    k_front, k_head = jax.random.split(key)
    params = frontend_init(k_front, mods, cfg.mod_dimension,
                           cfg.window_embed_size)
    if len(mods) > 1:
        keys = jax.random.split(k_head, len(mods) + 1)
        head = {}
        for i, mod in enumerate(mods):
            head[f"embed_{mod}"] = linear_init(
                keys[i], cfg.window_embed_size[mod], MFT_EMBED_DIM[mod])
        head["mfn"] = mfn_init(keys[-1], mods, MFT_EMBED_DIM, output_dim=1)
        params["Transformer"] = head
    else:
        params["Transformer"] = uni_transformer_init(k_head,
                                                     cfg.total_embed_size)
    return params


def b3_mfn_apply(params, cfg: ModelConfig, inputs, mask, rng=None):
    mods = cfg.modalities
    r_front, r_head = _split_rng(rng, 2)
    outs = frontend_apply(params, inputs, mods, rng=r_front)
    head = params["Transformer"]
    if len(mods) > 1:
        mfn_in = {m: linear(head[f"embed_{m}"], outs[m]) for m in mods}
        pred = mfn_scan(head["mfn"], mfn_in, mods, rng=r_head)
        return pred * mask
    return uni_transformer_apply(head, outs[mods[0]], mask, rng=r_head,
                                 mask_mode=cfg.mask_mode)


# ---------------------------------------------------------------- registry

FAMILY_FNS = {
    "MFT": (mft_init, mft_apply),
    "SFT": (sft_init, sft_apply),
    "B1-LSTM": (b1_lstm_init, b1_lstm_apply),
    "B2-Trans": (b2_trans_init, b2_trans_apply),
    "B3-MFN": (b3_mfn_init, b3_mfn_apply),
}


def build_model(cfg: ModelConfig):
    """Returns (init_fn, apply_fn) closed over the config."""
    init_fn, apply_fn = FAMILY_FNS[cfg.family]

    def init(key):
        return init_fn(key, cfg)

    def apply(params, inputs, mask, rng=None):
        return apply_fn(params, cfg, inputs, mask, rng=rng)

    return init, apply


if __name__ == "__main__":
    # Executable smoke test, the analog of the reference's
    # `python models.py --dir --subset` (reference MFT/models.py:402-428,
    # which instantiates an AR-LSTM and prints one video's valences; the
    # reference version passes a dict where a tensor is expected and has
    # bitrotted — this one runs the windowed pipeline end to end).
    import argparse

    import numpy as np

    # smoke runs eagerly (unjitted); keep it off any remote accelerator
    jax.config.update("jax_platforms", "cpu")

    from ..data import load_send, window_pipeline
    from .config import default_config
    from .legacy_lstm import multi_ar_lstm_apply, multi_ar_lstm_init

    parser = argparse.ArgumentParser()
    parser.add_argument('--dir', type=str, default="../data")
    parser.add_argument('--subset', type=str, default="Train")
    args = parser.parse_args()

    print("Loading data...")
    cfg = default_config("B3-MFN", ("acoustic", "emotient"))
    dataset = load_send(list(cfg.modalities), args.dir, args.subset)
    padded, targets, seq_lens = window_pipeline(
        dataset, cfg.window_size, cfg.modalities, cfg.mod_dimension)
    print("Building model...")
    import jax
    import jax.numpy as jnp
    total = sum(cfg.mod_dimension[m] for m in cfg.modalities)
    params = multi_ar_lstm_init(jax.random.PRNGKey(0), total)
    print("Passing a sample through the model...")
    x = jnp.concatenate(
        [jnp.asarray(padded[m][:1, :, 0, :]) for m in cfg.modalities],
        axis=2)  # first frame per window, first video
    mask = jnp.ones((1, x.shape[1], 1), jnp.float32)
    out = np.asarray(multi_ar_lstm_apply(params, x, mask)).reshape(-1)
    print("Predicted valences:")
    for o in out:
        print("{:+0.3f}".format(float(o)))
