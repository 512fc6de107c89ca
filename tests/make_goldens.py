"""Regenerate the numeric-regression goldens (tests/goldens/*.npz).

Run on CPU only (python tests/make_goldens.py).  Each golden is a full
eval-mode forward of one family at fixed seeds; test_golden.py asserts future
code produces identical outputs, locking numerics across refactors between
build rounds.  Regenerate ONLY when a numeric change is intended and
explained in the commit message.
"""

import os
import re
import sys

import numpy as np

# Pin the EXACT test topology (8 virtual CPU devices, tests/conftest.py):
# the train goldens checksum two full epochs of optimization, and XLA's
# partitioning differs with device count — goldens generated on a
# different topology fail the suite at the 1e-6 gate.
_xla_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                    os.environ.get("XLA_FLAGS", "")).strip()
os.environ["XLA_FLAGS"] = (
    _xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from multimodal_transformer_tpu.models import build_model, default_config  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")

SMALL_DIMS = {"linguistic": 12, "acoustic": 8, "image": 10, "emotient": 6}

CASES = [
    ("mft_avl", "MFT", ("acoustic", "image", "linguistic"), "query", "default"),
    ("mft_single", "MFT", ("linguistic",), "query", "default"),
    ("sft_vl", "SFT", ("image", "linguistic"), "query", "default"),
    ("b1_l", "B1-LSTM", ("linguistic",), "query", "default"),
    ("b1_legacy", "B1-LSTM", ("linguistic",), "query", "legacy"),
    ("b2_vl", "B2-Trans", ("image", "linguistic"), "query", "default"),
    ("b2_vl_keymask", "B2-Trans", ("image", "linguistic"), "key_query",
     "default"),
    ("b3_al", "B3-MFN", ("acoustic", "linguistic"), "query", "default"),
]


def build_case(family, mods, mask_mode, variant):
    cfg = default_config(family, mods, mask_mode=mask_mode, variant=variant)
    object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
    init, apply = build_model(cfg)
    params = init(jax.random.PRNGKey(1234))
    rs = np.random.RandomState(99)
    B, W, Fr = 2, 7, 4
    inputs = {m: rs.randn(B, W, Fr, SMALL_DIMS[m]).astype(np.float32)
              for m in mods}
    mask = np.ones((B, W, 1), np.float32)
    mask[1, 5:] = 0.0
    out = apply(params, {m: jnp.asarray(v) for m, v in inputs.items()},
                jnp.asarray(mask))
    return np.asarray(out)


# ---------------------------------------------------------- train goldens
# One fixed-seed 2-epoch training run per family per kernel path (VERDICT
# r2 #5): locks the TRAINING numerics — Adam + weight decay, loss
# denominator, hash-dropout streams, and the hand-written Pallas train
# kernels (forced to dispatch in interpret mode on CPU) — which the
# tolerance-based parity tests absorb small drift in.  Recorded: per-epoch
# losses + per-leaf (sum, abs-sum) checksums of the final params.

TRAIN_CASES = [
    # (name, family, mods); kernel=True/False generated for each
    ("mft", "MFT", ("acoustic", "linguistic")),
    ("sft", "SFT", ("image", "linguistic")),
    ("b1", "B1-LSTM", ("linguistic",)),
    ("b2", "B2-Trans", ("image", "linguistic")),
    ("b3", "B3-MFN", ("acoustic", "linguistic")),
]


def build_train_case(family, mods, kernel: bool):
    """2 deterministic train epochs; returns (losses[2], leaf_sums,
    leaf_abs_sums).  kernel=True forces every Pallas train path to
    dispatch (interpret mode on CPU); kernel=False pins the jnp paths.
    Dropout impl is pinned to "hash" (the only kernel-regenerable
    stream)."""
    from multimodal_transformer_tpu.engine import Engine
    from multimodal_transformer_tpu.ops import basic, dispatch

    orig_enabled = dispatch.pallas_enabled
    orig_impl = basic._dropout_impl()
    basic.set_dropout_impl("hash")
    dispatch.pallas_enabled = (lambda *a, **k: kernel)
    try:
        cfg = default_config(family, mods, mask_mode="key_query")
        object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
        eng = Engine(cfg, lr=1e-3, seed=7)
        rs = np.random.RandomState(5)
        B, W, Fr = 4, 7, 4
        data = {m: rs.randn(B, W, Fr, SMALL_DIMS[m]).astype(np.float32)
                for m in mods}
        target = (rs.randn(B, W) * 0.3).astype(np.float32)
        seq_lens = np.array([7, 6, 5, 7])
        losses = [float(eng.train_epoch(data, target, seq_lens,
                                        batch_size=2,
                                        rng=np.random.RandomState(3)))
                  for _ in range(2)]
        leaves = [np.asarray(l, np.float64)
                  for l in jax.tree_util.tree_leaves(eng.params)]
        sums = np.array([l.sum() for l in leaves])
        abs_sums = np.array([np.abs(l).sum() for l in leaves])
        return np.array(losses), sums, abs_sums
    finally:
        dispatch.pallas_enabled = orig_enabled
        basic.set_dropout_impl(orig_impl)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, family, mods, mask_mode, variant in CASES:
        out = build_case(family, mods, mask_mode, variant)
        np.savez(os.path.join(GOLDEN_DIR, f"{name}.npz"), out=out)
        print(f"{name}: {out.shape} mean={out.mean():+.6f}")
    for name, family, mods in TRAIN_CASES:
        for kernel in (False, True):
            tag = "kernel" if kernel else "jnp"
            losses, sums, abs_sums = build_train_case(family, mods, kernel)
            np.savez(os.path.join(GOLDEN_DIR, f"train_{name}_{tag}.npz"),
                     losses=losses, sums=sums, abs_sums=abs_sums)
            print(f"train_{name}_{tag}: losses={losses.round(6)} "
                  f"|params|={abs_sums.sum():.6f}")


if __name__ == "__main__":
    main()
