"""Regenerate the numeric-regression goldens (tests/goldens/*.npz).

Run on CPU only (python tests/make_goldens.py).  Each golden is a full
eval-mode forward of one family at fixed seeds; test_golden.py asserts future
code produces identical outputs, locking numerics across refactors between
build rounds.  Regenerate ONLY when a numeric change is intended and
explained in the commit message.
"""

import os
import sys

import numpy as np

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


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, family, mods, mask_mode, variant in CASES:
        out = build_case(family, mods, mask_mode, variant)
        np.savez(os.path.join(GOLDEN_DIR, f"{name}.npz"), out=out)
        print(f"{name}: {out.shape} mean={out.mean():+.6f}")


if __name__ == "__main__":
    main()
