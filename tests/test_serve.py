"""Serving API tests: checkpoint -> predictor -> per-video traces."""

import numpy as np
import pytest

from multimodal_transformer_tpu.data import (generate_synthetic_send,
                                             load_send, window_pipeline)
from multimodal_transformer_tpu.engine import Engine, save_checkpoint
from multimodal_transformer_tpu.models import default_config
from multimodal_transformer_tpu.serve import ValencePredictor

SMALL_DIMS = {"linguistic": 16, "emotient": 20, "image": 12, "acoustic": 10}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    generate_synthetic_send(str(d / "data"), {"Valid": 3}, duration_s=25.0,
                            seed=8, dims=SMALL_DIMS)
    cfg = default_config("B2-Trans", ("acoustic", "linguistic"),
                         mask_mode="key_query")
    object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
    eng = Engine(cfg, seed=3)
    ckpt = str(d / "model.ckpt")
    save_checkpoint(cfg.modalities, cfg.mod_dimension, cfg.window_size,
                    eng.params, ckpt)
    return d, cfg, eng, ckpt


def test_predict_dataset_matches_engine_eval(setup):
    d, cfg, eng, ckpt = setup
    ds = load_send(list(cfg.modalities), str(d / "data"), "Valid")
    pred = ValencePredictor.from_checkpoint(ckpt, "B2-Trans", bf16=False,
                                            batch_size=2, time_multiple=8)
    # fix the small fixture dims (checkpoint metadata carries them)
    traces = pred.predict_dataset(ds)
    assert len(traces) == 3
    x, y, lens = window_pipeline(ds, cfg.window_size, cfg.modalities,
                                 cfg.mod_dimension)
    _, preds, _, _, _, _ = eng.evaluate_per_video(x, y, lens)
    from multimodal_transformer_tpu.engine import seq_id_strings
    for sid, ref in zip(seq_id_strings(ds.seq_ids), preds):
        got = traces[sid]
        assert len(got) == len(ref)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_bf16_predictor_close(setup):
    d, cfg, eng, ckpt = setup
    ds = load_send(list(cfg.modalities), str(d / "data"), "Valid")
    p32 = ValencePredictor.from_checkpoint(ckpt, "B2-Trans", bf16=False,
                                           batch_size=2, time_multiple=8)
    p16 = ValencePredictor.from_checkpoint(ckpt, "B2-Trans", bf16=True,
                                           batch_size=2, time_multiple=8)
    t32, t16 = p32.predict_dataset(ds), p16.predict_dataset(ds)
    for sid in t32:
        np.testing.assert_allclose(t16[sid], t32[sid], atol=0.03)


def test_warmup_compiles_buckets(setup):
    _, cfg, _, ckpt = setup
    pred = ValencePredictor.from_checkpoint(ckpt, "B2-Trans", bf16=False,
                                            batch_size=2, time_multiple=8)
    n = pred.warmup(20, frames={m: 3 for m in cfg.modalities})
    assert n == 3  # buckets 8, 16, 24
