"""Data-layer tests on the synthetic mini-SENDv1 fixture."""

import numpy as np
import pytest

from multimodal_transformer_tpu.data import (
    Batch, bucketed_eval_batches, generate_synthetic_send, load_send,
    make_batches, window_pipeline,
)
from multimodal_transformer_tpu.data.windowing import (
    window_channel, window_ratings,
)
from multimodal_transformer_tpu.models import default_config

SMALL_DIMS = {"linguistic": 300, "emotient": 20, "image": 1000, "acoustic": 88}


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("send")
    generate_synthetic_send(str(d), {"Train": 4, "Valid": 2},
                            duration_s=30.0, seed=0)
    return str(d)


def test_load_send_discovers_and_aligns(fixture_dir):
    ds = load_send(["acoustic", "linguistic", "emotient", "image"],
                   fixture_dir, "Train")
    assert len(ds) == 4
    assert ds.modalities[-1] == "ratings"
    for m, d in [("linguistic", 300), ("emotient", 20), ("image", 1000),
                 ("acoustic", 88), ("ratings", 1)]:
        assert ds.data[m][0].shape[1] == d, m
        assert len(ds.data[m]) == 4
        assert len(ds.timers[m][0]) == len(ds.data[m][0])
    # ratings scaled to [0, 1] (reference divides EWE by 100)
    assert 0.0 <= ds.data["ratings"][0].min()
    assert ds.data["ratings"][0].max() <= 1.0
    # NaNs present in raw emotient (scrubbed later at windowing)
    assert any(np.isnan(a).any() for a in ds.data["emotient"])


def test_window_channel_semantics():
    """Oversample replication, empty windows, trailing-window drop."""
    # 1 Hz frames for 5.5 s -> times 0..5; window 2 s
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    times = np.arange(6, dtype=np.float64)
    wins = window_channel(feats, times, 2.0, oversample=1)
    # reference semantics: window 0 holds t in {0,1,2} (t <= 0+2),
    # window 1 holds t in {3,4} (t <= 2+2), t=5 never flushed (trailing drop)
    assert len(wins) == 2
    np.testing.assert_array_equal(wins[0], feats[:3])
    np.testing.assert_array_equal(wins[1], feats[3:5])
    # oversample: each window replicated
    wins2 = window_channel(feats, times, 2.0, oversample=3)
    assert len(wins2) == 6
    np.testing.assert_array_equal(wins2[0], wins2[2])
    # a large time gap produces empty windows
    times_gap = np.array([0.0, 0.5, 7.0, 7.5, 9.0])
    feats_gap = np.ones((5, 2), np.float32)
    wins3 = window_channel(feats_gap, times_gap, 2.0, oversample=1)
    sizes = [len(w) for w in wins3]
    assert sizes[0] == 2 and 0 in sizes  # first window full, gap windows empty


def test_window_channel_scrubs_nans():
    feats = np.array([[1.0, np.nan], [np.nan, 2.0], [3.0, 4.0], [5.0, 6.0]],
                     dtype=np.float32)
    times = np.array([0.0, 0.4, 0.8, 3.0])
    wins = window_channel(feats, times, 1.0, 1)
    assert not any(np.isnan(w).any() for w in wins)
    assert wins[0][0, 1] == 0.0  # NaN -> 0


def test_window_ratings_mean():
    r = np.array([0.2, 0.4, 0.6, 0.8, 1.0])
    t = np.array([0.0, 0.5, 1.0, 1.5, 2.5])
    out = window_ratings(r, t, 1.0)
    # window 0: t in {0, .5, 1.0} -> mean .4 ; window 1: {1.5} -> .8 ;
    # trailing t=2.5 dropped
    np.testing.assert_allclose(out, [0.4, 0.8])


def test_window_pipeline_shapes_and_alignment(fixture_dir):
    cfg = default_config("MFT", ("acoustic", "image", "linguistic"))
    ds = load_send(list(cfg.modalities), fixture_dir, "Train")
    padded, targets, seq_lens = window_pipeline(
        ds, cfg.window_size, cfg.modalities, cfg.mod_dimension)
    V = len(ds)
    W = max(seq_lens)
    for m in cfg.modalities:
        assert padded[m].shape[0] == V
        assert padded[m].shape[1] == W
        assert padded[m].shape[3] == cfg.mod_dimension[m]
        assert not np.isnan(padded[m]).any()
    assert targets.shape == (V, W)
    # every channel truncated to the common min -> same seq_lens everywhere
    assert all(l <= W for l in seq_lens)
    # oversampled linguistic (5s windows) aligns 1:1 with 1s rating steps
    assert padded["linguistic"].shape[1] == W


def test_make_batches_reference_semantics(fixture_dir):
    cfg = default_config("B2-Trans", ("acoustic", "linguistic"))
    ds = load_send(list(cfg.modalities), fixture_dir, "Train")
    padded, targets, seq_lens = window_pipeline(
        ds, cfg.window_size, cfg.modalities, cfg.mod_dimension)
    batches = list(make_batches(padded, targets, seq_lens, batch_size=3))
    assert len(batches) == 2  # 4 videos -> chunks of 3 + 1
    b = batches[0]
    assert isinstance(b, Batch)
    # sorted by length descending
    assert b.lengths == sorted(b.lengths, reverse=True)
    # time dim truncated to chunk max
    assert b.target.shape[1] == max(b.lengths)
    assert b.mask.shape == b.target.shape
    # mask marks exactly the valid prefix
    for i, ln in enumerate(b.lengths):
        assert b.mask[i, :ln].all() and not b.mask[i, ln:].any()
    # eval mode: bs=1, no shuffle, zero padding
    evals = list(make_batches(padded, targets, seq_lens, batch_size=1))
    assert len(evals) == 4
    assert all(e.target.shape[1] == e.lengths[0] for e in evals)


def test_bucketed_eval_batches_cover_all_videos(fixture_dir):
    cfg = default_config("B2-Trans", ("acoustic",))
    ds = load_send(list(cfg.modalities), fixture_dir, "Train")
    padded, targets, seq_lens = window_pipeline(
        ds, cfg.window_size, cfg.modalities, cfg.mod_dimension)
    seen = 0
    for b in bucketed_eval_batches(padded, targets, seq_lens, batch_size=2,
                                   time_multiple=8):
        assert b.target.shape[1] % 8 == 0
        assert b.target.shape[1] >= max(b.lengths)
        # trailing-mask invariant the fused Pallas encoder kernels rely on
        # (no query-row masking in-kernel): 1s prefix then 0s, no holes.
        for i, ln in enumerate(b.lengths):
            assert b.mask[i, :ln].all() and not b.mask[i, ln:].any()
        seen += len(b.lengths)
    assert seen == 4


def test_normalize_and_split(fixture_dir):
    ds = load_send(["acoustic"], fixture_dir, "Valid")
    norm = ds.normalize()
    for a in norm.data["acoustic"]:
        assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6
    halves = ds.split(2)
    assert len(halves) == 2 * len(ds)
