"""Native (C++) data-plane tests: build the library, compare the fast paths
against the pandas / pure-Python reference semantics exactly."""

import numpy as np
import pytest

from multimodal_transformer_tpu.data import (generate_synthetic_send,
                                             load_send)
from multimodal_transformer_tpu.data import native_loader
from multimodal_transformer_tpu.data.windowing import window_channel

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("send_native")
    generate_synthetic_send(str(d), {"Train": 3}, duration_s=20.0, seed=11)
    return str(d)


def test_native_parse_matches_pandas(fixture_dir):
    mods = ["acoustic", "linguistic", "emotient", "image"]
    ds_native = load_send(mods, fixture_dir, "Train", use_native=True)
    ds_pandas = load_send(mods, fixture_dir, "Train", use_native=False)
    assert ds_native.seq_ids == ds_pandas.seq_ids
    for m in ds_native.modalities:
        for a, b in zip(ds_native.data[m], ds_pandas.data[m]):
            assert a.shape == b.shape, m
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       equal_nan=True, err_msg=m)
        for ta, tb in zip(ds_native.timers[m], ds_pandas.timers[m]):
            np.testing.assert_allclose(ta, tb, rtol=1e-6, err_msg=m)


def test_native_window_assign_matches_python():
    rs = np.random.RandomState(0)
    times = np.cumsum(rs.rand(200) * 0.7)
    feats = rs.randn(200, 3).astype(np.float32)
    native = window_channel(feats, times, 2.0, oversample=2)

    # pure-python reference loop
    wins, cur, start, i = [], 0.0, 0, 0
    while i < len(times):
        if times[i] <= cur + 2.0:
            i += 1
        else:
            w = feats[start:i]
            wins.extend([w, w])
            start = i
            cur += 2.0
    assert len(native) == len(wins)
    for a, b in zip(native, wins):
        np.testing.assert_array_equal(a, b)


def test_native_nan_cells():
    """Non-numeric cells must come back as NaN (then scrubbed by windowing)."""
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write("a,b\n1.5,nan\n2.5,x\n,3.5\n")
        arr, header = native_loader.parse_table(p, "csv")
        assert header == ["a", "b"]
        assert arr.shape == (3, 2)
        assert arr[0, 0] == 1.5
        assert np.isnan(arr[0, 1])
        assert np.isnan(arr[1, 1])


def test_native_crlf_trailing_empty_cell_is_nan(tmp_path):
    """Regression: strtof skips whitespace incl. \\r\\n, so an UNBOUNDED
    parse of a trailing empty cell stole the next line's first number (and
    parsed it twice).  The cell must be NaN and the next row intact."""
    p = tmp_path / "t.csv"
    p.write_bytes(b"a,b,c\r\n1,2,\r\n3,4,5\r\n")
    arr, header = native_loader.parse_table(str(p), "csv")
    assert header == ["a", "b", "c"]
    assert arr.shape == (2, 3)
    assert np.isnan(arr[0, 2])
    assert arr[1].tolist() == [3.0, 4.0, 5.0]


def test_native_row_wider_than_header_falls_back(tmp_path):
    """Rows wider than the header are malformed; the native path must refuse
    (returning None -> pandas fallback, which fails loudly) instead of
    silently dropping the overflow cells."""
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2,9\n")
    assert native_loader.parse_table(str(p), "csv") is None
    q = tmp_path / "t.ssv"
    q.write_text("a b\n1 2 9\n")
    assert native_loader.parse_table(str(q), "ssv") is None
