"""End-to-end CLI tests: train -> checkpoint -> --eval (PredSave) -> --perf
(PerfSave) on a synthetic full-schema fixture."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as cli
from multimodal_transformer_tpu.data import generate_synthetic_send


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    data_dir = d / "SENDv1-data"
    generate_synthetic_send(str(data_dir),
                            {"Train": 3, "Valid": 2, "Test": 2},
                            duration_s=18.0, seed=7)
    return d


def _args(workdir, extra):
    base = ["--data_dir", str(workdir / "SENDv1-data"),
            "--save_dir", str(workdir / "ModelSave"),
            "--pred_save_dir", str(workdir / "PredSave"),
            "--perf_save_dir", str(workdir / "PerfSave"),
            "--log_file", str(workdir / "train_cnn.log")]
    return cli.build_arg_parser().parse_args(base + extra)


def test_train_eval_perf_cycle(workdir):
    # 1) train B2-Trans (VL) for 2 epochs
    args = _args(workdir, ["--family", "B2-Trans", "--epochs", "2",
                           "--lr", "1e-3"])
    best = cli.main(args)
    ckpt = workdir / "ModelSave" / "B2-Trans" / "B2-Trans-VL.ckpt"
    assert ckpt.exists()
    assert np.isfinite(best)
    log_text = (workdir / "train_cnn.log").read_text()
    assert "CCC_STATS\tSINGLE_BEST:" in log_text
    assert "Evaluation\tLoss:" in log_text

    # 2) --eval reloads config from checkpoint metadata and evaluates
    args = _args(workdir, ["--family", "B2-Trans", "--eval",
                           "--load", str(ckpt)])
    stats = cli.main(args)
    assert np.isfinite(stats["ccc"])

    # 3) --perf sweeps the checkpoint dir and writes the PerfSave CSV
    args = _args(workdir, ["--perf",
                           "--model_save",
                           str(workdir / "ModelSave" / "B2-Trans")])
    cli.main(args)
    perf = pd.read_csv(workdir / "PerfSave" / "B2-Trans.csv")
    assert list(perf.columns) == ["Model", "Combination", "VidID", "Set",
                                  "CCC"]
    assert set(perf["Set"]) == {"Train", "Valid", "Test"}
    assert (perf["Model"] == "B2-Trans").all()
    assert (perf["Combination"] == "LV").all()
    # 3 train + 2 valid + 2 test videos
    assert len(perf) == 7


def test_fast_eval_and_resident_train_flags(workdir):
    """New-flag coverage: --resident_train trains (key_query) and --fast_eval
    evaluates the checkpoint via the bucketed path."""
    args = _args(workdir, ["--family", "B2-Trans", "--epochs", "2",
                           "--lr", "1e-3", "--resident_train",
                           "--mask_mode", "key_query",
                           "--save_dir", str(workdir / "ModelSaveR")])
    best = cli.main(args)
    assert np.isfinite(best)
    ckpt = workdir / "ModelSaveR" / "B2-Trans" / "B2-Trans-VL.ckpt"
    assert ckpt.exists()
    args = _args(workdir, ["--family", "B2-Trans", "--test", "--fast_eval",
                           "--load", str(ckpt)])
    stats = cli.main(args)
    assert np.isfinite(stats["ccc"])


def test_eval_writes_pred_save_for_golden_video(workdir, monkeypatch):
    """--eval dumps the (time,pred,actual) PredSave CSV for the configured
    golden video when present (reference SFT/train.py:600-615 schema)."""
    ckpt = workdir / "ModelSave" / "B2-Trans" / "B2-Trans-VL.ckpt"
    assert ckpt.exists()  # from the train test
    # fixture videos are IDs 100+; point the golden-vid map at one of them
    monkeypatch.setitem(cli.PRED_SAVE_VIDEO, "Valid", "100_1")
    args = _args(workdir, ["--family", "B2-Trans", "--eval",
                           "--load", str(ckpt)])
    cli.main(args)
    csv_path = workdir / "PredSave" / "B2-Trans100_1.csv"
    assert csv_path.exists()
    df = pd.read_csv(csv_path)
    assert list(df.columns) == ["time", "pred", "actual"]
    assert (df["time"] == np.arange(len(df))).all()
    assert len(df) > 3
