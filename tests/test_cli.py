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


def test_b1_multimodal_window_lift(workdir):
    """B1's reference config (1-s acoustic/image vs 5-s rating windows) makes
    oversample = int(1/5) = 0, which the reference silently turns into zero
    windows per video (B1-LSTM/train.py:375-396).  train.py lifts 1-s feature
    channels to the rating resolution so the PerfSave B1 multimodal combos
    (A/V/AL/AV/ALV) are actually trainable; --window_size overrides."""
    import logging

    from multimodal_transformer_tpu.engine import load_checkpoint
    from multimodal_transformer_tpu.models import default_config

    # the lift itself, unit level: acoustic 1s -> 5s, linguistic already 5s
    cfg = default_config("B1-LSTM", ("acoustic", "linguistic"))
    lifted = cli.apply_window_override(cfg, None, logging.getLogger("t"))
    assert lifted.window_size["acoustic"] == 5
    assert lifted.window_size["linguistic"] == 5
    assert lifted.window_size["ratings"] == 5

    # windowing shapes: 18-s videos / 5-s windows -> 3 windows per video
    data_dir = workdir / "SENDv1-data"
    generate_synthetic_send(str(data_dir), {"Train": 3, "Valid": 2,
                                            "Test": 2},
                            duration_s=18.0, seed=7,
                            modalities=("linguistic",),
                            linguistic_variant="bert")
    _, x, y, lens = cli.prepare_data(lifted, str(data_dir), "Train", "bert")
    assert y.shape == (3, 4)                      # [V, W]: 18 s / 5-s windows
    assert x["acoustic"].shape[:2] == (3, 4)      # [V, W, F, D]
    assert x["acoustic"].shape[3] == 88
    assert x["linguistic"].shape[3] == 1024

    # end to end: train a B1 AL combo and check the metadata carries the lift
    args = _args(workdir, ["--family", "B1-LSTM", "--comb", "AL",
                           "--epochs", "1", "--lr", "1e-3"])
    best = cli.main(args)
    assert np.isfinite(best)
    ck = load_checkpoint(str(workdir / "ModelSave" / "B1-LSTM" /
                             "B1-LSTM-AL.ckpt"))
    assert int(ck["window_size"]["acoustic"]) == 5

    # explicit --window_size spec beats the preset
    cfg2 = cli.apply_window_override(
        default_config("B1-LSTM", ("acoustic", "linguistic")),
        "acoustic=10,ratings=5", logging.getLogger("t"))
    assert cfg2.window_size["acoustic"] == 10


def test_parity_replay_harness(workdir):
    """parity_replay.py diff logic on the synthetic fixture: replaying the
    checkpoint that produced a PerfSave CSV matches it exactly; a corrupted
    reference row fails (VERDICT r1 #5 — the real-data gate is this script
    pointed at PerfSave/B1-LSTM.csv + B1-LSTM-L.pth)."""
    import parity_replay as pr

    ckpt = workdir / "ModelSave" / "B2-Trans" / "B2-Trans-VL.ckpt"
    perf_csv = workdir / "PerfSave" / "B2-Trans.csv"
    assert ckpt.exists() and perf_csv.exists()  # from the train/perf test

    ok, rows = pr.replay_and_diff(str(ckpt), str(perf_csv),
                                  str(workdir / "SENDv1-data"),
                                  ["Valid", "Test"], tolerance=1e-6)
    assert ok
    compared = [r for r in rows if r[4] is not None]
    assert len(compared) == 4  # 2 Valid + 2 Test fixture videos
    assert max(r[4] for r in compared) <= 1e-6

    # corrupt one Valid row -> the gate must fail
    df = pd.read_csv(perf_csv)
    bad = df[df["Set"] == "Valid"].index[0]
    df.loc[bad, "CCC"] = float(df.loc[bad, "CCC"]) + 0.5
    corrupted = workdir / "PerfSave" / "B2-Trans-corrupted.csv"
    df.to_csv(corrupted, index=False)
    ok2, _ = pr.replay_and_diff(str(ckpt), str(corrupted),
                                str(workdir / "SENDv1-data"),
                                ["Valid"], tolerance=1e-6)
    assert not ok2

    # a split with ZERO matching reference rows must fail, not pass
    # vacuously ("0 videos compared" is not a verified checkpoint)
    df_no_valid = pd.read_csv(perf_csv)
    df_no_valid = df_no_valid[df_no_valid["Set"] != "Valid"]
    novalid = workdir / "PerfSave" / "B2-Trans-novalid.csv"
    df_no_valid.to_csv(novalid, index=False)
    ok3, _ = pr.replay_and_diff(str(ckpt), str(novalid),
                                str(workdir / "SENDv1-data"),
                                ["Valid"], tolerance=1e-6)
    assert not ok3


def test_resume_with_orbax_backend(workdir):
    """CLI roundtrip: --ckpt_backend orbax writes an atomic-commit state
    directory and --resume auto-detects + restores it."""
    save_dir = workdir / "ModelSaveO"
    base = ["--family", "B2-Trans", "--lr", "1e-3", "--save_freq", "1",
            "--ckpt_backend", "orbax", "--save_dir", str(save_dir)]
    cli.main(_args(workdir, base + ["--epochs", "1"]))
    state = save_dir / "B2-Trans" / "B2-Trans-VL.ckpt.state"
    assert state.is_dir()  # orbax commit is a directory
    cli.main(_args(workdir, base + ["--epochs", "2", "--resume"]))
    log_text = (workdir / "train_cnn.log").read_text()
    assert "Resumed from" in log_text and "at epoch 2" in log_text


def test_preemption_sigterm_saves_state_and_resumes(workdir, monkeypatch):
    """SIGTERM during training (the TPU-VM preemption notice) must save the
    full train state at the epoch boundary, exit 143, and --resume must
    continue from there (SURVEY §5 failure-recovery)."""
    import signal as _signal
    from multimodal_transformer_tpu.engine.train_engine import Engine

    orig_epoch = Engine.train_epoch
    fired = []

    def epoch_then_sigterm(self, *a, **kw):
        out = orig_epoch(self, *a, **kw)
        if not fired:
            fired.append(1)
            _signal.raise_signal(_signal.SIGTERM)  # delivered synchronously
        return out

    monkeypatch.setattr(Engine, "train_epoch", epoch_then_sigterm)
    save_dir = workdir / "ModelSaveP"
    base = ["--family", "B2-Trans", "--epochs", "4", "--lr", "1e-3",
            "--save_dir", str(save_dir)]
    try:
        with pytest.raises(SystemExit) as ei:
            cli.main(_args(workdir, base))
        assert ei.value.code == 143
        state = save_dir / "B2-Trans" / "B2-Trans-VL.ckpt.state"
        assert state.exists()
        log_text = (workdir / "train_cnn.log").read_text()
        assert "Preempted: state saved" in log_text

        monkeypatch.setattr(Engine, "train_epoch", orig_epoch)
        best = cli.main(_args(workdir, base + ["--resume"]))
        assert np.isfinite(best)
        log_text = (workdir / "train_cnn.log").read_text()
        assert "Resumed from" in log_text and "at epoch 2" in log_text
    finally:
        _signal.signal(_signal.SIGTERM, _signal.SIG_DFL)


def test_mixed_precision_and_fast_rng_flags(workdir):
    """--mixed_precision + --fast_rng train end to end (CPU smoke)."""
    import jax
    args = _args(workdir, ["--family", "B2-Trans", "--epochs", "1",
                           "--lr", "1e-3", "--mixed_precision",
                           "--fast_rng",
                           "--save_dir", str(workdir / "ModelSaveM")])
    try:
        best = cli.main(args)
    finally:
        # --fast_rng flips a process-global config; restore for the rest
        # of the suite (seeded dropout streams elsewhere assume threefry)
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert np.isfinite(best)


def test_compile_cache_knob(tmp_path):
    """Persistent XLA compile cache (VERDICT r2 #3): MMTX_COMPILE_CACHE
    points the cache at a directory (entries appear after one jit) and
    =0 disables it.  Subprocesses so the global jax config of the test
    process stays untouched."""
    import subprocess
    prog = ("import jax; jax.config.update('jax_platforms','cpu')\n"
            "from multimodal_transformer_tpu.utils.compile_cache import "
            "enable_compile_cache\n"
            "d = enable_compile_cache()\n"
            "import jax.numpy as jnp, numpy as np\n"
            "jax.jit(lambda x: jnp.tanh(x) @ x)(np.ones((8, 8), "
            "np.float32))\n"
            "print('DIR=' + repr(d))\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    cache = tmp_path / "xla-cache"
    env["MMTX_COMPILE_CACHE"] = str(cache)
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    assert f"DIR={str(cache)!r}" in out.stdout
    assert list(cache.iterdir()), "cache dir should hold compiled entries"

    env["MMTX_COMPILE_CACHE"] = "0"
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    assert "DIR=None" in out.stdout
