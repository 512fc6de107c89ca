"""Aux-subsystem tests: NaN guards, step timer, plots, artifact writers,
resume-from-step."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_transformer_tpu.engine.guards import (NanGuard,
                                                      NonFiniteError,
                                                      assert_finite_tree)
from multimodal_transformer_tpu.engine.profiling import StepTimer
from multimodal_transformer_tpu.engine.csv_io import (save_params,
                                                      save_predictions)
from multimodal_transformer_tpu.engine.plots import plot_eval, plot_predictions
from multimodal_transformer_tpu.engine import Engine
from multimodal_transformer_tpu.models import default_config

SMALL_DIMS = {"linguistic": 10, "acoustic": 8, "image": 10, "emotient": 6}


def test_nan_guard_raises_on_bad_loss():
    g = NanGuard()
    g.check(1.0)
    with pytest.raises(NonFiniteError):
        g.check(float("nan"))


def test_assert_finite_tree_reports_path():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.inf])}}
    with pytest.raises(NonFiniteError) as e:
        assert_finite_tree(tree, "params")
    assert "b" in str(e.value) and "c" in str(e.value)


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 3 and s["mean_ms"] >= 0


def test_plots_write_files(tmp_path):
    rs = np.random.RandomState(0)
    actuals = [rs.rand(30).tolist() for _ in range(10)]
    preds = [rs.rand(30).tolist() for _ in range(10)]
    metric = rs.rand(10).tolist()
    p1 = tmp_path / "fits.png"
    plot_predictions(actuals, preds, metric, str(p1))
    assert p1.exists() and p1.stat().st_size > 0
    p2 = tmp_path / "eval.png"
    plot_eval(preds, metric, actuals, [f"v{i}" for i in range(10)], str(p2))
    assert p2.exists() and p2.stat().st_size > 0


def test_save_predictions_and_params(tmp_path):
    seq_ids = [("101", "2"), ("103", "5")]
    preds = [[0.1, 0.2], [0.3]]
    save_predictions(seq_ids, preds, str(tmp_path))
    f = tmp_path / "target_101_2_normal.csv"
    assert f.read_text().splitlines() == ["rating", "0.1", "0.2"]
    ph = tmp_path / "param_hist.tsv"
    save_params(str(ph), model_name="MFT",
                args_dict={"modalities": ["a"], "batch_size": 25, "split": 1,
                           "epochs": 2, "lr": 1e-4, "sup_ratio": 0.5,
                           "base_rate": 2.0},
                train_stats={"ccc": 0.5, "ccc_std": 0.1},
                test_stats={"ccc": 0.4, "ccc_std": 0.2})
    save_params(str(ph), model_name="SFT", args_dict={},
                train_stats={}, test_stats={})
    lines = ph.read_text().splitlines()
    assert len(lines) == 3  # header + 2 rows
    # a changed column set across runs must be rejected, not silently
    # misaligned under the old header
    with pytest.raises(ValueError, match="does not match"):
        save_params(str(ph), model_name="MFT", args_dict={},
                    train_stats={}, test_stats={}, extra={"seed": 1})


def test_engine_resume_roundtrip(tmp_path):
    cfg = default_config("B2-Trans", ("acoustic",))
    object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
    eng = Engine(cfg, seed=1)
    rs = np.random.RandomState(0)
    x = {"acoustic": rs.randn(4, 6, 3, SMALL_DIMS["acoustic"])
         .astype(np.float32)}
    y = rs.rand(4, 6).astype(np.float32)
    lens = [6, 6, 5, 4]
    eng.train_epoch(x, y, lens, batch_size=2, rng=np.random.RandomState(1))
    path = str(tmp_path / "b2.state")
    eng.save_state(path, best_ccc=0.25)
    eng2 = Engine(cfg, seed=42)
    best = eng2.restore_state(path)
    assert best == pytest.approx(0.25)
    assert eng2._epoch == 1
    import jax
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(eng.params),
                                jax.tree_util.tree_leaves_with_path(eng2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))
    # resumed engine can keep training
    eng2.train_epoch(x, y, lens, batch_size=2, rng=np.random.RandomState(2))
    assert eng2._epoch == 2


def test_device_prefetcher_yields_all_and_propagates_errors():
    import jax.numpy as jnp
    from multimodal_transformer_tpu.data.prefetch import DevicePrefetcher
    from multimodal_transformer_tpu.data.batching import Batch

    def mk(i):
        t = np.full((1, 2, 1), float(i), np.float32)
        return Batch({"a": t}, t, np.ones_like(t), [2], [i])

    batches = [mk(i) for i in range(5)]
    put = lambda b: jnp.asarray(b.target)
    seen = [(b.indices[0], float(np.asarray(d)[0, 0, 0]))
            for b, d in DevicePrefetcher(iter(batches), put, depth=2)]
    assert seen == [(i, float(i)) for i in range(5)]

    def boom():
        yield mk(0)
        raise RuntimeError("worker died")

    it = iter(DevicePrefetcher(boom(), put, depth=1))
    next(it)
    with pytest.raises(RuntimeError, match="worker died"):
        for _ in it:
            pass


def test_profiler_trace_writes_output(tmp_path):
    import jax.numpy as jnp
    from multimodal_transformer_tpu.engine.profiling import trace
    with trace(str(tmp_path)):
        _ = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .pb) under the dir
    found = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in found), found


def test_orbax_train_state_roundtrip(tmp_path):
    import shutil
    from multimodal_transformer_tpu.engine.checkpoint import (
        load_train_state_orbax, save_train_state_orbax)
    params = {"w": np.full((2, 3), 1.5, np.float32)}
    opt = {"step": np.int32(9), "m": {"w": np.zeros((2, 3), np.float32)},
           "v": {"w": np.ones((2, 3), np.float32)}}
    path = str(tmp_path / "orbax_state")
    save_train_state_orbax(path, params=params, opt_state=opt, epoch=3,
                           scheduler_state={"lr": 5e-5, "best": 0.1,
                                            "num_bad": 7},
                           best_ccc=0.42, modalities=["acoustic"],
                           mod_dimension={"acoustic": 88},
                           window_size={"acoustic": 1, "ratings": 1})
    st = load_train_state_orbax(path)
    assert st["epoch"] == 3 and st["best_ccc"] == pytest.approx(0.42)
    assert st["scheduler"]["num_bad"] == 7
    np.testing.assert_array_equal(st["model"]["w"], params["w"])
    np.testing.assert_array_equal(st["opt_state"]["v"]["w"],
                                  opt["v"]["w"])


def test_engine_resume_backend_equivalence(tmp_path):
    """save_state(msgpack) and save_state(orbax) must restore to identical
    engine state (params, Adam moments, scheduler, epoch, best CCC) —
    the --ckpt_backend wiring contract (VERDICT r1 #7)."""
    import jax

    cfg = default_config("B2-Trans", ("acoustic",))
    object.__setattr__(cfg, "mod_dimension", dict(SMALL_DIMS))
    eng = Engine(cfg, seed=1)
    rs = np.random.RandomState(0)
    x = {"acoustic": rs.randn(4, 6, 3, SMALL_DIMS["acoustic"])
         .astype(np.float32)}
    y = rs.rand(4, 6).astype(np.float32)
    lens = [6, 6, 5, 4]
    eng.train_epoch(x, y, lens, batch_size=2, rng=np.random.RandomState(1))
    eng.scheduler_step(0.5)

    mpath = str(tmp_path / "s.state")
    opath = str(tmp_path / "s_orbax.state")
    eng.save_state(mpath, best_ccc=0.33, backend="msgpack")
    eng.save_state(opath, best_ccc=0.33, backend="orbax")

    a, b = Engine(cfg, seed=7), Engine(cfg, seed=8)
    assert a.restore_state(mpath) == pytest.approx(0.33)
    assert b.restore_state(opath) == pytest.approx(0.33)  # dir auto-detect
    assert a._epoch == b._epoch == 1
    assert a.scheduler.lr == b.scheduler.lr
    assert a.scheduler.best == b.scheduler.best
    assert a.scheduler.num_bad == b.scheduler.num_bad
    for tree_a, tree_b in ((a.params, b.params),
                           (a.opt_state, b.opt_state)):
        for (ka, la), (kb, lb) in zip(
                jax.tree_util.tree_leaves_with_path(tree_a),
                jax.tree_util.tree_leaves_with_path(tree_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=str(ka))


def test_ablation_knobs_warn_loudly_once():
    """Every measurement-only ablation knob must announce itself on stderr
    exactly once per process (VERDICT r4 #5: a stray env var silently
    corrupting numerics is the failure mode), and a clean environment must
    never emit the warning."""
    import subprocess
    import sys

    prog = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import jax.numpy as jnp\n"
        "from multimodal_transformer_tpu.ops.basic import dropout\n"
        "from multimodal_transformer_tpu.ops.pallas.encoder import _ln\n"
        "x = jnp.ones((4, 8)); k = jax.random.PRNGKey(0)\n"
        "dropout(x, k, 0.5); dropout(x, k, 0.5)\n"   # once per knob, not call
        "_ln(x, jnp.ones(8), jnp.zeros(8)); _ln(x, jnp.ones(8), "
        "jnp.zeros(8))\n"
        "print('RAN')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("MMTX_ABLATE_DROPOUT", None)
    env.pop("MMTX_ABLATE_ENC_LN", None)

    clean = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, check=True)
    assert "RAN" in clean.stdout
    assert "measurement-only ablation" not in clean.stderr, clean.stderr

    env["MMTX_ABLATE_DROPOUT"] = "1"
    env["MMTX_ABLATE_ENC_LN"] = "1"
    hot = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    assert "RAN" in hot.stdout
    assert hot.stderr.count("MMTX_ABLATE_DROPOUT is active") == 1, hot.stderr
    assert hot.stderr.count("MMTX_ABLATE_ENC_LN is active") == 1, hot.stderr
