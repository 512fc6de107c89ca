"""End-to-end walkthrough: data -> train -> checkpoint -> eval -> artifacts
-> serving, on a synthetic mini-SENDv1 tree.

    python examples/walkthrough.py [--workdir DIR] [--epochs N] [--cpu]

Exercises the same surfaces a real user touches, in order:
  1. generate a hermetic SENDv1-schema dataset (data/synthetic.py)
  2. train B3-MFN (acoustic+linguistic) with the reference protocol
     (Adam 1e-4 + plateau LR, per-video CCC eval, checkpoint-on-best)
  3. reload the checkpoint by metadata and evaluate on Test
  4. write PerfSave/PredSave-style artifacts + prediction plots
  5. serve: bucketed bf16 inference via ValencePredictor
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="./walkthrough_out")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast for small epochs)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multimodal_transformer_tpu.data import (generate_synthetic_send,
                                                 load_send, window_pipeline)
    from multimodal_transformer_tpu.engine import (Engine, append_perf_save,
                                                   get_logger,
                                                   load_checkpoint,
                                                   save_checkpoint,
                                                   seq_id_strings,
                                                   write_pred_save)
    from multimodal_transformer_tpu.engine.plots import plot_predictions
    from multimodal_transformer_tpu.models import default_config
    from multimodal_transformer_tpu.serve import ValencePredictor

    wd = os.path.abspath(args.workdir)
    data_dir = os.path.join(wd, "SENDv1-data")
    os.makedirs(wd, exist_ok=True)
    logger = get_logger(os.path.join(wd, "train_cnn.log"))

    # 1. data
    if not os.path.isdir(os.path.join(data_dir, "features")):
        print("[1/5] generating synthetic mini-SENDv1 ...")
        generate_synthetic_send(data_dir, {"Train": 6, "Valid": 3, "Test": 3},
                                duration_s=40.0)
    cfg = default_config("B3-MFN", ("acoustic", "linguistic"))

    def prep(subset):
        ds = load_send(list(cfg.modalities), data_dir, subset)
        return ds, *window_pipeline(ds, cfg.window_size, cfg.modalities,
                                    cfg.mod_dimension)

    _, tr_x, tr_y, tr_l = prep("Train")
    _, va_x, va_y, va_l = prep("Valid")

    # 2. train
    print(f"[2/5] training B3-MFN for {args.epochs} epochs ...")
    eng = Engine(cfg, lr=1e-3, seed=1, logger=logger)
    rng = np.random.RandomState(1)
    ckpt = os.path.join(wd, "ModelSave", "B3-MFN", "B3-MFN-AL.ckpt")
    best = -1.0
    for epoch in range(1, args.epochs + 1):
        eng.train_epoch(tr_x, tr_y, tr_l, batch_size=3, rng=rng)
        _, _, _, loss, stats, _ = eng.evaluate_per_video(va_x, va_y, va_l)
        eng.scheduler_step(loss)
        if stats["ccc"] > best:
            best = stats["ccc"]
            save_checkpoint(cfg.modalities, cfg.mod_dimension,
                            cfg.window_size, eng.params, ckpt)
    print(f"    best valid CCC {best:+.4f}; checkpoint: {ckpt}")

    # 3. reload + Test eval (config restored from checkpoint metadata)
    print("[3/5] reloading checkpoint, evaluating on Test ...")
    ck = load_checkpoint(ckpt)
    eng.params = ck["model"]
    test_ds, te_x, te_y, te_l = prep("Test")
    cccs, preds, actuals, _, stats, _ = eng.evaluate_per_video(te_x, te_y,
                                                              te_l)
    print(f"    Test CCC {stats['ccc']:+.4f} (±{stats['ccc_std']:.4f})")

    # 4. artifacts
    print("[4/5] writing PerfSave/PredSave artifacts + plots ...")
    seq_ids = seq_id_strings(test_ds.seq_ids)
    append_perf_save(os.path.join(wd, "PerfSave", "B3-MFN.csv"),
                     "B3-MFN", "AL", seq_ids, cccs, "Test")
    write_pred_save(os.path.join(wd, "PredSave", f"B3-MFN{seq_ids[0]}.csv"),
                    preds[0], actuals[0])
    plot_predictions(actuals, preds, cccs,
                     os.path.join(wd, "PredSave", "fits.png"))

    # 5. serving
    print("[5/5] serving: bucketed bf16 inference ...")
    predictor = ValencePredictor.from_checkpoint(ckpt, "B3-MFN",
                                                 batch_size=4,
                                                 time_multiple=16)
    traces = predictor.predict_dataset(test_ds)
    sid = seq_ids[0]
    print(f"    {len(traces)} videos served; '{sid}' trace head:",
          np.round(traces[sid][:5], 3))
    print("done; artifacts under", wd)


if __name__ == "__main__":
    main()
