#!/usr/bin/env python
"""Real-data parity gate: replay a reference checkpoint and diff per-video
CCC against its published PerfSave table.

The strongest available end-to-end fidelity check (VERDICT round 1 #5): the
reference ships per-video CCC tables (PerfSave/*.csv, written by
Performance-Eval/train.py:561-572) and one surviving torch checkpoint
(ModelSave/B1-LSTM/B1-LSTM-L.pth).  Given the real SENDv1 tree, this script
converts the checkpoint (engine/convert.py), runs the --perf evaluation
protocol (per-video bs=1 CCC, Performance-Eval/train.py:546-560) on
Train/Valid/Test, and diffs each video's CCC against the matching
(Model, Combination, Set) rows.

Usage (the moment real data is available):

  python parity_replay.py \
      --pth  /path/to/ModelSave/B1-LSTM/B1-LSTM-L.pth \
      --perf_csv /path/to/PerfSave/B1-LSTM.csv \
      --data_dir /path/to/SENDv1-data

Expected tolerances (--tolerance, max abs per-video CCC delta):
  * CPU/fp32 (force with JAX_PLATFORMS... see tests/conftest.py): the
    converter is exact to ~1e-6 elementwise vs torch (tests/test_convert.py)
    and the eval protocol is identical, so deltas should sit at float
    accumulation noise: default 5e-3 is generous headroom.
  * TPU: fp32 matmuls take bf16 MXU passes (~1e-3 elementwise); per-video
    CCC deltas up to ~1e-2 are plausible — pass --tolerance 2e-2.
  * The reference itself was trained/evaluated on CUDA; its published CCCs
    embed that hardware's numerics.  A systematic (not per-video-noise)
    mismatch indicates a semantics bug, not precision.

Exit code 0 = every video within tolerance on every requested split.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multimodal_transformer_tpu.engine import Engine, get_logger, seq_id_strings
from train import load_any_checkpoint, parse_ckpt_name, prepare_data


def replay_and_diff(ckpt_path, perf_csv, data_dir, splits, tolerance,
                    fast_eval=False, mask_mode="query", logger=None):
    """Returns (ok, report_rows).  report_rows: (split, vid, ours, ref,
    delta) per compared video."""
    logger = logger or get_logger(os.devnull)
    family, comb, acoustic_dim, model_str = parse_ckpt_name(
        os.path.basename(ckpt_path))
    mod_str = "".join(sorted(comb))
    if fast_eval:
        mask_mode = "key_query"
    cfg, params = load_any_checkpoint(ckpt_path, family, acoustic_dim,
                                      mask_mode)
    ref = pd.read_csv(perf_csv)
    ref = ref[(ref["Model"] == model_str)
              & (ref["Combination"] == mod_str)]
    if ref.empty:
        raise SystemExit(
            f"error: {perf_csv} has no rows for Model={model_str!r} "
            f"Combination={mod_str!r}")

    lvar = ("bert" if family == "B1-LSTM" and cfg.variant != "legacy"
            else "glove")
    rows, ok = [], True
    for split in splits:
        ds, x, y, lens = prepare_data(cfg, data_dir, split, lvar)
        eng = Engine(cfg, logger=logger)
        eng.params = params
        if fast_eval:
            cccs, _, _ = eng.evaluate_batched(x, y, lens)
        else:
            cccs, _, _, _, _, _ = eng.evaluate_per_video(x, y, lens)
        ours = dict(zip(seq_id_strings(ds.seq_ids), cccs))
        ref_split = ref[ref["Set"] == split]
        matched = 0
        for _, r in ref_split.iterrows():
            vid = str(r["VidID"])
            if vid not in ours:
                rows.append((split, vid, None, float(r["CCC"]), None))
                ok = False
                continue
            matched += 1
            delta = abs(ours[vid] - float(r["CCC"]))
            rows.append((split, vid, ours[vid], float(r["CCC"]), delta))
            if delta > tolerance:
                ok = False
        if matched == 0:
            # an empty ref_split (missing/mis-cased Set value) must fail
            # too — a gate that compared zero videos has verified nothing
            ok = False
    return ok, rows


def main():
    from multimodal_transformer_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--pth", "--ckpt", dest="ckpt", required=True,
                    help="reference .pth (converted on the fly) or "
                         "framework .ckpt checkpoint")
    ap.add_argument("--perf_csv", required=True,
                    help="reference PerfSave CSV to diff against")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--splits", nargs="+",
                    default=["Train", "Valid", "Test"])
    ap.add_argument("--tolerance", type=float, default=5e-3,
                    help="max abs per-video CCC delta (see module "
                         "docstring for CPU vs TPU guidance)")
    ap.add_argument("--fast_eval", action="store_true",
                    help="bucketed batched eval (key_query mask; faster on "
                         "TPU, small additional delta vs the reference's "
                         "bs=1 protocol)")
    ap.add_argument("--mask_mode", default="query",
                    choices=["query", "key_query"])
    args = ap.parse_args()

    ok, rows = replay_and_diff(args.ckpt, args.perf_csv, args.data_dir,
                               args.splits, args.tolerance,
                               fast_eval=args.fast_eval,
                               mask_mode=args.mask_mode)
    print(f"{'Set':6s} {'VidID':8s} {'ours':>10s} {'ref':>10s} {'delta':>10s}")
    worst = 0.0
    for split, vid, mine, refv, delta in rows:
        if mine is None:
            print(f"{split:6s} {vid:8s} {'MISSING':>10s} {refv:10.6f}")
            continue
        worst = max(worst, delta)
        flag = "  <-- OVER TOL" if delta > args.tolerance else ""
        print(f"{split:6s} {vid:8s} {mine:10.6f} {refv:10.6f} "
              f"{delta:10.6f}{flag}")
    n = sum(1 for r in rows if r[4] is not None)
    print(f"\n{n} videos compared, worst |delta| = {worst:.6f}, "
          f"tolerance = {args.tolerance}")
    print("PARITY PASS" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
