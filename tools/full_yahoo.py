"""Full Yahoo S5 benchmark study: every signal in the checkout, on one chip.

The reference's workflow for the Yahoo S5 webscope benchmark (README.md:87-89
+ configs/univariate.yaml) is one ``python main.py`` process per signal —
367 processes (A1: 67 real_*, A2: 100 synthetic_*, A3/A4: 100 TS* each) of
40 epochs each; at the measured PyTorch-CPU epoch wall-clocks (BASELINE.md,
~2.25 s at A1 size / ~2.5 s at the longer A3/A4 sizes) that is ~9-10 CPU
HOURS of epoch compute alone, before scoring.

This driver runs the SAME workload as four ``cli.cmd_sweep`` calls — one
vmapped fleet training program + one (HBM-chunked) fleet detection program
per class (hypad_tpu/train/fleet.py, detect/scorer.detect_scores_fleet) —
and writes per-signal F1s to ``yahoo_full.csv`` plus a per-class aggregate
table. Results land in each signal's own run dir exactly as per-signal
``train`` runs would put them (checkpoints incl. ``state_final``, config
snapshot, results CSV row), so any signal can be re-entered afterwards with
``hypad detect``/``sweep --detect-only``.

Usage (keep the chip free — ONE process may own it):
    cd /tmp/yahoo_full && PYTHONPATH=/root/repo python /root/repo/tools/full_yahoo.py \
        [--classes A1,A2,A3,A4] [--out .] [--epochs 40]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

import numpy as np
import pandas as pd  # fail fast: needed for the aggregate CSV at the end

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    "A1": "configs/yahoo_a1_hyper.yaml",
    "A2": "configs/yahoo_a2_hyper.yaml",
    "A3": "configs/yahoo_a3_hyper.yaml",
    "A4": "configs/yahoo_a4_hyper.yaml",
}


def class_signals(cls, data_root):
    """Every signal CSV of a Yahoo class, numerically ordered (real_1..67,
    synthetic_1..100, A{3,4}Benchmark-TS1..100); *_known_anomalies.csv are
    ground-truth side files, not signals."""
    d = os.path.join(data_root, "YAHOO", f"{cls}Benchmark")
    names = [f[:-4] for f in os.listdir(d)
             if f.endswith(".csv") and "known_anomalies" not in f]

    def order(name):
        m = re.search(r"(\d+)$", name)
        return int(m.group(1)) if m else 0

    return sorted(names, key=order)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--classes", default="A1,A2,A3,A4")
    ap.add_argument("--out", default=".")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override config epochs (default: config's 40)")
    ap.add_argument("--detect-only", action="store_true",
                    help="re-score the classes from their saved checkpoints "
                         "(a prior run of this tool) without retraining")
    ap.add_argument("--rec-errors", default=None,
                    help="comma-separated rec_error list (euclidean grid "
                         "detection: every rec_error x combination cell)")
    ap.add_argument("--combinations", default=None,
                    help="comma-separated combination list ('all' = every "
                         "mode valid for the class): grid detection over "
                         "the whole class in one vmapped program")
    args = ap.parse_args()

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    from hypad_tpu.cli import cmd_sweep
    from hypad_tpu.utils.config import load_config

    rows = []
    walls = {}
    t_all = time.time()
    for cls in args.classes.split(","):
        config_path = os.path.join(repo, CONFIGS[cls])
        params = load_config(config_path)
        params.output_root = os.path.abspath(
            os.path.join(args.out, f"runs_{cls}"))
        if args.epochs is not None:
            params.epochs = args.epochs
        signals = class_signals(cls, params.data_root)
        from hypad_tpu.cli import expand_combinations

        combos = expand_combinations(
            params,
            args.combinations.split(",") if args.combinations else None)
        print(f"=== {cls}: {len(signals)} signals x {params.epochs} epochs "
              f"(one fleet program) ===", flush=True)
        t0 = time.time()
        recs = args.rec_errors.split(",") if args.rec_errors else None
        results = cmd_sweep(params, config_path, signals=signals,
                            detect_only=args.detect_only,
                            rec_errors=recs, combinations=combos)
        walls[cls] = time.time() - t0
        if combos or recs:
            # grid mode returns (signal, {(rec_error, comb): result}) —
            # flatten to one row per cell; the family table also lands in
            # each class's sweep_grid.csv
            for sig, _sd, res in results:
                for (re_, cb), r in res.items():
                    m = r["metrics"] or {}
                    rows.append({"class": cls, "signal": sig,
                                 "rec_error": re_ or "",
                                 "combination": cb,
                                 "f1": m.get("f1", np.nan)})
        else:
            for sig, _sd, f1 in results:
                rows.append({"class": cls, "signal": sig,
                             "f1": np.nan if f1 is None else float(f1)})
        print(f"=== {cls} done in {walls[cls]:.1f}s ===", flush=True)

    table = pd.DataFrame(rows)
    name = "yahoo_full_grid.csv" if (args.combinations or args.rec_errors) else "yahoo_full.csv"
    out_csv = os.path.abspath(os.path.join(args.out, name))
    table.to_csv(out_csv, index=False)
    print(f"\nper-signal results -> {out_csv}")
    print(f"total wall-clock: {time.time() - t_all:.1f}s "
          f"({ {k: round(v, 1) for k, v in walls.items()} })")
    keys = (["class", "rec_error", "combination"]
            if args.rec_errors else
            ["class", "combination"] if args.combinations else ["class"])
    print(f"\n{'/'.join(keys)}  n  n_scored  mean_f1(scored)  "
          "mean_f1(all,NaN=0)")
    for key, g in table.groupby(keys):
        scored = g["f1"].dropna()
        label = key if isinstance(key, str) else "/".join(map(str, key))
        print(f"{label:28}  {len(g):4d}  {len(scored):8d}  "
              f"{scored.mean() if len(scored) else float('nan'):15.4f}  "
              f"{g['f1'].fillna(0.0).mean():18.4f}")


if __name__ == "__main__":
    main()
