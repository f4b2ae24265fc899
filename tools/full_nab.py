"""Full NAB benchmark study: every labeled NAB signal in the checkout.

The reference checkout ships 46 NAB signals as single ``{signal}.csv`` files
(NAB style: ``unique_dataset: True``, same CSV for train and test —
reference utils/dataloader.py:100-139 aggregation path) with ground truth in
``data/anomalies.csv``. The PARITY.md sweeps covered the 9-signal
TravelTime/Twitter family at the reference's ``interval: 21600``
(configs/univariate.yaml:12). This driver runs ALL of them.

28 of the 46 are 2-to-17-day series sampled at ~5 minutes; at the
reference's 6-hour aggregation they collapse to 37-68 rows — fewer than the
100-step window, so the reference pipeline itself cannot score them at its
shipped interval. Rather than silently skip them, the study groups signals
by the finest reference-compatible aggregation that leaves at least
1.5x window rows:

  * ``interval: 21600`` (the reference's shipped value) where that already
    yields >= 150 aggregated rows — TravelTime, Twitter, exchange, nyc_taxi;
  * ``interval: 1800`` for the short 5-minute-cadence group (art_*, ec2_*,
    elb, grok, iio, occupancy, rds, speed) -> 200-800 rows each.

Each group trains + scores as ONE ``cli.cmd_sweep`` fleet program
(TadGAN euclidean point/mult per configs/nab_sweep.yaml, the PARITY NAB
protocol). The reference's workflow is one main.py process per signal.

Usage (keep the chip free):
    cd /tmp/nab_full && PYTHONPATH=/root/repo \
        python /root/repo/tools/full_nab.py [--out .] [--epochs 40]
        [--detect-only] [--rec-errors point,area,dtw] [--combinations all]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIG = "configs/nab_sweep.yaml"
INTERVALS = (21600, 1800)  # reference value first; refinement for short series
MIN_ROWS = 150             # >= 1.5x the 100-step window after aggregation


def nab_signals(data_root):
    """Every labeled signal with a single ``{signal}.csv`` in the checkout
    (NASA channels ship as train/test pairs and are excluded), with the
    finest reference-compatible interval chosen per the module docstring."""
    with open(os.path.join(data_root, "anomalies.csv")) as f:
        gt = {row[0] for row in csv.reader(f)} - {"signal"}
    groups = {iv: [] for iv in INTERVALS}
    skipped = []
    for s in sorted(gt):
        path = os.path.join(data_root, f"{s}.csv")
        if os.path.exists(os.path.join(data_root, f"{s}-train.csv")):
            continue  # NASA channel (full_nasa.py territory)
        if not os.path.exists(path):
            skipped.append((s, "no CSV in checkout"))
            continue
        ts = pd.read_csv(path, usecols=["timestamp"])["timestamp"].values
        span = float(ts.max() - ts.min())
        for iv in INTERVALS:
            if span // iv + 1 >= MIN_ROWS:
                groups[iv].append(s)
                break
        else:
            skipped.append((s, f"{int(span // INTERVALS[-1]) + 1} rows even "
                               f"at interval={INTERVALS[-1]}"))
    return groups, skipped


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=".")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--detect-only", action="store_true",
                    help="re-score from saved checkpoints (a prior run of "
                         "this tool) without retraining")
    ap.add_argument("--rec-errors", default=None,
                    help="comma-separated rec_error list (grid detection)")
    ap.add_argument("--combinations", default=None,
                    help="grid detection over each group ('all' = every "
                         "mode valid for the euclidean path)")
    args = ap.parse_args()

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    from hypad_tpu.cli import cmd_sweep, expand_combinations
    from hypad_tpu.utils.config import load_config

    config_path = os.path.join(repo, CONFIG)
    groups, skipped = nab_signals(load_config(config_path).data_root)
    for s, why in skipped:
        print(f"skipping {s}: {why}", flush=True)

    rows = []
    walls = {}
    t_all = time.time()
    for iv, signals in groups.items():
        if not signals:
            continue
        params = load_config(config_path)
        params.interval = iv
        params.output_root = os.path.abspath(
            os.path.join(args.out, f"runs_nab_{iv}"))
        if args.epochs is not None:
            params.epochs = args.epochs
        combos = expand_combinations(
            params,
            args.combinations.split(",") if args.combinations else None)
        recs = args.rec_errors.split(",") if args.rec_errors else None
        print(f"=== NAB interval={iv}: {len(signals)} signals x "
              f"{params.epochs} epochs (one fleet program) ===", flush=True)
        t0 = time.time()
        results = cmd_sweep(params, config_path, signals=signals,
                            detect_only=args.detect_only,
                            rec_errors=recs, combinations=combos)
        walls[iv] = time.time() - t0
        if combos or recs:
            for sig, _sd, res in results:
                for (re_, cb), r in res.items():
                    m = r["metrics"] or {}
                    rows.append({"interval": iv, "signal": sig,
                                 "rec_error": re_ or "",
                                 "combination": cb,
                                 "f1": m.get("f1", np.nan)})
        else:
            for sig, _sd, f1 in results:
                rows.append({"interval": iv, "signal": sig,
                             "f1": np.nan if f1 is None else float(f1)})
        print(f"=== interval={iv} done in {walls[iv]:.1f}s ===", flush=True)

    table = pd.DataFrame(rows)
    name = ("nab_full_grid.csv" if (args.combinations or args.rec_errors)
            else "nab_full.csv")
    out_csv = os.path.abspath(os.path.join(args.out, name))
    table.to_csv(out_csv, index=False)
    print(f"\nper-signal results -> {out_csv}")
    print(f"total wall-clock: {time.time() - t_all:.1f}s "
          f"({ {k: round(v, 1) for k, v in walls.items()} })")
    keys = (["interval", "rec_error", "combination"] if args.rec_errors else
            ["interval", "combination"] if args.combinations else
            ["interval"])
    print(f"\n{'/'.join(map(str, keys))}  n  n_scored  mean_f1(scored)  "
          "mean_f1(all,NaN=0)")
    for key, g in table.groupby(keys):
        scored = g["f1"].dropna()
        key = key if isinstance(key, tuple) else (key,)
        label = "/".join(map(str, key))
        print(f"{str(label):28}  {len(g):4d}  {len(scored):8d}  "
              f"{scored.mean() if len(scored) else float('nan'):15.4f}  "
              f"{g['f1'].fillna(0.0).mean():18.4f}")


if __name__ == "__main__":
    main()
