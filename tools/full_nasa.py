"""Full NASA (SMAP + MSL) benchmark study: every channel in the checkout.

The reference checkout ships 80 NASA channels as ``{signal}-train.csv`` /
``{signal}-test.csv`` pairs with ground truth in ``data/anomalies.csv``
(``NASA_SIGNALS``, reference utils/data.py:30-111) — the PARITY.md sweeps
covered 7 SMAP + 8 MSL of them. This driver runs ALL channels, split by the
official telemanom spacecraft assignment, as two ``cli.cmd_sweep`` fleet
programs following the PARITY protocols per family:

  * SMAP (53 channels here): TadGAN euclidean, point/mult
    (configs/smap_euclidean.yaml)
  * MSL  (27 channels here): HypAD hyperbolic, point/uncertainty
    (configs/msl_hyper.yaml)

The reference's workflow is one ``main.py`` process per channel: 80 x 40
epochs at its measured CPU epoch wall-clocks (2.25-11.4 s/epoch depending
on channel length, BASELINE.md) — multiple CPU-days of epoch compute.

Usage (keep the chip free):
    cd /tmp/nasa_full && PYTHONPATH=/root/repo \
        python /root/repo/tools/full_nasa.py [--families SMAP,MSL] [--out .]
        [--epochs 40] [--detect-only] [--combinations all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    "SMAP": "configs/smap_euclidean.yaml",
    "MSL": "configs/msl_hyper.yaml",
}

# official telemanom spacecraft split (labeled_anomalies.csv of the SMAP/MSL
# benchmark): these channel prefixes/ids are Mars Science Laboratory; every
# other NASA channel is SMAP
MSL_CHANNELS = frozenset(
    [f"M-{i}" for i in range(1, 8)]
    + ["C-1", "C-2", "D-14", "D-15", "D-16", "F-4", "F-5", "F-7", "F-8",
       "P-10", "P-11", "P-14", "P-15", "S-2",
       "T-4", "T-5", "T-8", "T-9", "T-12", "T-13"])


def family_signals(family, data_root):
    """Every channel of the family with BOTH a train/test CSV pair in the
    checkout and a ground-truth row in anomalies.csv, registry order."""
    import csv

    from hypad_tpu.data.fetch import NASA_SIGNALS

    with open(os.path.join(data_root, "anomalies.csv")) as f:
        gt = {row[0] for row in csv.reader(f)}
    out = []
    for s in NASA_SIGNALS:
        if (s in MSL_CHANNELS) != (family == "MSL"):
            continue
        if s not in gt:
            continue
        if all(os.path.exists(os.path.join(data_root, f"{s}-{side}.csv"))
               for side in ("train", "test")):
            out.append(s)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--families", default="SMAP,MSL")
    ap.add_argument("--out", default=".")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--detect-only", action="store_true",
                    help="re-score from saved checkpoints (a prior run of "
                         "this tool) without retraining")
    ap.add_argument("--rec-errors", default=None,
                    help="comma-separated rec_error list (euclidean grid "
                         "detection: every rec_error x combination cell)")
    ap.add_argument("--combinations", default=None,
                    help="grid detection over the family ('all' = every "
                         "mode valid for the family's path)")
    args = ap.parse_args()

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    from hypad_tpu.cli import cmd_sweep, expand_combinations
    from hypad_tpu.utils.config import load_config

    rows = []
    walls = {}
    t_all = time.time()
    for fam in args.families.split(","):
        config_path = os.path.join(repo, CONFIGS[fam])
        params = load_config(config_path)
        params.output_root = os.path.abspath(
            os.path.join(args.out, f"runs_{fam}"))
        if args.epochs is not None:
            params.epochs = args.epochs
        signals = family_signals(fam, params.data_root)
        combos = expand_combinations(
            params,
            args.combinations.split(",") if args.combinations else None)
        print(f"=== {fam}: {len(signals)} channels x {params.epochs} epochs "
              f"(one fleet program) ===", flush=True)
        t0 = time.time()
        recs = args.rec_errors.split(",") if args.rec_errors else None
        results = cmd_sweep(params, config_path, signals=signals,
                            detect_only=args.detect_only,
                            rec_errors=recs, combinations=combos)
        walls[fam] = time.time() - t0
        if combos or recs:
            for sig, _sd, res in results:
                for (re_, cb), r in res.items():
                    m = r["metrics"] or {}
                    rows.append({"family": fam, "signal": sig,
                                 "rec_error": re_ or "",
                                 "combination": cb,
                                 "f1": m.get("f1", np.nan)})
        else:
            for sig, _sd, f1 in results:
                rows.append({"family": fam, "signal": sig,
                             "f1": np.nan if f1 is None else float(f1)})
        print(f"=== {fam} done in {walls[fam]:.1f}s ===", flush=True)

    table = pd.DataFrame(rows)
    name = "nasa_full_grid.csv" if (args.combinations or args.rec_errors) else "nasa_full.csv"
    out_csv = os.path.abspath(os.path.join(args.out, name))
    table.to_csv(out_csv, index=False)
    print(f"\nper-channel results -> {out_csv}")
    print(f"total wall-clock: {time.time() - t_all:.1f}s "
          f"({ {k: round(v, 1) for k, v in walls.items()} })")
    keys = (["family", "rec_error", "combination"]
            if args.rec_errors else
            ["family", "combination"] if args.combinations else ["family"])
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
