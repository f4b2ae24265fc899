"""Corpus-scale seed-band study: a whole benchmark class x several seeds.

The parity protocol (PARITY.md) quantifies GAN seed variance on 8-signal
subsets (3-seed bands, `sweep --seeds`). This driver asks the same question
at FULL-CLASS scale: every signal of a Yahoo S5 class trains at every seed
as one (signal, seed) cross-product fleet — e.g. A1 = 67 signals x 3 seeds
= 201 independent 40-epoch models in ONE vmapped training program and ONE
(HBM-chunked) fleet detection program per class (cli.cmd_sweep cross-product
mode; the reference's workflow for the same table is 201 `main.py`
processes, ~7.5 CPU-hours of epoch compute at its measured 2.25 s epochs).

Output: per-(signal, seed) F1 CSV + per-seed aggregates + cross-seed
stability stats (within-signal band width, scored-cell agreement). The
per-seed run dirs nest under runs_{cls}/seed_{k}/ exactly as per-signal
`train` runs at that seed would write them.

Usage (keep the chip free — ONE process may own it):
    cd /tmp/seedband && PYTHONPATH=/root/repo python \
        /root/repo/tools/seedband_study.py --cls A1 --seeds 0,1,2 [--out .]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from full_yahoo import CONFIGS, class_signals  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cls", default="A1", choices=sorted(CONFIGS),
                    help="Yahoo S5 class (default A1 — the paper's headline "
                         "HypAD benchmark)")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--out", default=".")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override config epochs (default: config's 40)")
    ap.add_argument("--limit", type=int, default=None,
                    help="first N signals only (smoke runs)")
    args = ap.parse_args()

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    from hypad_tpu.cli import cmd_sweep
    from hypad_tpu.utils.config import load_config

    seeds = [int(s) for s in args.seeds.split(",")]
    config_path = os.path.join(repo, CONFIGS[args.cls])
    params = load_config(config_path)
    params.output_root = os.path.abspath(
        os.path.join(args.out, f"runs_{args.cls}"))
    if args.epochs is not None:
        params.epochs = args.epochs
    signals = class_signals(args.cls, params.data_root)
    if args.limit:
        signals = signals[: args.limit]

    print(f"=== {args.cls}: {len(signals)} signals x {len(seeds)} seeds "
          f"({len(signals) * len(seeds)} models) x {params.epochs} epochs, "
          "one cross-product fleet ===", flush=True)
    t0 = time.time()
    results = cmd_sweep(params, config_path, signals=signals, seeds=seeds)
    wall = time.time() - t0

    # cmd_sweep returns (signal, seed, f1) per pair — the seed column comes
    # from the results themselves, so a reorder of cli.py's pairs
    # construction cannot silently mislabel it
    assert len(results) == len(signals) * len(seeds)
    assert {(sig, sd) for sig, sd, _ in results} == {
        (sig, sd) for sig in signals for sd in seeds}
    rows = [{"class": args.cls, "signal": sig, "seed": sd,
             "f1": np.nan if f1 is None else float(f1)}
            for sig, sd, f1 in results]
    table = pd.DataFrame(rows)
    out_csv = os.path.abspath(
        os.path.join(args.out, f"yahoo_{args.cls.lower()}_seedband.csv"))
    table.to_csv(out_csv, index=False)

    print(f"\nper-(signal, seed) results -> {out_csv}")
    print(f"wall-clock: {wall:.1f}s for {len(pairs)} models")
    print("\nseed  n  n_scored  mean_f1(scored)  mean_f1(all,NaN=0)")
    for sd, g in table.groupby("seed"):
        scored = g["f1"].dropna()
        print(f"{sd:4d}  {len(g):3d}  {len(scored):8d}  "
              f"{scored.mean() if len(scored) else float('nan'):15.4f}  "
              f"{g['f1'].fillna(0.0).mean():18.4f}")

    # cross-seed stability: scored/unscored comes from notna (a genuine
    # f1 == 0.0 still counts as scored); band widths use the 0-filled
    # scale (an unscored seed counts as 0 — the aggregate convention above)
    pivot = table.pivot(index="signal", columns="seed", values="f1")
    wide = pivot.fillna(0.0)
    band = wide.max(axis=1) - wide.min(axis=1)
    n_all = pivot.notna().all(axis=1).sum()
    n_any = pivot.notna().any(axis=1).sum()
    print(f"\ncross-seed stability over {len(wide)} signals:")
    print(f"  scored under every seed: {n_all}; under >=1 seed: {n_any}; "
          f"under none: {len(wide) - n_any}")
    print(f"  per-signal band width (max-min, NaN=0): mean "
          f"{band.mean():.4f}, median {band.median():.4f}, "
          f">0.2 on {(band > 0.2).sum()} signals")
    print(f"  class mean (NaN=0) per seed: "
          f"{[round(float(wide[s].mean()), 4) for s in wide.columns]}")


if __name__ == "__main__":
    main()
