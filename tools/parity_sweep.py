#!/usr/bin/env python3
"""End-to-end parity sweep driver: run N signals through 40-epoch train +
detect on either side and tabulate final F1s.

  --side ref   runs the reference (aleflabo/HypAD) from the /tmp/refbase
               sandbox (build it first: python tools/make_refbase.py)
  --side tpu   runs hypad_tpu.cli from this repo

Examples (the PARITY.md MSL sweep):
  python tools/parity_sweep.py --side ref --dataset MSL \
      --signals M-1,M-2,M-6,C-1,C-2,D-14,F-5,T-4 --hyperbolic \
      --rec-error point --combination uncertainty
  python tools/parity_sweep.py --side tpu ... (same flags)

One signal at a time (the box has one CPU core; the TPU admits one process).
Logs land in <outdir>/<side>_<signal>.log; the summary prints at the end as
``signal precision recall f1`` (∅ for no-intervals runs).
"""

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBASE = "/tmp/refbase"

CONFIG_TMPL = """\
dataset: '{dataset}'
signal: '{signal}'
epochs: {epochs}
hyperbolic: {hyperbolic}
signal_shape: 100
lr: 0.0005
batch_size: 64
save_result: False
filename: ''
rec_error: '{rec_error}'
combination: '{combination}'
interval: {interval}
unique_dataset: {unique}
resume: False
resume_epoch: 10
load: False
new_features: False
id: 1
split: 1
{extra}"""


def run_one(side, args, signal, outdir):
    cfg = CONFIG_TMPL.format(
        dataset=args.dataset, signal=signal, epochs=args.epochs,
        hyperbolic=args.hyperbolic, rec_error=args.rec_error,
        combination=args.combination, interval=args.interval,
        unique=args.unique_dataset,
        extra=("" if side == "ref" else
               f"data_root: '{args.data_root}'\noutput_root: '.'\n"
               "save_artifacts: False\n"))
    log = os.path.join(outdir, f"{side}_{signal}.log")
    if side == "ref":
        cfg_path = os.path.join(REFBASE, "configs", f"sweep_{signal}.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg)
        env = dict(os.environ, PYTHONPATH=os.path.join(REFBASE, "shims"),
                   MPLBACKEND="Agg")
        cmd = [sys.executable, "main.py", "--config", cfg_path]
        cwd = REFBASE
    else:
        cwd = os.path.join(outdir, f"tpu_{signal}")
        os.makedirs(cwd, exist_ok=True)
        cfg_path = os.path.join(cwd, "config.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg)
        # keep the inherited PYTHONPATH (the axon TPU plugin registration
        # lives there; replacing it with JAX_PLATFORMS=axon still set makes
        # every jax import fail with "unknown backend")
        inherited = os.environ.get("PYTHONPATH", "")
        env = dict(os.environ,
                   PYTHONPATH=f"{REPO}:{inherited}" if inherited else REPO)
        cmd = [sys.executable, "-m", "hypad_tpu.cli", "train", "--config",
               cfg_path]
    t0 = time.time()
    with open(log, "w") as f:
        r = subprocess.run(cmd, cwd=cwd, env=env, stdout=f,
                           stderr=subprocess.STDOUT,
                           timeout=args.timeout)
    text = open(log).read()
    m = re.findall(r"precision: ([0-9.e-]+), recall: ([0-9.e-]+)", text)
    f1 = re.findall(r"f1_score: ([0-9.e-]+|nan)", text)
    if r.returncode != 0:
        status = ("ERROR", "", "")
    elif not f1:
        status = ("∅", "", "")
    else:
        status = (f1[-1], m[-1][0], m[-1][1])
    print(f"[{side}] {signal}: f1={status[0]} p={status[1]} r={status[2]} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return signal, status


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=("ref", "tpu"), required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--signals", required=True)
    ap.add_argument("--hyperbolic", action="store_true")
    ap.add_argument("--rec-error", default="point")
    ap.add_argument("--combination", default="mult")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--interval", type=int, default=21600)
    ap.add_argument("--unique-dataset", action="store_true")
    ap.add_argument("--data-root", default="/root/reference/data")
    ap.add_argument("--outdir", default="/tmp/parity_sweep")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    rows = [run_one(args.side, args, s, args.outdir)
            for s in args.signals.split(",")]
    print(f"\n== {args.side} {args.dataset} "
          f"{args.rec_error}/{args.combination} ==")
    for sig, (f1, p, r) in rows:
        print(f"{sig}\t{f1}\t{p}\t{r}")


if __name__ == "__main__":
    main()
