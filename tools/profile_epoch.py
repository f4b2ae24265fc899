"""Per-kernel profile of the fused training epoch (VERDICT r2 item 6).

Runs the warm multi-epoch program on the real TPU under jax.profiler with a
perfetto trace, then parses the trace protobuf/JSON for device-side slices
and prints the top kernels by total duration, plus the epoch anatomy
(kernel time vs gaps = dispatch/latency bound).

Usage:  python tools/profile_epoch.py [--fused]
(--fused profiles the fused_critics="full" megakernel epoch;
keep the chip free: one user at a time)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_epoch_trace(trace_dir):
    import jax
    import jax.numpy as jnp

    from hypad_tpu.data.pipeline import load_signal_dataset
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import trainer as tr

    data_root = os.environ.get("HYPAD_DATA", "/root/reference/data")
    csv = os.path.join(data_root, "YAHOO", "A1Benchmark", "real_1.csv")
    data = load_signal_dataset(csv, interval=1, yahoo=True)
    X = jnp.asarray(data.X)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                             hyperbolic=True)
        state = tr.init_train_state(params, lr=5e-4, hyperbolic=True)
    state = jax.device_put(state, jax.devices()[0])
    n_epochs = 5
    fused = "full" if "--fused" in sys.argv else False
    multi = tr.build_multi_epoch_fn(5e-4, True, 64, n_epochs, mesh=None,
                                    fused_critics=fused)
    key = jax.random.PRNGKey(1)
    # warm (compile) outside the trace
    state, m = multi(state, X, jax.random.fold_in(key, 99))
    float(m["decoder_loss"][-1])

    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        state, m = multi(state, X, jax.random.fold_in(key, 0))
        float(m["decoder_loss"][-1])
    wall = time.time() - t0
    return wall, n_epochs, len(data.X)


def parse_trace(trace_dir):
    """Parse the perfetto/xplane trace for device-lane slices.

    jax.profiler.trace writes plugins/profile/<run>/*.trace.json.gz
    (chrome trace) when available; fall back to reporting nothing."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name metadata mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in proc_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    per_kernel = defaultdict(lambda: [0.0, 0])
    spans = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        per_kernel[name][0] += dur
        per_kernel[name][1] += 1
        spans.append((float(e["ts"]), float(e["ts"]) + dur))
    if not spans:
        return None
    spans.sort()
    total_busy = sum(d for d, _ in per_kernel.values())
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    # merged busy time (overlaps collapsed) to estimate gaps
    merged, cur_s, cur_e = 0.0, spans[0][0], spans[0][1]
    for s, e in spans[1:]:
        if s > cur_e:
            merged += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    merged += cur_e - cur_s
    top = sorted(per_kernel.items(), key=lambda kv: -kv[1][0])
    return {
        "top": [(name, d, c) for name, (d, c) in top],
        "busy_us": total_busy,
        "merged_busy_us": merged,
        "span_us": hi - lo,
    }


def main():
    trace_dir = "/tmp/hypad_epoch_trace"
    os.system(f"rm -rf {trace_dir}")
    wall, n_epochs, n_windows = run_epoch_trace(trace_dir)
    print(f"traced {n_epochs} warm epochs in {wall:.3f}s "
          f"({wall / n_epochs * 1e3:.1f} ms/epoch, {n_windows} windows)")
    stats = parse_trace(trace_dir)
    if stats is None:
        print("no device trace events found; trace dir:", trace_dir)
        for p in glob.glob(os.path.join(trace_dir, "**", "*"),
                           recursive=True):
            print("  ", p)
        return
    print(f"device busy (merged) {stats['merged_busy_us'] / 1e3:.2f} ms over "
          f"span {stats['span_us'] / 1e3:.2f} ms "
          f"(occupancy {stats['merged_busy_us'] / stats['span_us']:.1%})")
    print(f"\n| kernel | total ms | calls | us/call |")
    print("|---|---|---|---|")
    for name, dur, cnt in stats["top"][:15]:
        print(f"| `{name[:60]}` | {dur / 1e3:.3f} | {cnt} | "
              f"{dur / cnt:.1f} |")


if __name__ == "__main__":
    main()
