"""Tracing / profiling / observability (aux subsystem; SURVEY.md §5).

The reference has no profiling at all (only per-epoch print statements,
train.py:367-376). This framework provides:

  * ``stage(name)``       — wall-clock context manager; records per-stage
                            timings into a process-wide registry
  * ``report()``          — formatted per-stage summary (count/total/mean)
  * ``trace(logdir)``     — jax.profiler device trace context (TensorBoard
                            readable) around any region
  * ``annotate(name)``    — jax.profiler.TraceAnnotation for fine-grained
                            device-timeline labels
  * ``MetricsLogger``     — structured per-epoch metric log with optional
                            JSONL persistence (replaces the reference's raw
                            prints while keeping them available)
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

_STAGES = defaultdict(lambda: {"count": 0, "total": 0.0})


@contextlib.contextmanager
def stage(name):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _STAGES[name]
        s["count"] += 1
        s["total"] += dt


def stage_stats():
    return {k: dict(v, mean=v["total"] / max(v["count"], 1))
            for k, v in _STAGES.items()}


def reset_stages():
    _STAGES.clear()


def report():
    lines = ["stage                          count    total(s)    mean(s)"]
    for name, s in sorted(stage_stats().items(),
                          key=lambda kv: -kv[1]["total"]):
        lines.append(f"{name:<30} {s['count']:>5} {s['total']:>11.3f} "
                     f"{s['mean']:>10.4f}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Label a region on the device trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class MetricsLogger:
    """Per-epoch metric sink: keeps history, optionally appends JSONL,
    and can reproduce the reference's stdout format."""

    def __init__(self, path=None, echo=True, hyperbolic=False):
        self.history = []
        self.path = path
        self.echo = echo
        self.hyperbolic = hyperbolic
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def __call__(self, epoch, metrics):
        row = {"epoch": int(epoch),
               **{k: float(v) for k, v in metrics.items()}}
        self.history.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")
        if self.echo:
            rec = ("Hyperbolic loss" if self.hyperbolic else "Eucl mse loss")
            print(f"Encoder decoder training done in epoch {epoch - 1}")
            print(f"{rec} {row['rec_loss']:.6f}")
            print(f"critic x loss {row['critic_x_loss']:.3f} "
                  f"critic z loss {row['critic_z_loss']:.3f} \n"
                  f"decoder loss {row['decoder_loss']:.3f}\n")
