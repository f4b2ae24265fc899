"""Decompose the fleet81 staged-detection call (VERDICT r4 item 1a).

BENCH r5 shows ~80 ms/call (1.34M w/s at 81 x ~1319 windows) vs round 3's
~60 ms (1.70M) — and exact == canonical, so the bucket pad is NOT the cost.
This probe times each layer of the call on the real chip:

  1. `_detect_fleet_device` one dispatch, exact shape, snap off
  2. same, canonical-padded stack staged at the bucket, snap on
  3. the jitted canonical pad program alone
  4. the 81-per-signal-slice epilogue alone
  5. full `detect_scores_fleet` exact / canonical / canonical staged-at-bucket

Usage: python tools/fleet81_probe.py [--reps 7]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def _time(label, fn, force, reps):
    out = fn()
    force(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        force(out)
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{label:44s} {best*1e3:8.2f} ms  (spread "
          f"{(max(ts)-best)/best:.2f})")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypad_tpu.detect import scorer as sc
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import fleet as fl

    dev0 = jax.devices()[0]
    S81 = 81
    rng = np.random.default_rng(0)
    base = rng.uniform(-1, 1, (1320, 100)).astype(np.float32)
    X_list = [base[: len(base) - (i % 3)] for i in range(S81)]
    n_win = sum(len(x) for x in X_list)

    with jax.default_device(jax.devices("cpu")[0]):
        params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                             hyperbolic=True)
    params = jax.device_put(params, dev0)
    p81 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S81,) + x.shape), params)

    Xs, n_real = fl.pad_and_stack(X_list)
    staged = (jax.device_put(jnp.asarray(Xs), dev0), n_real)
    smooth = np.array([max(int(int(n) * 0.01), 1) for n in n_real], np.int32)

    # --- 1. one dispatch, exact shape, snap off --------------------------
    def dev_exact():
        return sc._detect_fleet_device(
            p81, staged[0], jnp.asarray(n_real), jnp.asarray(smooth),
            True, "uncertainty", "point", 100, False, snap=False)

    t_dev = _time("device program (exact, no snap)", dev_exact,
                  lambda o: float(o[0, 0]), args.reps)

    # exact with snap: isolates the in-program snap cost
    def dev_exact_snap():
        return sc._detect_fleet_device(
            p81, staged[0], jnp.asarray(n_real), jnp.asarray(smooth),
            True, "uncertainty", "point", 100, False, snap=True)

    _time("device program (exact, snap)", dev_exact_snap,
          lambda o: float(o[0, 0]), args.reps)

    # --- 2/3. canonical pad program + canonical-shape program ------------
    pc, Xc, nc, sm_c = sc._fleet_canonical_pad(p81, staged[0], n_real,
                                               smooth)
    print(f"canonical shape: {Xc.shape} (exact {staged[0].shape})")

    _time("canonical pad program alone",
          lambda: sc._fleet_canonical_pad(p81, staged[0], n_real, smooth),
          lambda o: float(o[1][0, 0, 0]), args.reps)

    def dev_canon():
        return sc._detect_fleet_device(
            pc, Xc, jnp.asarray(nc), jnp.asarray(sm_c),
            True, "uncertainty", "point", 100, False, snap=True)

    _time("device program (canonical, snap)", dev_canon,
          lambda o: float(o[0, 0]), args.reps)

    # --- 4. the 81-slice epilogue on a concrete output -------------------
    out = dev_exact()
    _ = float(out[0, 0])
    lens = [int(n) for n in n_real]

    def slices():
        return [out[i, :L] for i, L in enumerate(lens)]

    _time("81-slice epilogue (device slices)", slices,
          lambda o: float(o[-1][-1]), args.reps)

    # --- 5. full calls (bench repro) --------------------------------------
    t_exact = _time(
        "detect_scores_fleet exact",
        lambda: sc.detect_scores_fleet(p81, X_list, True, "uncertainty",
                                       staged=staged, canonical=False),
        lambda o: float(o[-1][-1]), args.reps)
    t_canon = _time(
        "detect_scores_fleet canonical (pad per call)",
        lambda: sc.detect_scores_fleet(p81, X_list, True, "uncertainty",
                                       staged=staged),
        lambda o: float(o[-1][-1]), args.reps)

    # staged AT the bucket (train_fleet canonical=True shape): zero-copy
    staged_bucket = ((Xc, np.asarray(nc)))
    t_bucket = _time(
        "detect_scores_fleet canonical (staged at bucket)",
        lambda: sc.detect_scores_fleet(p81, X_list, True, "uncertainty",
                                       staged=staged_bucket),
        lambda o: float(o[-1][-1]), args.reps)

    for name, t in (("exact", t_exact), ("canonical", t_canon),
                    ("bucket-staged", t_bucket)):
        print(f"{name:16s} {n_win / t / 1e6:.2f}M w/s")
    print(f"device-program floor: {n_win / t_dev / 1e6:.2f}M w/s")


if __name__ == "__main__":
    main()
