#!/usr/bin/env python3
"""Fleet scaling study: how per-signal cost falls as the fleet grows.

Trains/detects S independent A1-sized hyperbolic models in ONE vmapped
program (train/fleet.py, detect/scorer.detect_scores_fleet) for a range of
fleet sizes and prints signal-epochs/s and aggregate detection windows/s.
The single-model fused epoch is kernel-latency-bound (~25 us/step critic,
PROFILE.md), so batching S models into (S, B, W) kernels should cost far
less than S dispatches — this measures how far that holds on the real chip.

Run on the TPU (the only process using it):
  PYTHONPATH=/root/repo python tools/fleet_scaling.py [--sizes 1,3,9,27,81]

Results are recorded in PROFILE.md ("Fleet scaling" section).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EPOCHS_PER_CALL = 10
N_WINDOWS = 1320          # Yahoo A1 real_1 size (the bench headline regime)
WIDTH = 100
BATCH = 64


def measure(S):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypad_tpu.detect import scorer as sc
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import fleet as fl

    dev0 = jax.devices()[0]
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (N_WINDOWS, WIDTH)).astype(np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        fstate = fl.init_fleet_state(
            [init_tadgan(jax.random.PRNGKey(i), signal_shape=WIDTH,
                         hyperbolic=True) for i in range(S)],
            lr=5e-4, hyperbolic=True)
    fstate = jax.device_put(fstate, dev0)
    Xs = jax.device_put(
        jnp.broadcast_to(jnp.asarray(X), (S,) + X.shape).copy(), dev0)

    multi = fl.build_fleet_multi_epoch_fn(5e-4, True, BATCH,
                                          N_EPOCHS_PER_CALL)
    key = jax.random.PRNGKey(7)
    # warm (compile + remote fingerprint), then timed with forced completion
    fstate, m = multi(fstate, Xs, jax.random.fold_in(key, 1))
    float(jnp.sum(m["decoder_loss"][-1]))
    t0 = time.time()
    fstate, m = multi(fstate, Xs, jax.random.fold_in(key, 0))
    float(jnp.sum(m["decoder_loss"][-1]))
    epoch_s = (time.time() - t0) / N_EPOCHS_PER_CALL

    # fleet detection at the same size (slightly ragged like a real family)
    X_list = [X[: N_WINDOWS - (i % 3)] for i in range(S)]
    params = jax.tree_util.tree_map(lambda x: x[:S], fstate.params)

    def det():
        return sc.detect_scores_fleet(params, X_list, True,
                                      "uncertainty")[-1]

    det()
    t0 = time.time()
    out = det()
    float(out[-1])
    det_s = time.time() - t0
    n_win = sum(len(x) for x in X_list)

    # staged: reuse a device-resident padded stack (the `sweep` CLI path
    # for unique-dataset families) — skips the host pad + tunnel upload
    Xs_h, n_real = fl.pad_and_stack([np.asarray(x, np.float32)
                                     for x in X_list])
    staged = (jax.device_put(jnp.asarray(Xs_h), dev0), n_real)

    def det_staged():
        return sc.detect_scores_fleet(params, X_list, True, "uncertainty",
                                      staged=staged)[-1]

    det_staged()
    t0 = time.time()
    out = det_staged()
    float(out[-1])
    det_staged_s = time.time() - t0

    del fstate, Xs, params, staged
    return epoch_s, det_s, det_staged_s, n_win


def compile_probe():
    """Canonical-shape probe (VERDICT r3 item 2): run two DIFFERENT
    families (S and N both differ, same canonical bucket) back-to-back and
    assert the second pays ZERO novel fleet-detection compiles. On the
    tunneled TPU this is the difference between 40-200 s of remote compile
    per family and a cache hit; also prints wall-clocks so the reuse is
    visible in the timings."""
    import jax
    import numpy as np

    from hypad_tpu.detect import scorer as sc
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import fleet as fl

    rng = np.random.default_rng(0)

    def family(S, lens_base, seed0):
        params = fl.stack_states(
            [init_tadgan(jax.random.PRNGKey(seed0 + i), signal_shape=WIDTH,
                         hyperbolic=True) for i in range(S)])
        X_list = [rng.uniform(-1, 1, (lens_base - (i % 3), WIDTH))
                  .astype(np.float32) for i in range(S)]
        return params, X_list

    shapes = [(9, 1300, 0), (12, 1450, 100)]   # both -> bucket (16, 1536)
    assert (sc.canonical_fleet_shape(9, 1300, WIDTH)
            == sc.canonical_fleet_shape(12, 1450, WIDTH))
    for i, (S, lens_base, seed0) in enumerate(shapes):
        params, X_list = family(S, lens_base, seed0)
        before = sc._detect_fleet_device._cache_size()
        t0 = time.time()
        out = sc.detect_scores_fleet(params, X_list, True, "uncertainty")
        float(out[-1][-1])
        wall = time.time() - t0
        new = sc._detect_fleet_device._cache_size() - before
        print(f"family {i}: S={S} lens~{lens_base} -> {wall:.2f}s, "
              f"{new} novel compile(s)", flush=True)
        if i > 0:
            assert new == 0, "second family was NOT served canonically"
    print("compile probe OK: second family paid zero novel compiles")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,3,9,27,81")
    ap.add_argument("--compile-probe", action="store_true",
                    help="canonical-shape reuse probe instead of the "
                         "scaling sweep")
    args = ap.parse_args()
    if args.compile_probe:
        compile_probe()
        return
    sizes = [int(s) for s in args.sizes.split(",")]

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"{'S':>4} {'epoch_s':>10} {'sig-epoch_s':>12} "
          f"{'sig-epochs/s':>13} {'detect_s':>10} {'detect_w/s':>12} "
          f"{'staged_s':>10} {'staged_w/s':>12}")
    for S in sizes:
        epoch_s, det_s, det_staged_s, n_win = measure(S)
        print(f"{S:>4} {epoch_s:>10.4f} {epoch_s / S:>12.5f} "
              f"{S / epoch_s:>13.1f} {det_s:>10.4f} "
              f"{n_win / det_s:>12.0f} {det_staged_s:>10.4f} "
              f"{n_win / det_staged_s:>12.0f}", flush=True)


if __name__ == "__main__":
    main()
