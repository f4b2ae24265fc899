"""Decompose the canonical-shape cost of staged fleet detection (round 4).

Round 3 measured fleet81_detect_staged at 1.70M w/s with exact shapes;
the round-4 canonical padding (canonical_fleet_shape) measured 254k w/s —
a 6.7x warm-call regression. Candidate costs:
  (a) per-call `_fleet_canonical_pad` — ~100 un-jitted device dispatches
      (2 per param leaf) + big on-device copies, OUTSIDE the compiled
      program;
  (b) the padded program itself (S 81->85, N ~1420->1536: ~1.2x FLOPs,
      plus possible XLA schedule degradation near the HBM ceiling).

Variants timed (best-of-5 warm, forced completion):
  exact     — canonical=False on the exact staged stack (the round-3 path)
  canonical — canonical=True, pads per call (current bench shape)
  prepadded — canonical=True but params/stack ALREADY at the canonical
              rungs, so every pad is a no-op: isolates (b) from (a)

Usage: python tools/canonical_cost.py [S]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hypad_tpu.data.pipeline import load_signal_dataset
from hypad_tpu.detect import scorer as sc
from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import fleet as fl


def best_of(fn, n=5):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts), (max(ts) - min(ts)) / min(ts)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 81
    data = load_signal_dataset(
        "/root/reference/data/YAHOO/A1Benchmark/real_1.csv", interval=1,
        yahoo=True)
    dev0 = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                             hyperbolic=True)
    fleet_X = [np.asarray(data.X[: len(data.X) - (i % 3)], np.float32)
               for i in range(S)]
    n_win = sum(len(x) for x in fleet_X)
    sp = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (S,) + x.shape).copy(),
        params), dev0)
    Xs, n_real = fl.pad_and_stack(fleet_X)
    staged = (jax.device_put(jnp.asarray(Xs), dev0), n_real)

    def run(canonical, p=sp, st=staged):
        return sc.detect_scores_fleet(p, fleet_X, True, "uncertainty",
                                      staged=st, canonical=canonical)[-1]

    shape = sc.canonical_fleet_shape(S, Xs.shape[1], Xs.shape[2])
    print(f"S={S} exact_stack={Xs.shape} canonical={shape}", flush=True)

    t, spr = best_of(lambda: float(run(False)[-1]))
    print(f"exact:     {t:.4f}s  {n_win / t:,.0f} w/s  (spread {spr:.2f})",
          flush=True)
    t, spr = best_of(lambda: float(run(True)[-1]))
    print(f"canonical: {t:.4f}s  {n_win / t:,.0f} w/s  (spread {spr:.2f})",
          flush=True)

    # pre-pad ONCE to the canonical rungs, then drive the compiled program
    # directly (detect_scores_fleet would re-slice the staged stack to S
    # rows and re-pad per call): isolates the padded-program cost (b) from
    # the per-call pad dispatches (a)
    import math

    smooth = np.array([max(math.trunc(int(n) * 0.01), 1) for n in n_real],
                      np.int32)
    pp, pXs, pn, psm = sc._fleet_canonical_pad(sp, staged[0],
                                               np.asarray(n_real), smooth)
    width = pXs.shape[2]

    def run_dev(p, x, n, sm):
        return sc._detect_fleet_device(
            p, jnp.asarray(x), jnp.asarray(n), jnp.asarray(sm), True,
            "uncertainty", "point", width, False, mesh=None,
            multivariate=False)

    def prepadded():
        out = sc._fleet_chunked(run_dev, pp, pXs, pn, psm)
        return float(out[S - 1, -1])

    t, spr = best_of(prepadded)
    print(f"prepadded: {t:.4f}s  {n_win / t:,.0f} w/s  (spread {spr:.2f})",
          flush=True)

    # the pad alone, forced
    def pad_only():
        o = sc._fleet_canonical_pad(sp, staged[0], np.asarray(n_real),
                                    smooth)
        jax.block_until_ready(o[1])
        return float(jax.tree_util.tree_leaves(o[0])[0][-1].ravel()[0])

    t, spr = best_of(pad_only)
    print(f"pad_only:  {t:.4f}s  (spread {spr:.2f})", flush=True)


if __name__ == "__main__":
    main()
