"""On-chip A/B: default XLA critic step vs the fused Pallas megakernel.

VERDICT r4 item 6: settle the critic-step megakernel question with data.
Times the full fused epoch program (build_epoch_fn) at Yahoo-A1 size
(1320 windows x 100, batch 64 -> 100 critic steps + 20 generator steps per
epoch) with the default autodiff critic step and with
``fused_critics=True`` (train/critic_kernel.py), hyperbolic and euclidean.

Timing protocol per CLAUDE.md: params init on host, one device_put; a
20-epoch multi-call scan would hide the per-call tunnel floor differently
for the two variants, so this times a 5-epoch lax.scan of the epoch body
(enough steps that the ~24 ms tunnel round-trip is <10% of either variant),
best-of-N with forced value fetch.

Usage: python tools/critic_kernel_bench.py [--reps 7] [--epochs 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n", type=int, default=1320)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import trainer as tr

    dev0 = jax.devices()[0]
    print(f"device: {dev0.device_kind}")

    def build(hyperbolic, fused):
        single = tr._make_epoch_body(0.0005, hyperbolic, args.batch,
                                     lambda b: b, fused_critics=fused)

        def multi(state, X, key):
            keys = jax.random.split(key, args.epochs)
            return jax.lax.scan(lambda st, k: single(st, X, k), state, keys)

        return jax.jit(multi)

    results = {}
    for hyperbolic in (True, False):
        with jax.default_device(jax.devices("cpu")[0]):
            params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                                 hyperbolic=hyperbolic)
            X = jax.random.uniform(jax.random.PRNGKey(1), (args.n, 100),
                                   minval=-1.0, maxval=1.0)
            state = tr.init_train_state(params, lr=0.0005,
                                        hyperbolic=hyperbolic)
        X = jax.device_put(X, dev0)
        state = jax.device_put(state, dev0)
        key = jax.device_put(jax.random.PRNGKey(2), dev0)

        for fused in (False, True, "full"):
            fn = build(hyperbolic, fused)
            st = jax.tree_util.tree_map(jnp.copy, state)
            st, m = fn(st, X, key)             # compile + warm
            last = float(m["decoder_loss"][-1])
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                st, m = fn(st, X, key)
                last = float(m["decoder_loss"][-1])
                ts.append(time.time() - t0)
            tag = {False: "_default", True: "_fused", "full": "_full"}[fused]
            name = ("hyper" if hyperbolic else "eucl") + tag
            per_epoch = min(ts) / args.epochs
            results[name] = per_epoch
            print(f"{name:16s} {per_epoch*1e3:8.3f} ms/epoch "
                  f"(best of {args.reps}; {args.epochs}-epoch program; "
                  f"last_loss={last:.4f})")

    for mode in ("hyper", "eucl"):
        d = results[f"{mode}_default"]
        for tag in ("fused", "full"):
            f = results[f"{mode}_{tag}"]
            print(f"{mode}: {tag} is {d / f:.2f}x default "
                  f"({d*1e3:.3f} -> {f*1e3:.3f} ms/epoch)")


if __name__ == "__main__":
    main()
