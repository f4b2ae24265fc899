"""Fleet-vs-sequential epoch throughput on the real TPU chip.

Times the vmapped S-signal fleet epoch against S sequential fused epochs
at Yahoo-A1 size (~1320 windows x 100, batch 64). Timing per CLAUDE.md:
chained fori_loop-style reps with a value fetch at the end of the
dependency chain — single dispatches only measure the ~24ms tunnel floor.

Usage: python tools/bench_fleet.py [S ...]  (default 1 9 32)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import fleet as fl
from hypad_tpu.train import trainer as tr

N, W, B, LR = 1320, 100, 64, 5e-4
REPS = 20


def toy(n, w, seed):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 40 * np.pi, n + w)
    s = np.sin(t) + 0.05 * rng.standard_normal(n + w)
    X = np.stack([s[i:i + w] for i in range(n)]).astype(np.float32)
    return np.clip(X, -1, 1)


def chain_time(fn, state, args, reps=REPS):
    """Run `reps` chained epochs (state feeds forward) and time by value
    fetch; returns seconds per epoch."""
    st = state
    # warmup+compile
    st, m = fn(st, *args)
    _ = float(jax.tree_util.tree_leaves(m)[0].sum()
              if hasattr(jax.tree_util.tree_leaves(m)[0], "sum")
              else jax.tree_util.tree_leaves(m)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        st, m = fn(st, *args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(m)[0]))
    dt = time.perf_counter() - t0
    return dt / reps


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 9, 32]
    print(f"devices: {jax.devices()}")

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    # sequential baseline (S=1)
    with jax.default_device(cpu):
        p = init_tadgan(jax.random.PRNGKey(0), signal_shape=W,
                        hyperbolic=False)
        st = tr.init_train_state(p, lr=LR, hyperbolic=False)
    st = jax.device_put(st, dev)
    X = jax.device_put(jnp.asarray(toy(N, W, 0)), dev)
    seq_fn = tr.build_epoch_fn(LR, False, B)
    key = jax.random.PRNGKey(1)
    t_seq = chain_time(lambda s, x, k: seq_fn(s, x, k), st, (X, key))
    print(f"sequential epoch: {t_seq * 1e3:.2f} ms")

    for S in sizes:
        with jax.default_device(cpu):
            ps = [init_tadgan(jax.random.PRNGKey(0), signal_shape=W,
                              hyperbolic=False) for _ in range(S)]
            fst = fl.init_fleet_state(ps, lr=LR, hyperbolic=False)
        fst = jax.device_put(fst, dev)
        Xs = jax.device_put(
            jnp.asarray(np.stack([toy(N, W, s) for s in range(S)])), dev)
        keys = jnp.broadcast_to(key, (S,) + key.shape)
        fn = fl.build_fleet_epoch_fn(LR, False, B)
        t_f = chain_time(lambda s, x, k: fn(s, x, k), fst, (Xs, keys))
        print(f"fleet S={S:3d}: {t_f * 1e3:8.2f} ms/epoch  "
              f"{t_f / S * 1e3:7.3f} ms/signal-epoch  "
              f"speedup vs sequential: {t_seq * S / t_f:6.2f}x")


if __name__ == "__main__":
    main()
