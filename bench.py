"""HypAD-TPU benchmark — headline config: HypAD (hyperbolic) on Yahoo A1.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value      = steady-state training epoch wall-clock (seconds) on the current
             default JAX backend (the TPU under the driver).
vs_baseline= speedup vs the PyTorch-CPU reference measured on this machine
             (aleflabo/HypAD @ /root/reference run via /tmp sandbox shims):
             2.247 s/epoch on Yahoo A1 hyperbolic, batch 64, lr 5e-4
             (recorded 2026-08-16; see BASELINE.md).

Also reports detection throughput (windows/sec) on stderr for the record.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_EPOCH_SECONDS = 2.247       # PyTorch-CPU reference, Yahoo A1 hyperbolic
REF_DETECT_WPS = 392.6          # PyTorch-CPU reference detection throughput

N_TIMED_EPOCHS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypad_tpu.data.pipeline import load_signal_dataset
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.parallel.mesh import batch_multiple, make_mesh
    from hypad_tpu.train import trainer as tr
    from hypad_tpu.detect import scorer as sc

    data_root = os.environ.get("HYPAD_DATA", "/root/reference/data")
    csv = os.path.join(data_root, "YAHOO", "A1Benchmark", "real_1.csv")
    data = load_signal_dataset(csv, interval=1, yahoo=True)
    X = jnp.asarray(data.X)

    mesh = make_mesh("all")
    # init on host: building ~50 tiny tensors through the device tunnel is
    # ~30s of round-trips; one bulk transfer afterwards is milliseconds
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                             hyperbolic=True)
        state = tr.init_train_state(params, lr=5e-4, hyperbolic=True)
    state = jax.device_put(state, jax.devices()[0])
    # production configuration: N epochs fused into one device program;
    # batch rounded to a dp-divisible size (64 on a single chip)
    batch = batch_multiple(64, mesh)
    multi_fn = tr.build_multi_epoch_fn(5e-4, True, batch, N_TIMED_EPOCHS,
                                       mesh=mesh)

    # warmup / compile; fetching a metric VALUE forces real completion
    # (block_until_ready alone can return early on tunneled backends)
    key = jax.random.PRNGKey(1)
    state, m = multi_fn(state, X, jax.random.fold_in(key, 1000))
    float(m["decoder_loss"][-1])

    t0 = time.time()
    state, m = multi_fn(state, X, jax.random.fold_in(key, 0))
    final_loss = float(m["decoder_loss"][-1])
    epoch_s = (time.time() - t0) / N_TIMED_EPOCHS

    # detection throughput (scoring pipeline, warm)
    inf = sc.run_inference(state.params, data.X, True)
    sc.score_anomalies_hyperbolic(inf, "uncertainty")  # compile warmup
    t0 = time.time()
    scores = sc.score_anomalies_hyperbolic(inf, "uncertainty")
    det_s = time.time() - t0
    wps = len(data.X) / det_s

    print(
        f"[bench] devices={jax.device_count()} epoch={epoch_s:.4f}s "
        f"detect={det_s:.3f}s ({wps:.0f} windows/s, ref {REF_DETECT_WPS})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "a1_hyper_epoch_wall_clock",
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(REF_EPOCH_SECONDS / epoch_s, 2),
    }))


if __name__ == "__main__":
    main()
