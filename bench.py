"""HypAD-TPU benchmark — headline config: HypAD (hyperbolic) on Yahoo A1.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

value      = steady-state training epoch wall-clock (seconds) on the current
             default JAX backend (the TPU under the driver).

Every timed metric is the BEST of N_TIMED_REPS forced-completion
repetitions after one warm call, and extras["spread"] records each metric's
relative (max-min)/min band — tunnel variance at small N made single-shot
numbers drift up to 1.6x between rounds (VERDICT r3 item 6); two runs now
agree within the recorded spread or flag a real regression.
vs_baseline= speedup vs the PyTorch-CPU reference measured on this machine
             (aleflabo/HypAD @ /root/reference run via /tmp sandbox shims):
             2.247 s/epoch on Yahoo A1 hyperbolic, batch 64, lr 5e-4
             (recorded 2026-08-16; see BASELINE.md).

extras (all measured in the same run, full-framework coverage):
  eucl_epoch_s / eucl_vs_baseline — TadGAN euclidean epoch on NAB
             Twitter_volume_AAPL vs the 0.542 s reference baseline
  smap_epoch_s / smap_vs_baseline — HypAD epoch on the SMAP A-1 train split
             (2780 windows) vs the 11.4 s reference baseline
  fleet9_* — 9 hyperbolic models trained in ONE vmapped fleet program
             (train/fleet.py, `hypad sweep`): per-fleet-epoch and
             per-signal-epoch seconds, speedup vs 9 sequential fused
             epochs, and vs 9 reference (PyTorch-CPU) processes
  mv_one_call_rows_per_s — multivariate one-call detection throughput
             (50k x 51 SWAT-shaped rows, hyperbolic mult, scores-only);
             the _resident_ variant is the wired CLI path (rows staged on
             device once, no per-call upload)
  hyper_scoring_wps / eucl_dtw_scoring_wps — detection throughput
             (windows/sec) for the hyperbolic and euclidean-DTW scoring
             pipelines (reference: 392.6 / ~193 windows/s)
  detect_e2e_wps — END-TO-END detection (model forward + full scoring in
             one device program, scores-only / save_artifacts: false path)
             vs the same 392.6 w/s reference stage. Measured on the WIRED
             CLI path (windows staged on device once, round 3)
  detect_e2e_upload_wps — same program paying the host->device window
             upload every call (the upload dominates the warm path through
             the tunneled backend; pre-round-3 CLI behavior)
  detect_20k_wps — the wired one-call program at 20k windows (the PARITY
             warm-path-anatomy regime)
  detect_default_20k_wps — the REFERENCE-DEFAULT path (save_artifacts:
             true) at the same regime: one-call detection + sync D2H of
             the inference tensors + uncompressed .npz persistence. Bounded
             below by ~0.72 s of tunnel transfer physics (24 MB at
             ~35 MB/s) + ~1.3 s of 1-core disk write — the round-4 savez
             (was savez_compressed: 7.3 s of zlib) is the fix; async D2H
             measured SLOWER through the tunnel and was rejected
  detect_f16_20k_wps — same path with artifact_dtype: float16 (opt-in,
             halves the D2H bytes; documented divergence from the
             reference's f32 pickles)
  tunnel_d2h_mbps — raw D2H bandwidth on a 24 MB fetch: the measured
             physics floor that bounds every artifact-persisting path
  fleet9_detect_* — 9 ragged signals' detection (forward + full scoring)
             in ONE vmapped fleet program (`hypad sweep`'s detection path,
             detect/scorer.detect_scores_fleet), incl. per-call pad+upload;
             speedup vs 9 sequential one-call detections and vs reference.
             The _staged variant reuses a device-resident padded stack
             (sweep's unique-dataset path) — no per-call pad+upload.
             fleet81_detect_staged_wps is the same staged program at
             S=81 (the PROFILE.md scaling headline)
  pallas_ok / pallas_kde_tie_flips / pallas_mobius_maxdiff — on-chip
             equivalence of the hand-tiled Mosaic kernels vs their jnp
             references, re-proven on every bench run. mobius_linear_fused
             must match within 1e-6 (observed <=2e-9). The KDE argmax is
             value-exact except on density TIES, where Mosaic's reduction
             order can legitimately select a different sample point of the
             same row (observed: 1 row in 1419); pallas_ok requires every
             differing value to be a true sample of its row and <=0.5% of
             rows to differ.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_EPOCH_SECONDS = 2.247       # PyTorch-CPU reference, Yahoo A1 hyperbolic
REF_EUCL_EPOCH_SECONDS = 0.542  # PyTorch-CPU reference, NAB euclidean
REF_DETECT_WPS = 392.6          # PyTorch-CPU reference detection throughput
REF_SMAP_EPOCH_SECONDS = 11.4   # PyTorch-CPU reference, SMAP A-1 (2780 win)

N_TIMED_EPOCHS = 20
N_TIMED_REPS = 3

# relative spread ((max-min)/min over the N_TIMED_REPS timed repetitions) of
# every timed metric, keyed by its extras field name — accumulated during the
# run and emitted as extras["spread"] so two consecutive bench runs can be
# compared against measured variance instead of eyeballed (VERDICT r3 item 6)
SPREAD = {}


def _spread(ts):
    return round((max(ts) - min(ts)) / min(ts), 4)


def _rep_times(fn, force, n_reps=N_TIMED_REPS):
    """Shared timing protocol: one warm call (compile + remote fingerprint),
    then ``n_reps`` timed calls with forced completion (fetch a value —
    block_until_ready lies through the tunnel). Returns (best_seconds,
    relative spread, last_output) — asserts on the output must consume
    ``last_output`` rather than re-dispatching the program (an extra full
    call of a grid program is seconds of single-user chip time)."""
    out = fn()
    force(out)
    ts = []
    for _ in range(n_reps):
        t0 = time.time()
        out = fn()
        force(out)
        ts.append(time.time() - t0)
    return min(ts), _spread(ts), out


def _timed_epochs(tr, state, X, multi_fn, key):
    """Warm 20-epoch program; best-of-N forced-completion timing. The state
    advances across repetitions (shapes are static, so timing is unaffected)."""
    import jax

    holder = [state]

    def run():
        holder[0], m = multi_fn(holder[0], X, jax.random.fold_in(key, 0))
        return m

    best, spr, _ = _rep_times(run, lambda m: float(m["decoder_loss"][-1]))
    return holder[0], best / N_TIMED_EPOCHS, spr


def _train_bench(hyperbolic, csv, yahoo, interval, mesh, batch,
                 spread_key=None, fused_critics=False):
    import jax
    import jax.numpy as jnp

    from hypad_tpu.data.pipeline import load_signal_dataset
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import trainer as tr

    data = load_signal_dataset(csv, interval=interval, yahoo=yahoo)
    X = jnp.asarray(data.X)
    # init on host: building ~50 tiny tensors through the device tunnel is
    # ~30s of round-trips; one bulk transfer afterwards is milliseconds
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                             hyperbolic=hyperbolic)
        state = tr.init_train_state(params, lr=5e-4, hyperbolic=hyperbolic)
    state = jax.device_put(state, jax.devices()[0])
    multi_fn = tr.build_multi_epoch_fn(5e-4, hyperbolic, batch,
                                       N_TIMED_EPOCHS, mesh=mesh,
                                       fused_critics=fused_critics)
    state, epoch_s, spr = _timed_epochs(tr, state, X, multi_fn,
                                        jax.random.PRNGKey(1))
    if spread_key:
        SPREAD[spread_key] = spr
    return data, state, epoch_s


def _pallas_onchip_check(data, state):
    """On-chip jnp-vs-Pallas equivalence for both kernels (skipped -> None
    on non-TPU backends where compiled Mosaic is unavailable). Returns
    (ok, kde_tie_flips, mobius_maxdiff)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "TPU" not in jax.devices()[0].device_kind.upper():
        return None, None, None
    from hypad_tpu.detect.scorer import _critic_antidiag, run_inference
    from hypad_tpu.manifold.kernels import mobius_linear_fused
    from hypad_tpu.models.tadgan import mobius_linear
    from hypad_tpu.ops.kde import kde_argmax_rows
    from hypad_tpu.ops.kde_pallas import kde_argmax_rows_pallas

    # KDE: real critic anti-diagonals from the trained A1 model
    inf = run_inference(state.params, data.X, True)
    critic = jnp.asarray(inf.critic_score, jnp.float32)
    vals, mask = jax.jit(_critic_antidiag, static_argnums=(1, 2))(
        critic, len(critic), data.X.shape[1])
    kde_jnp = np.asarray(jax.jit(kde_argmax_rows)(vals, mask))
    v = np.asarray(vals)
    m = np.asarray(mask)

    def check_version(ver):
        kde_pl = np.asarray(jax.jit(
            lambda a, b: kde_argmax_rows_pallas(a, b, version=ver))(
                vals, mask))
        diff_rows = np.nonzero(kde_jnp != kde_pl)[0]
        # a differing value is only acceptable if it is a true sample point
        # of its row (a density-tie flipped by reduction order)
        legit = all(kde_pl[i] in v[i][m[i]] for i in diff_rows)
        ok = legit and len(diff_rows) <= max(1, int(0.005 * len(kde_jnp)))
        return ok, len(diff_rows), legit

    v1_ok, v1_flips, v1_legit = check_version("v1")
    v2_ok, v2_flips, v2_legit = check_version("v2")
    kde_ok = v1_ok and v2_ok
    legit = v1_legit and v2_legit

    # MobiusLinear: ball embedding of the real test windows
    p = state.params["decoder"]["hyperbolic_linear"]
    x = jnp.asarray(data.X[:512], jnp.float32)
    ml_jnp = np.asarray(jax.jit(mobius_linear)(p, x))
    ml_pl = np.asarray(jax.jit(mobius_linear_fused)(p, x))
    ml_maxdiff = float(np.abs(ml_jnp - ml_pl).max())
    ml_ok = ml_maxdiff <= 1e-6

    if not (kde_ok and ml_ok):
        print(f"[bench] PALLAS MISMATCH kde_ok={kde_ok} "
              f"(v1 {v1_flips} / v2 {v2_flips} rows, legit_ties={legit}) "
              f"mobius_ok={ml_ok} (maxdiff {ml_maxdiff})",
              file=sys.stderr)
    return bool(kde_ok and ml_ok), int(max(v1_flips, v2_flips)), ml_maxdiff


def _throughput(fn, n, spread_key=None, n_reps=None):
    """Best-of-N windows/sec with forced completion; records the relative
    spread under ``spread_key`` in the global SPREAD table. ``n_reps``
    overrides the default rep count for fields whose round-4 spread
    exceeded 40% (tunnel/1-core-host variance needs more samples)."""
    best, spr, _ = _rep_times(fn, lambda out: float(out[-1]),
                              **({} if n_reps is None
                                 else {"n_reps": n_reps}))
    if spread_key:
        SPREAD[spread_key] = spr
    return n / best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypad_tpu.detect import scorer as sc
    from hypad_tpu.parallel.mesh import batch_multiple, make_mesh

    data_root = os.environ.get("HYPAD_DATA", "/root/reference/data")
    mesh = make_mesh("all")
    batch = batch_multiple(64, mesh)
    dev0 = jax.devices()[0]

    # ---- headline: hyperbolic Yahoo A1 training epoch
    a1_csv = os.path.join(data_root, "YAHOO", "A1Benchmark", "real_1.csv")
    data, state, epoch_s = _train_bench(True, a1_csv, True, 1, mesh, batch,
                                        spread_key="a1_hyper_epoch")

    # ---- the same epoch with the critic-step megakernel opt-in
    # (fused_critics: "full" — train/critic_kernel.py): whole critic-step
    # body in ONE Pallas kernel; numerically equivalent, not bitwise
    _, _, mega_epoch_s = _train_bench(True, a1_csv, True, 1, mesh, batch,
                                      spread_key="megakernel_epoch_s",
                                      fused_critics="full")

    # ---- euclidean NAB training epoch (the other half of the framework)
    nab_csv = os.path.join(data_root, "Twitter_volume_AAPL.csv")
    eucl_data, eucl_state, eucl_epoch_s = _train_bench(
        False, nab_csv, False, 21600, mesh, batch,
        spread_key="eucl_epoch_s")

    # ---- fleet: 9 hyperbolic models trained in ONE vmapped program
    # (train/fleet.py) on the same A1-sized windows; signal-epoch cost and
    # family-sweep speedup vs 9 sequential fused epochs
    from hypad_tpu.models.tadgan import init_tadgan as _init
    from hypad_tpu.train import fleet as fl

    S = 9
    with jax.default_device(jax.devices("cpu")[0]):
        fstate = fl.init_fleet_state(
            [_init(jax.random.PRNGKey(i), signal_shape=100, hyperbolic=True)
             for i in range(S)], lr=5e-4, hyperbolic=True)
    fstate = jax.device_put(fstate, dev0)
    Xs = jax.device_put(jnp.broadcast_to(
        jnp.asarray(data.X, jnp.float32),
        (S,) + data.X.shape).copy(), dev0)
    fleet_multi = fl.build_fleet_multi_epoch_fn(5e-4, True, batch,
                                                N_TIMED_EPOCHS)
    fkey = jax.random.PRNGKey(5)
    fholder = [fstate]

    def _fleet_run():
        fholder[0], fm = fleet_multi(fholder[0], Xs, jax.random.fold_in(
            fkey, 0))
        return fm

    best, SPREAD["fleet9_epoch_s"], _ = _rep_times(
        _fleet_run, lambda fm: float(jnp.sum(fm["decoder_loss"][-1])))
    fleet_epoch_s = best / N_TIMED_EPOCHS
    del fholder, fstate, Xs

    # ---- scoring throughput, hyperbolic pipeline (mesh-sharded when >1 dev)
    inf = sc.run_inference(state.params, data.X, True, mesh=mesh)
    hyper_wps = _throughput(
        lambda: sc.score_anomalies_hyperbolic(inf, "uncertainty", mesh=mesh),
        len(data.X), spread_key="hyper_scoring_wps", n_reps=7)

    # ---- end-to-end detection throughput: ONE program (forward + full
    # scoring), scores-only so the inference-tensor transfer is DCE'd —
    # the save_artifacts: false fast path (reference: ~392.6 w/s for the
    # same forward+score stage, anomaly_detection.py:46-113 + host scoring).
    # detect_e2e_wps measures THE WIRED CLI PATH (round 3): the detector
    # stages windows on device once (detect/detector.py) and scores the
    # resident array; detect_e2e_upload_wps is the same program paying the
    # host->device upload every call (pre-round-3 CLI behavior). A
    # committed-device input is a different sharding than an uncommitted
    # numpy upload -> separate executable; _throughput warms each.
    def detect(x, multivariate=False, p=None):
        return sc.detect_scores(p or state.params, x, True,
                                "mult" if multivariate else "uncertainty",
                                mesh=mesh, fetch_inference=False,
                                multivariate=multivariate)[0]

    X_dev = jax.device_put(jnp.asarray(data.X, jnp.float32), dev0)
    detect_e2e_wps = _throughput(lambda: detect(X_dev), len(data.X),
                                 spread_key="detect_e2e_wps")
    detect_upload_wps = _throughput(lambda: detect(data.X), len(data.X),
                                    spread_key="detect_e2e_upload_wps")

    # ---- grid detection: the full euclidean (rec_error x combination)
    # grid — 3 x 4 = 12 cells, the reference's README-documented detection
    # sweep (one anomaly_detection.py re-run per cell) — scored from ONE
    # traced program on device-resident NAB windows (detect_scores_grid;
    # the `detect --rec-errors ... --combinations all` CLI path)
    from hypad_tpu.detect.scorer import EUCL_COMBOS, detect_scores_grid

    Xe_dev = jax.device_put(jnp.asarray(eucl_data.X, jnp.float32), dev0)

    def grid():
        return detect_scores_grid(eucl_state.params, Xe_dev, False,
                                  EUCL_COMBOS,
                                  rec_errors=("point", "area", "dtw"),
                                  mesh=mesh)

    # device_get inside the grid call forces completion of every cell
    grid12_s, SPREAD["grid12_detect_s"], grid_out = _rep_times(
        grid, lambda o: None)
    assert len(grid_out) == 12
    del grid_out

    # the 20k-window regime (PARITY.md warm-path anatomy row), wired path
    rng = np.random.default_rng(3)
    X20 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (20_000, 100)).astype(np.float32)), dev0)
    detect_20k_wps = _throughput(lambda: detect(X20), len(X20),
                                 spread_key="detect_20k_wps")

    # the REFERENCE-DEFAULT detection path (save_artifacts: true) at the
    # same regime: fetch the inference tensors (sync D2H of ~24 MB through
    # the ~35 MB/s tunnel, measured 0.72 s — copy_to_host_async measured
    # SLOWER through the tunnel, 1.2 s, so the fetch stays sync) and
    # persist them (np.savez, round 4 — savez_compressed was 7.3 s of
    # 1-core zlib, the single largest cost of this path)
    import tempfile

    from hypad_tpu.utils import artifacts as _art

    _artdir = tempfile.mkdtemp(prefix="bench_art_")

    def detect_default():
        scores, inf = sc.detect_scores(state.params, X20, True,
                                       "uncertainty", mesh=mesh,
                                       fetch_inference=True)
        _art.save_inference(_artdir, inf, np.arange(len(X20) + 100))
        return scores

    detect_default_20k_wps = _throughput(
        detect_default, len(X20), spread_key="detect_default_20k_wps",
        n_reps=7)

    # raw tunnel D2H bandwidth at the artifact-set size — the denominator
    # of the detect_default proof: bytes / bandwidth is the hard floor of
    # any artifact-persisting path, independent of what the program computes.
    # A FRESH device array is fetched each rep: jax.Array caches its host
    # copy after the first np.asarray, so re-fetching the same array times
    # the cache (measured 8e6 "MB/s"), not the tunnel
    _probe = jax.device_put(jnp.zeros((6 * 1024 * 1024,), jnp.float32), dev0)
    _probe_mb = _probe.size * 4 / 1e6
    _ctr = [0.0]

    def _fresh_fetch():
        _ctr[0] += 1.0
        return np.asarray(_probe + _ctr[0])

    _d2h_s, SPREAD["tunnel_d2h_mbps"], _ = _rep_times(
        _fresh_fetch, lambda a: None, n_reps=5)
    tunnel_d2h_mbps = _probe_mb / _d2h_s
    del _probe

    # the float16 artifact opt-in (utils/config.py artifact_dtype; halves
    # the D2H bytes, documented divergence from the reference's f32 pickles)
    _artdir16 = tempfile.mkdtemp(prefix="bench_art16_")

    def detect_f16():
        scores, inf = sc.detect_scores(state.params, X20, True,
                                       "uncertainty", mesh=mesh,
                                       fetch_inference=True,
                                       artifact_dtype="float16")
        _art.save_inference(_artdir16, inf, np.arange(len(X20) + 100))
        return scores

    detect_f16_20k_wps = _throughput(
        detect_f16, len(X20), spread_key="detect_f16_20k_wps", n_reps=7)

    # cached re-scoring (`load: true`): artifacts staged on device ONCE
    # (scorer.stage_inference), then the fused scoring program runs
    # device-resident — the detector.py params.load path (round 5; the
    # round-4 upload-paying staged path measured ~21-28k w/s)
    inf20, idx20 = _art.load_inference(_artdir)
    inf20_dev = sc.stage_inference(inf20)
    rescore_resident_20k_wps = _throughput(
        lambda: sc.score_anomalies_hyperbolic(inf20_dev, "uncertainty",
                                              mesh=mesh),
        len(X20), spread_key="rescore_resident_20k_wps")
    del inf20, idx20

    # euclidean-DTW end-to-end detection at the same 20k-window regime —
    # the anti-diagonal DTW (ops/dtw.py, round 4) moved the dtw column from
    # ~19x slower than point to pipeline parity; the small-N
    # eucl_dtw_scoring_wps metric below is tunnel-floor-bound (~24 ms
    # round-trip at n=1320) and can't show it
    eucl_dtw_detect_20k_wps = _throughput(
        lambda: sc.detect_scores(eucl_state.params, X20, False, "mult",
                                 rec_error="dtw", mesh=mesh,
                                 fetch_inference=False)[0],
        len(X20), spread_key="eucl_dtw_detect_20k_wps")

    # ---- fleet detection: 9 signals' forward + FULL scoring in ONE
    # vmapped program (detect/scorer.detect_scores_fleet — the `sweep`
    # subcommand's detection path). Deliberately ragged (A1 size minus
    # 0..8 windows) so the measured program is the real padded/masked one;
    # timing includes the host pad_and_stack + window upload every call,
    # exactly what `hypad sweep` pays.
    fleet_X = [np.asarray(data.X[: len(data.X) - i], np.float32)
               for i in range(9)]
    fd_params = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * 9), state.params)
    n_fleet_win = sum(len(x) for x in fleet_X)
    fleet_detect_wps = _throughput(
        lambda: sc.detect_scores_fleet(fd_params, fleet_X, True,
                                       "uncertainty")[-1], n_fleet_win,
        spread_key="fleet9_detect_wps")
    # staged variant: the `sweep` path for unique-dataset families — the
    # trainer's device-resident padded stack is reused, no per-call
    # pad+upload (train_fleet return_staged= -> detect_scores_fleet staged=)
    fXs, fn_real = fl.pad_and_stack(fleet_X)
    fleet_staged = (jax.device_put(jnp.asarray(fXs), dev0), fn_real)
    fleet_detect_staged_wps = _throughput(
        lambda: sc.detect_scores_fleet(fd_params, fleet_X, True,
                                       "uncertainty",
                                       staged=fleet_staged)[-1], n_fleet_win,
        spread_key="fleet9_detect_staged_wps")
    # exact-shape twin (canonical=False): side-by-side accounting of the
    # canonical-bucket pad cost on the default path (VERDICT r4 item 1b)
    fleet_detect_staged_exact_wps = _throughput(
        lambda: sc.detect_scores_fleet(fd_params, fleet_X, True,
                                       "uncertainty", staged=fleet_staged,
                                       canonical=False)[-1], n_fleet_win,
        spread_key="fleet9_detect_staged_exact_wps")

    # fleet x grid: 9 signals x 12 euclidean cells (108 detection cells) in
    # ONE vmapped program on the staged stack — the `sweep --rec-errors ...
    # --combinations all` path (PARITY.md "Family-wide grid study")
    from hypad_tpu.detect.scorer import detect_scores_fleet_grid
    from hypad_tpu.models.tadgan import init_tadgan as _init_g

    with jax.default_device(jax.devices("cpu")[0]):
        eg_params = _init_g(jax.random.PRNGKey(4), signal_shape=100,
                            hyperbolic=False)
    eg_params = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.stack([np.asarray(x)] * 9), eg_params), dev0)

    def fleet_grid():
        return detect_scores_fleet_grid(
            eg_params, fleet_X, False, EUCL_COMBOS,
            rec_errors=("point", "area", "dtw"), staged=fleet_staged)

    fleet_grid108_s, SPREAD["fleet9_grid108_detect_s"], out = _rep_times(
        fleet_grid, lambda o: None)
    assert len(out) == 9 and len(out[0]) == 12
    del out, eg_params

    # 81-model fleet detection on the staged stack — the scaling headline
    # (PROFILE.md "Fleet scaling": the vmapped program stays ~flat in S,
    # ~1.8M windows/s aggregate on one chip)
    S81 = 81
    fleet81_X = [np.asarray(data.X[: len(data.X) - (i % 3)], np.float32)
                 for i in range(S81)]
    fd81_params = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S81,) + x.shape), state.params)
    f81Xs, f81n = fl.pad_and_stack(fleet81_X)
    fleet81_staged = (jax.device_put(jnp.asarray(f81Xs), dev0), f81n)
    n81_win = sum(len(x) for x in fleet81_X)
    fleet81_detect_staged_wps = _throughput(
        lambda: sc.detect_scores_fleet(fd81_params, fleet81_X, True,
                                       "uncertainty",
                                       staged=fleet81_staged)[-1],
        n81_win, spread_key="fleet81_detect_staged_wps")
    fleet81_detect_staged_exact_wps = _throughput(
        lambda: sc.detect_scores_fleet(fd81_params, fleet81_X, True,
                                       "uncertainty", staged=fleet81_staged,
                                       canonical=False)[-1],
        n81_win, spread_key="fleet81_detect_staged_exact_wps")
    del fleet81_staged, fd81_params

    # ---- SMAP A-1 hyperbolic epoch (separate train split, 2780 windows —
    # the second PARITY headline; driver-reproducible per VERDICT r2 item 4)
    smap_csv = os.path.join(data_root, "A-1-train.csv")
    _, _, smap_epoch_s = _train_bench(True, smap_csv, False, 21600, mesh,
                                      batch, spread_key="smap_epoch_s")

    # ---- multivariate one-call detection throughput (SWAT-shaped 50k x 51,
    # hyperbolic mult, scores-only): the PARITY.md 150.5k rows/s row, plus
    # the wired CLI variant (rows staged on device once, detect/detector.py)
    from hypad_tpu.models.tadgan import init_tadgan

    mv_X = np.random.default_rng(0).uniform(
        -1, 1, (50_000, 51)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        mv_params = init_tadgan(jax.random.PRNGKey(2), signal_shape=51,
                                hyperbolic=True)
    mv_params = jax.device_put(mv_params, dev0)
    mv_rows_per_s = _throughput(
        lambda: detect(mv_X, multivariate=True, p=mv_params), len(mv_X),
        spread_key="mv_one_call_rows_per_s")
    mv_X_dev = jax.device_put(jnp.asarray(mv_X), dev0)
    mv_resident_rows_per_s = _throughput(
        lambda: detect(mv_X_dev, multivariate=True, p=mv_params), len(mv_X),
        spread_key="mv_one_call_resident_rows_per_s")

    # ---- scoring throughput, euclidean-DTW pipeline
    eucl_wps = _throughput(
        lambda: sc.score_anomalies_euclidean(
            data.X, inf.eucl_recons, inf.critic_score, "dtw", "mult",
            mesh=mesh),
        len(data.X), spread_key="eucl_dtw_scoring_wps")

    # ---- on-chip Pallas validation
    pallas_ok, kde_flips, ml_maxdiff = _pallas_onchip_check(data, state)

    print(
        f"[bench] devices={jax.device_count()} epoch={epoch_s:.4f}s "
        f"eucl_epoch={eucl_epoch_s:.4f}s smap_epoch={smap_epoch_s:.4f}s "
        f"megakernel_epoch={mega_epoch_s:.4f}s "
        f"mv_one_call={mv_rows_per_s:.0f}rows/s "
        f"mv_resident={mv_resident_rows_per_s:.0f}rows/s "
        f"hyper_scoring={hyper_wps:.0f}w/s "
        f"detect_e2e={detect_e2e_wps:.0f}w/s "
        f"detect_upload={detect_upload_wps:.0f}w/s "
        f"detect_20k={detect_20k_wps:.0f}w/s "
        f"detect_default_20k={detect_default_20k_wps:.0f}w/s "
        f"detect_f16_20k={detect_f16_20k_wps:.0f}w/s "
        f"tunnel_d2h={tunnel_d2h_mbps:.1f}MB/s "
        f"grid12={grid12_s:.4f}s "
        f"fleet9_detect={fleet_detect_wps:.0f}w/s "
        f"fleet9_detect_staged={fleet_detect_staged_wps:.0f}w/s "
        f"fleet9_grid108={fleet_grid108_s:.4f}s "
        f"fleet81_detect_staged={fleet81_detect_staged_wps:.0f}w/s "
        f"fleet81_detect_staged_exact={fleet81_detect_staged_exact_wps:.0f}w/s "
        f"eucl_dtw_scoring={eucl_wps:.0f}w/s pallas_ok={pallas_ok} "
        f"(kde_tie_flips={kde_flips}, mobius_maxdiff={ml_maxdiff})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "a1_hyper_epoch_wall_clock",
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(REF_EPOCH_SECONDS / epoch_s, 2),
        "extras": {
            "megakernel_epoch_s": round(mega_epoch_s, 4),
            "megakernel_vs_baseline": round(REF_EPOCH_SECONDS / mega_epoch_s,
                                            2),
            "eucl_epoch_s": round(eucl_epoch_s, 4),
            "eucl_vs_baseline": round(REF_EUCL_EPOCH_SECONDS / eucl_epoch_s,
                                      2),
            "smap_epoch_s": round(smap_epoch_s, 4),
            "smap_vs_baseline": round(REF_SMAP_EPOCH_SECONDS / smap_epoch_s,
                                      2),
            "fleet9_epoch_s": round(fleet_epoch_s, 4),
            "fleet9_signal_epoch_s": round(fleet_epoch_s / 9, 5),
            "fleet9_speedup_vs_sequential": round(
                epoch_s * 9 / fleet_epoch_s, 2),
            "fleet9_vs_baseline": round(
                REF_EPOCH_SECONDS * 9 / fleet_epoch_s, 2),
            "mv_one_call_rows_per_s": round(mv_rows_per_s),
            "mv_one_call_resident_rows_per_s": round(mv_resident_rows_per_s),
            "hyper_scoring_wps": round(hyper_wps),
            "detect_e2e_wps": round(detect_e2e_wps),
            "detect_e2e_vs_baseline": round(detect_e2e_wps / REF_DETECT_WPS,
                                            2),
            "detect_e2e_upload_wps": round(detect_upload_wps),
            "detect_20k_wps": round(detect_20k_wps),
            "detect_default_20k_wps": round(detect_default_20k_wps),
            "detect_f16_20k_wps": round(detect_f16_20k_wps),
            "tunnel_d2h_mbps": round(tunnel_d2h_mbps, 1),
            "rescore_resident_20k_wps": round(rescore_resident_20k_wps),
            "eucl_dtw_detect_20k_wps": round(eucl_dtw_detect_20k_wps),
            "grid12_detect_s": round(grid12_s, 4),
            "grid12_cells_per_s": round(12 / grid12_s, 2),
            "fleet9_detect_wps": round(fleet_detect_wps),
            "fleet9_detect_staged_wps": round(fleet_detect_staged_wps),
            "fleet9_detect_staged_exact_wps": round(
                fleet_detect_staged_exact_wps),
            "fleet9_grid108_detect_s": round(fleet_grid108_s, 4),
            "fleet9_grid108_cells_per_s": round(108 / fleet_grid108_s, 1),
            "fleet81_detect_staged_wps": round(fleet81_detect_staged_wps),
            "fleet81_detect_staged_exact_wps": round(
                fleet81_detect_staged_exact_wps),
            # like-for-like regimes: the upload-paying fleet vs 9 sequential
            # upload-paying one-calls; the staged fleet vs 9 sequential
            # device-resident one-calls
            "fleet9_detect_speedup_vs_sequential": round(
                fleet_detect_wps / detect_upload_wps, 2),
            "fleet9_detect_staged_speedup_vs_sequential": round(
                fleet_detect_staged_wps / detect_e2e_wps, 2),
            "fleet9_detect_vs_baseline": round(
                fleet_detect_wps / REF_DETECT_WPS, 2),
            "eucl_dtw_scoring_wps": round(eucl_wps),
            "ref_scoring_wps": REF_DETECT_WPS,
            "pallas_ok": pallas_ok,
            "pallas_kde_tie_flips": kde_flips,
            "pallas_mobius_maxdiff": ml_maxdiff,
            # relative (max-min)/min over the N_TIMED_REPS repetitions of
            # each timed metric; consecutive bench runs should agree within
            # these bands (metrics not listed are derived ratios)
            "timing_reps": N_TIMED_REPS,
            "spread": dict(sorted(SPREAD.items())),
        },
    }))


if __name__ == "__main__":
    main()
