"""CLI entry points (layer L6).

Mirrors the reference surface:
  * ``python -m hypad_tpu.cli train  --config cfg.yaml``  == reference
    ``python main.py --config cfg.yaml`` (train + detect, main.py:14-70)
  * ``python -m hypad_tpu.cli detect --config cfg.yaml``  == reference
    ``python anomaly_detection.py --config cfg.yaml`` (detect from saved
    checkpoints, anomaly_detection.py:158-243; supports ``resume`` /
    ``resume_epoch`` to score a specific epoch's checkpoint)
  * invoking without a subcommand behaves like ``train`` (the reference's
    single-entry style).
  * ``detect --rec-errors point,dtw --combinations mult,sum`` (or
    ``--combinations all``) — grid detection: every (rec_error x
    combination) cell scored from ONE device program
    (detect/scorer.detect_scores_grid) with per-cell metrics and a
    ``grid_results.csv`` in the run dir; the TPU-native form of the
    reference's README-documented detection sweep (reference
    README.md:87-89, one ``anomaly_detection.py`` re-run per cell).
  * ``python -m hypad_tpu.cli sweep --config cfg.yaml [--signals a,b,c]
    [--seeds 0,1,2]`` — capability extension with no reference
    equivalent: trains a whole signal family (and/or a seed band; both =
    the cross product) in ONE vmapped fleet program (train/fleet.py),
    scores it in ONE vmapped fleet detection program (detect/scorer), and
    writes per-run results into the same run dirs per-signal ``train``
    runs would use. ``--detect-only`` re-scores a trained family from its
    checkpoints without retraining; ``--rec-errors``/``--combinations``
    switch the family to GRID detection — every signal x every cell in one
    vmapped program (detect/scorer.detect_scores_fleet_grid) with a
    ``sweep_grid.csv`` family table and per-cell mean f1 ranking.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax


def _build(params):
    from hypad_tpu.data.registry import dataset_selection
    from hypad_tpu.utils.config import run_dir

    path = run_dir(params)
    train_data, test_data, read_path = dataset_selection(
        params, cache_dir=path)
    return train_data, test_data, read_path, path


def _init_models(params):
    from hypad_tpu.models.tadgan import init_tadgan

    # init on host: tiny-tensor construction through a remote-device tunnel
    # costs seconds of round-trips; bulk-transfer the finished pytree later
    with jax.default_device(jax.devices("cpu")[0]):
        return init_tadgan(jax.random.PRNGKey(params.seed),
                           signal_shape=params.signal_shape,
                           hyperbolic=params.hyperbolic)


def cmd_train(params, config_path):
    from hypad_tpu.parallel.mesh import make_mesh
    from hypad_tpu.train import trainer as tr
    from hypad_tpu.utils import checkpoint as ck

    train_data, test_data, read_path, path = _build(params)
    ck.snapshot_config(path, config_path)

    mesh = make_mesh(params.devices)
    from hypad_tpu.parallel.mesh import batch_multiple

    # round the batch down to a dp-divisible size so XLA shards evenly
    # (the reference's drop_last already trims ragged batches)
    batch_size = batch_multiple(params.batch_size, mesh)
    model_params = _init_models(params)
    with jax.default_device(jax.devices("cpu")[0]):
        state = tr.init_train_state(model_params, lr=params.lr,
                                    hyperbolic=params.hyperbolic)

    def put(st):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(st, NamedSharding(mesh, PartitionSpec()))
        return jax.device_put(st, jax.devices()[0])

    state = put(state)

    start_epoch = 0
    if params.resume:
        # working resume (the reference's is a NameError, train.py:400-404);
        # the restored host state needs the same replicated placement as the
        # fresh one (restore_state returns host numpy arrays)
        tag = ck.latest_epoch_tag(path)
        if tag is not None:
            state = put(ck.restore_state(path, tag))
            start_epoch = tag
            print(f"resumed from epoch {tag}")

    from hypad_tpu.utils.profiling import MetricsLogger, stage

    log_cb = MetricsLogger(path=os.path.join(path, "train_log.jsonl"),
                           hyperbolic=params.hyperbolic)

    # stage the training windows on device ONCE; for unique_dataset/Yahoo
    # runs (test is train, data/registry.py) detection reuses the same
    # resident array instead of re-uploading it (the dominant warm-path
    # cost through a tunneled backend — see detect/detector.py)
    import jax.numpy as jnp
    import numpy as np

    X_dev = jnp.asarray(np.asarray(train_data.X, np.float32))
    train_data.X_device = X_dev
    if test_data is train_data or test_data.X is train_data.X:
        test_data.X_device = X_dev

    t0 = time.time()
    with stage("train"):
        state = tr.train_tadgan(
            state, X_dev, lr=params.lr, hyperbolic=params.hyperbolic,
            batch_size=batch_size, n_epochs=params.epochs,
            seed=params.seed, mesh=mesh, start_epoch=start_epoch,
            log_cb=log_cb,
            checkpoint_cb=lambda e, s: ck.save_state(path, s, e),
            fused_critics=getattr(params, "fused_critics", False),
        )
    wall = time.time() - t0
    trained = max(params.epochs - start_epoch, 1)
    print(f"training wall-clock: {wall:.2f}s "
          f"({wall / trained:.3f}s/epoch)")
    ck.save_state(path, state, "final")

    _run_detection(params, state.params, test_data, path, read_path,
                   mesh=mesh)
    return state, path


def _run_detection(params, model_params, test_data, path, read_path,
                   mesh=None, precomputed_scores=None):
    from hypad_tpu.detect.detector import detect
    from hypad_tpu.utils.profiling import stage

    t0 = time.time()
    with stage("detect"):
        result = detect(params, model_params, test_data, path,
                        read_path=read_path, mesh=mesh,
                        save_plots=getattr(params, "save_plots", None),
                        precomputed_scores=precomputed_scores)
    wall = time.time() - t0
    n_windows = len(test_data.X)
    print(f"detection wall-clock: {wall:.2f}s "
          f"({n_windows / wall:.1f} windows/sec)")
    if result["metrics"] is None:
        print("no anomalous intervals predicted (or no ground truth)")
    return result


def cmd_sweep(params, config_path, signals=None, seeds=None,
              detect_only=False, rec_errors=None, combinations=None,
              canonical=False):
    """Train + detect a whole signal family in ONE fused fleet program.

    Capability extension over the reference (which re-runs ``train.py`` per
    signal, main.py:14-70): all signals' models train together in a single
    vmapped XLA program (train/fleet.py), and detection likewise runs as
    ONE vmapped fleet program (detect/scorer.detect_scores_fleet) before
    each signal's host epilogue (intervals, metrics, results CSV) lands in
    its own run dir — checkpoints, config snapshots, and results CSV rows
    go exactly where per-signal ``train`` runs would put them, so
    ``detect``/resume re-enter unchanged per signal. Sweep detection is
    scores-only (no inference-artifact persistence); ``load: true`` configs
    fall back to the per-signal cached path.

    ``detect_only=True`` (CLI ``--detect-only``) skips training and
    restores each pair's saved checkpoint from its run dir instead (tag =
    ``resume_epoch`` when ``resume: true``, else ``final`` — the
    reference's detect-only entry semantics, anomaly_detection.py:211-222),
    then runs the SAME one-program fleet detection + per-signal epilogues.
    The family-scale twin of ``detect``: re-score a trained family under a
    new ``combination``/``rec_error`` without retraining or per-signal
    re-compiles.

    ``rec_errors``/``combinations`` (CLI ``--rec-errors``/
    ``--combinations``) switch the detection side to GRID mode: every
    signal x every (rec_error x combination) cell in ONE vmapped program
    (scorer.detect_scores_fleet_grid) — family-level model selection in one
    compile. Each run dir gets its per-cell ``grid_results.csv``; the
    family table lands in ``sweep_grid.csv`` and the per-cell family mean
    f1 is printed best-first. Composes with ``--detect-only`` (grid-rescore
    a trained family without retraining) and ``--seeds``.

    Signals come from a ``signals: [...]`` list in the config or the
    ``--signals a,b,c`` flag. ``--seeds 0,1,2`` (or a ``seeds: [...]``
    config list) trains the config's ONE signal as a SEED BAND — S
    replicas with per-signal key streams identical to S sequential
    ``train`` runs at those seeds (the PARITY.md seed-band protocol in
    one program; bitwise == sequential on CPU, statistically equivalent
    on TPU — train_fleet docstring); run dirs are nested under
    ``seed_{k}/``. Giving BOTH trains the full signals x seeds CROSS
    PRODUCT in one fleet program (the multi-seed family-aggregate
    protocol behind PARITY.md's A3/A4 tables: 8 signals x 3 seeds = 24
    models, one program). A --seeds flag with only a config ``signals:``
    list is a band of the config's signal (the list is ignored).

    ``canonical=True`` (CLI ``--canonical``) trains the fleet at canonical
    bucket shapes (train/fleet.py ``canonical``) so back-to-back family
    sweeps reuse each other's compiled training programs via the remote
    fingerprint cache; it forces the ragged RNG stream (per-signal results
    are distribution-equivalent, not bitwise, to non-canonical runs — do
    not combine with seed-band bitwise protocols). Fleet DETECTION always
    runs at canonical shapes (value-equivalent; scorer default).

    Returns one ``(signal, seed, f1)`` tuple per trained pair in pair
    order (grid mode: ``(signal, seed, {(rec_error, comb): result})``);
    ``seed`` is the effective per-run seed, so study drivers can verify
    their (signal, seed) alignment instead of trusting the pair ordering.
    """
    import argparse as ap
    import copy

    import numpy as np

    from hypad_tpu.parallel.mesh import make_mesh
    from hypad_tpu.train import fleet as fl
    from hypad_tpu.utils import checkpoint as ck
    from hypad_tpu.utils.profiling import stage

    explicit_signals = signals
    seeds = seeds if seeds is not None else getattr(params, "seeds", None)
    if seeds is not None and explicit_signals:
        # cross product: every (signal, seed) pair trains as one fleet
        # entry in a single program
        pairs = [(sig, int(sd)) for sig in explicit_signals for sd in seeds]
    elif seeds is not None:
        # a seed band trains the config's ONE signal; a `signals:` list in
        # the config is ignored
        pairs = [(params.signal, int(sd)) for sd in seeds]
    else:
        signals = signals or getattr(params, "signals", None)
        if not signals:
            raise SystemExit("sweep needs a `signals:` list in the config, "
                             "--signals a,b,c, or --seeds 0,1,2")
        pairs = [(sig, None) for sig in signals]

    # multivariate family sweeps (e.g. every CASAS resident) run the same
    # one-program fleet paths with the mv scoring tail (detector dispatch
    # semantics: signal == 'multivariate' or an mv dataset family)
    from hypad_tpu.data.registry import MULTIVARIATE_DATASETS

    is_mv = (params.signal == "multivariate"
             or params.dataset in MULTIVARIATE_DATASETS)
    if getattr(params, "save_artifacts", True) and not params.load:
        print("sweep detection is scores-only: inference artifacts are NOT "
              "persisted (save_artifacts ignored; use per-signal `detect` "
              "for artifact caching)")

    from hypad_tpu.utils.config import run_dir

    per = []
    data_cache = {}  # one dataset build per signal, shared across seeds
    for s, sd in pairs:
        p = ap.Namespace(**copy.deepcopy(vars(params)))
        p.signal = s
        if sd is not None:
            p.seed = sd
            p.output_root = os.path.join(params.output_root, f"seed_{sd}")
        if s in data_cache:
            train_data, test_data, read_path = data_cache[s]
            path = run_dir(p)
        else:
            train_data, test_data, read_path, path = _build(p)
            data_cache[s] = (train_data, test_data, read_path)
        if not detect_only:
            # snapshot the EFFECTIVE params (swept signal / band seed), not
            # the config file — so `hypad detect --config <run>/config.yaml`
            # re-enters THIS run (detect-only keeps the training snapshot)
            ck.snapshot_effective(path, p)
        per.append((p, train_data, test_data, read_path, path))

    mesh = make_mesh(params.devices)

    def put(tree):
        """Replicated placement on the mesh (the fleet programs reshard the
        signal axis internally); committing to a single device instead
        conflicts with the in-program mesh constraints."""
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(tree, NamedSharding(mesh,
                                                      PartitionSpec()))
        return jax.device_put(tree, jax.devices()[0])

    grid_mode = bool(rec_errors or combinations)
    grid_combos = combinations or [params.combination]
    grid_recs = rec_errors or [params.rec_error]
    ckpt_tag = params.resume_epoch if params.resume else "final"
    if detect_only:
        # family-scale detect-only re-entry: restore every pair's saved
        # checkpoint (the states per-signal `train`/`sweep` runs wrote) and
        # go straight to the one-program fleet detection below. With
        # `load: true` and no grid, detection serves the per-signal cached
        # artifacts instead — no fleet program runs, so checkpoints are
        # restored lazily per signal in the epilogue loop.
        staged = None
        stacked_params = host_params = None
        if grid_mode or not params.load:
            missing = [path for (_, _, _, _, path) in per
                       if not os.path.exists(
                           os.path.join(path, f"state_{ckpt_tag}"))]
            if missing:
                raise SystemExit(
                    f"sweep --detect-only: no 'state_{ckpt_tag}' checkpoint "
                    f"in {len(missing)}/{len(per)} run dir(s) — train the "
                    "family first (same config, without --detect-only). "
                    f"First missing: {missing[0]}")
            # stack on host (np), then ONE bulk device_put — per-leaf
            # jnp.stack would pay a tunnel round-trip per tensor (CLAUDE.md
            # gotcha); the host stack doubles as the epilogue params source
            host_params = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[ck.restore_state(path, ckpt_tag).params
                  for (_, _, _, _, path) in per])
            stacked_params = put(host_params)
    else:
        with jax.default_device(jax.devices("cpu")[0]):
            fstate = fl.init_fleet_state(
                [_init_models(p) for (p, *_) in per],
                lr=params.lr, hyperbolic=params.hyperbolic)
        fstate = put(fstate)

        X_list = [np.asarray(td.X, np.float32) for (_, td, *_) in per]

        import json

        log_path = os.path.join(per[0][4], "sweep_log.jsonl")

        def log_cb(epoch, metrics):
            row = {"epoch": int(epoch),
                   **{k: [float(x) for x in np.asarray(v)[: len(per)]]
                      for k, v in metrics.items()}}
            with open(log_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            mean = {k: float(np.mean(v)) for k, v in row.items()
                    if k != "epoch"}
            print(f"[sweep] epoch {epoch}: "
                  f"critic x {mean['critic_x_loss']:.3f} "
                  f"critic z {mean['critic_z_loss']:.3f} "
                  f"decoder {mean['decoder_loss']:.3f} "
                  f"rec {mean['rec_loss']:.6f} (mean of {len(per)})")

        def ckpt_cb(epoch, stacked):
            host = jax.device_get(stacked)
            for i, (_, _, _, _, path) in enumerate(per):
                ck.save_state(path, fl.unstack_state(host, i), epoch)

        t0 = time.time()
        with stage("sweep_train"):
            fstate, staged = fl.train_fleet(
                fstate, X_list, lr=params.lr, hyperbolic=params.hyperbolic,
                batch_size=params.batch_size, n_epochs=params.epochs,
                seed=params.seed, mesh=mesh, log_cb=log_cb,
                checkpoint_cb=ckpt_cb, return_staged=True,
                seeds=([sd for (_, sd) in pairs] if seeds is not None
                       else None), canonical=canonical,
                fused_critics=getattr(params, "fused_critics", False))
        wall = time.time() - t0
        print(f"sweep training wall-clock: {wall:.2f}s for {len(per)} "
              f"models x {params.epochs} epochs "
              f"({wall / max(params.epochs, 1):.3f}s/fleet-epoch, "
              f"{wall / max(params.epochs * len(per), 1):.4f}"
              f"s/signal-epoch)")

        host_state = jax.device_get(fstate)
        stacked_params = jax.tree_util.tree_map(
            lambda x: x[: len(per)], fstate.params)
        # epilogue params come from the state already fetched above — a
        # second device_get of stacked_params would re-pay the transfer
        host_params = jax.tree_util.tree_map(
            lambda x: x[: len(per)], host_state.params)

    # detection side of the fleet: every signal's forward + scoring in ONE
    # vmapped program (scorer.detect_scores_fleet) instead of S per-shape
    # compiles — on the tunneled backend each novel shape costs ~40-200 s
    # of remote compile, so this is the difference between one compile and
    # one per signal. Sweep mode is scores-only: inference artifacts are
    # not persisted (run `detect` per signal for artifact caching).
    fleet_scores = [None] * len(per)
    fleet_grid = None
    # unique-dataset families test on their training windows — reuse
    # the trainer's device-resident padded stack instead of paying the
    # host pad + tunnel upload again (dominant at large S; scorer doc)
    reuse = staged if all(
        td is trd or td.X is trd.X for (_, trd, td, *_) in per) else None
    if grid_mode:
        # family x grid: every signal x every (rec_error x combination)
        # cell in ONE vmapped program (scorer.detect_scores_fleet_grid) —
        # model selection over a whole family in one compile
        from hypad_tpu.detect.scorer import detect_scores_fleet_grid

        t0 = time.time()
        with stage("sweep_detect_grid"):
            fleet_grid = detect_scores_fleet_grid(
                stacked_params, [td.X for (_, _, td, *_) in per],
                params.hyperbolic, grid_combos, rec_errors=grid_recs,
                mesh=mesh, staged=reuse, multivariate=is_mv)
        dwall = time.time() - t0
        n_cells = len(fleet_grid[0])
        print(f"fleet grid detection wall-clock: {dwall:.2f}s for "
              f"{len(per)} signals x {n_cells} cells in one program")
    elif not params.load:
        from hypad_tpu.detect.scorer import detect_scores_fleet

        t0 = time.time()
        with stage("sweep_detect_device"):
            fleet_scores = detect_scores_fleet(
                stacked_params, [td.X for (_, _, td, *_) in per],
                params.hyperbolic, params.combination,
                rec_error=params.rec_error, mesh=mesh, staged=reuse,
                multivariate=is_mv)
        dwall = time.time() - t0
        n_win = sum(len(td.X) for (_, _, td, *_) in per)
        print(f"fleet detection wall-clock: {dwall:.2f}s for {len(per)} "
              f"signals / {n_win} windows in one program "
              f"({n_win / dwall:.1f} windows/sec)")

    results = []
    grid_rows = []
    for i, (p, train_data, test_data, read_path, path) in enumerate(per):
        if not detect_only:
            ck.save_state(path, fl.unstack_state(host_state, i), "final")
        if host_params is not None:
            p_i = fl.unstack_state(host_params, i)
        else:  # detect-only `load: true` cached path (no fleet program ran)
            p_i = ck.restore_state(path, ckpt_tag).params
        tag = f" (seed {p.seed})" if seeds is not None else ""
        print(f"--- {p.signal}{tag} ---")
        if grid_mode:
            from hypad_tpu.detect.detector import detect_grid

            res = detect_grid(p, p_i, test_data, path, read_path=read_path,
                              rec_errors=grid_recs,
                              combinations=grid_combos, mesh=mesh,
                              precomputed_grid=fleet_grid[i])
            for (re_, cb), r in res.items():
                m = r["metrics"] or {}
                grid_rows.append({"signal": p.signal, "seed": p.seed,
                                  "rec_error": re_ or "",
                                  "combination": cb,
                                  "f1": m.get("f1", np.nan)})
            results.append((p.signal, p.seed, res))
        else:
            res = _run_detection(p, p_i, test_data, path, read_path,
                                 mesh=mesh,
                                 precomputed_scores=fleet_scores[i])
            m = res["metrics"]
            results.append((p.signal, p.seed, m["f1"] if m else None))
    if grid_mode:
        # family-level model selection: mean f1 per cell over every
        # (signal, seed), best cell first; full table -> sweep_grid.csv
        # next to sweep_log.jsonl (per-signal grid_results.csv in each
        # run dir comes from detect_grid)
        import pandas as pd

        table = pd.DataFrame(grid_rows)
        table.to_csv(os.path.join(per[0][4], "sweep_grid.csv"), index=False)
        agg = (table.groupby(["rec_error", "combination"])["f1"]
               .agg(["mean", "count"]).sort_values("mean", ascending=False))
        print(f"sweep grid mean f1 over {len(per)} runs, best cell first:")
        for (re_, cb), row in agg.iterrows():
            cell = cb if not re_ else f"{re_}/{cb}"
            print(f"  {cell}: {row['mean']:.4f} "
                  f"(n={int(row['count'])})")
        return results
    scored = [f for _, _, f in results if f is not None]
    if scored:
        print(f"sweep mean f1 over {len(scored)}/{len(results)} signals: "
              f"{float(np.mean(scored)):.4f}")
    return results


def expand_combinations(params, combos):
    """``["all"]`` -> every combination valid for the config's path
    (hyperbolic/multivariate: the 6 critic modes + rec/rec_uncertainty;
    euclidean: the 4 reference score_anomalies modes). Any other list
    passes through for _validate_grid to check."""
    if combos != ["all"]:
        return combos
    from hypad_tpu.data.registry import MULTIVARIATE_DATASETS
    from hypad_tpu.detect.scorer import CRITIC_COMBOS, EUCL_COMBOS

    hyper_like = (params.hyperbolic
                  or params.signal == "multivariate"
                  or params.dataset in MULTIVARIATE_DATASETS)
    return list(CRITIC_COMBOS + ("rec", "rec_uncertainty")
                if hyper_like else EUCL_COMBOS)


def cmd_detect(params, config_path, rec_errors=None, combinations=None):
    from hypad_tpu.parallel.mesh import make_mesh
    from hypad_tpu.utils import checkpoint as ck

    train_data, test_data, read_path, path = _build(params)
    tag = params.resume_epoch if params.resume else "final"
    if params.resume:
        print(f"resuming epoch: {params.resume_epoch}")
    state = ck.restore_state(path, tag)
    mesh = make_mesh(params.devices)
    model_params = state.params
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        model_params = jax.device_put(
            model_params, NamedSharding(mesh, PartitionSpec()))
    if rec_errors or combinations:
        # grid detection: every (rec_error x combination) cell from ONE
        # device program — the TPU-native form of the reference's
        # README-documented detection sweep (re-run per cell + load: true)
        from hypad_tpu.detect.detector import detect_grid
        from hypad_tpu.utils.profiling import stage

        t0 = time.time()
        with stage("detect_grid"):
            results = detect_grid(
                params, model_params, test_data, path, read_path=read_path,
                rec_errors=rec_errors, combinations=combinations, mesh=mesh)
        wall = time.time() - t0
        print(f"grid detection wall-clock: {wall:.2f}s for "
              f"{len(results)} cells in one program "
              f"(results -> {os.path.join(path, 'grid_results.csv')})")
        return results
    return _run_detection(params, model_params, test_data, path, read_path,
                          mesh=mesh)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    command = "train"
    if argv and argv[0] in ("train", "detect", "sweep"):
        command = argv.pop(0)

    parser = argparse.ArgumentParser(description="HypAD-TPU")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--profile", action="store_true",
                        help="print per-stage wall-clock report at exit")
    parser.add_argument("--signals", type=str, default=None,
                        help="comma-separated signal list for `sweep` "
                             "(overrides the config's `signals:`)")
    parser.add_argument("--seeds", type=str, default=None,
                        help="comma-separated seed list for `sweep`: train "
                             "the config's signal as a seed band in one "
                             "fleet program")
    parser.add_argument("--detect-only", action="store_true",
                        help="`sweep`: skip training; restore each "
                             "signal/seed run's saved checkpoint and run "
                             "the one-program fleet detection + epilogues")
    parser.add_argument("--rec-errors", type=str, default=None,
                        help="comma-separated rec_error list for `detect`/"
                             "`sweep`: score every (rec_error x "
                             "combination) cell from one device program "
                             "(grid detection; on `sweep` the whole "
                             "family x grid runs in one vmapped program)")
    parser.add_argument("--combinations", type=str, default=None,
                        help="comma-separated combination list for "
                             "`detect`/`sweep` grid detection ('all' = "
                             "every mode valid for the config's path)")
    parser.add_argument("--canonical", action="store_true",
                        help="`sweep`: train at canonical bucket shapes so "
                             "back-to-back family sweeps reuse compiled "
                             "programs (ragged RNG stream; distribution-"
                             "equivalent, not bitwise, per-signal results)")
    args = parser.parse_args(argv)

    from hypad_tpu.utils.config import load_config

    params = load_config(args.config)
    print(f"dataset: {params.dataset}, signal: {params.signal}")
    print(params)

    combos = expand_combinations(
        params, args.combinations.split(",") if args.combinations else None)
    recs = args.rec_errors.split(",") if args.rec_errors else None
    if command == "train":
        cmd_train(params, args.config)
    elif command == "sweep":
        cmd_sweep(params, args.config,
                  signals=(args.signals.split(",") if args.signals
                           else None),
                  seeds=(args.seeds.split(",") if args.seeds else None),
                  detect_only=args.detect_only,
                  rec_errors=recs, combinations=combos,
                  canonical=args.canonical)
    else:
        cmd_detect(params, args.config, rec_errors=recs,
                   combinations=combos)

    if args.profile:
        from hypad_tpu.utils.profiling import report

        print(report())


if __name__ == "__main__":
    main()
