"""Batched anomaly scorer (layer L5) — the whole scoring stage on device.

Behavior spec:
  * model inference loop     reference anomaly_detection.py:20-155
  * euclidean scoring        reference score_anomalies
                             (utils/anomaly_detection_utils.py:407-576)
  * critic KDE smoothing     :365-404 + _compute_critic_score :307-333
  * reconstruction errors    :761-863,:866-962 (point / area / dtw)
  * hyperbolic scoring       :54-66 (per-WINDOW acosh distance — NOT
                             per-timestep; score lengths intentionally differ
                             from the euclidean path, SURVEY §2.1)
  * score combination        combine_scores :336-362 (8 modes incl. the
                             paper's ``uncertainty`` = ||x_hat_ball||)
  * multivariate scoring     :129-222

TPU-native: the reference runs a batched CUDA forward then does ALL scoring
on host numpy/scipy with O(T*W) Python loops and one scipy KDE fit per
timestep (the profiled hot spot). Here the forward pass over every test
window is one jitted call, and the entire scoring pipeline — anti-diagonal
unroll, KDE argmax, rolling smoothing, DTW, z-scores, combination — is jnp
on device; only interval extraction stays on host (detect/intervals.py).

Scoring parallelism (SURVEY §2.3): the detector math is embarrassingly
parallel over windows/timesteps. Every public entry takes an optional
``mesh`` (a 1-D ``dp`` jax.sharding.Mesh); inputs and the row axes of the
intermediate matrices (inference batches, KDE anti-diagonal rows, DTW
windows, per-window distances) carry sharding constraints over it, so XLA
partitions the whole pipeline across devices and inserts the few collectives
(quantile/std reductions, rolling-mean halos) over ICI. dp-sharded scoring
is asserted equal to single-device scoring in tests/test_sharded_scoring.py.
The Pallas KDE kernel (opaque to GSPMD) is mesh-parallelized explicitly via
shard_map over its row axis (ops/kde_pallas.kde_argmax_rows_pallas_sharded).
"""

from __future__ import annotations

import functools
import math
import weakref
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.manifold import stereographic as st
from hypad_tpu.models.tadgan import (
    critic_x_apply,
    decoder_apply,
    encoder_apply,
    mobius_linear,
)
from hypad_tpu.ops.dtw import dtw_errors
from hypad_tpu.ops.kde import kde_argmax_rows
from hypad_tpu.ops.rolling import rolling_mean_centered, rolling_trapz_centered, zscore
from hypad_tpu.ops.unroll import true_series, unroll_median

CRITIC_COMBOS = ("mult", "uncertainty", "sum", "sum_uncertainty", "critic",
                 "critic_uncertainty")


class InferenceOutput(NamedTuple):
    recons_signal: np.ndarray   # (N, W) reconstruction (ball coords if hyper)
    true_signal: np.ndarray     # (N, W) input windows, or hyper_real if hyper
    critic_score: np.ndarray    # (N,) critic values
    eucl_recons: Optional[np.ndarray] = None  # (N, W) tanh output (hyper only)
    gt_signal: Optional[np.ndarray] = None    # raw input windows (hyper only)


# ---------------------------------------------------------------------------
# sharding helpers (scoring parallelism over the dp mesh)
# ---------------------------------------------------------------------------

def _row_constraint(mesh):
    """Returns f(x) applying a sharding constraint over the leading (row)
    axis of any-rank x; identity when mesh is None."""
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


# NOTE: inputs are handed to the jits as plain arrays and sharded by
# with_sharding_constraint INSIDE the traced program — jax.device_put with a
# NamedSharding rejects row counts not divisible by the mesh, while GSPMD's
# in-program constraint pads uneven shards transparently.


# ---------------------------------------------------------------------------
# model forward over the full test set
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("hyperbolic", "mesh"))
def _forward_chunk(params, x, hyperbolic, mesh=None):
    x = _row_constraint(mesh)(x)
    z = encoder_apply(params["encoder"], x)
    critic = critic_x_apply(params["critic_x"], x)[:, 0]
    if hyperbolic:
        hyper, eucl = decoder_apply(params["decoder"], z, hyperbolic=True)
        hyper_x = mobius_linear(params["decoder"]["hyperbolic_linear"], x)
        return hyper, eucl, hyper_x, critic
    recon = decoder_apply(params["decoder"], z)
    return recon, critic


def run_inference(params, X, hyperbolic, batch_size=1024,
                  mesh=None) -> InferenceOutput:
    """Forward every test window (eval mode: no dropout) in large device
    batches. Replaces the reference test loop (anomaly_detection.py:67-113).

    ``mesh``: optional dp mesh — chunks are sharded over the window axis so
    every device forwards 1/n of the batch (SURVEY §2.3 scoring parallelism).
    """
    X = np.asarray(X, np.float32)
    outs = []
    for i in range(0, len(X), batch_size):
        outs.append(jax.device_get(
            _forward_chunk(params, jnp.asarray(X[i:i + batch_size]),
                           hyperbolic, mesh=mesh)))
    if hyperbolic:
        hyper = np.concatenate([o[0] for o in outs])
        eucl = np.concatenate([o[1] for o in outs])
        hyper_x = np.concatenate([o[2] for o in outs])
        critic = np.concatenate([o[3] for o in outs])
        # reference stores hyper_real as "true_signal" for scoring
        # (anomaly_detection.py:127-131)
        return InferenceOutput(recons_signal=hyper, true_signal=hyper_x,
                               critic_score=critic, eucl_recons=eucl,
                               gt_signal=X)
    recon = np.concatenate([o[0] for o in outs])
    critic = np.concatenate([o[1] for o in outs])
    return InferenceOutput(recons_signal=recon, true_signal=X,
                           critic_score=critic)


# ---------------------------------------------------------------------------
# critic-score pipeline
# ---------------------------------------------------------------------------

def _critic_antidiag(critic, n_windows, width, n_real=None):
    """(N,) critic values -> (T, width) anti-diagonal matrix + mask, where
    entry (i, j) = critic[i - j] (the reference repeats each window's critic
    value across the window before unrolling, :372-379). Broadcasting the
    critic across the window and skewing (ops/unroll.antidiagonal_gather)
    replaces the old (T, width) gather — ~4x faster on TPU, identical
    values and lane order (first-max-wins KDE ties preserved)."""
    from hypad_tpu.ops.unroll import antidiagonal_gather

    return antidiagonal_gather(
        jnp.broadcast_to(critic[:, None], (n_windows, width)), n_real=n_real)


def _use_pallas_kde():
    """KDE backend selection. Default: the jnp/XLA path everywhere — the
    round-3 on-chip chained-timing study (PARITY.md "KDE kernel floor")
    measured the XLA fusion at 3.6 ms/20k rows on the v5e vs 4.2 ms for the
    best Mosaic kernel (the quoted 30 ms was ~24 ms of tunnel round-trip),
    and the jnp path is bitwise-reference by construction. The hand-tiled
    Mosaic kernels remain available (HYPAD_KDE_PALLAS=1) and are
    re-validated on-chip by every bench run."""
    import os

    return os.environ.get("HYPAD_KDE_PALLAS") == "1"


def _critic_scores_core(critic, width, smooth_window, use_pallas, mesh,
                        n_real=None):
    """Traced body of the critic pipeline (shared by the standalone jit and
    the fused hyperbolic scorer).

    ``n_real``: optional traced real-window count for the padded fleet path
    (detect_scores_fleet) — quantile/std/rolling reductions then run over
    the real prefix only; ``smooth_window`` arrives traced in that mode."""
    n = critic.shape[0]
    constrain = _row_constraint(mesh)
    vals, mask = _critic_antidiag(critic, n, width, n_real=n_real)
    # shard the (T, width) anti-diagonal rows: each device KDE-fits its slab
    vals, mask = constrain(vals), constrain(mask)
    if use_pallas and mesh is not None:
        from hypad_tpu.ops.kde_pallas import kde_argmax_rows_pallas_sharded

        # pallas_call is opaque to GSPMD; the mesh partitioning is expressed
        # explicitly with shard_map (row-independent, no collectives)
        kde_max = kde_argmax_rows_pallas_sharded(vals, mask, mesh)
    elif use_pallas:
        from hypad_tpu.ops.kde_pallas import kde_argmax_rows_pallas

        kde_max = kde_argmax_rows_pallas(vals, mask)
    else:
        kde_max = kde_argmax_rows(vals, mask)
    # _compute_critic_score (:307-333)
    if n_real is None:
        lq = jnp.quantile(kde_max, 0.25)
        uq = jnp.quantile(kde_max, 0.75)
        in_range = (kde_max >= lq) & (kde_max <= uq)
        mean = jnp.sum(jnp.where(in_range, kde_max, 0.0)) / jnp.sum(in_range)
        std = jnp.std(kde_max)
        z = constrain(jnp.abs((kde_max - mean) / std) + 1.0)
        return rolling_mean_centered(z, smooth_window,
                                     max(smooth_window // 2, 1))
    from hypad_tpu.ops.rolling import (
        masked_quantile,
        rolling_mean_centered_ragged,
    )

    t_real = n_real + width - 1
    rv = jnp.arange(kde_max.shape[0]) < t_real
    lq = masked_quantile(kde_max, rv, 0.25)
    uq = masked_quantile(kde_max, rv, 0.75)
    in_range = rv & (kde_max >= lq) & (kde_max <= uq)
    mean = jnp.sum(jnp.where(in_range, kde_max, 0.0)) / jnp.sum(in_range)
    cnt = jnp.sum(rv).astype(kde_max.dtype)
    m_all = jnp.sum(jnp.where(rv, kde_max, 0.0)) / cnt
    std = jnp.sqrt(
        jnp.sum(jnp.where(rv, (kde_max - m_all) ** 2, 0.0)) / cnt)
    z = jnp.abs((kde_max - mean) / std) + 1.0
    return rolling_mean_centered_ragged(z, smooth_window, t_real,
                                        jnp.maximum(smooth_window // 2, 1))


@functools.partial(jax.jit, static_argnames=("width", "smooth_window",
                                             "use_pallas", "mesh"))
def _critic_scores_device(critic, width, smooth_window, use_pallas=False,
                          mesh=None):
    return _critic_scores_core(critic, width, smooth_window, use_pallas,
                               mesh)


def final_critic_scores(critic_score, true_signal, mesh=None):
    """Reference final_critic_scores (:365-404): returns (T,) smoothed
    critic anomaly scores, T = W + N - 1.

    Documented divergence: for N < 100 windows trunc(N*0.01) is 0 and the
    reference's pandas ``rolling(0).mean()`` raises; the window is floored
    at 1 (identity smoothing) here so short signals score instead of
    crashing. Identical for N >= 100 (see README)."""
    n, w = true_signal.shape
    smooth_window = math.trunc(n * 0.01)
    out = _critic_scores_device(jnp.asarray(critic_score, jnp.float32), w,
                                max(smooth_window, 1),
                                use_pallas=_use_pallas_kde(), mesh=mesh)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# reconstruction errors (euclidean path)
# ---------------------------------------------------------------------------

def _rec_errors_core(y, y_hat, rec_error_type, smoothing_window,
                     score_window=10, smooth=True, mesh=None, n_real=None):
    """Traced body of the reconstruction-error pipeline (shared by the
    standalone jit and the fused euclidean scorer).

    ``n_real``: optional traced real-window count (padded fleet path) —
    the unroll masks, rolling bounds, and the dtw zero-pad boundary then
    follow the real prefix; ``smoothing_window`` arrives traced."""
    constrain = _row_constraint(mesh)
    if n_real is None:
        true = constrain(true_series(constrain(y)))
        pred = constrain(unroll_median(constrain(y_hat)))
    else:
        from hypad_tpu.ops.unroll import true_series_ragged

        true = true_series_ragged(y, n_real)
        pred = unroll_median(y_hat, n_real=n_real)
    width = y.shape[1]
    t_real = None if n_real is None else n_real + width - 1
    if rec_error_type == "point":
        errors = jnp.abs(true - pred)
    elif rec_error_type == "area":
        if n_real is None:
            st_ = rolling_trapz_centered(true, score_window,
                                         score_window // 2)
            sp = rolling_trapz_centered(pred, score_window,
                                        score_window // 2)
        else:
            from hypad_tpu.ops.rolling import rolling_trapz_centered_ragged

            st_ = rolling_trapz_centered_ragged(true, score_window, t_real,
                                                score_window // 2)
            sp = rolling_trapz_centered_ragged(pred, score_window, t_real,
                                               score_window // 2)
        errors = jnp.abs(st_ - sp)
    elif rec_error_type == "dtw":
        if n_real is None:
            errors = dtw_errors(true, pred, score_window)
        else:
            # zero past the real boundary so boundary windows see the same
            # zero padding the per-signal call sees, then re-zero the
            # positions the per-signal output leaves at 0 (ops/dtw.py)
            t = jnp.arange(true.shape[0])
            rv = t < t_real
            errors = dtw_errors(jnp.where(rv, true, 0.0),
                                jnp.where(rv, pred, 0.0), score_window)
            half = score_window // 2
            length = 2 * half + 1
            live = (t >= half) & (t < t_real - length + half)
            errors = jnp.where(live, errors, 0.0)
    else:
        raise ValueError(f"unknown rec_error_type {rec_error_type!r}")
    if smooth:
        if n_real is None:
            errors = rolling_mean_centered(errors, smoothing_window,
                                           max(smoothing_window // 2, 1))
        else:
            from hypad_tpu.ops.rolling import rolling_mean_centered_ragged

            errors = rolling_mean_centered_ragged(
                errors, smoothing_window, t_real,
                jnp.maximum(smoothing_window // 2, 1))
    return errors, pred


_reconstruction_errors_device = functools.partial(
    jax.jit, static_argnames=("rec_error_type", "smoothing_window",
                              "score_window", "smooth", "mesh"))(
    _rec_errors_core)


def reconstruction_errors(y, y_hat, rec_error_type="point", score_window=10,
                          smoothing_window=0.01, smooth=True, mesh=None):
    """Reference reconstruction_errors (:866-962). y/y_hat: (N, W) arrays.
    Returns (errors (T,), predictions (T,)).

    NOTE the reference's min(.., 200) cap applies only when smoothing_window
    arrives as a float proportion (:905-906); integer windows pass through
    uncapped — preserved here (score_anomalies passes trunc(N*0.01) as int).

    Documented divergence: a resolved window of 0 (signals shorter than 100
    windows) is floored at 1 instead of raising like the reference's pandas
    ``rolling(0)`` (see README).
    """
    if isinstance(smoothing_window, float):
        smoothing_window = min(math.trunc(len(y) * smoothing_window), 200)
    # the window is unused when smooth=False; pin it so one executable serves
    # every dataset size on that path
    window = max(smoothing_window, 1) if smooth else 1
    errors, pred = _reconstruction_errors_device(
        jnp.asarray(y, jnp.float32), jnp.asarray(y_hat, jnp.float32),
        rec_error_type, window, score_window, smooth=smooth, mesh=mesh)
    return np.asarray(errors), np.asarray(pred)


def _zscore_clip(scores):
    """zscore -> clip(min=0) -> +1 (:523-524,:542-543)."""
    z = zscore(jnp.asarray(scores, jnp.float32))
    return np.asarray(jnp.clip(z, 0.0, None) + 1.0)


# ---------------------------------------------------------------------------
# combination
# ---------------------------------------------------------------------------

def combine_scores(combination, critic_scores, rec_scores, recons_signal):
    """Reference combine_scores (:336-362) — all 8 modes."""
    critic_scores = np.asarray(critic_scores) if len(critic_scores) else critic_scores
    rec_scores = np.asarray(rec_scores)
    if combination == "sum":
        return 0.2 * critic_scores + 0.8 * rec_scores
    if combination == "mult":
        return np.multiply(critic_scores, rec_scores)
    if combination == "uncertainty":
        unc = np.linalg.norm(recons_signal, axis=1)
        return np.multiply(critic_scores, rec_scores) * unc
    if combination == "critic":
        return critic_scores
    if combination == "critic_uncertainty":
        unc = np.linalg.norm(recons_signal, axis=1)
        return critic_scores * unc
    if combination == "sum_uncertainty":
        unc = np.linalg.norm(recons_signal, axis=1)
        n = rec_scores.shape[0]
        return 0.5 * critic_scores * unc[:n] + 0.5 * rec_scores * unc[:n]
    if combination == "rec":
        return rec_scores
    if combination == "rec_uncertainty":
        unc = np.linalg.norm(recons_signal, axis=1)
        return rec_scores * unc
    raise ValueError(f"unknown combination {combination!r}")


# ---------------------------------------------------------------------------
# top-level scoring entries
# ---------------------------------------------------------------------------

def _eucl_scores_core(y, y_hat, critic, rec_error_type, comb, width,
                      smooth_window, use_pallas, lambda_rec=0.5, mesh=None,
                      n_real=None):
    """Traced body of the euclidean score_anomalies pipeline (shared by the
    standalone fused jit, the one-call detector, and — with a traced
    ``n_real``/``smooth_window`` — the padded fleet detector)."""
    critic_scores = _critic_scores_core(critic, width, smooth_window,
                                        use_pallas, mesh, n_real=n_real)
    errors, _ = _rec_errors_core(y, y_hat, rec_error_type, smooth_window,
                                 mesh=mesh, n_real=n_real)
    if n_real is None:
        z = zscore(errors)
    else:
        from hypad_tpu.ops.rolling import zscore_masked

        z = zscore_masked(errors,
                          jnp.arange(errors.shape[0]) < n_real + width - 1)
    rec_scores = jnp.clip(z, 0.0, None) + 1.0
    if comb == "mult":
        return critic_scores * rec_scores
    if comb == "sum":
        return ((1 - lambda_rec) * (critic_scores - 1)
                + lambda_rec * (rec_scores - 1))
    if comb == "rec":
        return rec_scores
    if comb == "critic":
        return critic_scores
    raise ValueError(
        f'Unknown combination specified {comb}, use "mult", "sum", or "rec"')


_eucl_scores_fused = functools.partial(
    jax.jit, static_argnames=("rec_error_type", "comb", "width",
                              "smooth_window", "use_pallas", "mesh"))(
    _eucl_scores_core)


def stage_inference(inference: InferenceOutput, mesh=None) -> InferenceOutput:
    """Put an inference-artifact set on device ONCE, so every later scoring
    call (`score_anomalies_*`) runs on resident tensors instead of paying
    the host->device upload per call — the `load: true` cached-re-scoring
    path (reference: score pickles re-read per cell,
    utils/anomaly_detection_utils.py:508-550). The staged functions'
    ``jnp.asarray`` calls are no-ops on the returned arrays, so scores are
    bitwise identical to host-input scoring (tests/test_scoring.py)."""
    del mesh  # sharding constraints are applied inside the scoring programs

    def put(x):
        if x is None or isinstance(x, jax.Array):
            return x
        return jax.device_put(np.asarray(x, np.float32))

    return InferenceOutput(*(put(t) for t in inference))


def score_anomalies_euclidean(y, y_hat, critic, rec_error_type="point",
                              comb="mult", lambda_rec=0.5, mesh=None):
    """Reference score_anomalies (:407-576) minus the pickle cache plumbing
    (artifact caching lives in utils/artifacts.py). Returns final (T,)
    scores. Fused into a single jitted program; equality with the staged
    stage functions is asserted in tests/test_scoring.py.

    NOTE: score_anomalies passes error_smooth_window = trunc(N*0.01) as an
    INT (:459-460), which bypasses reconstruction_errors' 200 cap; the same
    trunc(N*0.01) is the critic smooth window (:330).
    """
    if comb not in ("mult", "sum", "rec", "critic"):
        raise ValueError(
            f'Unknown combination specified {comb}, use "mult", "sum", or '
            f'"rec"')
    n = len(y)
    smooth_window = max(math.trunc(n * 0.01), 1)
    out = _eucl_scores_fused(
        jnp.asarray(y, jnp.float32), jnp.asarray(y_hat, jnp.float32),
        jnp.asarray(critic, jnp.float32), rec_error_type, comb,
        int(np.shape(y)[1]), smooth_window, _use_pallas_kde(),
        lambda_rec=lambda_rec, mesh=mesh)
    return np.asarray(out)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _acosh_rows(u, v, mesh=None):
    c = _row_constraint(mesh)
    return st.acosh_poincare_distance(c(u), c(v))


def hyperbolic_window_scores(recons_signal, true_signal, mesh=None):
    """Per-window acosh Poincare distance (:58-66). Shapes (N, W) -> (N,).
    NOTE the reference passes recons as 'true_data' and ground-truth-in-ball
    as 'pred_data' (swapped names, harmless: the distance is symmetric)."""
    d = _acosh_rows(jnp.asarray(recons_signal, jnp.float32),
                    jnp.asarray(true_signal, jnp.float32), mesh=mesh)
    return np.asarray(d)


def _combine_device(combination, critic_scores, rec_scores, recons):
    """Traced combine_scores (:336-362): same arithmetic as the host
    version, jnp so the whole hyperbolic pipeline stays in one program."""
    if combination == "sum":
        return 0.2 * critic_scores + 0.8 * rec_scores
    if combination == "mult":
        return critic_scores * rec_scores
    if combination == "uncertainty":
        unc = jnp.linalg.norm(recons, axis=1)
        return critic_scores * rec_scores * unc
    if combination == "critic":
        return critic_scores
    if combination == "critic_uncertainty":
        return critic_scores * jnp.linalg.norm(recons, axis=1)
    if combination == "sum_uncertainty":
        unc = jnp.linalg.norm(recons, axis=1)
        n = rec_scores.shape[0]
        return 0.5 * critic_scores * unc[:n] + 0.5 * rec_scores * unc[:n]
    if combination == "rec":
        return rec_scores
    if combination == "rec_uncertainty":
        return rec_scores * jnp.linalg.norm(recons, axis=1)
    raise ValueError(f"unknown combination {combination!r}")


def _hyper_scores_core(recons, true, critic, combination, width,
                       smooth_window, use_pallas, mesh=None, n_real=None):
    """The entire hyperbolic scoring pipeline — per-window acosh distances,
    critic KDE smoothing, combination — as ONE traced program. Detection on
    the tunneled backend is round-trip-bound; one call instead of three
    roughly halves warm scoring latency. ``n_real``: traced real-window
    count for the padded fleet path (the [:N] critic truncation is the
    static padded N there; positions past n_real are pad garbage the host
    slices off)."""
    c = _row_constraint(mesh)
    rec_scores = st.acosh_poincare_distance(c(recons), c(true))
    critic_scores = []
    if combination in CRITIC_COMBOS:
        critic_scores = _critic_scores_core(critic, width, smooth_window,
                                            use_pallas, mesh, n_real=n_real)
        critic_scores = critic_scores[: rec_scores.shape[0]]
    return _combine_device(combination, critic_scores, rec_scores, recons)


_hyper_scores_fused = functools.partial(
    jax.jit, static_argnames=("combination", "width", "smooth_window",
                              "use_pallas", "mesh"))(
    _hyper_scores_core)


def score_anomalies_hyperbolic(inference: InferenceOutput, combination,
                               mesh=None):
    """Hyperbolic univariate scoring (:54-86): per-window rec scores,
    critic scores truncated to N windows, combined. Fused into a single
    jitted program; stage-for-stage equality with the host-combined path is
    asserted in tests/test_scoring.py."""
    n, w = inference.true_signal.shape
    smooth_window = max(math.trunc(n * 0.01), 1)
    out = _hyper_scores_fused(
        jnp.asarray(inference.recons_signal, jnp.float32),
        jnp.asarray(inference.true_signal, jnp.float32),
        jnp.asarray(inference.critic_score, jnp.float32),
        combination, w, smooth_window, _use_pallas_kde(), mesh=mesh)
    return np.asarray(out)


def _mv_scores_core(recons, true, critic, combination, hyperbolic, width,
                    smooth_window, use_pallas, mesh=None, n_real=None):
    """Traced body of the multivariate scoring pipeline (shared by the
    standalone fused jit, the one-call detector, and — with a traced
    ``n_real``/``smooth_window`` — the padded multivariate fleet detector;
    rows past ``n_real`` are pad garbage the host slices off)."""
    c = _row_constraint(mesh)
    if hyperbolic:
        raw = st.acosh_poincare_distance(c(recons), c(true))
    else:
        raw = jnp.linalg.norm(c(true) - c(recons), axis=1)
    if n_real is None:
        z = zscore(raw)
    else:
        from hypad_tpu.ops.rolling import zscore_masked

        z = zscore_masked(raw, jnp.arange(raw.shape[0]) < n_real)
    rec_scores = jnp.clip(z, 0.0, None) + 1.0
    critic_scores = []
    if combination in CRITIC_COMBOS:
        critic_scores = _critic_scores_core(critic, width, smooth_window,
                                            use_pallas, mesh, n_real=n_real)
        critic_scores = critic_scores[: rec_scores.shape[0]]
    return _combine_device(combination, critic_scores, rec_scores, recons)


_mv_scores_fused = functools.partial(
    jax.jit, static_argnames=("combination", "hyperbolic", "width",
                              "smooth_window", "use_pallas", "mesh"))(
    _mv_scores_core)


# ---------------------------------------------------------------------------
# one-call detection: model forward + full scoring in a single program
# ---------------------------------------------------------------------------

def _detect_core(params, X, hyperbolic, combination, rec_error, width,
                 smooth_window, use_pallas, mesh=None, multivariate=False,
                 n_real=None):
    c = _row_constraint(mesh)
    Xc = c(X)
    z = encoder_apply(params["encoder"], Xc)
    critic = critic_x_apply(params["critic_x"], Xc)[:, 0]
    if hyperbolic:
        hyper, eucl = decoder_apply(params["decoder"], z, hyperbolic=True)
        hyper_x = mobius_linear(params["decoder"]["hyperbolic_linear"], Xc)
        if multivariate:
            scores = _mv_scores_core(c(hyper), c(hyper_x), critic,
                                     combination, True, width, smooth_window,
                                     use_pallas, mesh, n_real=n_real)
        else:
            scores = _hyper_scores_core(c(hyper), c(hyper_x), critic,
                                        combination, width, smooth_window,
                                        use_pallas, mesh, n_real=n_real)
        return scores, (hyper, hyper_x, critic, eucl)
    recon = decoder_apply(params["decoder"], z)
    if multivariate:
        scores = _mv_scores_core(c(recon), Xc, critic, combination, False,
                                 width, smooth_window, use_pallas, mesh,
                                 n_real=n_real)
    else:
        scores = _eucl_scores_core(Xc, c(recon), critic, rec_error,
                                   combination, width, smooth_window,
                                   use_pallas, mesh=mesh, n_real=n_real)
    return scores, (recon, critic)


_STATIC_DETECT = ("hyperbolic", "combination", "rec_error", "width",
                  "smooth_window", "use_pallas", "mesh", "multivariate")
_detect_device = functools.partial(
    jax.jit, static_argnames=_STATIC_DETECT)(_detect_core)
# scores-only variant: dropping the inference outputs at trace level lets
# XLA dead-code-eliminate their device->host transfer (the warm-path cost,
# see CLAUDE.md); used when artifact persistence is disabled
def _detect_scores_only_core(params, X, hyperbolic, combination, rec_error,
                             width, smooth_window, use_pallas, mesh=None,
                             multivariate=False):
    return _detect_core(params, X, hyperbolic, combination, rec_error,
                        width, smooth_window, use_pallas, mesh=mesh,
                        multivariate=multivariate)[0]


_detect_device_scores_only = functools.partial(
    jax.jit, static_argnames=_STATIC_DETECT)(_detect_scores_only_core)


# above this many windows the one-call path falls back to chunked inference
# + fused scoring (full-batch activations would start to matter in HBM)
ONE_CALL_MAX_WINDOWS = 262144


def _apply_artifact_opts(inference, artifact_dtype, artifact_set,
                         hyperbolic):
    """Host-side twin of the one-call path's artifact options (used by the
    chunked fallback): f16-downcast the (N, W) tensors and/or drop
    eucl_recons/gt_signal for hyperbolic runs."""
    if hyperbolic and artifact_set == "minimal":
        inference = inference._replace(eucl_recons=None, gt_signal=None)
    if artifact_dtype == "float16":
        inference = InferenceOutput(*(
            t.astype(np.float16) if t is not None and np.ndim(t) > 1 else t
            for t in inference))
    return inference


def detect_scores(params, X, hyperbolic, combination, rec_error="point",
                  mesh=None, fetch_inference=True, multivariate=False,
                  X_host=None, artifact_dtype="float32",
                  artifact_set="full"):
    """ONE device program for the whole detection compute: encoder, critic,
    decoder, ball embedding and the full scoring pipeline, returning
    (final_scores, InferenceOutput). The staged equivalents (run_inference +
    score_anomalies_*) remain the golden-tested parity surface; equality is
    asserted in tests/test_scoring.py (univariate) and
    tests/test_multivariate_glue.py (multivariate). Falls back to the staged
    path beyond ONE_CALL_MAX_WINDOWS.

    ``multivariate=True`` swaps in the per-timestep multivariate scoring
    tail (reference utils/anomaly_detection_utils.py:153-196) — rows are
    feature vectors, rec scores are z-scored+clipped norms/distances.

    ``fetch_inference=False`` returns (scores, None) and never transfers
    the inference tensors to host — XLA drops their copies entirely. Warm
    detection through the tunnel is transfer-bound, so this is ~3x faster;
    used by the detector when ``save_artifacts: false``.
    ``fetch_inference="device"`` returns the inference tensors still ON
    DEVICE (``gt_signal`` stays host) so ``artifacts.save_inference`` can
    overlap each member's D2H transfer with the previous member's disk
    write — the detector's ``save_artifacts: true`` path.

    ``X`` may be a device-resident jax.Array — it is then fed to the
    program as-is, skipping the host->device upload (the dominant warm-path
    cost when data is staged on device by the pipeline). Non-f32 device
    arrays are cast to float32 so the traced program and the persisted
    artifacts agree. ``X_host``: optional host copy of X used for the
    inference artifacts — pass it when X is device-resident to avoid a
    device->host readback of the windows.

    ``artifact_dtype`` / ``artifact_set`` (config keys, round 5): the
    reference-default artifact path is device->host-transfer-bound
    (~24 MB/call at 20k hyperbolic windows). ``artifact_dtype="float16"``
    casts the big (N, W) tensors ON DEVICE before the fetch (half the
    tunnel bytes; critic scores stay f32); ``artifact_set="minimal"``
    drops ``eucl_recons``/``gt_signal`` from the fetch+file for
    hyperbolic runs (the hyperbolic scoring variants never read them).
    Scores returned by THIS call are computed in f32 either way — the
    options only affect what later ``load: true`` re-scoring sees."""
    if isinstance(X, jax.Array):
        if X.dtype != jnp.float32:
            X = X.astype(jnp.float32)
    else:
        X = np.asarray(X, np.float32)
    if len(X) > ONE_CALL_MAX_WINDOWS:
        # chunked host-batched fallback: feed it the host copy when we have
        # one rather than reading the device array back (run_inference's
        # np.asarray would be a full device->host transfer)
        X_in = X_host if (X_host is not None
                          and isinstance(X, jax.Array)) else X
        inference = run_inference(params, X_in, hyperbolic, mesh=mesh)
        if multivariate:
            scores = score_anomalies_multivariate(inference, combination,
                                                  hyperbolic, mesh=mesh)
        elif hyperbolic:
            scores = score_anomalies_hyperbolic(inference, combination,
                                                mesh=mesh)
        else:
            scores = score_anomalies_euclidean(
                inference.true_signal, inference.recons_signal,
                inference.critic_score, rec_error_type=rec_error,
                comb=combination, mesh=mesh)
        if fetch_inference:
            inference = _apply_artifact_opts(inference, artifact_dtype,
                                             artifact_set, hyperbolic)
            return scores, inference
        return scores, None
    n, w = X.shape
    smooth_window = max(math.trunc(n * 0.01), 1)
    if not fetch_inference:
        scores = _detect_device_scores_only(
            params, jnp.asarray(X), hyperbolic, combination, rec_error, w,
            smooth_window, _use_pallas_kde(), mesh=mesh,
            multivariate=multivariate)
        return np.asarray(scores), None
    scores, outs = _detect_device(
        params, jnp.asarray(X), hyperbolic, combination, rec_error, w,
        smooth_window, _use_pallas_kde(), mesh=mesh,
        multivariate=multivariate)
    halve = artifact_dtype == "float16"
    if halve:
        # cast the (N, W) tensors ON DEVICE so the tunnel carries half the
        # bytes; the (N,) critic stays f32 (negligible size, and KDE
        # re-smoothing is the most rounding-sensitive consumer)
        outs = tuple(o.astype(jnp.float16) if o.ndim > 1 else o
                     for o in outs)
    if hyperbolic and artifact_set == "minimal":
        outs = outs[:3]  # drop eucl from the transfer entirely
    if fetch_inference != "device":
        outs = jax.device_get(outs)
    # fetch_inference="device": leave the tensors ON DEVICE — the caller
    # (detector save_artifacts path) streams them through
    # artifacts.save_inference, overlapping each member's D2H transfer
    # with the previous member's disk write
    if hyperbolic and artifact_set == "minimal":
        hyper, hyper_x, critic = outs
        inference = InferenceOutput(recons_signal=hyper, true_signal=hyper_x,
                                    critic_score=critic)
        return np.asarray(scores), inference
    if X_host is None:
        X_host = np.asarray(X, np.float32)
    else:
        X_host = np.asarray(X_host, np.float32)
    if halve:
        X_host = X_host.astype(np.float16)
    if hyperbolic:
        hyper, hyper_x, critic, eucl = outs
        inference = InferenceOutput(recons_signal=hyper, true_signal=hyper_x,
                                    critic_score=critic, eucl_recons=eucl,
                                    gt_signal=X_host)
    else:
        recon, critic = outs
        inference = InferenceOutput(recons_signal=recon, true_signal=X_host,
                                    critic_score=critic)
    return np.asarray(scores), inference


# ---------------------------------------------------------------------------
# fleet detection: a whole signal family's detection in ONE vmapped program
# ---------------------------------------------------------------------------

_STATIC_FLEET = ("hyperbolic", "combination", "rec_error", "width",
                 "use_pallas", "mesh", "multivariate", "snap")

# HBM bound for the fleet programs: the critic-KDE pair stage is the peak
# buffer — (S, T, W, W) f32 with T = N_pad + W - 1 anti-diagonal rows per
# signal. Families whose stacked pair tensor would exceed this many elements
# are scored in fixed-shape signal chunks (full chunks of the budget size
# plus one replica-padded remainder bucket), so a small canonical shape set
# serves every chunk (a fresh shape costs 40-200 s of remote compile
# through a tunneled backend). 1.4e9 elems = 5.6 GB f32 — sized so the
# S=85 x A1-CANONICAL stack (85 x 1536-rung windows, the bucket covering
# the round-3 measured-working 81 x 1320 regime) runs as ONE program on a
# 16 GB chip; single-call verified on-chip round 4.
FLEET_MAX_PAIR_ELEMS = 1_400_000_000


def _fleet_chunk_plan(S, n_pad, width):
    """Chunk plan for the fleet signal axis. Returns (chunks, S_c):
    ``chunks is None`` means a single full-fleet call of S signals;
    otherwise ``chunks`` is a list of (start, size) slices, ALL of size
    ``S_c`` — the driver slides a short tail chunk back to end at S and
    drops its leading overlap rows (recomputed signals; per-signal results
    are independent, so recomputation cannot change them). One compiled
    shape therefore serves every chunk of every family at a given N rung:
    round 4 first sized the remainder to its own small-fleet bucket, and
    the full-Yahoo grid study then paid a 40-200 s novel remote compile per
    family for each distinct remainder shape ((16,1536) for A2, (24,1728)
    for A3 — 238 s total) while a warm full-size chunk executes in ~2 s;
    overlap rows are pure vmapped compute, far cheaper than any compile."""
    per_signal = (n_pad + width - 1) * width * width
    S_c = max(int(FLEET_MAX_PAIR_ELEMS // max(per_signal, 1)), 1)
    if S <= S_c:
        return None, S
    chunks = [(i * S_c, S_c) for i in range(-(-S // S_c))]
    return chunks, S_c


# Canonical fleet program shapes: every fleet/grid detection call pads its
# (S, N, W) stack up to a small set of compiled shapes so different families
# REUSE each other's programs. On the tunneled backend a novel shape costs
# 40-200 s of remote compile (CLAUDE.md) while the padded rows cost
# microseconds of vmapped compute — round-3's Yahoo grid study paid 51.5 s
# for A1's novel S=67 shape while A4 reused A3's S=100 shape and ran in
# 14.2 s. The window axis rounds up to a ~1.33-1.5x rung ladder (<=50%
# compute waste); the signal axis rounds up the FLEET_S_RUNGS ladder, capped
# at the HBM chunk size (which is itself a single canonical shape per N
# rung, so over-chunk-size fleets need no padding at all). Padding is
# REPLICAS of the last signal — full valid lanes, no NaN-producing empty
# reductions — whose output rows are simply discarded.
FLEET_N_RUNGS = tuple(
    b * 2 ** k for k in range(10) for b in (128, 192) if b * 2 ** k <= 131072
)
# signal-axis ladder: x1.33-1.5 steps cap the dummy-replica compute waste at
# ~33% (a pow2 ladder measured 2-4x fleet-detection regressions in the r4
# bench: 9 -> 16 signals is 1.78x wasted vmap compute)
FLEET_S_RUNGS = tuple(
    b * 2 ** k for k in range(9) for b in (4, 6) if b * 2 ** k <= 1024
)


def _next_rung(n):
    for r in sorted(FLEET_N_RUNGS):
        if r >= n:
            return r
    return n  # beyond the ladder: exact shape (huge signals are rare)


def _next_s_rung(s):
    for r in sorted(FLEET_S_RUNGS):
        if r >= s:
            return r
    return s


def canonical_fleet_shape(S, n_pad, width, ndev=1):
    """The canonical compiled shape (S_c, N_c) covering an (S, n_pad, width)
    fleet stack. ``S_c < S`` means no signal padding: the HBM chunk plan
    (`_fleet_chunk_plan`) will carve the fleet into fixed-size chunks that
    are themselves canonical shapes.

    ``ndev``: mesh device count — the signal rung rounds up to a device
    multiple so the dp-sharded axis divides evenly, matching the rounding
    ``train_fleet(canonical=True)`` applies when it stages the stack (the
    canonical set is per (rung, ndev); ndev is fixed for a deployment)."""
    N_c = _next_rung(n_pad)
    per_signal = (N_c + width - 1) * width * width
    S_chunk = max(int(FLEET_MAX_PAIR_ELEMS // max(per_signal, 1)), 1)
    s = _next_s_rung(S)
    s += (-s) % max(ndev, 1)
    return min(s, S_chunk), N_c


def _pad_axis_with_zeros(x, axis, target):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    xp = jnp if isinstance(x, jax.Array) else np
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return xp.pad(x, widths)


def _pad_leading_with_replicas(x, target):
    pad = target - x.shape[0]
    if pad <= 0:
        return x
    xp = jnp if isinstance(x, jax.Array) else np
    rep = xp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
    return xp.concatenate([x, rep])


@functools.partial(jax.jit, static_argnames=("s_target", "n_target"))
def _pad_stack_device(Xs, *, s_target, n_target):
    return _pad_leading_with_replicas(
        _pad_axis_with_zeros(Xs, 1, n_target), s_target)


@functools.partial(jax.jit, static_argnames=("s_target",))
def _pad_tree_device(tree, *, s_target):
    return jax.tree_util.tree_map(
        lambda x: _pad_leading_with_replicas(x, s_target), tree)


def _fleet_canonical_pad(stacked_params, Xs, n_real, smooth, ndev=1):
    """Pad a staged fleet stack to its canonical compiled shape
    (`canonical_fleet_shape`): zeros on the window axis (value-invariant —
    every reduction is masked to the traced ``n_real`` prefix), replicas of
    the last signal on the signal axis (output rows past the real S are the
    caller's to discard). Device-resident leaves are padded ON DEVICE in
    ONE jitted program each for the stack and the param tree — the round-4
    un-jitted tree_map paid ~2 dispatches per leaf through the tunnel
    (~0.27 s/call at S=81, tools/canonical_cost.py) and erased most of the
    staged path's win. Params shorter than the stack (sweep slices them to
    the real S) are replica-aligned to the stack's row count."""
    S, n_pad, width = Xs.shape
    S_c, N_c = canonical_fleet_shape(S, n_pad, width, ndev)
    S_t, N_t = max(S_c, S), max(N_c, n_pad)
    n_real = _pad_leading_with_replicas(np.asarray(n_real), S_t)
    smooth = _pad_leading_with_replicas(np.asarray(smooth), S_t)
    if S_t > S or N_t > n_pad:
        if isinstance(Xs, jax.Array):
            Xs = _pad_stack_device(Xs, s_target=S_t, n_target=N_t)
        else:
            Xs = _pad_leading_with_replicas(
                _pad_axis_with_zeros(Xs, 1, N_t), S_t)
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if leaves and leaves[0].shape[0] < S_t:
        if isinstance(leaves[0], jax.Array):
            stacked_params = _pad_tree_device(stacked_params, s_target=S_t)
        else:
            stacked_params = jax.tree_util.tree_map(
                lambda x: _pad_leading_with_replicas(x, S_t), stacked_params)
    return stacked_params, Xs, n_real, smooth


# One-entry memo for the canonical-padded staging. The pad itself is two
# jitted programs (stack + param tree), but dispatching them PER CALL costs
# ~10-30 ms of tunnel round-trips on top of the ~51 ms fleet program
# (tools/fleet81_probe.py: exact staged 1.69M w/s vs canonical-per-call
# 1.46M at S=81) — for the dominant usage (a sweep or bench loop re-scoring
# the SAME staged family) the padded device arrays are reusable verbatim.
# Keyed by the identity of the staged stack + first param leaf (validated
# via weakrefs, so a recycled id() can never alias) + the ragged-length
# bytes; one entry only, so at most one stale padded stack (~60 MB HBM at
# S=81) is ever pinned, and any miss clears it.
_CANON_MEMO: dict = {}


def _canonical_pad_cached(stacked_params, Xs, n_real, smooth, ndev=1):
    leaves = jax.tree_util.tree_leaves(stacked_params)
    anchor = leaves[0] if leaves else None
    if not (isinstance(Xs, jax.Array) and isinstance(anchor, jax.Array)):
        return _fleet_canonical_pad(stacked_params, Xs, n_real, smooth, ndev)
    key = (id(Xs), id(anchor), np.asarray(n_real).tobytes(),
           np.asarray(smooth).tobytes(), ndev)
    hit = _CANON_MEMO.get(key)
    if hit is not None:
        xs_ref, p_ref, val = hit
        if xs_ref() is Xs and p_ref() is anchor:
            return val
    val = _fleet_canonical_pad(stacked_params, Xs, n_real, smooth, ndev)
    _CANON_MEMO.clear()
    _CANON_MEMO[key] = (weakref.ref(Xs), weakref.ref(anchor), val)
    return val


# Canonical padding perturbs reduction tilings by ~1 ulp; through the
# z-score stages that turns the exact path's EXACT ZEROS (clip boundaries,
# flat score runs) into ~1e-6 residue, which find_anomalies' per-window
# mean+4sigma thresholds then amplify into spurious intervals wherever the
# exact scores are constant (measured: SMAP D-9 point/sum — a 6,377-point
# exact-zero run picked up 5.96e-8..1.7e-6 noise and two phantom intervals,
# F1 1.0 -> 0.5). Genuine scores live orders of magnitude above 256 ulp of
# the signal's peak; snapping below it restores the exact path's flat-region
# semantics (validated corpus-wide: the full Yahoo + NASA grid re-scores
# match the pre-canonical round-3 studies cell-for-cell).
_SNAP_ULPS = 256.0


def _snap_noise(s):
    """Zero out |scores| below the f32 noise floor (256 ulp of the
    signal's max) — canonical-fleet paths only; the exact per-signal path
    stays bitwise-golden vs the reference. Host twin of
    `_snap_scores_device` (kept as the oracle for its tests)."""
    if not s.size:
        return s
    floor = _SNAP_ULPS * np.finfo(np.float32).eps * np.abs(s).max()
    return np.where(np.abs(s) <= floor, np.float32(0), s).astype(
        s.dtype, copy=False)


def _snap_scores_device(s, n_valid):
    """Traced twin of `_snap_noise` over a padded score vector whose real
    prefix is ``n_valid`` rows: the noise floor comes from the masked
    prefix max, pad rows are ignored (the caller discards them). Runs
    INSIDE the fleet programs — round 4 snapped on host, which forced a
    separate D2H fetch of every signal's full score vector through the
    tunnel (81 fetches/call at S=81) and was the real cause of the
    BENCH_r03->r04 fleet-detection regression (1.70M -> 1.14M w/s; the
    padded compute itself measured ~free, tools/canonical_cost.py)."""
    a = jnp.abs(s)
    m = jnp.max(jnp.where(jnp.arange(s.shape[0]) < n_valid, a, 0.0))
    floor = _SNAP_ULPS * jnp.float32(np.finfo(np.float32).eps) * m
    return jnp.where(a <= floor, jnp.float32(0), s)


def _fleet_stage(X_list, staged, canonical=False, ndev=1):
    """Shared fleet staging: validate/slice a device-resident padded stack
    (``staged``: train_fleet ``return_staged=True``) or host pad+stack, plus
    the per-signal smooth windows computed host-side with the exact Python
    trunc the per-signal path uses (score_anomalies_*: trunc(N*0.01)).

    ``canonical=True``: when the staged stack already sits at the detection
    bucket (train_fleet ``canonical=True`` stages it there by design), it is
    used AS-IS — zero copies, zero dispatches — instead of being sliced back
    to the real S and re-padded per call; the dummy tail rows score garbage
    (replica window counts over pad data) that the caller discards."""
    from hypad_tpu.train.fleet import pad_and_stack

    widths = {int(x.shape[1]) for x in X_list}
    if len(widths) > 1:
        raise ValueError("fleet signals must share a window/feature width; "
                         f"got {sorted(widths)}")
    if staged is not None:
        Xs_full, n_staged = staged
        S = len(X_list)
        n_real = np.asarray([x.shape[0] for x in X_list], np.int32)
        if Xs_full.shape[0] < S or Xs_full.shape[1] < n_real.max():
            raise ValueError("staged stack does not cover the requested "
                             f"family: {Xs_full.shape} vs {S} signals of "
                             f"up to {int(n_real.max())} windows")
        if not (np.asarray(n_staged)[:S] == n_real).all():
            raise ValueError("staged window counts disagree with X_list — "
                             "stale stack?")
        S_full, N_full = int(Xs_full.shape[0]), int(Xs_full.shape[1])
        if (canonical and S_full > S and N_full == _next_rung(N_full)
                and S_full == canonical_fleet_shape(
                    S, N_full, Xs_full.shape[2], ndev)[0]):
            Xs = Xs_full
            n_real = np.concatenate(
                [n_real, np.repeat(n_real[-1:], S_full - S)])
        elif S_full > S:
            Xs = Xs_full[:S]
        else:
            Xs = Xs_full
    else:
        Xs, n_real = pad_and_stack(
            [np.asarray(x, np.float32) for x in X_list])
    smooth = np.array([max(math.trunc(int(n) * 0.01), 1) for n in n_real],
                      np.int32)
    return Xs, n_real, smooth


@functools.partial(jax.jit, static_argnames=_STATIC_FLEET)
def _detect_fleet_device(stacked_params, Xs, n_real, smooth_window,
                         hyperbolic, combination, rec_error, width,
                         use_pallas, mesh=None, multivariate=False,
                         snap=False):
    from hypad_tpu.parallel.mesh import shard_leading

    constrain = shard_leading(mesh)
    stacked_params = constrain(stacked_params)
    Xs = constrain(Xs)

    def one(params, X, n, w):
        s = _detect_core(params, X, hyperbolic, combination, rec_error,
                         width, w, use_pallas, mesh=None,
                         multivariate=multivariate, n_real=n)[0]
        if snap:
            L = n if (hyperbolic or multivariate) else n + width - 1
            s = _snap_scores_device(s, L)
        return s

    return jax.vmap(one)(stacked_params, Xs, n_real, smooth_window)


def detect_scores_fleet(stacked_params, X_list, hyperbolic, combination,
                        rec_error="point", mesh=None, staged=None,
                        canonical=True, multivariate=False):
    """Whole-family detection — S signals' forward passes AND full scoring
    pipelines in ONE vmapped, jit-compiled program.

    No reference equivalent exists (the reference re-runs
    ``anomaly_detection.py`` per signal, paying a process + compile + every
    per-stage dispatch per signal); this is the detection-side twin of the
    fleet trainer (train/fleet.py). Ragged families are zero-padded to one
    (S, N, W) shape; every reduction (KDE masks, quantiles, std, rolling
    smoothing, dtw boundaries, zscore) runs over each signal's REAL prefix
    via a traced ``n_real``, so per-signal results match the per-signal
    ``detect_scores`` path (asserted in tests/test_fleet_detect.py). One
    compiled program serves the whole family — on a tunneled backend where
    each novel shape costs ~40-200 s of remote compile, this collapses S
    compiles into 1.

    ``stacked_params``: model params pytree with a leading S axis
    (train/fleet.stack_states-style). ``X_list``: S (N_i, W) host window
    arrays. ``mesh``: optional dp mesh — the SIGNAL axis is sharded over it
    (embarrassingly parallel, zero collectives).

    ``staged``: optional ``(Xs, n_real)`` device-resident padded stack
    covering the SAME windows as ``X_list`` (train_fleet
    ``return_staged=True``) — the host pad + device upload are skipped
    entirely (they dominate large fleets: 2.5 s of a 3.6 s call at
    S=81 x 1320 x 100 through the tunnel, vs 61 ms device compute).
    ``Xs`` may be longer-padded and carry trailing mesh-dummy rows; only
    its first S rows are consumed.

    Families too large for HBM (the stacked KDE pair tensor past
    ``FLEET_MAX_PAIR_ELEMS``) are scored in fixed-shape signal chunks — all
    of one size, the tail chunk slid back to end at S — so ONE compiled
    program serves any family at a given N rung; per-signal results are
    independent, so chunk boundaries cannot change them.

    ``canonical`` (default True) pads the stack to a canonical compiled
    shape (`canonical_fleet_shape`) so different families share programs —
    per-signal scores are value-equivalent (pad windows are masked out of
    every reduction, pad signals are discarded replicas); they are NOT
    bitwise-reproduced because the padded GEMM/reduction shapes tile
    differently (measured <=7e-5 on the euclidean scores, <=8e-9
    hyperbolic — the same class of noise as the fleet-vs-sequential
    tolerance already documented in PARITY.md; asserted at the anchor
    tolerance in tests/test_fleet_canonical.py). Sub-noise-floor values
    are snapped to exact zero (`_snap_noise`) so the exact path's flat
    score runs — where find_anomalies' per-window thresholds are
    infinitely noise-sensitive — survive the padding bit-for-bit.

    ``multivariate=True``: rows are per-timestep feature vectors (N_i, F)
    — the CASAS/SWAT/WADI shape — and each signal runs the multivariate
    scoring tail (`_mv_scores_core`) with masked reductions over its real
    prefix; all signals must share a feature count F. Whole multi-resident
    CASAS families then score as one vmapped program, same as univariate
    families (parity vs per-signal detect_scores in
    tests/test_fleet_mv.py).

    Returns a list of S per-signal score vectors, each sliced to its true
    length (N_i hyperbolic/multivariate, N_i + W - 1 euclidean).
    """
    S_real = len(X_list)
    ndev = int(mesh.devices.size) if mesh is not None else 1
    Xs, n_real, smooth = _fleet_stage(X_list, staged, canonical, ndev)
    if canonical:
        stacked_params, Xs, n_real, smooth = _canonical_pad_cached(
            stacked_params, Xs, n_real, smooth, ndev)
    width = Xs.shape[2]

    # always the jnp/XLA KDE backend here: it is the measured-fastest and
    # bitwise-reference default (PARITY.md "KDE kernel floor"), and the
    # opt-in Mosaic kernels are 2-D-only (not vmappable over the fleet axis)
    def run(p, x, n, sm):
        return _detect_fleet_device(
            p, jnp.asarray(x), jnp.asarray(n), jnp.asarray(sm), hyperbolic,
            combination, rec_error, width, False, mesh=mesh,
            multivariate=multivariate, snap=canonical)

    out = _fleet_chunked(run, stacked_params, Xs, n_real, smooth)
    lens = [int(n) if (hyperbolic or multivariate) else int(n) + width - 1
            for n in n_real[:S_real]]
    # canonical noise-snapping happens INSIDE the program
    # (`_snap_scores_device`); both paths return device slices, no fetch
    return [out[i, :L] for i, L in enumerate(lens)]


@functools.partial(jax.jit, static_argnames=("size",))
def _cut_tree_device(tree, start, *, size):
    """Slice ``size`` leading-axis rows at ``start`` from every leaf in ONE
    compiled program. ``start`` is traced, so every chunk of every family
    shares one compile per (treedef, size); un-jitted per-leaf slicing pays
    ~2 host dispatches per leaf through the tunnel (the canonical-pad
    lesson, tools/canonical_cost.py)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, start, size, axis=0),
        tree)


def _fleet_chunked(run, stacked_params, Xs, n_real, smooth):
    """Drive ``run`` over the whole fleet, chunking the signal axis when the
    stacked KDE pair tensor would blow HBM (``_fleet_chunk_plan``). ``run``
    returns a chunk-leading array or a dict of them; chunk outputs are
    reassembled by row. Every chunk has the same S_c rows (one compiled
    shape per N rung): the tail chunk is slid back to end at row S and its
    leading overlap rows — signals the previous chunk already scored — are
    dropped on reassembly. Device-resident trees are cut by one jitted
    traced-start program each (`_cut_tree_device`)."""
    S = Xs.shape[0]
    chunks, S_c = _fleet_chunk_plan(S, Xs.shape[1], Xs.shape[2])
    if chunks is None:
        # device_get batches the device->host copies (per-leaf np.asarray
        # would serialize one ~24 ms tunnel round-trip per grid cell)
        return jax.device_get(run(stacked_params, Xs, n_real, smooth))

    def cut(tree, start):
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves and isinstance(leaves[0], jax.Array):
            return _cut_tree_device(tree, start, size=S_c)
        return jax.tree_util.tree_map(
            lambda x: x[start:start + S_c], tree)

    full = None
    for start, size in chunks:
        start_c = min(start, S - size)  # slide the tail chunk back
        off = start - start_c
        sub = jax.device_get(
            run(cut(stacked_params, start_c), cut(Xs, start_c),
                np.asarray(n_real)[start_c:start_c + size],
                np.asarray(smooth)[start_c:start_c + size]))
        if isinstance(sub, dict):
            if full is None:
                full = {k: np.zeros((S,) + v.shape[1:], v.dtype)
                        for k, v in sub.items()}
            for k, v in sub.items():
                full[k][start:start_c + size] = v[off:]
        else:
            if full is None:
                full = np.zeros((S,) + sub.shape[1:], sub.dtype)
            full[start:start_c + size] = sub[off:]
    return full


# ---------------------------------------------------------------------------
# grid detection: every (rec_error x combination) cell from ONE program
# ---------------------------------------------------------------------------

EUCL_COMBOS = ("mult", "sum", "rec", "critic")


def _validate_grid(hyperbolic, combinations, rec_errors, multivariate=False):
    """Shared cell validation for the grid detectors: dedupe (keeping
    order), reject combinations invalid for the path, reject unknown
    rec_errors. Returns the deduped static tuples."""
    combinations = tuple(dict.fromkeys(combinations))
    valid = (CRITIC_COMBOS + ("rec", "rec_uncertainty")
             if (hyperbolic or multivariate) else EUCL_COMBOS)
    bad = [cb for cb in combinations if cb not in valid]
    if bad:
        raise ValueError(f"unknown combination(s) {bad} for this path; "
                         f"valid: {sorted(valid)}")
    rec_errors = tuple(dict.fromkeys(rec_errors))
    for re_ in rec_errors:
        if re_ not in ("point", "area", "dtw"):
            raise ValueError(f"unknown rec_error {re_!r}")
    return combinations, rec_errors


def _grid_core(params, X, hyperbolic, combinations, rec_errors, width,
               smooth_window, use_pallas, lambda_rec=0.5, mesh=None,
               multivariate=False, n_real=None):
    """Traced body of the grid detector: ONE forward pass, ONE critic KDE
    pipeline, one unroll per requested rec_error — then every combination
    tail. Returns a flat dict keyed ``comb`` (hyperbolic / multivariate) or
    ``"{rec_error}/{comb}"`` (euclidean).

    ``n_real``: optional traced real-window count for the padded fleet path
    (detect_scores_fleet_grid) — every reduction then runs over the real
    prefix (same contract as _detect_core); positions past n_real are pad
    garbage the host slices off."""
    c = _row_constraint(mesh)
    Xc = c(X)
    z = encoder_apply(params["encoder"], Xc)
    critic = critic_x_apply(params["critic_x"], Xc)[:, 0]
    need_critic = any(cb in CRITIC_COMBOS for cb in combinations)
    critic_scores = None
    if need_critic:
        critic_scores = _critic_scores_core(critic, width, smooth_window,
                                            use_pallas, mesh, n_real=n_real)
    if hyperbolic or multivariate:
        if hyperbolic:
            recons, _ = decoder_apply(params["decoder"], z, hyperbolic=True)
            other = mobius_linear(params["decoder"]["hyperbolic_linear"], Xc)
        else:  # euclidean multivariate
            recons, other = decoder_apply(params["decoder"], z), Xc
        if multivariate:
            if hyperbolic:
                raw = st.acosh_poincare_distance(c(recons), c(other))
            else:
                raw = jnp.linalg.norm(c(other) - c(recons), axis=1)
            if n_real is None:
                z = zscore(raw)
            else:  # the exact _mv_scores_core masked tail (fleet path)
                from hypad_tpu.ops.rolling import zscore_masked

                z = zscore_masked(raw, jnp.arange(raw.shape[0]) < n_real)
            rec_scores = jnp.clip(z, 0.0, None) + 1.0
        else:
            rec_scores = st.acosh_poincare_distance(c(recons), c(other))
        cs = (critic_scores[: rec_scores.shape[0]] if need_critic else [])
        return {cb: _combine_device(
                    cb, cs if cb in CRITIC_COMBOS else [], rec_scores, recons)
                for cb in combinations}
    recon = decoder_apply(params["decoder"], z)
    out = {}
    for rec_error in rec_errors:
        errors, _ = _rec_errors_core(Xc, c(recon), rec_error, smooth_window,
                                     mesh=mesh, n_real=n_real)
        if n_real is None:
            zs = zscore(errors)
        else:  # the exact _eucl_scores_core masked tail (fleet path)
            from hypad_tpu.ops.rolling import zscore_masked

            zs = zscore_masked(
                errors, jnp.arange(errors.shape[0]) < n_real + width - 1)
        rec_scores = jnp.clip(zs, 0.0, None) + 1.0
        for cb in combinations:
            # the exact _eucl_scores_core combination tail
            if cb == "mult":
                s = critic_scores * rec_scores
            elif cb == "sum":
                s = ((1 - lambda_rec) * (critic_scores - 1)
                     + lambda_rec * (rec_scores - 1))
            elif cb == "rec":
                s = rec_scores
            else:  # "critic" (validated in the wrapper)
                s = critic_scores
            out[f"{rec_error}/{cb}"] = s
    return out


_STATIC_GRID = ("hyperbolic", "combinations", "rec_errors", "width",
                "smooth_window", "use_pallas", "mesh", "multivariate")
_grid_device = functools.partial(
    jax.jit, static_argnames=_STATIC_GRID)(_grid_core)


def detect_scores_grid(params, X, hyperbolic, combinations,
                       rec_errors=("point",), mesh=None, multivariate=False):
    """Every (rec_error x combination) detection cell from ONE device
    program.

    The reference's README documents sweeping ``rec_error`` and
    ``combination`` as detection flags (reference README.md:87-89), served
    by re-running ``anomaly_detection.py`` per cell with ``load: true`` so
    the cached inference tensors are reused — each cell still pays a full
    process start plus every scoring-stage dispatch. Here the whole grid is
    one traced program: the forward pass and the critic KDE pipeline are
    computed once, each requested rec_error's unroll once, and only the
    (cheap) combination tails fan out — XLA CSEs everything shared, and all
    cells come back in one transfer.

    Returns ``{(rec_error|None, combination): (T,) np.ndarray}`` — the
    rec_error slot is None for hyperbolic/multivariate cells (their rec
    scores don't take a rec_error). Cell values are identical to the
    per-cell ``score_anomalies_*`` outputs (tests/test_grid.py).

    ``X`` may be a device-resident jax.Array (no upload), like
    ``detect_scores``. Beyond ``ONE_CALL_MAX_WINDOWS`` the forward pass
    falls back to the chunked ``run_inference`` (bounding HBM exactly like
    ``detect_scores``) and each cell is scored from the shared inference —
    the reference's own ``load: true`` workflow.
    """
    combinations, rec_errors = _validate_grid(hyperbolic, combinations,
                                              rec_errors, multivariate)
    if (hyperbolic or multivariate) and len(rec_errors) > 1:
        import warnings

        warnings.warn(
            "rec_errors apply only to the euclidean univariate path; the "
            f"{'hyperbolic' if hyperbolic else 'multivariate'} grid keys "
            "cells by combination alone and the requested rec_error sweep "
            "collapses to one row per combination", stacklevel=2)
    if len(X) > ONE_CALL_MAX_WINDOWS:
        # chunked fallback, shared inference + per-cell scoring (the
        # detect_scores fallback's grid twin)
        X_in = np.asarray(X, np.float32)
        inference = run_inference(params, X_in, hyperbolic, mesh=mesh)
        out = {}
        for cb in combinations:
            if multivariate:
                out[(None, cb)] = score_anomalies_multivariate(
                    inference, cb, hyperbolic, mesh=mesh)
            elif hyperbolic:
                out[(None, cb)] = score_anomalies_hyperbolic(
                    inference, cb, mesh=mesh)
            else:
                for re_ in rec_errors:
                    out[(re_, cb)] = score_anomalies_euclidean(
                        inference.true_signal, inference.recons_signal,
                        inference.critic_score, rec_error_type=re_,
                        comb=cb, mesh=mesh)
        return out
    if isinstance(X, jax.Array):
        if X.dtype != jnp.float32:
            X = X.astype(jnp.float32)
    else:
        X = jnp.asarray(np.asarray(X, np.float32))
    n, w = X.shape
    smooth_window = max(math.trunc(n * 0.01), 1)
    out = _grid_device(params, X, hyperbolic, combinations, rec_errors, w,
                       smooth_window, _use_pallas_kde(), mesh=mesh,
                       multivariate=multivariate)
    out = jax.device_get(out)
    if hyperbolic or multivariate:
        return {(None, cb): np.asarray(v) for cb, v in out.items()}
    return {(k.split("/")[0], k.split("/")[1]): np.asarray(v)
            for k, v in out.items()}


_STATIC_FLEET_GRID = ("hyperbolic", "combinations", "rec_errors", "width",
                      "use_pallas", "mesh", "multivariate", "snap")


@functools.partial(jax.jit, static_argnames=_STATIC_FLEET_GRID)
def _detect_fleet_grid_device(stacked_params, Xs, n_real, smooth_window,
                              hyperbolic, combinations, rec_errors, width,
                              use_pallas, mesh=None, multivariate=False,
                              snap=False):
    from hypad_tpu.parallel.mesh import shard_leading

    constrain = shard_leading(mesh)
    stacked_params = constrain(stacked_params)
    Xs = constrain(Xs)

    def one(params, X, n, w):
        cells = _grid_core(params, X, hyperbolic, combinations, rec_errors,
                           width, w, use_pallas, mesh=None,
                           multivariate=multivariate, n_real=n)
        if snap:
            L = n if (hyperbolic or multivariate) else n + width - 1
            cells = {k: _snap_scores_device(v, L) for k, v in cells.items()}
        return cells

    return jax.vmap(one)(stacked_params, Xs, n_real, smooth_window)


def detect_scores_fleet_grid(stacked_params, X_list, hyperbolic,
                             combinations, rec_errors=("point",), mesh=None,
                             staged=None, canonical=True,
                             multivariate=False):
    """A whole signal family x the whole (rec_error x combination) grid in
    ONE vmapped program — the composition of ``detect_scores_fleet`` (S
    signals' forwards + ragged scoring vmapped over a padded stack) and
    ``detect_scores_grid`` (shared stages computed once, only combination
    tails fan out).

    The reference equivalent is S x cells ``anomaly_detection.py`` re-runs
    (reference README.md:87-89 per cell, one process per signal each); here
    model selection over a family — "which (rec_error, combination) works
    best across these signals?" — is one compile and one transfer.

    ``staged`` as in ``detect_scores_fleet``; HBM-bounded signal chunking
    as there (``FLEET_MAX_PAIR_ELEMS``); ``canonical`` shape-bucket padding
    as there; ``multivariate`` (N_i, F) rows + the mv scoring tail as there
    (mv cells are keyed by combination alone, like hyperbolic ones).
    Returns a list of S dicts ``{(rec_error|None, combination): scores}``,
    each cell identical to the per-signal ``detect_scores_grid`` output
    (tests/test_grid.py::test_fleet_grid_*, tests/test_fleet_mv.py).
    """
    combinations, rec_errors = _validate_grid(hyperbolic, combinations,
                                              rec_errors, multivariate)
    S_real = len(X_list)
    ndev = int(mesh.devices.size) if mesh is not None else 1
    Xs, n_real, smooth = _fleet_stage(X_list, staged, canonical, ndev)
    if canonical:
        stacked_params, Xs, n_real, smooth = _canonical_pad_cached(
            stacked_params, Xs, n_real, smooth, ndev)
    width = Xs.shape[2]

    # jnp/XLA KDE backend, as in detect_scores_fleet (Mosaic is 2-D-only)
    def run(p, x, n, sm):
        return _detect_fleet_grid_device(
            p, jnp.asarray(x), jnp.asarray(n), jnp.asarray(sm), hyperbolic,
            combinations, rec_errors, width, False, mesh=mesh,
            multivariate=multivariate, snap=canonical)

    out = _fleet_chunked(run, stacked_params, Xs, n_real, smooth)
    lens = [int(n) if (hyperbolic or multivariate) else int(n) + width - 1
            for n in n_real[:S_real]]
    # canonical noise-snapping is applied inside the program
    # (`_snap_scores_device`), so the host epilogue only slices + fetches
    per_signal = []
    for i, L in enumerate(lens):
        if hyperbolic or multivariate:
            cells = {(None, cb): np.asarray(v[i, :L])
                     for cb, v in out.items()}
        else:
            cells = {(k.split("/")[0], k.split("/")[1]):
                     np.asarray(v[i, :L]) for k, v in out.items()}
        per_signal.append(cells)
    return per_signal


def score_anomalies_multivariate(inference: InferenceOutput, combination,
                                 hyperbolic, mesh=None):
    """Multivariate scoring (:153-196): per-timestep scores over (N, F).
    Fused into a single jitted program like the univariate paths."""
    n, w = np.shape(inference.true_signal)
    smooth_window = max(math.trunc(n * 0.01), 1)
    out = _mv_scores_fused(
        jnp.asarray(inference.recons_signal, jnp.float32),
        jnp.asarray(inference.true_signal, jnp.float32),
        jnp.asarray(inference.critic_score, jnp.float32),
        combination, hyperbolic, w, smooth_window, _use_pallas_kde(),
        mesh=mesh)
    return np.asarray(out)
