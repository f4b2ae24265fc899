"""Fleet detector tests: one vmapped detection program over a padded,
ragged signal family vs the per-signal one-call path.

The fleet detector has no reference equivalent (the reference re-runs
anomaly_detection.py per signal); equality against ``detect_scores`` —
itself golden vs the reference scoring stages (tests/test_scoring.py) —
is the correctness anchor. The family is deliberately ragged (210/150/90
windows) so the traced per-signal smooth windows differ (2/1/1) and every
masked reduction (KDE mask, quantiles, std, rolling bounds, dtw
boundaries, zscore) is exercised off the static path.
"""

import jax
import numpy as np
import pytest

from hypad_tpu.detect import scorer as sc
from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.parallel.mesh import make_mesh
from hypad_tpu.train import fleet as fl

W = 100
LENS = (210, 150, 90)


def _toy_windows(n, seed):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n + W)
    s = np.sin(t) + 0.05 * rng.standard_normal(n + W)
    X = np.stack([s[i:i + W] for i in range(n)]).astype(np.float32)
    return np.clip(X, -1, 1)


def _family(hyperbolic):
    params = [init_tadgan(jax.random.PRNGKey(7 + i), signal_shape=W,
                          hyperbolic=hyperbolic)
              for i in range(len(LENS))]
    X_list = [_toy_windows(n, seed=i) for i, n in enumerate(LENS)]
    return fl.stack_states(params), params, X_list


def _per_signal(params, X_list, hyperbolic, combination, rec_error):
    return [sc.detect_scores(p, X, hyperbolic, combination,
                             rec_error=rec_error, fetch_inference=False)[0]
            for p, X in zip(params, X_list)]


@pytest.mark.parametrize("combination,rec_error", [
    ("mult", "point"),
    ("mult", "dtw"),
    ("sum", "area"),
    ("critic", "point"),
    ("rec", "point"),
])
def test_fleet_matches_per_signal_euclidean(combination, rec_error):
    stacked, params, X_list = _family(False)
    expected = _per_signal(params, X_list, False, combination, rec_error)
    got = sc.detect_scores_fleet(stacked, X_list, False, combination,
                                 rec_error=rec_error)
    assert len(got) == len(expected)
    for e, g in zip(expected, got):
        assert g.shape == e.shape
        np.testing.assert_allclose(g, e, rtol=3e-4, atol=1e-5)


@pytest.mark.parametrize("combination", [
    "uncertainty", "mult", "critic_uncertainty", "rec",
])
def test_fleet_matches_per_signal_hyperbolic(combination):
    stacked, params, X_list = _family(True)
    expected = _per_signal(params, X_list, True, combination, "point")
    got = sc.detect_scores_fleet(stacked, X_list, True, combination)
    for e, g in zip(expected, got):
        assert g.shape == e.shape
        np.testing.assert_allclose(g, e, rtol=3e-4, atol=1e-5)


def test_fleet_equal_length_family():
    """Equal lengths (no padding) still go through the ragged program and
    must match the per-signal path."""
    params = [init_tadgan(jax.random.PRNGKey(i), signal_shape=W,
                          hyperbolic=True) for i in range(2)]
    X_list = [_toy_windows(120, seed=10 + i) for i in range(2)]
    expected = _per_signal(params, X_list, True, "uncertainty", "point")
    got = sc.detect_scores_fleet(fl.stack_states(params), X_list, True,
                                 "uncertainty")
    for e, g in zip(expected, got):
        np.testing.assert_allclose(g, e, rtol=3e-4, atol=1e-5)


def test_fleet_detect_staged_stack_matches():
    """A pre-staged (device-resident) padded stack — incl. extra padding
    and trailing dummy rows, as train_fleet's mesh path produces — gives
    identical scores to the host-list path."""
    import jax.numpy as jnp

    stacked, params, X_list = _family(False)
    want = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    n_max = max(len(x) for x in X_list) + 5      # longer-padded than needed
    Xs = np.zeros((len(X_list) + 2, n_max, W), np.float32)  # +2 dummies
    for i, x in enumerate(X_list):
        Xs[i, : len(x)] = x
    staged = (jnp.asarray(Xs),
              np.asarray([len(x) for x in X_list] + [1, 1], np.int32))
    got = sc.detect_scores_fleet(stacked, X_list, False, "mult",
                                 staged=staged)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=1e-5)


def test_fleet_detect_staged_mismatch_raises():
    stacked, params, X_list = _family(False)
    bad = (np.zeros((3, 50, W), np.float32),
           np.asarray([len(x) for x in X_list], np.int32))
    with pytest.raises(ValueError):
        sc.detect_scores_fleet(stacked, X_list, False, "mult", staged=bad)


def test_fleet_detect_sharded_matches_single():
    """Signal-axis sharding over the 8-device CPU mesh changes nothing."""
    stacked, params, X_list = _family(False)
    mesh = make_mesh("all")
    single = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    sharded = sc.detect_scores_fleet(stacked, X_list, False, "mult",
                                     mesh=mesh)
    for s1, s2 in zip(single, sharded):
        np.testing.assert_allclose(s2, s1, rtol=3e-4, atol=1e-5)


def test_fleet_detect_chunked_matches_full(monkeypatch):
    """Families whose stacked KDE pair tensor would exceed the HBM budget
    run as overlapping fixed-shape signal chunks through one compiled
    program; per-signal scores must match the single-call fleet program."""
    stacked, params, X_list = _family(False)
    full = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    # budget of 2 CANONICAL signals' pair tensors (the fleet pads N to its
    # 256 rung before chunking): 3 signals -> a full [0:2] chunk + a
    # replica-padded remainder chunk of the same bucket size
    n_bucket = sc.canonical_fleet_shape(len(X_list), max(LENS), W)[1]
    monkeypatch.setattr(sc, "FLEET_MAX_PAIR_ELEMS",
                        2 * (n_bucket + W - 1) * W * W)
    chunks, S_c = sc._fleet_chunk_plan(len(X_list), n_bucket, W)
    assert chunks == [(0, 2), (2, 2)] and S_c == 2
    chunked = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    for c, f in zip(chunked, full):
        np.testing.assert_allclose(c, f, rtol=1e-5, atol=1e-7)


def test_fleet_detect_chunked_staged_and_hyper(monkeypatch):
    """Chunking composes with the staged device-resident stack and the
    hyperbolic path."""
    import jax.numpy as jnp

    stacked, params, X_list = _family(True)
    full = sc.detect_scores_fleet(stacked, X_list, True, "uncertainty")
    n_max = max(LENS)
    Xs = np.zeros((len(X_list), n_max, W), np.float32)
    for i, x in enumerate(X_list):
        Xs[i, : len(x)] = x
    staged = (jnp.asarray(Xs), np.asarray([len(x) for x in X_list],
                                          np.int32))
    monkeypatch.setattr(sc, "FLEET_MAX_PAIR_ELEMS",
                        (n_max + W - 1) * W * W)  # one signal per chunk
    chunked = sc.detect_scores_fleet(stacked, X_list, True, "uncertainty",
                                     staged=staged)
    for c, f in zip(chunked, full):
        np.testing.assert_allclose(c, f, rtol=1e-5, atol=1e-7)


def test_fleet_chunk_plan_edges():
    assert sc._fleet_chunk_plan(1, 10_000, W) == (None, 1)
    # degenerate budget still makes progress one signal at a time
    import hypad_tpu.detect.scorer as scorer

    old = scorer.FLEET_MAX_PAIR_ELEMS
    try:
        scorer.FLEET_MAX_PAIR_ELEMS = 1
        chunks, S_c = sc._fleet_chunk_plan(3, 100, W)
        assert S_c == 1 and chunks == [(0, 1), (1, 1), (2, 1)]
    finally:
        scorer.FLEET_MAX_PAIR_ELEMS = old


def test_fleet_chunk_plan_uniform_sizes():
    """Every chunk has the SAME size S_c (one compiled shape per N rung);
    a short tail is expressed as a full-size chunk the driver slides back
    to end at S, not as a smaller remainder bucket (round 4: distinct
    remainder shapes each paid a 40-200 s novel remote compile)."""
    import hypad_tpu.detect.scorer as scorer

    old = scorer.FLEET_MAX_PAIR_ELEMS
    try:
        per = (100 + W - 1) * W * W
        scorer.FLEET_MAX_PAIR_ELEMS = 2 * per
        assert sc._fleet_chunk_plan(5, 100, W) == ([(0, 2), (2, 2), (4, 2)], 2)
        scorer.FLEET_MAX_PAIR_ELEMS = 3 * per
        assert sc._fleet_chunk_plan(5, 100, W) == ([(0, 3), (3, 3)], 3)
        assert sc._fleet_chunk_plan(3, 100, W) == (None, 3)
    finally:
        scorer.FLEET_MAX_PAIR_ELEMS = old


def test_fleet_detect_chunk_tail_overlap(monkeypatch):
    """A 5-signal family through a 3-signal budget: the tail chunk (3, 3)
    slides back to rows [2, 5) and its leading overlap row (signal 2,
    already scored by chunk one) is dropped on reassembly — per-signal
    scores must match the unchunked fleet call."""
    lens = (210, 150, 90, 180, 120)
    params = [init_tadgan(jax.random.PRNGKey(31 + i), signal_shape=W,
                          hyperbolic=False) for i in range(len(lens))]
    X_list = [_toy_windows(n, seed=10 + i) for i, n in enumerate(lens)]
    stacked = fl.stack_states(params)
    full = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    n_bucket = sc.canonical_fleet_shape(len(lens), max(lens), W)[1]
    monkeypatch.setattr(sc, "FLEET_MAX_PAIR_ELEMS",
                        3 * (n_bucket + W - 1) * W * W)
    chunks, S_c = sc._fleet_chunk_plan(len(lens), n_bucket, W)
    assert S_c == 3 and chunks == [(0, 3), (3, 3)]
    chunked = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    for c, f in zip(chunked, full):
        np.testing.assert_allclose(c, f, rtol=1e-5, atol=1e-7)


def test_fleet_detect_chunked_on_mesh(monkeypatch):
    """HBM chunking composes with signal-axis dp sharding: each <=S_c
    chunk is itself sharded over the mesh (GSPMD pads uneven shards)."""
    stacked, params, X_list = _family(False)
    full = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    monkeypatch.setattr(sc, "FLEET_MAX_PAIR_ELEMS",
                        2 * (max(LENS) + W - 1) * W * W)
    mesh = make_mesh("all")
    chunked = sc.detect_scores_fleet(stacked, X_list, False, "mult",
                                     mesh=mesh)
    for c, f in zip(chunked, full):
        np.testing.assert_allclose(c, f, rtol=3e-4, atol=1e-5)
