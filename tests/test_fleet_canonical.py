"""Canonical fleet program shapes (detect/scorer.canonical_fleet_shape).

Every fleet / fleet-grid detection call pads its (S, N, W) stack to a small
set of compiled shapes so different families REUSE each other's XLA
programs — on the tunneled TPU backend a novel shape costs 40-200 s of
remote compile while the pad rows cost microseconds of vmapped compute
(round-3 measurement: A1's novel S=67 grid shape cost 51.5 s while A4
reused A3's S=100 shape and ran in 14.2 s). No reference equivalent (the
reference re-runs anomaly_detection.py per signal, one process per shape).

Assertions:
  * canonical=True scores match canonical=False at the fleet anchor
    tolerance (bit-identity is impossible: padded GEMM/reduce shapes tile
    differently — the PARITY.md fleet-vs-sequential noise class);
  * two families with different (S, N) inside one bucket hit the SAME
    compiled program (jit cache size does not grow on the second family);
  * the shape bucket math (rung ladder, pow2 signals, HBM chunk cap).
"""

import jax
import numpy as np
import pytest

from hypad_tpu.detect import scorer as sc
from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import fleet as fl

W = 100


def _toy_windows(n, seed):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n + W)
    s = np.sin(t) + 0.05 * rng.standard_normal(n + W)
    X = np.stack([s[i:i + W] for i in range(n)]).astype(np.float32)
    return np.clip(X, -1, 1)


def _family(lens, hyperbolic, seed0=7):
    params = [init_tadgan(jax.random.PRNGKey(seed0 + i), signal_shape=W,
                          hyperbolic=hyperbolic) for i in range(len(lens))]
    X_list = [_toy_windows(n, seed=seed0 + 10 + i)
              for i, n in enumerate(lens)]
    return fl.stack_states(params), X_list


def test_canonical_fleet_shape_buckets():
    # window axis rounds up the 128/192 rung ladder
    assert sc.canonical_fleet_shape(3, 210, W) == (4, 256)
    assert sc.canonical_fleet_shape(3, 256, W) == (4, 256)
    assert sc.canonical_fleet_shape(3, 257, W) == (4, 384)
    assert sc.canonical_fleet_shape(1, 100, W)[1] == 128
    # signal axis rounds up the 4/6-based x1.33-1.5 ladder (floor 4)
    assert sc.canonical_fleet_shape(1, 210, W)[0] == 4
    assert sc.canonical_fleet_shape(5, 210, W)[0] == 6
    assert sc.canonical_fleet_shape(9, 1320, W)[0] == 12
    # past the HBM chunk cap the canonical S is the chunk size itself, so
    # A1 (S=67, padded) and A3/A4 (S=100, chunked) share one program shape
    s67, n67 = sc.canonical_fleet_shape(67, 1320, W)
    s100, n100 = sc.canonical_fleet_shape(100, 1320, W)
    assert (s67, n67) == (s100, n100)
    per_signal = (n67 + W - 1) * W * W
    assert s67 == sc.FLEET_MAX_PAIR_ELEMS // per_signal
    # beyond the ladder: exact window shape (no rung)
    big = max(sc.FLEET_N_RUNGS)
    assert sc.canonical_fleet_shape(1, big + 1, W)[1] == big + 1


def test_canonical_shape_capped_by_chunk_plan(monkeypatch):
    # with a 2-signal HBM budget the canonical S is the chunk size, and
    # over-budget fleets take no signal padding (the chunk plan carves them
    # into fixed-size chunks that are already one canonical shape)
    monkeypatch.setattr(sc, "FLEET_MAX_PAIR_ELEMS",
                        2 * (256 + W - 1) * W * W)
    assert sc.canonical_fleet_shape(1, 210, W) == (2, 256)
    assert sc.canonical_fleet_shape(2, 210, W) == (2, 256)
    assert sc.canonical_fleet_shape(3, 210, W) == (2, 256)
    chunks, S_c = sc._fleet_chunk_plan(3, 256, W)
    assert S_c == 2 and chunks == [(0, 2), (2, 2)]


@pytest.mark.parametrize("hyperbolic,combination", [
    (False, "mult"), (True, "uncertainty"),
])
def test_canonical_matches_uncanonical(hyperbolic, combination):
    stacked, X_list = _family((210, 150, 90), hyperbolic)
    want = sc.detect_scores_fleet(stacked, X_list, hyperbolic, combination,
                                  canonical=False)
    got = sc.detect_scores_fleet(stacked, X_list, hyperbolic, combination,
                                 canonical=True)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=1e-5)


def test_canonical_grid_matches_uncanonical():
    stacked, X_list = _family((210, 150, 90), False)
    kw = dict(combinations=("mult", "rec"), rec_errors=("point", "dtw"))
    want = sc.detect_scores_fleet_grid(stacked, X_list, False,
                                       canonical=False, **kw)
    got = sc.detect_scores_fleet_grid(stacked, X_list, False,
                                      canonical=True, **kw)
    for gcells, wcells in zip(got, want):
        assert gcells.keys() == wcells.keys()
        for k in wcells:
            np.testing.assert_allclose(gcells[k], wcells[k],
                                       rtol=3e-4, atol=1e-5)


def test_canonical_staged_device_stack():
    """A device-resident staged stack is padded ON DEVICE to the canonical
    shape and scores match the host-list path."""
    import jax.numpy as jnp

    stacked, X_list = _family((210, 150, 90), False)
    want = sc.detect_scores_fleet(stacked, X_list, False, "mult")
    n_max = max(len(x) for x in X_list)
    Xs = np.zeros((len(X_list), n_max, W), np.float32)
    for i, x in enumerate(X_list):
        Xs[i, : len(x)] = x
    staged = (jnp.asarray(Xs),
              np.asarray([len(x) for x in X_list], np.int32))
    got = sc.detect_scores_fleet(stacked, X_list, False, "mult",
                                 staged=staged)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=1e-5)


def test_canonical_training_matches_unvmapped_body():
    """train_fleet(canonical=True) pads to (S=4, N=128) here and must equal
    the un-vmapped ragged epoch body run per signal on the SAME padded
    shape with the same key schedule — i.e. canonical mode is exactly
    'ragged mode at the bucket shape', bitwise."""
    import jax.numpy as jnp

    from hypad_tpu.train import trainer as tr

    def params():
        return [init_tadgan(jax.random.PRNGKey(i), signal_shape=W,
                            hyperbolic=False) for i in range(2)]

    X_list = [_toy_windows(96, seed=0), _toy_windows(64, seed=1)]
    fstate = fl.init_fleet_state(params(), lr=5e-4, hyperbolic=False)
    fstate, (Xs, lens) = fl.train_fleet(
        fstate, X_list, lr=5e-4, hyperbolic=False, batch_size=32,
        n_epochs=3, seed=0, canonical=True, return_staged=True)
    assert Xs.shape == (4, 128, W)          # canonical bucket, not (2, 96+)
    assert list(lens) == [96, 64]

    body = jax.jit(tr._make_epoch_body(5e-4, False, 32,
                                       constrain=lambda b: b, ragged=True))
    Xpad, n_real = fl.pad_and_stack(X_list, target_len=128)
    base = jax.random.PRNGKey(0)
    for i, p in enumerate(params()):
        st = tr.init_train_state(p, lr=5e-4, hyperbolic=False)
        for k in jax.random.split(jax.random.fold_in(base, 0), 2):
            st, _ = body(st, jnp.asarray(Xpad[i]), k, jnp.int32(n_real[i]))
        st, _ = body(st, jnp.asarray(Xpad[i]), jax.random.fold_in(base, 2),
                     jnp.int32(n_real[i]))
        for a, b in zip(jax.tree_util.tree_leaves(st.params),
                        jax.tree_util.tree_leaves(
                            fl.unstack_state(fstate, i).params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_canonical_training_rejects_forced_nonragged():
    X_list = [_toy_windows(96, seed=0)]
    fstate = fl.init_fleet_state(
        [init_tadgan(jax.random.PRNGKey(0), signal_shape=W,
                     hyperbolic=False)], lr=5e-4, hyperbolic=False)
    with pytest.raises(ValueError, match="ragged"):
        fl.train_fleet(fstate, X_list, lr=5e-4, hyperbolic=False,
                       batch_size=32, n_epochs=1, canonical=True,
                       ragged=False)


def test_canonical_staged_feeds_canonical_detection():
    """The canonical training stack is already at the detection bucket, so
    detection's own canonical pad is a no-op on it (shape check) and the
    staged scores match the unstaged fleet scores."""
    X_list = [_toy_windows(96, seed=0), _toy_windows(64, seed=1)]
    fstate = fl.init_fleet_state(
        [init_tadgan(jax.random.PRNGKey(i), signal_shape=W,
                     hyperbolic=False) for i in range(2)],
        lr=5e-4, hyperbolic=False)
    fstate, staged = fl.train_fleet(
        fstate, X_list, lr=5e-4, hyperbolic=False, batch_size=32,
        n_epochs=1, seed=0, canonical=True, return_staged=True)
    params2 = jax.tree_util.tree_map(lambda x: x[:2], fstate.params)
    want = sc.detect_scores_fleet(params2, X_list, False, "mult")
    got = sc.detect_scores_fleet(params2, X_list, False, "mult",
                                 staged=staged)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=1e-5)


def test_canonical_shape_mesh_divisible():
    # with a mesh, the signal rung rounds up to the device-count multiple —
    # the SAME rounding train_fleet(canonical=True) applies, so the staged
    # accept in _fleet_stage fires on a mesh too
    assert sc.canonical_fleet_shape(9, 1320, W, ndev=8)[0] == 16
    assert sc.canonical_fleet_shape(3, 210, W, ndev=8)[0] == 8
    assert sc.canonical_fleet_shape(5, 210, W, ndev=4)[0] == 8
    # ndev=1 keeps the plain ladder
    assert sc.canonical_fleet_shape(9, 1320, W, ndev=1)[0] == 12


def test_canonical_staged_accept_fires_on_mesh():
    """train_fleet(canonical=True) on a mesh pads the signal axis to the
    device-multiple rung; detection's staged accept must recognize that
    shape and use the stack AS-IS (zero copies) rather than slicing back to
    the real S and re-padding per call — and the mesh-sharded scores must
    match the meshless unstaged path."""
    from hypad_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("all")
    ndev = int(mesh.devices.size)
    X_list = [_toy_windows(96, seed=0), _toy_windows(64, seed=1),
              _toy_windows(80, seed=2)]
    fstate = fl.init_fleet_state(
        [init_tadgan(jax.random.PRNGKey(i), signal_shape=W,
                     hyperbolic=False) for i in range(3)],
        lr=5e-4, hyperbolic=False)
    fstate, staged = fl.train_fleet(
        fstate, X_list, lr=5e-4, hyperbolic=False, batch_size=32,
        n_epochs=1, seed=0, canonical=True, mesh=mesh, return_staged=True)
    S_want = sc.canonical_fleet_shape(3, 128, W, ndev)[0]
    assert staged[0].shape[0] == S_want and S_want % ndev == 0

    # the accept itself: the staged stack comes back untouched
    Xs, n_real, _ = sc._fleet_stage(X_list, staged, True, ndev)
    assert Xs is staged[0]
    assert list(n_real[:3]) == [96, 64, 80]

    params3 = jax.tree_util.tree_map(lambda x: x[:3], fstate.params)
    want = sc.detect_scores_fleet(params3, X_list, False, "mult")
    got = sc.detect_scores_fleet(params3, X_list, False, "mult",
                                 staged=staged, mesh=mesh)
    assert [len(g) for g in got] == [len(w) for w in want]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=7e-5)


def test_two_families_share_one_compiled_program():
    """The whole point: family B (different S, different N, same bucket)
    pays ZERO novel fleet-program compiles after family A ran."""
    stacked_a, X_a = _family((210, 150, 90), True, seed0=3)
    sc.detect_scores_fleet(stacked_a, X_a, True, "uncertainty")
    size_after_a = sc._detect_fleet_device._cache_size()

    stacked_b, X_b = _family((240, 230), True, seed0=40)
    assert (sc.canonical_fleet_shape(2, 240, W)
            == sc.canonical_fleet_shape(3, 210, W))
    out = sc.detect_scores_fleet(stacked_b, X_b, True, "uncertainty")
    assert sc._detect_fleet_device._cache_size() == size_after_a
    assert [len(o) for o in out] == [240, 230]

    # ... and the grid program likewise
    kw = dict(combinations=("uncertainty", "rec"))
    sc.detect_scores_fleet_grid(stacked_a, X_a, True, **kw)
    size_after_a = sc._detect_fleet_grid_device._cache_size()
    sc.detect_scores_fleet_grid(stacked_b, X_b, True, **kw)
    assert sc._detect_fleet_grid_device._cache_size() == size_after_a


def test_canonical_pad_memo_reuses_staged_family():
    """Re-scoring the SAME staged (params, stack) must reuse the padded
    device arrays verbatim (the per-call pad dispatch chain measured
    ~10-30 ms of tunnel round-trips at S=81, tools/fleet81_probe.py), and
    a different family must miss and repad."""
    import jax.numpy as jnp

    stacked, X_list = _family((210, 150, 90), False)
    n_max = max(len(x) for x in X_list)
    Xs = np.zeros((len(X_list), n_max, W), np.float32)
    for i, x in enumerate(X_list):
        Xs[i, : len(x)] = x
    staged = (jnp.asarray(Xs),
              np.asarray([len(x) for x in X_list], np.int32))

    sc._CANON_MEMO.clear()
    first = sc.detect_scores_fleet(stacked, X_list, False, "mult",
                                   staged=staged)
    assert len(sc._CANON_MEMO) == 1
    (entry,) = sc._CANON_MEMO.values()
    padded_stack_1 = entry[2][1]
    second = sc.detect_scores_fleet(stacked, X_list, False, "mult",
                                    staged=staged)
    (entry2,) = sc._CANON_MEMO.values()
    assert entry2[2][1] is padded_stack_1          # verbatim reuse
    for a, b in zip(first, second):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a different staged family invalidates (one-entry memo)
    stacked_b, X_b = _family((240, 230), False, seed0=41)
    Xs_b = np.zeros((2, 240, W), np.float32)
    for i, x in enumerate(X_b):
        Xs_b[i, : len(x)] = x
    staged_b = (jnp.asarray(Xs_b), np.asarray([240, 230], np.int32))
    want_b = sc.detect_scores_fleet(stacked_b, X_b, False, "mult")
    got_b = sc.detect_scores_fleet(stacked_b, X_b, False, "mult",
                                   staged=staged_b)
    (entry3,) = sc._CANON_MEMO.values()
    assert entry3[2][1] is not padded_stack_1
    for g, w in zip(got_b, want_b):
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=7e-5)


def test_snap_noise_restores_exact_zeros():
    """Canonical tiling noise turns the exact path's EXACT ZEROS into ~ulp
    residue, which find_anomalies' per-window mean+4sigma thresholds
    amplify into phantom intervals on flat score runs (SMAP D-9 point/sum:
    F1 1.0 -> 0.5 from 5.96e-8 noise on a 6,377-point zero run). The snap
    floors |s| <= 256 ulp of the peak back to exact zero and leaves real
    scores untouched."""
    eps = np.finfo(np.float32).eps
    s = np.array([0.0, 2 * eps, -30 * eps, 1e-3, 2.0, -1.5], np.float32)
    got = sc._snap_noise(s)
    np.testing.assert_array_equal(
        got, np.array([0, 0, 0, 1e-3, 2.0, -1.5], np.float32))
    assert got.dtype == np.float32
    # all-zero row: floor 0, nothing to snap, no nan
    np.testing.assert_array_equal(
        sc._snap_noise(np.zeros(5, np.float32)), np.zeros(5, np.float32))
    assert sc._snap_noise(np.zeros(0, np.float32)).size == 0


def test_canonical_zero_runs_survive_padding():
    """End-to-end: a signal whose exact per-signal scores contain exact
    zeros must yield exact zeros from the canonical fleet path at those
    positions (the D-9 regression class)."""
    stacked, X_list = _family((210, 150, 90), False)
    per = [sc.detect_scores(
        jax.tree_util.tree_map(lambda x, i=i: x[i], stacked),
        X, False, "sum", rec_error="point", fetch_inference=False)[0]
        for i, X in enumerate(X_list)]
    fleet = sc.detect_scores_fleet(stacked, X_list, False, "sum",
                                   rec_error="point", canonical=True)
    for p, f in zip(per, fleet):
        p = np.asarray(p)
        zeros = p == 0
        if zeros.any():
            assert (np.asarray(f)[zeros] == 0).all()
        # documented canonical tiling-noise bound (<=7e-5 euclidean)
        np.testing.assert_allclose(f, p, rtol=3e-4, atol=7e-5)


def test_snap_device_matches_host():
    """`_snap_scores_device` (in-program, round 5) must reproduce the host
    `_snap_noise` oracle bitwise on the real prefix, ignoring pad rows —
    including NaN propagation and all-zero rows."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    eps = np.finfo(np.float32).eps
    cases = [
        np.array([0.0, 2 * eps, -30 * eps, 1e-3, 2.0, -1.5], np.float32),
        np.zeros(6, np.float32),
        rng.normal(size=6).astype(np.float32) * 1e-5,
        np.array([np.nan, 1.0, 2 * eps, 0.0, -1.0, 3.0], np.float32),
    ]
    for s in cases:
        for L in (6, 4):
            padded = np.concatenate([s, np.full(3, 7.0, np.float32)])
            got = np.asarray(
                sc._snap_scores_device(jnp.asarray(padded), L))[:L]
            want = sc._snap_noise(s[:L])
            np.testing.assert_array_equal(got, want)
