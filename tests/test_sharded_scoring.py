"""dp-sharded scoring == single-device scoring (SURVEY §2.3 scoring
parallelism; round-1 review item 1). Runs on the 8-virtual-CPU-device mesh
from conftest; every stage of the detection pipeline — inference forward,
KDE critic smoothing, reconstruction errors, hyperbolic window scores, the
full score_anomalies entries — must produce the same numbers sharded and
unsharded."""

import numpy as np
import pytest

import jax

from hypad_tpu.detect import scorer as sc
from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    m = make_mesh("all")
    assert m is not None and m.devices.size == 8
    return m


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, w = 403, 100  # deliberately NOT a multiple of 8 (uneven shards)
    X = rng.uniform(-1, 1, (n, w)).astype(np.float32)
    critic = rng.standard_normal(n).astype(np.float32)
    return X, critic


def test_sharded_inference_matches_single(mesh, data):
    X, _ = data
    params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                         hyperbolic=True)
    single = sc.run_inference(params, X, True)
    sharded = sc.run_inference(params, X, True, mesh=mesh)
    for a, b in zip(single, sharded):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_sharded_critic_scores_match(mesh, data):
    X, critic = data
    single = sc.final_critic_scores(critic, X)
    sharded = sc.final_critic_scores(critic, X, mesh=mesh)
    # sharded scalar reductions (quantile/mean/std) differ by
    # reduction order only
    np.testing.assert_allclose(single, sharded, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("rec_error", ["point", "area", "dtw"])
def test_sharded_reconstruction_errors_match(mesh, data, rec_error):
    X, _ = data
    rng = np.random.default_rng(1)
    y_hat = X + 0.1 * rng.standard_normal(X.shape).astype(np.float32)
    e1, p1 = sc.reconstruction_errors(X, y_hat, rec_error)
    e2, p2 = sc.reconstruction_errors(X, y_hat, rec_error, mesh=mesh)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(e1, e2, rtol=3e-4, atol=3e-5)


def test_sharded_euclidean_scoring_matches(mesh, data):
    X, critic = data
    rng = np.random.default_rng(2)
    y_hat = X + 0.1 * rng.standard_normal(X.shape).astype(np.float32)
    s1 = sc.score_anomalies_euclidean(X, y_hat, critic, "point", "mult")
    s2 = sc.score_anomalies_euclidean(X, y_hat, critic, "point", "mult",
                                      mesh=mesh)
    np.testing.assert_allclose(s1, s2, rtol=3e-4, atol=3e-5)


def test_sharded_hyperbolic_scoring_matches(mesh, data):
    X, _ = data
    params = init_tadgan(jax.random.PRNGKey(0), signal_shape=100,
                         hyperbolic=True)
    inf = sc.run_inference(params, X, True)
    s1 = sc.score_anomalies_hyperbolic(inf, "uncertainty")
    s2 = sc.score_anomalies_hyperbolic(inf, "uncertainty", mesh=mesh)
    np.testing.assert_allclose(s1, s2, rtol=3e-4, atol=3e-5)


def test_sharded_detect_end_to_end_matches(mesh, data, tmp_path):
    """Full detector orchestration sharded vs single: same intervals and
    confusion."""
    from types import SimpleNamespace

    import pandas as pd

    from hypad_tpu.data.pipeline import SignalData
    from hypad_tpu.detect.detector import detect

    X, _ = data
    n, w = X.shape
    test_data = SignalData(
        X=X, y=np.zeros((n, 1), np.float32),
        X_index=np.arange(n, dtype=np.float64),
        y_index=np.arange(n, dtype=np.float64) + w,
        index=np.arange(n + w, dtype=np.float64),
    )
    params = SimpleNamespace(signal="sig", dataset="NAB", hyperbolic=True,
                             combination="uncertainty", rec_error="point",
                             load=False, save_result=False)
    model = init_tadgan(jax.random.PRNGKey(0), signal_shape=w,
                        hyperbolic=True)
    known = pd.DataFrame({"start": [50.0], "end": [80.0]})
    r1 = detect(params, model, test_data, str(tmp_path / "single"),
                known_anomalies=known)
    r2 = detect(params, model, test_data, str(tmp_path / "sharded"),
                known_anomalies=known, mesh=mesh)
    np.testing.assert_allclose(r1["scores"], r2["scores"],
                               rtol=3e-4, atol=3e-5)
    assert [tuple(iv) for iv in r1["intervals"]] == \
           [tuple(iv) for iv in r2["intervals"]]
    assert list(r1["confusion"]) == list(r2["confusion"])


def test_sharded_pallas_kde_matches_jnp(mesh):
    """The shard_map'd Mosaic KDE (interpret mode on the CPU mesh) must
    equal the jnp reference row-for-row, including uneven row counts."""
    import jax.numpy as jnp

    from hypad_tpu.ops.kde import kde_argmax_rows
    from hypad_tpu.ops.kde_pallas import kde_argmax_rows_pallas_sharded

    rng = np.random.default_rng(7)
    T, W = 101, 40  # not a multiple of 8 -> exercises the pad+slice path
    vals = jnp.asarray(rng.standard_normal((T, W)), jnp.float32)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(W)[None, :]
    mask = (j <= (i % W)) | (j < 3)  # ragged but nonempty rows
    want = np.asarray(kde_argmax_rows(vals, mask))
    got = np.asarray(kde_argmax_rows_pallas_sharded(vals, mask, mesh,
                                                    interpret=True,
                                                    version="v1"))
    np.testing.assert_array_equal(got, want)

    # the v2 offset-rotation kernel is tie-level equal (accumulation order)
    from tests.test_pallas import assert_tie_level_equal

    got2 = np.asarray(kde_argmax_rows_pallas_sharded(vals, mask, mesh,
                                                     interpret=True,
                                                     version="v2"))
    assert_tie_level_equal(got2, want, vals, mask)
