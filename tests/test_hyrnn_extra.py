"""Tests for the hyperbolic GRU family and the auxiliary detector utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from hypad_tpu.detect import extra
from hypad_tpu.manifold import stereographic as st
from hypad_tpu.models import hyrnn
from reference_oracle import load_reference_adu


def test_mobius_gru_loop_shapes_and_ball():
    key = jax.random.PRNGKey(0)
    p = hyrnn.init_mobius_gru(key, input_size=8, hidden_size=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 8)) * 0.1
    h0 = jnp.zeros((3, 6))
    outs, h_last = hyrnn.mobius_gru_loop(
        x, h0, p["weight_ih"], p["weight_hh"], p["bias"])
    assert outs.shape == (5, 3, 6)
    assert h_last.shape == (3, 6)
    # all states stay in the (open) unit ball
    assert float(jnp.linalg.norm(outs, axis=-1).max()) < 1.0
    np.testing.assert_allclose(np.asarray(outs[-1]), np.asarray(h_last))


def test_mobius_gru_cell_gradients_finite():
    key = jax.random.PRNGKey(0)
    p = hyrnn.init_mobius_gru(key, 4, 4)

    def loss(p_):
        x = st.expmap0(jnp.full((2, 4), 0.1))
        h = st.expmap0(jnp.full((2, 4), -0.05))
        out = hyrnn.mobius_gru_cell(x, h, p_["weight_ih"], p_["weight_hh"],
                                    p_["bias"])
        return jnp.sum(st.dist0(out))

    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dist2hyperplane():
    key = jax.random.PRNGKey(0)
    p = hyrnn.init_dist2hyperplane(key, in_features=6, out_features=3)
    x = st.expmap0(jax.random.normal(jax.random.PRNGKey(1), (10, 6)) * 0.2)
    d = hyrnn.dist2hyperplane_apply(p, x)
    assert d.shape == (10, 3)
    assert np.all(np.isfinite(np.asarray(d)))


def test_pairwise_poincare_distance_symmetry_and_diag():
    x = st.expmap0(jax.random.normal(jax.random.PRNGKey(0), (7, 5)) * 0.2)
    D = np.asarray(hyrnn.pairwise_poincare_distance(x, x))
    assert D.shape == (7, 7)
    np.testing.assert_allclose(D, D.T, atol=1e-5)
    # diagonal ~ acosh(1 + eps) ~ tiny
    assert np.all(np.diag(D) < 1e-2)


# ---- auxiliary detector utils vs reference ---------------------------------

def test_ewma_matches_pandas():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(200)
    for span in (5, 20, 63):
        want = pd.Series(x).ewm(span=span).mean().values
        got = extra.ewma(x, span)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_regression_errors_matches_reference():
    adu = load_reference_adu()
    rng = np.random.default_rng(1)
    y = rng.standard_normal((300, 1))
    y_hat = y + 0.1 * rng.standard_normal((300, 1))
    want = adu.regression_errors(y, y_hat)
    got = extra.regression_errors(y, y_hat)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_prune_false_positive_matches_reference():
    adu = load_reference_adu()
    rng = np.random.default_rng(2)
    n = 120
    scores = np.abs(rng.standard_normal(n))
    is_anom = (rng.random(n) < 0.3).astype(int)
    is_anom[0] = 0
    want = adu.prune_false_positive(is_anom.copy(), scores.copy(), 0.2)
    got = extra.prune_false_positive(is_anom.copy(), scores.copy(), 0.2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_detect_anomaly_matches_reference():
    adu = load_reference_adu()
    rng = np.random.default_rng(3)
    scores = np.abs(rng.standard_normal(150))
    want = adu.detect_anomaly(scores.copy())
    got = extra.detect_anomaly(scores.copy())
    np.testing.assert_array_equal(got, np.asarray(want))


# ---- packed-sequence GRU loop: golden parity vs the reference executed ----
# from its checkout (hyperspace/hyrnn_nets.py:94-151 with the vendored math
# spec as gmath), float64 torch vs our float32 masked scan.

def _ref_hyrnn():
    from reference_oracle import load_reference_hyrnn

    return load_reference_hyrnn()


def _pack(sequences):
    """list of (len_b, D) arrays (sorted by decreasing length) -> torch-style
    packed (data, batch_sizes)."""
    lengths = [len(s) for s in sequences]
    T = max(lengths)
    batch_sizes = np.array([sum(1 for L in lengths if L > t)
                            for t in range(T)])
    data = np.concatenate([
        np.stack([s[t] for s in sequences if len(s) > t])
        for t in range(T)])
    return data, batch_sizes


@pytest.mark.parametrize("hyper_in", [False, True])
def test_packed_gru_loop_matches_reference(hyper_in):
    import torch

    ref = _ref_hyrnn()
    rng = np.random.default_rng(0)
    in_size, hidden = 5, 4
    lengths = [6, 4, 4, 1]  # ragged, with ties and a length-1 straggler
    seqs = [rng.standard_normal((L, in_size)) * 0.2 for L in lengths]
    data, batch_sizes = _pack(seqs)
    h0 = rng.standard_normal((len(lengths), hidden)) * 0.1

    key = jax.random.PRNGKey(0)
    p = hyrnn.init_mobius_gru(key, in_size, hidden)
    w_ih = np.asarray(p["weight_ih"], np.float64)
    w_hh = np.asarray(p["weight_hh"], np.float64)
    bias = np.asarray(p["bias"], np.float64)

    want_outs, want_hlast = ref.mobius_gru_loop(
        torch.tensor(data), torch.tensor(h0),
        torch.tensor(w_ih), torch.tensor(w_hh), torch.tensor(bias),
        k=torch.tensor(-1.0, dtype=torch.float64),
        batch_sizes=torch.tensor(batch_sizes),
        hyperbolic_input=hyper_in, hyperbolic_hidden_state0=False)

    got_outs, got_hlast = hyrnn.mobius_gru_loop_packed(
        jnp.asarray(data, jnp.float32), batch_sizes,
        jnp.asarray(h0, jnp.float32), p["weight_ih"], p["weight_hh"],
        p["bias"], hyperbolic_input=hyper_in)

    np.testing.assert_allclose(np.asarray(got_outs), want_outs.numpy(),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_hlast), want_hlast.numpy(),
                               rtol=5e-4, atol=5e-5)


def test_dense_gru_loop_matches_reference():
    """The dense branch against the same executed reference (:113-127)."""
    import torch

    ref = _ref_hyrnn()
    rng = np.random.default_rng(1)
    T, B, in_size, hidden = 5, 3, 6, 4
    x = rng.standard_normal((T, B, in_size)) * 0.2
    h0 = rng.standard_normal((B, hidden)) * 0.1
    p = hyrnn.init_mobius_gru(jax.random.PRNGKey(2), in_size, hidden)

    want_outs, want_hlast = ref.mobius_gru_loop(
        torch.tensor(x), torch.tensor(h0),
        torch.tensor(np.asarray(p["weight_ih"], np.float64)),
        torch.tensor(np.asarray(p["weight_hh"], np.float64)),
        torch.tensor(np.asarray(p["bias"], np.float64)),
        k=torch.tensor(-1.0, dtype=torch.float64),
        hyperbolic_input=False, hyperbolic_hidden_state0=False)

    got_outs, got_hlast = hyrnn.mobius_gru_loop(
        jnp.asarray(x, jnp.float32), jnp.asarray(h0, jnp.float32),
        p["weight_ih"], p["weight_hh"], p["bias"])
    np.testing.assert_allclose(np.asarray(got_outs), want_outs.numpy(),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_hlast), want_hlast.numpy(),
                               rtol=5e-4, atol=5e-5)


def test_packed_gru_masking_freezes_finished_rows():
    """Dense masked form: rows keep their state after their length."""
    rng = np.random.default_rng(3)
    T, B, in_size, hidden = 6, 3, 5, 4
    x = jnp.asarray(rng.standard_normal((T, B, in_size)) * 0.2, jnp.float32)
    h0 = jnp.zeros((B, hidden), jnp.float32)
    p = hyrnn.init_mobius_gru(jax.random.PRNGKey(4), in_size, hidden)
    lengths = np.array([6, 3, 1])
    outs, h_last = hyrnn.mobius_gru_loop(
        x, h0, p["weight_ih"], p["weight_hh"], p["bias"], lengths=lengths)
    outs = np.asarray(outs)
    for b, L in enumerate(lengths):
        for t in range(L, T):
            np.testing.assert_array_equal(outs[t, b], outs[L - 1, b])
        np.testing.assert_array_equal(np.asarray(h_last)[b], outs[L - 1, b])
