"""LSTM op vs torch.nn.LSTM oracle, and model shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hypad_tpu.models import tadgan as m
from hypad_tpu.ops.lstm import init_lstm_params, lstm_forward


def _copy_lstm_to_torch(params, torch_lstm):
    """Load our pytree weights into a torch.nn.LSTM for comparison."""
    sd = {}
    for layer_idx, layer in enumerate(params):
        for direction, suffix in ((0, ""), (1, "_rev")):
            tsuf = "_reverse" if direction == 1 else ""
            if "w_ih" + suffix not in layer:
                continue
            sd[f"weight_ih_l{layer_idx}{tsuf}"] = torch.tensor(
                np.asarray(layer["w_ih" + suffix]))
            sd[f"weight_hh_l{layer_idx}{tsuf}"] = torch.tensor(
                np.asarray(layer["w_hh" + suffix]))
            sd[f"bias_ih_l{layer_idx}{tsuf}"] = torch.tensor(
                np.asarray(layer["b_ih" + suffix]))
            sd[f"bias_hh_l{layer_idx}{tsuf}"] = torch.tensor(
                np.asarray(layer["b_hh" + suffix]))
    torch_lstm.load_state_dict(sd)


@pytest.mark.parametrize("T,B,inp,hid,layers,bidir", [
    (1, 4, 100, 50, 1, True),    # encoder config (seq_len=1)
    (1, 4, 50, 64, 2, True),     # decoder config
    (7, 3, 12, 8, 1, False),     # genuine recurrence, unidirectional
    (5, 2, 6, 4, 2, True),       # genuine recurrence, stacked bidir
])
def test_lstm_matches_torch(T, B, inp, hid, layers, bidir):
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, inp, hid, layers, bidir)
    x = np.random.default_rng(1).standard_normal((T, B, inp)).astype(np.float32)

    out = np.asarray(lstm_forward(params, jnp.array(x)))

    tl = torch.nn.LSTM(inp, hid, num_layers=layers, bidirectional=bidir)
    _copy_lstm_to_torch(params, tl)
    with torch.no_grad():
        want, _ = tl(torch.tensor(x))
    np.testing.assert_allclose(out, want.numpy(), rtol=1e-5, atol=1e-5)


def test_encoder_shapes():
    key = jax.random.PRNGKey(0)
    p = m.init_encoder(key)
    x = jnp.zeros((64, 100), jnp.float32)
    z = m.encoder_apply(p, x)
    assert z.shape == (64, 20)


def test_decoder_shapes_euclidean():
    key = jax.random.PRNGKey(0)
    p = m.init_decoder(key)
    z = jnp.zeros((64, 20), jnp.float32)
    x = m.decoder_apply(p, z)
    assert x.shape == (64, 100)
    assert np.all(np.abs(np.asarray(x)) <= 1.0)  # tanh range


def test_decoder_shapes_hyperbolic():
    key = jax.random.PRNGKey(0)
    p = m.init_decoder(key, hyperbolic=True)
    z = jnp.zeros((64, 20), jnp.float32)
    hyper, eucl = m.decoder_apply(p, z, hyperbolic=True)
    assert hyper.shape == (64, 100)
    assert eucl.shape == (64, 100)
    # hyperbolic output lies strictly inside the unit ball
    assert np.all(np.linalg.norm(np.asarray(hyper), axis=-1) < 1.0)


def test_critics_shapes():
    key = jax.random.PRNGKey(0)
    cx = m.init_critic_x(key)
    cz = m.init_critic_z(key)
    assert m.critic_x_apply(cx, jnp.zeros((64, 100))).shape == (64, 1)
    assert m.critic_z_apply(cz, jnp.zeros((64, 20))).shape == (64, 1)


def test_dropout_only_in_training():
    key = jax.random.PRNGKey(0)
    cx = m.init_critic_x(key)
    x = jnp.ones((8, 100))
    a = m.critic_x_apply(cx, x)
    b = m.critic_x_apply(cx, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eval: deterministic
    c = m.critic_x_apply(cx, x, training=True, rng=jax.random.PRNGKey(1))
    d = m.critic_x_apply(cx, x, training=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(c), np.asarray(d))  # train: stochastic


def test_mobius_linear_init_statistics():
    """Weight std ~ 1/(100*sqrt(2*in*out)); bias tiny and on the ball."""
    key = jax.random.PRNGKey(0)
    p = m.init_mobius_linear(key, 100, 100)
    w = np.asarray(p["w"])
    expected_std = 1.0 / (100.0 * np.sqrt(2.0 * 100 * 100))
    assert abs(w.std() - expected_std) / expected_std < 0.1
    b = np.asarray(p["b"])
    assert np.linalg.norm(b) < 0.1  # expmap0(N(0,1)/400) stays near origin


def test_torch_linear_init_statistics():
    key = jax.random.PRNGKey(3)
    p = m.init_encoder(key)
    w = np.asarray(p["dense"]["w"])
    bound = 1.0 / np.sqrt(100)
    assert w.min() >= -bound and w.max() <= bound
    # uniform on [-b, b] has std b/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) / (bound / np.sqrt(3)) < 0.15
