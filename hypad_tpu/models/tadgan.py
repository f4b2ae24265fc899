"""TadGAN / HypAD model family — functional JAX modules.

Re-implements (behaviorally) the reference models:
  * Encoder     — reference models/tadgan.py:10-27
  * Decoder     — reference models/tadgan.py:30-67 (hyperbolic head :42-52,:63-66)
  * CriticX     — reference models/tadgan.py:70-106
  * CriticZ     — reference models/tadgan.py:109-132
  * MobiusLinear— reference hyperspace/hyrnn_nets.py:13-35,:154-200

Design: parameters are plain pytrees (nested dicts of jnp arrays); ``apply``
functions are pure and jit/vmap/grad-friendly. Initialization matches the
torch distributions so statistical training parity holds:
  * nn.Linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias
    (torch kaiming_uniform(a=sqrt(5)) reduces to that bound);
  * nn.LSTM:   U(-1/sqrt(hidden), 1/sqrt(hidden)) (see ops/lstm.py);
  * MobiusLinear weight: N(0, (1/(100*sqrt(2*out*in)))^2)
    (reference hyperspace/hyrnn_nets.py:174-179);
  * MobiusLinear bias:   expmap0(N(0,1)/400), a manifold parameter on the
    Poincare ball (reference hyperspace/hyrnn_nets.py:167-173).

The window is fed to the LSTMs as a single timestep of a ``signal_shape``-dim
feature vector — seq_len == 1 (reference models/tadgan.py:24,:92; SURVEY §3.5).
This degenerate recurrence is reproduced faithfully: parity first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypad_tpu.manifold import stereographic as st
from hypad_tpu.ops.lstm import init_lstm_params, lstm_forward

LATENT_DIM = 20  # hardcoded by the reference (train.py:413)
# dropout rates (reference models/tadgan.py:91-106,:123-132,:35-41).
# The fused epoch pregenerates keep-masks from these same constants
# (train/trainer.py) — change them HERE only.
CX_DROPOUT = 0.25       # CriticX, after each hidden layer
CZ_DROPOUT = 0.2        # CriticZ
DEC_LSTM_DROPOUT = 0.2  # decoder inter-layer LSTM dropout


# --------------------------------------------------------------------------
# small helpers
# --------------------------------------------------------------------------

def _init_linear(key, out_features, in_features, dtype=jnp.float32):
    """torch nn.Linear default init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    return {
        "w": jax.random.uniform(kw, (out_features, in_features), dtype,
                                minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_features,), dtype,
                                minval=-bound, maxval=bound),
    }


def _linear(p, x):
    return x @ p["w"].T + p["b"]


def _dropout(x, rate, rng, training, mask=None):
    """``mask``: optional pregenerated keep-mask (bool, x.shape) — the fused
    epoch hoists dropout draws out of the step scan (dispatch-bound steps;
    see train/trainer.py); ``rng`` draws it here otherwise."""
    if not training or rate <= 0.0:
        return x
    keep = (jax.random.bernoulli(rng, 1.0 - rate, x.shape)
            if mask is None else mask)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# --------------------------------------------------------------------------
# MobiusLinear (hyperbolic head)
# --------------------------------------------------------------------------

def init_mobius_linear(key, out_features, in_features, dtype=jnp.float32):
    """Reference hyperspace/hyrnn_nets.py:154-184 with hyperbolic_bias=True."""
    kw, kb = jax.random.split(key)
    std = 1.0 / jnp.sqrt(2.0 * out_features * in_features) / 100.0
    weight = jax.random.normal(kw, (out_features, in_features), dtype) * std
    bias_tangent = jax.random.normal(kb, (out_features,), dtype) / 400.0
    bias = st.expmap0(bias_tangent, k=-1.0)
    return {"w": weight, "b": bias}  # "b" lives ON the ball (manifold param)


def mobius_linear(p, x, k=-1.0):
    """hyperbolic_input=False path: Euclidean matvec -> expmap0 ->
    mobius_add(bias) -> project (reference hyperspace/hyrnn_nets.py:13-35).
    x: (..., in) -> (..., out), points in the Poincare ball."""
    out = x @ p["w"].T
    out = st.expmap0(out, k)
    out = st.mobius_add(out, jnp.broadcast_to(p["b"], out.shape), k)
    return st.project(out, k)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def init_encoder(key, signal_shape=100, latent_dim=LATENT_DIM):
    k1, k2 = jax.random.split(key)
    return {
        "lstm": init_lstm_params(k1, input_size=signal_shape, hidden_size=50,
                                 num_layers=1, bidirectional=True),
        "dense": _init_linear(k2, latent_dim, 100),
    }


def encoder_apply(params, x):
    """x: (B, signal_shape) -> z: (B, latent_dim).

    Reference forward (models/tadgan.py:23-27) reshapes to (1, B, S): one
    timestep. We keep the batch-major (B, S) surface and run the scan with
    T=1 internally.
    """
    h = lstm_forward(params["lstm"], x[None, :, :])  # (1, B, 100)
    z = _linear(params["dense"], h)
    return z[0]


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def init_decoder(key, signal_shape=100, latent_dim=LATENT_DIM, hyperbolic=False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "dense1": _init_linear(k1, 50, latent_dim),
        "lstm": init_lstm_params(k2, input_size=50, hidden_size=64,
                                 num_layers=2, bidirectional=True),
        "dense2": _init_linear(k3, signal_shape, 128),
    }
    if hyperbolic:
        params["hyperbolic_linear"] = init_mobius_linear(
            k4, signal_shape, signal_shape
        )
    return params


def decoder_apply(params, z, *, hyperbolic=False, training=False, rng=None,
                  lstm_drop_masks=None):
    """z: (B, latent_dim) -> reconstruction.

    Euclidean: returns (B, signal_shape) tanh output.
    Hyperbolic: returns (hyper, eucl) like the reference (models/tadgan.py:63-66)
    where ``hyper`` are Poincare-ball points (B, signal_shape).
    ``lstm_drop_masks``: optional pregenerated inter-layer keep-masks.
    """
    h = _linear(params["dense1"], z)[None, :, :]  # (1, B, 50)
    h = lstm_forward(params["lstm"], h, training=training,
                     dropout=DEC_LSTM_DROPOUT, rng=rng,
                     drop_masks=lstm_drop_masks)
    x = jnp.tanh(_linear(params["dense2"], h))[0]  # (B, signal_shape)
    if hyperbolic:
        hyper = mobius_linear(params["hyperbolic_linear"], x)
        return hyper, x
    return x


# --------------------------------------------------------------------------
# Critics
# --------------------------------------------------------------------------

def init_critic_x(key, signal_shape=100, latent_dim=LATENT_DIM):
    keys = jax.random.split(key, 5)
    return {
        "dense1": _init_linear(keys[0], latent_dim, signal_shape),
        "dense2": _init_linear(keys[1], latent_dim, latent_dim),
        "dense3": _init_linear(keys[2], latent_dim, latent_dim),
        "dense4": _init_linear(keys[3], latent_dim, latent_dim),
        "dense5": _init_linear(keys[4], 1, latent_dim),
    }


def critic_x_apply(params, x, *, training=False, rng=None, drop_masks=None):
    """x: (B, signal_shape) -> (B, 1). Reference models/tadgan.py:91-106.
    ``drop_masks``: optional (4, B, latent) pregenerated keep-masks."""
    if training and rng is not None and drop_masks is None:
        rngs = jax.random.split(rng, 4)
    else:
        rngs = [None] * 4
    h = x
    for i, layer in enumerate(("dense1", "dense2", "dense3", "dense4")):
        h = _leaky_relu(_linear(params[layer], h))
        h = _dropout(h, CX_DROPOUT, rngs[i], training,
                     mask=None if drop_masks is None else drop_masks[i])
    return _linear(params["dense5"], h)


def init_critic_z(key, latent_dim=LATENT_DIM):
    keys = jax.random.split(key, 3)
    return {
        "dense1": _init_linear(keys[0], latent_dim, latent_dim),
        "dense2": _init_linear(keys[1], latent_dim, latent_dim),
        "dense3": _init_linear(keys[2], 1, latent_dim),
    }


def critic_z_apply(params, z, *, training=False, rng=None, drop_masks=None):
    """z: (B, latent_dim) -> (B, 1). Reference models/tadgan.py:123-132.
    ``drop_masks``: optional (2, B, latent) pregenerated keep-masks."""
    if training and rng is not None and drop_masks is None:
        rngs = jax.random.split(rng, 2)
    else:
        rngs = [None] * 2
    h = z
    for i, layer in enumerate(("dense1", "dense2")):
        h = _leaky_relu(_linear(params[layer], h))
        h = _dropout(h, CZ_DROPOUT, rngs[i], training,
                     mask=None if drop_masks is None else drop_masks[i])
    return _linear(params["dense3"], h)


# --------------------------------------------------------------------------
# convenience: init all four modules
# --------------------------------------------------------------------------

def init_tadgan(key, signal_shape=100, latent_dim=LATENT_DIM, hyperbolic=False):
    ke, kd, kx, kz = jax.random.split(key, 4)
    return {
        "encoder": init_encoder(ke, signal_shape, latent_dim),
        "decoder": init_decoder(kd, signal_shape, latent_dim, hyperbolic),
        "critic_x": init_critic_x(kx, signal_shape, latent_dim),
        "critic_z": init_critic_z(kz, latent_dim),
    }
