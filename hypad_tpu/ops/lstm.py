"""Multi-layer bidirectional LSTM built on ``lax.scan``, TPU-native.

Replaces the reference's cuDNN ``nn.LSTM`` (reference ``models/tadgan.py:15-20``
encoder: 1-layer bidirectional LSTM(100->50); ``:36-38`` decoder: 2-layer
bidirectional LSTM(50->64, dropout=0.2)). Semantics match torch.nn.LSTM:

  * gate order i, f, g, o in the stacked weight matrices;
  * two bias vectors (b_ih + b_hh) both added;
  * zero initial hidden/cell state;
  * bidirectional: independent forward/reverse passes, outputs concatenated
    on the feature axis;
  * inter-layer dropout applied to the output of every layer except the last,
    only in training mode;
  * weights initialized U(-1/sqrt(hidden), 1/sqrt(hidden)) like torch.

The reference always evaluates its LSTMs with sequence length 1 (the window is
packed into the input-feature dimension, reference ``models/tadgan.py:24,:92``),
so the scan is degenerate there — but this op is a general recurrent scan so
the framework supports true sequence models too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_lstm_params(key, input_size, hidden_size, num_layers=1,
                     bidirectional=True, dtype=jnp.float32):
    """Initialize torch-compatible LSTM parameters.

    Returns a list (per layer) of dicts with keys ``w_ih``/``w_hh``/``b_ih``/
    ``b_hh`` for the forward direction and ``*_rev`` for the reverse direction
    when bidirectional. Shapes: w_ih (4H, in), w_hh (4H, H), b (4H,).
    """
    num_dir = 2 if bidirectional else 1
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, dtype=jnp.float32))
    layers = []
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size * num_dir
        layer_params = {}
        for direction in range(num_dir):
            suffix = "_rev" if direction == 1 else ""
            for name, shape in (
                ("w_ih", (4 * hidden_size, in_size)),
                ("w_hh", (4 * hidden_size, hidden_size)),
                ("b_ih", (4 * hidden_size,)),
                ("b_hh", (4 * hidden_size,)),
            ):
                key, sub = jax.random.split(key)
                layer_params[name + suffix] = jax.random.uniform(
                    sub, shape, dtype=dtype, minval=-bound, maxval=bound
                )
        layers.append(layer_params)
    return layers


def _lstm_cell(carry, x_t, w_ih, w_hh, b_ih, b_hh):
    """One torch-semantics LSTM cell step. x_t: (B, in), carry: ((B,H),(B,H))."""
    h, c = carry
    gates = x_t @ w_ih.T + h @ w_hh.T + b_ih + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (h_new, c_new), h_new


def _run_direction(x, w_ih, w_hh, b_ih, b_hh, reverse):
    """Scan an LSTM over time. x: (T, B, in) -> outputs (T, B, H)."""
    T, B, _ = x.shape
    H = w_hh.shape[1]
    h0 = jnp.zeros((B, H), dtype=x.dtype)
    c0 = jnp.zeros((B, H), dtype=x.dtype)

    def step(carry, x_t):
        return _lstm_cell(carry, x_t, w_ih, w_hh, b_ih, b_hh)

    (_, _), outs = jax.lax.scan(step, (h0, c0), x, reverse=reverse)
    return outs


def lstm_forward(params, x, *, training=False, dropout=0.0, rng=None,
                 drop_masks=None):
    """Run a (possibly multi-layer, bidirectional) LSTM.

    Args:
      params: output of :func:`init_lstm_params`.
      x: (T, B, input_size) time-major input.
      training: enables inter-layer dropout.
      dropout: inter-layer dropout probability (torch ``nn.LSTM(dropout=...)``).
      rng: PRNG key, required if ``training`` and dropout > 0 and >1 layers.
      drop_masks: optional pregenerated keep-masks, one per inter-layer
        dropout (num_layers - 1 entries); overrides ``rng`` draws (used by
        the fused training epoch to hoist RNG out of dispatch-bound scans).

    Returns:
      (T, B, H * num_directions) outputs of the last layer.
    """
    num_layers = len(params)
    out = x
    for layer_idx, layer in enumerate(params):
        fwd = _run_direction(
            out, layer["w_ih"], layer["w_hh"], layer["b_ih"], layer["b_hh"],
            reverse=False,
        )
        if "w_ih_rev" in layer:
            bwd = _run_direction(
                out, layer["w_ih_rev"], layer["w_hh_rev"],
                layer["b_ih_rev"], layer["b_hh_rev"], reverse=True,
            )
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
        is_last = layer_idx == num_layers - 1
        if training and dropout > 0.0 and not is_last:
            if drop_masks is not None:
                keep = drop_masks[layer_idx]
            elif rng is None:
                raise ValueError("dropout in training mode requires an rng key")
            else:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0)
    return out
