"""Hyperbolic recurrent layers (layer L1 extras).

Behavior spec: reference ``hyperspace/hyrnn_nets.py`` —
  * ``one_rnn_transform``      (:61-65)
  * ``mobius_gru_cell``        (:68-91): gates via logmap0(..).sigmoid(),
    candidate state through Mobius ops, update via Mobius addition of the
    z-scaled delta
  * ``mobius_gru_loop``        (:94-151): sequence scan with optional
    expmap0 of inputs / initial state
  * ``MobiusDist2Hyperplane``  (:210-245): signed distances to learned
    hyperplanes scaled by exp(scale)

These are part of the reference's component inventory (SURVEY §2.1) though
its main TadGAN path never instantiates them; provided here as first-class,
scan-based TPU modules so hyperbolic sequence models are available to users
of the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.manifold import stereographic as st


def one_rnn_transform(W, h, U, x, b, k=-1.0):
    """W (x) h  (+)  U (x) x  (+)  b (reference :61-65)."""
    W_otimes_h = st.mobius_matvec(W, h, k)
    U_otimes_x = st.mobius_matvec(U, x, k)
    Wh_plus_Ux = st.mobius_add(W_otimes_h, U_otimes_x, k)
    return st.mobius_add(Wh_plus_Ux, b, k)


def mobius_gru_cell(x, h, weight_ih, weight_hh, bias, k=-1.0, nonlin=None):
    """One hyperbolic GRU step (reference :68-91).

    weight_ih/weight_hh: (3H, in)/(3H, H) stacked [r, h, z] like the
    reference's ``chunk(3)``; bias: (3, H) rows [b_r, b_h, b_z].
    x: (..., in) ball points; h: (..., H) ball points.
    """
    W_ir, W_ih, W_iz = jnp.split(weight_ih, 3, axis=0)
    W_hr, W_hh, W_hz = jnp.split(weight_hh, 3, axis=0)
    b_r, b_h, b_z = bias[0], bias[1], bias[2]

    z_t = jax.nn.sigmoid(st.logmap0(
        one_rnn_transform(W_hz, h, W_iz, x, b_z, k), k))
    r_t = jax.nn.sigmoid(st.logmap0(
        one_rnn_transform(W_hr, h, W_ir, x, b_r, k), k))

    rh_t = st.mobius_pointwise_mul(r_t, h, k)
    h_tilde = one_rnn_transform(W_hh, rh_t, W_ih, x, b_h, k)
    if nonlin is not None:
        h_tilde = st.mobius_fn_apply(nonlin, h_tilde, k)
    delta_h = st.mobius_add(-h, h_tilde, k)
    return st.mobius_add(h, st.mobius_pointwise_mul(z_t, delta_h, k), k)


def mobius_gru_loop(inputs, h0, weight_ih, weight_hh, bias, k=-1.0,
                    hyperbolic_input=False, hyperbolic_hidden_state0=False,
                    nonlin=None, lengths=None):
    """Scan the hyperbolic GRU over time (reference :94-151).

    inputs: (T, B, in); h0: (B, H). Returns (outs (T, B, H), h_last (B, H)).

    ``lengths``: optional (B,) per-sequence lengths — the TPU-native form of
    the reference's packed-sequence branch (:128-151). The scan stays fully
    dense (fixed shapes for XLA); a row whose sequence has ended keeps its
    hidden state frozen, so ``h_last[b]`` is the state after step
    ``lengths[b]`` exactly as PackedSequence delivers it, and
    ``outs[t, b]`` for t >= lengths[b] repeats that frozen state (positions
    a PackedSequence simply does not carry). For the reference's exact
    packed layout use :func:`mobius_gru_loop_packed`.
    """
    h = h0 if hyperbolic_hidden_state0 else st.expmap0(h0, k)
    x = inputs if hyperbolic_input else st.expmap0(inputs, k)

    if lengths is None:
        def step(h, x_t):
            h_new = mobius_gru_cell(x_t, h, weight_ih, weight_hh, bias, k,
                                    nonlin)
            return h_new, h_new

        h_last, outs = jax.lax.scan(step, h, x)
        return outs, h_last

    lengths = jnp.asarray(lengths)

    def step(carry, x_t):
        h, t = carry
        # mask padded inputs to the origin before the cell (keeps the ball
        # ops on well-conditioned points; the result is discarded anyway)
        active = (t < lengths)[:, None]
        h_new = mobius_gru_cell(jnp.where(active, x_t, 0.0), h,
                                weight_ih, weight_hh, bias, k, nonlin)
        h = jnp.where(active, h_new, h)
        return (h, t + 1), h

    (h_last, _), outs = jax.lax.scan(step, (h, jnp.zeros((), jnp.int32)), x)
    return outs, h_last


def batch_sizes_to_lengths(batch_sizes):
    """PackedSequence ``batch_sizes`` (T,) -> per-sequence lengths (B0,)
    (torch packs sequences sorted by decreasing length, so
    lengths[b] = #{t : batch_sizes[t] > b})."""
    batch_sizes = np.asarray(batch_sizes)
    return (batch_sizes[:, None] > np.arange(batch_sizes[0])).sum(0)


def mobius_gru_loop_packed(data, batch_sizes, h0, weight_ih, weight_hh, bias,
                           k=-1.0, hyperbolic_input=False,
                           hyperbolic_hidden_state0=False, nonlin=None):
    """The reference's packed-sequence branch of ``mobius_gru_loop``
    (:128-151), exact layout included: ``data`` is the PackedSequence data
    (sum(batch_sizes), in) — at step t the first batch_sizes[t] rows are
    active, sequences sorted by decreasing length; returns
    (packed outs (sum(batch_sizes), H), h_last (B0, H)) where h_last rows
    follow the packed (sorted) sequence order, like the reference's
    reversed-and-concatenated h_last.

    TPU-native: the ragged stream is unpacked ONCE on host into a dense
    (T, B0, in) tensor (batch_sizes lives on host in torch too), the loop
    runs as the fixed-shape masked ``lax.scan`` above, and the dense outputs
    are re-packed by slicing — no data-dependent shapes ever reach XLA.
    """
    batch_sizes = np.asarray(batch_sizes)
    T, B0 = len(batch_sizes), int(batch_sizes[0])
    lengths = batch_sizes_to_lengths(batch_sizes)

    offsets = np.concatenate([[0], np.cumsum(batch_sizes)])
    dense = jnp.zeros((T, B0) + data.shape[1:], data.dtype)
    for t in range(T):
        dense = dense.at[t, : batch_sizes[t]].set(
            data[offsets[t]: offsets[t + 1]])

    outs_dense, h_last = mobius_gru_loop(
        dense, h0, weight_ih, weight_hh, bias, k,
        hyperbolic_input=hyperbolic_input,
        hyperbolic_hidden_state0=hyperbolic_hidden_state0,
        nonlin=nonlin, lengths=lengths)
    packed_outs = jnp.concatenate(
        [outs_dense[t, : batch_sizes[t]] for t in range(T)])
    return packed_outs, h_last


def init_mobius_gru(key, input_size, hidden_size, dtype=jnp.float32):
    """torch-GRU-flavoured init: U(-1/sqrt(H), 1/sqrt(H)); bias points
    initialized near the origin on the ball."""
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    return {
        "weight_ih": jax.random.uniform(k1, (3 * hidden_size, input_size),
                                        dtype, -bound, bound),
        "weight_hh": jax.random.uniform(k2, (3 * hidden_size, hidden_size),
                                        dtype, -bound, bound),
        "bias": st.expmap0(
            jax.random.normal(k3, (3, hidden_size), dtype) / 400.0),
    }


def init_dist2hyperplane(key, in_features, out_features, dtype=jnp.float32):
    """Reference MobiusDist2Hyperplane init (:210-225): points
    expmap0(N(0,1)/4) on the ball, unit-normalized tangents, zero log-scales.
    """
    kp, kt = jax.random.split(key)
    point = st.expmap0(
        jax.random.normal(kp, (out_features, in_features), dtype) / 4.0)
    tangent = jax.random.normal(kt, (out_features, in_features), dtype)
    tangent = tangent / jnp.linalg.norm(tangent, axis=-1, keepdims=True)
    return {"point": point, "tangent": tangent,
            "scale": jnp.zeros((out_features,), dtype)}


def dist2hyperplane_apply(params, x, k=-1.0):
    """x: (..., in) ball points -> (..., out) signed scaled distances
    (reference :227-237)."""
    d = st.dist2plane(x[..., None, :], params["point"], params["tangent"],
                      k, signed=True)
    return d * jnp.exp(params["scale"])


def pairwise_poincare_distance(x, y):
    """All-pairs Poincare distance (reference
    hyperspace/poincare_distance.py:5-48): squared norms floored at 1e-5
    ("they really like to die to zero"), pairwise squared distances clamped
    to [1e-7, inf), then acosh(1 + 2 d2 / ((1-|x|^2)(1-|y|^2))).
    x: (N, D), y: (M, D) -> (N, M)."""
    x2 = jnp.maximum(jnp.sum(x * x, -1), 1e-5)
    y2 = jnp.maximum(jnp.sum(y * y, -1), 1e-5)
    sq = (jnp.sum(x * x, -1)[:, None] - 2.0 * x @ y.T
          + jnp.sum(y * y, -1)[None, :])
    sq = jnp.clip(sq, 1e-7, None)
    arg = 1.0 + 2.0 * sq / ((1.0 - x2)[:, None] * (1.0 - y2)[None, :])
    return jnp.arccosh(arg)
