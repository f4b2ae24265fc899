"""Pallas TPU kernel: fused MobiusLinear forward.

The hyperbolic head chain — Euclidean matvec -> expmap0 -> mobius_add(bias)
-> project (reference hyperspace/hyrnn_nets.py:13-35) — is the training hot
path's manifold work. XLA already fuses most of it; this kernel is the
hand-tiled version from SURVEY §7 step 1: the matvec lands on the MXU and
the entire clamp-heavy elementwise chain stays in VMEM registers, one HBM
read of x/W/b and one write of the output.

Gradients: the forward runs in Pallas; the backward is the autodiff of the
numerically-identical jnp composition (custom_vjp), so training semantics
match `mobius_linear` exactly. Padded feature lanes are masked out of every
norm/inner-product so results are bit-comparable to the unpadded jnp path.

Opt-in: ``mobius_linear_fused(p, x)``; auto-interprets off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hypad_tpu.manifold import stereographic as st

TILE_B = 128


def _masked_norm(x, col_mask, keepdims=True):
    sq = jnp.sum(jnp.where(col_mask, x * x, 0.0), axis=-1, keepdims=keepdims)
    return jnp.maximum(jnp.sqrt(sq), st.NORM_FLOOR)


def _kernel(x_ref, w_ref, b_ref, colmask_ref, out_ref):
    x = x_ref[:]                    # (TILE_B, Din_p)
    w = w_ref[:]                    # (Dout_p, Din_p)
    b = b_ref[:]                    # (1, Dout_p) broadcast bias row
    cm = colmask_ref[:] > 0         # (1, Dout_p) valid output lanes

    mx = jnp.dot(x, w.T, preferred_element_type=jnp.float32)

    # expmap0 (math_.py:1132-1136) with tanh clamp +-15
    n = _masked_norm(mx, cm)
    u = jnp.tanh(jnp.clip(n, -st.TANH_CLAMP, st.TANH_CLAMP)) * (mx / n)

    # mobius_add(u, b) at k=-1 (math_.py:536-555)
    u2 = jnp.sum(jnp.where(cm, u * u, 0.0), axis=-1, keepdims=True)
    b2 = jnp.sum(jnp.where(cm, b * b, 0.0), axis=-1, keepdims=True)
    ub = jnp.sum(jnp.where(cm, u * b, 0.0), axis=-1, keepdims=True)
    num = (1.0 + 2.0 * ub + b2) * u + (1.0 - u2) * b
    denom = 1.0 + 2.0 * ub + u2 * b2
    y = num / jnp.maximum(denom, st.NORM_FLOOR)

    # project to the f32 ball (math_.py:340-352)
    yn = _masked_norm(y, cm)
    maxnorm = 1.0 - st.PROJECT_EPS_F32
    y = jnp.where(yn > maxnorm, y / yn * maxnorm, y)
    out_ref[:] = jnp.where(cm, y, 0.0)


def _pallas_forward(x, w, b, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Din = x.shape
    Dout = w.shape[0]
    Din_p = ((Din + 127) // 128) * 128
    Dout_p = ((Dout + 127) // 128) * 128
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B

    xp = jnp.zeros((Bp, Din_p), jnp.float32).at[:B, :Din].set(x)
    wp = jnp.zeros((Dout_p, Din_p), jnp.float32).at[:Dout, :Din].set(w)
    bp = jnp.zeros((1, Dout_p), jnp.float32).at[0, :Dout].set(b)
    cm = jnp.zeros((1, Dout_p), jnp.float32).at[0, :Dout].set(1.0)

    out = pl.pallas_call(
        _kernel,
        grid=(Bp // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, Din_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dout_p, Din_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dout_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dout_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, Dout_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Dout_p), jnp.float32),
        interpret=interpret,
    )(xp, wp, bp, cm)
    return out[:B, :Dout]


def _jnp_forward(x, w, b):
    from hypad_tpu.models.tadgan import mobius_linear

    return mobius_linear({"w": w, "b": b}, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(x, w, b, interpret):
    return _pallas_forward(x, w, b, interpret)


def _fused_fwd(x, w, b, interpret):
    return _pallas_forward(x, w, b, interpret), (x, w, b)


def _fused_bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_jnp_forward, x, w, b)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def mobius_linear_fused(p, x, interpret=None):
    """Fused-Pallas drop-in for models.tadgan.mobius_linear. p: {'w','b'}."""
    if interpret is None:
        interpret = "TPU" not in jax.devices()[0].device_kind.upper()
    return _fused(x, p["w"], p["b"], interpret)
