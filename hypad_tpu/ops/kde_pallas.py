"""Pallas TPU kernel for the batched KDE-argmax critic smoother.

The KDE stage is the reference's profiled scoring hot spot (a scipy
``gaussian_kde`` fit per timestep, SURVEY §3.4); ``ops/kde.py`` already
vectorizes it as jnp, and this module provides the hand-tiled Pallas
version: for every row (timestep anti-diagonal) the masked pairwise Gaussian
density and its argmax are computed entirely in VMEM — one (TILE_T, W, W)
broadcast per grid step, no HBM round-trips for intermediates.

Semantics are identical to :func:`hypad_tpu.ops.kde.kde_argmax_rows`
(Scott bandwidth over the unbiased variance; density evaluated at the sample
points; first-max-wins; median fallback for degenerate rows) and are
verified against it in tests/test_pallas.py. The median fallback itself
needs a sort, which stays outside the kernel; the kernel emits the KDE value
and a use-kde flag per row.

Use ``kde_argmax_rows_pallas(vals, mask)`` as a drop-in replacement; it
falls back to the jnp path on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hypad_tpu.ops.unroll import masked_median

TILE_T = 128  # rows per grid step; (128, 128, 128) f32 broadcast = 8 MB VMEM
# (rank-1 output blocks must be 128-multiples on TPU)


def _kernel(vals_ref, mask_ref, kde_ref, use_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    v = vals_ref[:]                       # (TILE_T, Wp)
    m = mask_ref[:] > 0                   # (TILE_T, Wp)
    mf = m.astype(v.dtype)

    cnt = jnp.sum(mf, axis=-1)            # (TILE_T,)
    cnt_f = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(v * mf, axis=-1) / cnt_f
    centered = (v - mean[:, None]) * mf
    var = jnp.sum(centered * centered, axis=-1) / jnp.maximum(cnt_f - 1.0, 1.0)
    h2 = var * cnt_f ** (-0.4)            # Scott: var * n^(-2/5)
    h2_safe = jnp.where(h2 > 0, h2, 1.0)

    diff = v[:, :, None] - v[:, None, :]  # (TILE_T, Wp, Wp)
    pair = m[:, :, None] & m[:, None, :]
    dens = jnp.sum(
        jnp.where(pair, jnp.exp(-(diff * diff)
                                / (2.0 * h2_safe[:, None, None])), 0.0),
        axis=-1,
    )
    dens = jnp.where(m, dens, -jnp.inf)
    arg = jnp.argmax(dens, axis=-1)
    kde_ref[:] = jnp.take_along_axis(v, arg[:, None], axis=-1)[:, 0]
    use_ref[:] = ((cnt > 1.0) & (var > 0.0)).astype(jnp.float32)


def _pallas_kde(vals, mask, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W = vals.shape
    Wp = ((W + 127) // 128) * 128
    Tp = ((T + TILE_T - 1) // TILE_T) * TILE_T
    vp = jnp.zeros((Tp, Wp), vals.dtype).at[:T, :W].set(vals)
    mp = jnp.zeros((Tp, Wp), jnp.float32).at[:T, :W].set(
        mask.astype(jnp.float32))

    kde, use = pl.pallas_call(
        _kernel,
        grid=(Tp // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_T,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp,), vals.dtype),
            jax.ShapeDtypeStruct((Tp,), jnp.float32),
        ),
        interpret=interpret,
    )(vp, mp)
    return kde[:T], use[:T] > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kde_argmax_rows_pallas_impl(vals, mask, interpret):
    kde_val, use_kde = _pallas_kde(vals, mask, interpret=interpret)
    med = masked_median(vals, mask)
    return jnp.where(use_kde, kde_val, med)


def kde_argmax_rows_pallas(vals, mask, interpret=None):
    """Drop-in Pallas variant of kde_argmax_rows. vals/mask: (T, W).

    ``interpret=None`` auto-selects: compiled Mosaic on TPU, interpreter
    elsewhere (compiled Pallas is TPU-only)."""
    if interpret is None:
        # device_kind, not backend name: the tunneled TPU registers under a
        # plugin platform name but is still a Mosaic-capable TPU
        interpret = "TPU" not in jax.devices()[0].device_kind.upper()
    return _kde_argmax_rows_pallas_impl(vals, mask, interpret)
