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

Value-range contract: masked entries are encoded as a 1e18 sentinel so that
any pair touching one has diff^2 ~ 1e36 and exp(-...) == 0. This assumes
|vals| stays far below 1e18 — a real value near the sentinel would make
masked-pair diffs small and silently reintroduce their kernel contribution.
Critic scores (the only production input) are O(1); if the kernel is ever
reused on another signal, keep |vals| < 1e12 or restore an explicit pair
mask.
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
    # SAME arithmetic form as ops/kde.py one_block (scale-multiply, not
    # divide) so v1-vs-jnp bitwise equality holds by construction, not just
    # empirically — FP rounding of x/(2h^2) and x*(-0.5/h^2) can differ
    scale = (-0.5 / h2_safe)[:, None, None]

    # masked entries become a huge sentinel: any pair touching one has
    # diff^2 ~ 1e36 and exp(-...) == exactly 0 — the same contribution the
    # old explicit mf[:, :, None] * mf[:, None, :] pair-mask multiplies
    # produced (bitwise-identical outputs, verified on-chip at 20k rows),
    # two fewer (TILE_T, Wp, Wp) ops per tile (~12% kernel time).
    # Sentinel-sentinel pairs land only on masked rows, discarded below.
    vs = jnp.where(m, v, 1e18)
    diff = vs[:, :, None] - vs[:, None, :]  # (TILE_T, Wp, Wp)
    kern = jnp.exp(scale * (diff * diff))
    dens = jnp.sum(kern, axis=-1)
    dens = jnp.where(m, dens, -jnp.inf)
    # first-max select (Mosaic has neither row gather nor cumsum): find the
    # smallest column index attaining the row max — np.argmax first-wins
    maxd = jnp.max(dens, axis=-1, keepdims=True)
    is_best = dens == maxd
    col = jax.lax.broadcasted_iota(jnp.int32, dens.shape, 1)
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    first_idx = jnp.min(jnp.where(is_best, col, big), axis=-1, keepdims=True)
    first = col == first_idx
    kde_val = jnp.sum(jnp.where(first, v, 0.0), axis=-1)
    use_val = ((cnt > 1.0) & (var > 0.0)).astype(jnp.float32)
    # outputs are (TILE_T, 128) lane-broadcast rows: rank-1 outputs collide
    # with XLA's T(1024) layout for flat f32 vectors
    kde_ref[:] = jnp.broadcast_to(kde_val[:, None], kde_ref.shape)
    use_ref[:] = jnp.broadcast_to(use_val[:, None], use_ref.shape)


TILE_T_V2 = 512  # rank-2 working set (TILE, 128) f32 = 256 KB -> big tiles


def _kernel_v2(vals_ref, mask_ref, kde_ref, use_ref, *, width):
    """Offset-rotation KDE kernel: instead of materializing the
    (TILE, W, W) pair tensor, iterate over relative offsets r = 1..W-1 and
    accumulate exp contributions on a (TILE, 128) working set, reusing each
    pair's exp for both (i, i-r) and its mirror (i-r, i) via lane rolls —
    ~2x fewer exps (the kernel matrix is symmetric) and no rank-3 VMEM
    traffic. Padded columns (>= width) are sentinel-masked like v1 and
    offsets >= width are provably all-masked, so they are skipped entirely.

    NOTE: the per-row accumulation ORDER differs from v1/jnp's axis
    reduction, so densities can differ in final ulps — argmax ties may
    resolve to a different sample point of the same row (tie-level
    equivalence, verified on-chip by bench.py's sample-membership check).
    """
    from jax.experimental.pallas import tpu as pltpu

    v = vals_ref[:]                       # (TILE, Wp)
    m = mask_ref[:] > 0
    mf = m.astype(v.dtype)

    cnt = jnp.sum(mf, axis=-1)
    cnt_f = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(v * mf, axis=-1) / cnt_f
    centered = (v - mean[:, None]) * mf
    var = jnp.sum(centered * centered, axis=-1) / jnp.maximum(cnt_f - 1.0,
                                                              1.0)
    h2 = var * cnt_f ** (-0.4)            # Scott: var * n^(-2/5)
    h2_safe = jnp.where(h2 > 0, h2, 1.0)
    scale = (-0.5 / h2_safe)[:, None]     # (TILE, 1)

    vs = jnp.where(m, v, 1e18)            # sentinel (see module docstring)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    dens = jnp.ones_like(v)               # r=0 self pairs: exp(0) == 1
    for r in range(1, width):
        vr = pltpu.roll(vs, r, axis=1)            # vr[i] = vs[i-r] (wrap)
        d = vs - vr
        e = jnp.exp(scale * (d * d))              # pair (i, i-r)
        e = jnp.where(col >= r, e, 0.0)           # kill wrapped lanes
        # mirror (i-r, i): back[i] = e[i+r]; its wrapped lanes (i >= Wp-r)
        # read e[(i+r) mod Wp] with col < r, already zeroed above
        # (pltpu.roll requires shift >= 0: roll by Wp-r == roll by -r)
        back = pltpu.roll(e, v.shape[1] - r, axis=1)
        dens = dens + e + back
    dens = jnp.where(m, dens, -jnp.inf)

    # first-max select, identical to v1
    maxd = jnp.max(dens, axis=-1, keepdims=True)
    is_best = dens == maxd
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    first_idx = jnp.min(jnp.where(is_best, col, big), axis=-1, keepdims=True)
    first = col == first_idx
    kde_val = jnp.sum(jnp.where(first, v, 0.0), axis=-1)
    use_val = ((cnt > 1.0) & (var > 0.0)).astype(jnp.float32)
    kde_ref[:] = jnp.broadcast_to(kde_val[:, None], kde_ref.shape)
    use_ref[:] = jnp.broadcast_to(use_val[:, None], use_ref.shape)


def _pallas_kde_v2(vals, mask, interpret=False):
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, W = vals.shape
    Wp = ((W + 127) // 128) * 128
    tile = TILE_T_V2
    Tp = ((T + tile - 1) // tile) * tile
    vp = jnp.zeros((Tp, Wp), vals.dtype).at[:T, :W].set(vals)
    mp = jnp.zeros((Tp, Wp), jnp.float32).at[:T, :W].set(
        mask.astype(jnp.float32))

    kde, use = pl.pallas_call(
        ft.partial(_kernel_v2, width=W),
        grid=(Tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, 128), vals.dtype),
            jax.ShapeDtypeStruct((Tp, 128), jnp.float32),
        ),
        interpret=interpret,
    )(vp, mp)
    return kde[:T, 0], use[:T, 0] > 0


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
            pl.BlockSpec((TILE_T, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, 128), vals.dtype),
            jax.ShapeDtypeStruct((Tp, 128), jnp.float32),
        ),
        interpret=interpret,
    )(vp, mp)
    return kde[:T, 0], use[:T, 0] > 0


def _kernel_version():
    """v2 = offset-rotation kernel (default: 4.2 ms vs v1's 5.3 ms at 20k
    rows on-chip; tie-level equal to the jnp path); v1 = rank-3 pair-tensor
    kernel (bitwise-equal to the jnp path). Override with HYPAD_KDE_V2=0."""
    import os

    return "v1" if os.environ.get("HYPAD_KDE_V2") == "0" else "v2"


@functools.partial(jax.jit, static_argnames=("interpret", "version"))
def _kde_argmax_rows_pallas_impl(vals, mask, interpret, version="v1"):
    fn = _pallas_kde_v2 if version == "v2" else _pallas_kde
    kde_val, use_kde = fn(vals, mask, interpret=interpret)
    med = masked_median(vals, mask)
    return jnp.where(use_kde, kde_val, med)


def kde_argmax_rows_pallas(vals, mask, interpret=None, version=None):
    """Drop-in Pallas variant of kde_argmax_rows. vals/mask: (T, W).

    ``interpret=None`` auto-selects: compiled Mosaic on TPU, interpreter
    elsewhere (compiled Pallas is TPU-only)."""
    if interpret is None:
        # device_kind, not backend name: the tunneled TPU registers under a
        # plugin platform name but is still a Mosaic-capable TPU
        interpret = "TPU" not in jax.devices()[0].device_kind.upper()
    return _kde_argmax_rows_pallas_impl(vals, mask, interpret,
                                        version or _kernel_version())


def kde_argmax_rows_pallas_sharded(vals, mask, mesh, interpret=None,
                                   version=None):
    """Mesh-parallel Mosaic KDE: shard_map the row-wise kernel over the
    ``dp`` axis so each device runs the compiled Pallas program on its own
    row slab (pallas_call is opaque to GSPMD, so the partitioning must be
    expressed manually; the computation is row-independent, so no
    collectives are needed). Rows are padded to a mesh multiple and the
    padding sliced off (padded rows take the all-masked median-fallback
    path and are discarded)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = "TPU" not in jax.devices()[0].device_kind.upper()
    n = mesh.devices.size
    T = vals.shape[0]
    Tp = -(-T // n) * n
    vp = jnp.zeros((Tp, vals.shape[1]), vals.dtype).at[:T].set(vals)
    mp = jnp.zeros((Tp, mask.shape[1]), mask.dtype).at[:T].set(mask)
    body = functools.partial(_kde_argmax_rows_pallas_impl,
                             interpret=interpret,
                             version=version or _kernel_version())
    specs = dict(mesh=mesh, in_specs=(P("dp", None), P("dp", None)),
                 out_specs=P("dp"))
    try:
        # replication checking can't see through an opaque pallas_call;
        # disable it (the kernel output is genuinely dp-varying)
        fn = shard_map(body, check_vma=False, **specs)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(body, check_rep=False, **specs)
    return fn(vp, mp)[:T]
