"""Batched Gaussian-KDE argmax over anti-diagonals — one einsum per batch.

Behavior spec: reference ``utils/anomaly_detection_utils.py:381-400`` (and its
duplicate ``:480-503``): per timestep, fit ``scipy.stats.gaussian_kde`` to the
<=W critic values on the anti-diagonal, evaluate the density AT those same
points, and keep the sample where the density peaks; fall back to the median
when the fit is singular (zero variance) or only one sample exists.

scipy semantics reproduced:
  * Scott bandwidth: ``factor = n**(-1/(d+4))`` with d=1 -> ``n**(-0.2)``;
  * covariance uses the UNBIASED sample variance (np.cov ddof=1);
  * the argmax is over density values, first-max-wins (np.argmax).

The normalization constant is dropped — it does not affect the argmax. The
whole T-row batch is one masked pairwise-difference reduction; rows are
processed in blocks to bound the (block, W, W) intermediate.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from hypad_tpu.ops.unroll import masked_median

# the masked-entry sentinel (see one_block below) is only exact when real
# values are far below it; critic scores are O(1) so 1e15 is a generous bound
_SENTINEL_BOUND = 1e15
_DEBUG = os.environ.get("HYPAD_DEBUG", "") not in ("", "0")


def _check_sentinel_bound(max_abs):
    if not (max_abs < _SENTINEL_BOUND):  # also trips on NaN
        raise FloatingPointError(
            f"kde_argmax_rows: |vals| max {max_abs!r} >= {_SENTINEL_BOUND:g}; "
            "the 1e18 masked-entry sentinel is no longer separable from real "
            "data and the density argmax would be silently wrong")


def kde_argmax_rows(vals, mask, block=1024):
    """Per-row KDE-argmax sample. vals/mask: (T, W). Returns (T,).

    Rows with count <= 1 or zero variance use the masked median (the
    reference's fallback paths)."""

    def one_block(vb, mb):
        cnt = jnp.sum(mb, axis=-1)                            # (t,)
        cnt_f = jnp.maximum(cnt, 1).astype(vb.dtype)
        mean = jnp.sum(jnp.where(mb, vb, 0.0), -1) / cnt_f
        centered = jnp.where(mb, vb - mean[:, None], 0.0)
        var = jnp.sum(centered * centered, -1) / jnp.maximum(cnt_f - 1.0, 1.0)
        # Scott: h^2 = var * n^(-2/5)
        h2 = var * cnt_f ** (-0.4)
        h2_safe = jnp.where(h2 > 0, h2, 1.0)

        # masked entries become a 1e18 sentinel: any pair touching one has
        # diff^2 ~ 1e36, the scaled exponent is a huge negative (or -inf)
        # and exp == exactly 0 — same outputs as the explicit (t, W, W)
        # pair-mask select (verified bitwise on-chip at 20k rows), one
        # fewer rank-3 op. Sentinel-sentinel pairs contribute only to
        # masked rows, discarded below. Assumes |vals| << 1e18 (critic
        # scores are O(1) — see ops/kde_pallas.py docstring). The
        # scale-multiply form below is deliberately shared with the Pallas
        # v1 kernel so their bitwise-equality tests hold by construction.
        scale = (-0.5 / h2_safe)[:, None, None]
        vs = jnp.where(mb, vb, 1e18)
        diff = vs[:, :, None] - vs[:, None, :]                # (t, W, W)
        dens = jnp.sum(jnp.exp(scale * (diff * diff)), axis=-1)
        dens = jnp.where(mb, dens, -jnp.inf)
        arg = jnp.argmax(dens, axis=-1)
        kde_val = jnp.take_along_axis(vb, arg[:, None], axis=-1)[:, 0]

        med = masked_median(vb, mb)
        use_kde = (cnt > 1) & (var > 0)
        return jnp.where(use_kde, kde_val, med)

    if _DEBUG:
        # HYPAD_DEBUG=1: verify the sentinel contract even under jit (the
        # callback raises on host); off by default — adds one tiny kernel +
        # a host sync per call
        max_abs = jnp.max(jnp.abs(jnp.where(mask, vals, 0.0)))
        jax.debug.callback(_check_sentinel_bound, max_abs)

    T = vals.shape[0]
    if T <= block:
        return one_block(vals, mask)
    pad = (-T) % block
    vp = jnp.pad(vals, ((0, pad), (0, 0)))
    mp = jnp.pad(mask, ((0, pad), (0, 0)))
    vb = vp.reshape(-1, block, vals.shape[1])
    mb = mp.reshape(-1, block, vals.shape[1])
    out = jax.lax.map(lambda args: one_block(*args), (vb, mb))
    return out.reshape(-1)[:T]
