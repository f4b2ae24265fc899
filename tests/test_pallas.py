"""Pallas KDE kernel: exact equivalence with the jnp scoring path
(interpreter mode on the CPU mesh; compiled validation runs on-chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.ops.kde import kde_argmax_rows
from hypad_tpu.ops.kde_pallas import kde_argmax_rows_pallas


def _antidiag_inputs(N, W, seed=0, constant_runs=False):
    rng = np.random.default_rng(seed)
    critic = rng.standard_normal(N).astype(np.float32)
    if constant_runs:
        critic[10:40] = 0.5  # forces zero-variance rows -> median fallback
    T = N + W - 1
    i = np.arange(T)[:, None]
    j = np.arange(W)[None, :]
    n = i - j
    mask = (n >= 0) & (n < N)
    vals = np.where(mask, critic[np.clip(n, 0, N - 1)], 0).astype(np.float32)
    return jnp.array(vals), jnp.array(mask)


def assert_tie_level_equal(got, want, vals, mask, max_frac=0.01):
    """v2 accumulates pair contributions in a different order than the jnp
    axis reduction, so density TIES can resolve to a different sample point
    of the same row: any differing value must be a true sample of its row
    and differing rows must be rare."""
    diff = np.nonzero(got != want)[0]
    v, m = np.asarray(vals), np.asarray(mask)
    assert all(got[i] in v[i][m[i]] for i in diff), diff
    assert len(diff) <= max(1, int(max_frac * len(want)))


@pytest.mark.parametrize("version", ["v1", "v2"])
@pytest.mark.parametrize("N,W,const", [(300, 100, False), (50, 100, False),
                                       (300, 100, True), (700, 64, False)])
def test_pallas_kde_matches_jnp(N, W, const, version):
    vals, mask = _antidiag_inputs(N, W, constant_runs=const)
    want = np.asarray(kde_argmax_rows(vals, mask))
    got = np.asarray(kde_argmax_rows_pallas(vals, mask, interpret=True,
                                            version=version))
    if version == "v1":
        # rank-3 kernel: same reduction structure -> bitwise
        np.testing.assert_array_equal(got, want)
    else:
        assert_tie_level_equal(got, want, vals, mask)


def test_pallas_kde_through_critic_pipeline(monkeypatch):
    """HYPAD_KDE_PALLAS=1 routes final_critic_scores through the kernel
    (interpret mode on CPU) with identical output."""
    from hypad_tpu.detect import scorer as sc

    rng = np.random.default_rng(1)
    y = rng.standard_normal((160, 100))
    critic = rng.standard_normal(160)
    base = sc.final_critic_scores(critic, y)

    monkeypatch.setenv("HYPAD_KDE_PALLAS", "1")
    # interpret mode is needed off-TPU; patch the kernel entry accordingly
    import hypad_tpu.ops.kde_pallas as kp

    orig = kp.kde_argmax_rows_pallas
    monkeypatch.setattr(
        kp, "kde_argmax_rows_pallas",
        lambda v, m, interpret=False: orig(v, m, interpret=True))
    got = sc.final_critic_scores(critic, y)
    np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-7)
