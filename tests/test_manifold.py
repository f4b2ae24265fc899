"""Unit tests for the kappa-stereographic core (SURVEY.md §4: closed-form
identities + float64 numpy oracle for the geoopt-0.5.0 formula set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.manifold import stereographic as st

jax.config.update("jax_enable_x64", False)


# ---- independent float64 numpy oracle (written from the math, not the code) -

def np_mobius_add(x, y, k=-1.0):
    x2 = np.sum(x * x, -1, keepdims=True)
    y2 = np.sum(y * y, -1, keepdims=True)
    xy = np.sum(x * y, -1, keepdims=True)
    num = (1 - 2 * k * xy - k * y2) * x + (1 + k * x2) * y
    den = 1 - 2 * k * xy + k * k * x2 * y2
    return num / np.maximum(den, 1e-15)


def np_expmap0(u, k=-1.0):
    n = np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-15)
    return np.tanh(n) * u / n


def np_logmap0(y, k=-1.0):
    n = np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-15)
    return np.arctanh(np.clip(n, None, 1 - 1e-7)) * y / n


def random_ball_points(rng, shape, scale=0.3):
    return (rng.standard_normal(shape) * scale / np.sqrt(shape[-1])).astype(
        np.float32
    )


def test_mobius_add_matches_oracle(rng):
    x = random_ball_points(rng, (64, 100))
    y = random_ball_points(rng, (64, 100))
    got = np.asarray(st.mobius_add(jnp.array(x), jnp.array(y)))
    want = np_mobius_add(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_expmap0_logmap0_match_oracle(rng):
    u = rng.standard_normal((32, 20)).astype(np.float32) * 0.5
    got = np.asarray(st.expmap0(jnp.array(u)))
    want = np_expmap0(u.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    y = random_ball_points(rng, (32, 20))
    got = np.asarray(st.logmap0(jnp.array(y)))
    want = np_logmap0(y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_left_cancellation(rng):
    """(-x) + (x + y) == y  (math_.py:511-515)."""
    x = random_ball_points(rng, (16, 10))
    y = random_ball_points(rng, (16, 10))
    out = st.mobius_add(-jnp.array(x), st.mobius_add(jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=1e-5)


def test_expmap0_logmap0_inverse(rng):
    y = random_ball_points(rng, (16, 10))
    out = st.expmap0(st.logmap0(jnp.array(y)))
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=1e-6)


def test_project_clips_to_ball(rng):
    x = rng.standard_normal((8, 5)).astype(np.float32) * 10
    out = np.asarray(st.project(jnp.array(x)))
    norms = np.linalg.norm(out, axis=-1)
    assert np.all(norms <= 1.0 - 4e-3 + 1e-6)
    # points already inside are untouched
    inside = random_ball_points(rng, (8, 5))
    np.testing.assert_array_equal(np.asarray(st.project(jnp.array(inside))), inside)


def test_mobius_matvec_zero_guard():
    m = jnp.zeros((4, 4), jnp.float32)
    x = jnp.full((2, 4), 0.1, jnp.float32)
    out = np.asarray(st.mobius_matvec(m, x))
    np.testing.assert_array_equal(out, np.zeros((2, 4), np.float32))


def test_mobius_matvec_identity(rng):
    """Identity matrix -> identity map on the ball (up to f32 eps)."""
    x = random_ball_points(rng, (8, 6))
    out = np.asarray(st.mobius_matvec(jnp.eye(6), jnp.array(x)))
    np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-6)


def test_dist_vs_acosh_formula(rng):
    """gmath-style dist and the explicit acosh distance agree analytically
    (up to the 1e-7 fudge the reference adds inside acosh)."""
    u = random_ball_points(rng, (32, 10), scale=0.2)
    v = random_ball_points(rng, (32, 10), scale=0.2)
    d1 = np.asarray(st.dist(jnp.array(u), jnp.array(v)))
    d2 = np.asarray(st.acosh_poincare_distance(jnp.array(u), jnp.array(v)))
    np.testing.assert_allclose(d1, d2, rtol=1e-2, atol=5e-3)


def test_acosh_distance_matches_reference_formula(rng):
    """Bit-level spec of train.py:226-230 in float64."""
    u = random_ball_points(rng, (16, 100)).astype(np.float64)
    v = random_ball_points(rng, (16, 100)).astype(np.float64)
    sqdist = np.sum((u - v) ** 2, -1)
    squ = np.sum(u * u, -1)
    sqv = np.sum(v * v, -1)
    want = np.arccosh(1 + 2 * sqdist / ((1 - squ) * (1 - sqv)) + 1e-7)
    got = np.asarray(
        st.acosh_poincare_distance(
            jnp.array(u, jnp.float32), jnp.array(v, jnp.float32)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_parallel_transport_preserves_norm_at_origin(rng):
    """Transport 0 -> y is v * lambda_0/lambda_y * gyr[y,0] = v*2/lambda_y;
    check against parallel_transport0 closed form (math_.py:1776-1780)."""
    y = random_ball_points(rng, (8, 6))
    v = rng.standard_normal((8, 6)).astype(np.float32)
    got = np.asarray(st.parallel_transport(jnp.zeros((8, 6)), jnp.array(y), jnp.array(v)))
    lam_y = 2.0 / (1.0 - np.sum(y * y, -1, keepdims=True))
    want = v * 2.0 / lam_y
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_egrad2rgrad(rng):
    x = random_ball_points(rng, (4, 3))
    g = rng.standard_normal((4, 3)).astype(np.float32)
    got = np.asarray(st.egrad2rgrad(jnp.array(x), jnp.array(g)))
    lam = 2.0 / (1.0 - np.sum(x * x, -1, keepdims=True))
    np.testing.assert_allclose(got, g / lam**2, rtol=1e-4, atol=1e-6)


def test_gradients_flow():
    """Manifold ops must be differentiable (training depends on it)."""
    def loss(u, v):
        pu = st.project(st.expmap0(u))
        pv = st.project(st.expmap0(v))
        return jnp.sum(st.acosh_poincare_distance(pu, pv))

    u = jnp.full((4, 10), 0.05, jnp.float32)
    v = jnp.full((4, 10), -0.03, jnp.float32)
    g = jax.grad(loss)(u, v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_dist2plane_finite(rng):
    x = random_ball_points(rng, (8, 1, 6))
    p = random_ball_points(rng, (4, 6))
    a = rng.standard_normal((4, 6)).astype(np.float32)
    out = np.asarray(st.dist2plane(jnp.array(x), jnp.array(p), jnp.array(a), signed=True))
    assert out.shape == (8, 4)
    assert np.all(np.isfinite(out))


# ---- L0 spec completion: weighted_midpoint / dist2plane_matmul -------------
# Golden-tested against the vendored math spec EXECUTED from the reference
# checkout (tests/reference_oracle.load_reference_math) in float64.

def _refmath():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference_math

    return load_reference_math()


def test_weighted_midpoint_matches_spec(rng):
    import torch

    mod = _refmath()
    xs = random_ball_points(rng, (6, 8)).astype(np.float64)
    w = rng.standard_normal(6)
    k = torch.tensor(-1.0, dtype=torch.float64)
    txs, tw = torch.tensor(xs), torch.tensor(w)
    cases = [
        dict(),                       # unweighted Einstein midpoint
        dict(weights=w),              # signed weights
        dict(weights=w, lincomb=True),
        dict(weights=w, posweight=True),
        dict(lincomb=True),           # scalar-weight lincomb (alpha = n)
    ]
    for kw in cases:
        tkw = {kk: (torch.tensor(vv) if isinstance(vv, np.ndarray) else vv)
               for kk, vv in kw.items()}
        want = mod.weighted_midpoint(txs, k=k, **tkw).numpy()
        got = np.asarray(st.weighted_midpoint(
            xs.astype(np.float32),
            **{kk: (vv.astype(np.float32) if isinstance(vv, np.ndarray)
                    else vv) for kk, vv in kw.items()}))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5,
                                   err_msg=f"case {kw}")


def test_weighted_midpoint_of_identical_points_is_the_point(rng):
    x = random_ball_points(rng, (1, 8))
    xs = np.repeat(x, 5, axis=0)
    mid = np.asarray(st.weighted_midpoint(xs))
    np.testing.assert_allclose(mid, x[0], rtol=1e-4, atol=1e-5)


def test_weighted_midpoint_reducedim_and_keepdim(rng):
    xs = random_ball_points(rng, (3, 5, 8))
    out = np.asarray(st.weighted_midpoint(xs, reducedim=(1,)))
    assert out.shape == (3, 8)
    out2 = np.asarray(st.weighted_midpoint(xs, reducedim=(1,), keepdim=True))
    assert out2.shape == (3, 1, 8)
    np.testing.assert_allclose(out, out2[:, 0], rtol=1e-6)


def test_dist2plane_matmul_matches_spec(rng):
    import torch

    mod = _refmath()
    x = (rng.standard_normal((5, 8)) * 0.2)
    p = (rng.standard_normal((8, 3)) * 0.2)
    z = rng.standard_normal((8, 3))
    k = torch.tensor(-1.0, dtype=torch.float64)
    want = mod.dist2plane_matmul(torch.tensor(x), torch.tensor(p),
                                 torch.tensor(z), k=k).numpy()
    got = np.asarray(st.dist2plane_matmul(
        jnp.array(x, jnp.float32), jnp.array(p, jnp.float32),
        jnp.array(z, jnp.float32)))
    # f32 runtime vs f64 spec: the inner product has cancellation, hence
    # the looser rtol (f64-vs-f64 agreement is ~1e-15, verified offline)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_mobius_scalar_mul_matches_spec(rng):
    import torch

    mod = _refmath()
    x = random_ball_points(rng, (6, 8)).astype(np.float64)
    r = 0.37
    k = torch.tensor(-1.0, dtype=torch.float64)
    want = mod.mobius_scalar_mul(torch.tensor(r, dtype=torch.float64),
                                 torch.tensor(x), k=k).numpy()
    got = np.asarray(st.mobius_scalar_mul(r, jnp.array(x, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_antipode_is_negation_for_negative_curvature(rng):
    x = random_ball_points(rng, (4, 8))
    np.testing.assert_array_equal(np.asarray(st.antipode(x)), -x)


def test_full_manifold_core_matches_executed_spec(rng):
    """Every runtime manifold op golden-tested against the vendored spec
    EXECUTED from the reference checkout (float64 torch), complementing the
    hand-written oracles above. k = -1 (the only curvature HypAD uses)."""
    import torch

    mod = _refmath()
    k64 = torch.tensor(-1.0, dtype=torch.float64)
    x = random_ball_points(rng, (16, 10)).astype(np.float64)
    y = random_ball_points(rng, (16, 10)).astype(np.float64)
    u = (rng.standard_normal((16, 10)) * 0.3)
    w = rng.standard_normal((16, 10))
    m = (rng.standard_normal((6, 10)) * 0.3)
    tx, ty, tu, tw, tm = (torch.tensor(a) for a in (x, y, u, w, m))

    def chk(got, want, name, rtol=3e-5, atol=1e-6):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=rtol, atol=atol, err_msg=name)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    chk(st.tan_k(f32(u)), mod.tan_k(tu, k64), "tan_k")
    chk(st.artan_k(f32(x)), mod.artan_k(tx, k64), "artan_k")
    chk(st.lambda_x(f32(x)), mod.lambda_x(tx, k=k64), "lambda_x")
    chk(st.mobius_add(f32(x), f32(y)), mod.mobius_add(tx, ty, k=k64),
        "mobius_add")
    chk(st.gyration(f32(x), f32(y), f32(w)), mod.gyration(tx, ty, tw, k=k64),
        "gyration")
    chk(st.expmap0(f32(u)), mod.expmap0(tu, k=k64), "expmap0")
    chk(st.logmap0(f32(x)), mod.logmap0(tx, k=k64), "logmap0")
    chk(st.expmap(f32(x), f32(u)), mod.expmap(tx, tu, k=k64), "expmap")
    chk(st.dist(f32(x), f32(y)), mod.dist(tx, ty, k=k64), "dist")
    chk(st.dist0(f32(x)), mod.dist0(tx, k=k64), "dist0")
    chk(st.mobius_matvec(f32(m), f32(x)), mod.mobius_matvec(tm, tx, k=k64),
        "mobius_matvec")
    chk(st.mobius_pointwise_mul(f32(w), f32(x)),
        mod.mobius_pointwise_mul(tw, tx, k=k64), "mobius_pointwise_mul")
    chk(st.parallel_transport(f32(x), f32(y), f32(w)),
        mod.parallel_transport(tx, ty, tw, k=k64), "parallel_transport")
    chk(st.egrad2rgrad(f32(x), f32(w)), mod.egrad2rgrad(tx, tw, k=k64),
        "egrad2rgrad")
    # dist2plane: spec signature dist2plane(x, z, p) where z=plane point,
    # a=tangent (math_.py:1501-1524)
    p_pt = random_ball_points(rng, (10,)).astype(np.float64)
    a = rng.standard_normal(10)
    chk(st.dist2plane(f32(x), f32(p_pt), f32(a), signed=True),
        mod.dist2plane(tx, torch.tensor(p_pt), torch.tensor(a), k=k64,
                       signed=True), "dist2plane")
    # project: spec clips only points outside the ball; feed far points
    far = (rng.standard_normal((8, 10)) * 5).astype(np.float64)
    # float32 branch uses eps=4e-3: compare vs spec evaluated in f32
    want = mod.project(torch.tensor(far, dtype=torch.float32),
                       k=torch.tensor(-1.0))
    chk(st.project(jnp.asarray(far, jnp.float32)), want, "project")


# ---- L0 spec completion round 5: the remaining public k<0 math_.py API -----

def test_remaining_spec_api_matches_executed_spec(rng):
    """Round-5 additions (VERDICT r4 item 5) golden vs the vendored spec
    executed from the reference checkout in float64: inner, norm,
    mobius_sub, mobius_coadd, mobius_cosub, logmap, dist_matmul, geodesic,
    geodesic_unit, mobius_fn_apply_chain (math_.py:386-1472)."""
    import torch

    mod = _refmath()
    k64 = torch.tensor(-1.0, dtype=torch.float64)
    x = random_ball_points(rng, (16, 10)).astype(np.float64)
    y = random_ball_points(rng, (16, 10)).astype(np.float64)
    u = rng.standard_normal((16, 10)) * 0.3
    v = rng.standard_normal((16, 10)) * 0.3
    t = rng.uniform(0.1, 0.9, (16, 1))
    tx, ty, tu, tv, tt = (torch.tensor(a) for a in (x, y, u, v, t))

    def chk(got, want, name, rtol=3e-5, atol=1e-6):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=rtol, atol=atol, err_msg=name)

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    chk(st.inner(f32(x), f32(u), f32(v)), mod.inner(tx, tu, tv, k=k64),
        "inner")
    chk(st.norm(f32(x), f32(u)), mod.norm(tx, tu, k=k64), "norm")
    chk(st.mobius_sub(f32(x), f32(y)), mod.mobius_sub(tx, ty, k=k64),
        "mobius_sub")
    chk(st.mobius_coadd(f32(x), f32(y)), mod.mobius_coadd(tx, ty, k=k64),
        "mobius_coadd")
    chk(st.mobius_cosub(f32(x), f32(y)), mod.mobius_cosub(tx, ty, k=k64),
        "mobius_cosub")
    chk(st.logmap(f32(x), f32(y)), mod.logmap(tx, ty, k=k64), "logmap")
    # dist_matmul: x (N, D) vs y (D, M)
    ym = np.ascontiguousarray(y[:6].T)
    chk(st.dist_matmul(f32(x), f32(ym)),
        mod.dist_matmul(tx, torch.tensor(ym), k=k64), "dist_matmul",
        rtol=2e-4)
    chk(st.geodesic(f32(t), f32(x), f32(y)),
        mod.geodesic(tt, tx, ty, k=k64), "geodesic")
    chk(st.geodesic_unit(f32(t), f32(x), f32(u)),
        mod.geodesic_unit(tt, tx, tu, k=k64), "geodesic_unit")
    fns = (lambda a: a * 0.5, lambda a: a + 0.01)
    chk(st.mobius_fn_apply_chain(f32(x), *fns),
        mod.mobius_fn_apply_chain(tx, *fns, k=k64),
        "mobius_fn_apply_chain")


def test_logmap_expmap_inverse_at_x(rng):
    """expmap(x, logmap(x, y)) == y and logmap(x, expmap(x, u)) == u —
    the at-x identity pair (math_.py:1097-1231)."""
    x = jnp.asarray(random_ball_points(rng, (12, 8)), jnp.float32)
    y = jnp.asarray(random_ball_points(rng, (12, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(st.expmap(x, st.logmap(x, y))),
                               np.asarray(y), rtol=2e-4, atol=2e-5)
    u = jnp.asarray(rng.standard_normal((12, 8)) * 0.2, jnp.float32)
    np.testing.assert_allclose(np.asarray(st.logmap(x, st.expmap(x, u))),
                               np.asarray(u), rtol=2e-4, atol=2e-5)


def test_geodesic_endpoints_and_unit_speed(rng):
    """geodesic(0)=x, geodesic(1)=y; dist(x, geodesic_unit(t, x, u)) = t
    (unit speed, math_.py:978-1186)."""
    x = jnp.asarray(random_ball_points(rng, (10, 6)), jnp.float32)
    y = jnp.asarray(random_ball_points(rng, (10, 6)), jnp.float32)
    np.testing.assert_allclose(np.asarray(st.geodesic(0.0, x, y)),
                               np.asarray(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.geodesic(1.0, x, y)),
                               np.asarray(y), rtol=2e-4, atol=1e-5)
    u = jnp.asarray(rng.standard_normal((10, 6)), jnp.float32)
    t = 0.37
    d = st.dist(x, st.geodesic_unit(t, x, u))
    np.testing.assert_allclose(np.asarray(d), np.full(10, t, np.float32),
                               rtol=1e-4, atol=1e-5)


def test_coadd_cancellation_and_dist_matmul_vs_dist(rng):
    """Ungar right-cancellation pair: (x (+) y) cosub y == x and
    (x coadd y) (-) y == x; dist_matmul columns equal pairwise dist."""
    x = jnp.asarray(random_ball_points(rng, (12, 8)), jnp.float32)
    y = jnp.asarray(random_ball_points(rng, (12, 8)), jnp.float32)
    got = st.mobius_cosub(st.mobius_add(x, y), y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-4, atol=2e-5)
    got = st.mobius_sub(st.mobius_coadd(x, y), y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-4, atol=2e-5)
    ym = jnp.asarray(np.asarray(y[:5]).T)  # (D, 5)
    dm = st.dist_matmul(x, ym)
    for j in range(5):
        want = st.dist(x, jnp.broadcast_to(y[j], x.shape))
        np.testing.assert_allclose(np.asarray(dm[:, j]), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=f"col {j}")


def test_fn_apply_chain_empty_and_composition(rng):
    """Empty chain is identity; chain(f, g) == fn_apply of g.f without the
    wrapper's project (math_.py:1374-1428)."""
    x = jnp.asarray(random_ball_points(rng, (8, 6)), jnp.float32)
    assert st.mobius_fn_apply_chain(x) is x
    f = lambda a: a * 0.5  # noqa: E731
    g = lambda a: a + 0.02  # noqa: E731
    got = st.mobius_fn_apply_chain(x, f, g)
    want = st.expmap0(g(f(st.logmap0(x))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
