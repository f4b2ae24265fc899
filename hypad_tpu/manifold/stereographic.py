"""kappa-stereographic (Poincare ball for k<0) gyrovector math, TPU-native.

This is the numerical core of HypAD-TPU (layer L0 of the framework). The
*behavior* spec is the kappa-stereographic math of geoopt 0.5.0 as vendored by
the reference repo in ``math_.py`` (see reference ``math_.py:51-59`` for the
tanh/artanh clamp schedule, ``:340-352`` project, ``:381-383`` lambda_x,
``:536-555`` mobius_add, ``:657-676`` gyration, ``:892-902`` dist,
``:1132-1136`` expmap0, ``:1267-1270`` logmap0, ``:1307-1323`` mobius_matvec,
``:1739-1745`` parallel transport, ``:1843-1845`` egrad2rgrad,
``:853-858`` mobius_scalar_mul, ``:1940-1952`` antipode, ``:2026-2090``
weighted_midpoint, ``:2135-2159`` dist2plane_matmul; round 5 completed the
remaining public k<0 surface: ``:386`` inner, ``:433`` norm, ``:558``
mobius_sub, ``:678/:747`` mobius_coadd/cosub, ``:905`` dist_matmul, ``:978``
geodesic, ``:1139`` geodesic_unit, ``:1188`` logmap-at-x, ``:1374``
mobius_fn_apply_chain — every public ``math_.py`` function meaningful on the
ball is now implemented and golden-tested). The
*implementation* is new: pure jnp in float32, jit/vmap/grad-transformable, with
every stability clamp reproduced exactly so boundary numerics match the
reference bit-for-bit in f32.

Conventions:
  * curvature ``k`` is a python float or scalar array, k < 0 for the
    hyperbolic ball (HypAD always uses k = -1.0).
  * all ops reduce over the last axis (``dim=-1`` in the reference).
  * computations are carried out in the input dtype; HypAD uses float32
    (reference forces fp32 in MobiusLinear, ``hyperspace/hyrnn_nets.py:186-191``).
"""

from __future__ import annotations

import jax.numpy as jnp

# -- stability constants (reference math_.py clamp table) --------------------
TANH_CLAMP = 15.0          # math_.py:51-53
ARTANH_EPS = 1e-7          # math_.py:56-59
NORM_FLOOR = 1e-15         # clamp_min floor used throughout
PROJECT_EPS_F32 = 4e-3     # math_.py:346-349 (fp32 branch)
PROJECT_EPS_F64 = 1e-5
ACOSH_EPS = 1e-7           # train.py:229 fudge inside acosh


def _last_norm(x, keepdims=True):
    """L2 norm over the last axis, floored at NORM_FLOOR like ``clamp_min``."""
    return jnp.maximum(
        jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=keepdims)), NORM_FLOOR
    )


def tanh(x):
    """tanh with +-15 pre-clamp (math_.py:51-53)."""
    return jnp.tanh(jnp.clip(x, -TANH_CLAMP, TANH_CLAMP))


def artanh(x):
    """artanh with input clamped to (-1+1e-7, 1-1e-7) (math_.py:56-59)."""
    x = jnp.clip(x, -1.0 + ARTANH_EPS, 1.0 - ARTANH_EPS)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def tan_k(x, k=-1.0):
    """tan_kappa; only the k<0 branch is exercised by HypAD (math_.py:217-244)."""
    k = jnp.asarray(k, dtype=jnp.result_type(x))
    sqrt_abs_k = jnp.sqrt(jnp.abs(k))
    return tanh(x * sqrt_abs_k) / sqrt_abs_k


def artan_k(x, k=-1.0):
    """artan_kappa, k<0 branch (math_.py:247-274)."""
    k = jnp.asarray(k, dtype=jnp.result_type(x))
    sqrt_abs_k = jnp.sqrt(jnp.abs(k))
    return artanh(x * sqrt_abs_k) / sqrt_abs_k


def project(x, k=-1.0, eps=None):
    """Clip points to the open ball of radius (1-eps)/sqrt(|k|) (math_.py:340-352)."""
    if eps is None:
        eps = PROJECT_EPS_F32 if x.dtype == jnp.float32 else PROJECT_EPS_F64
    k = jnp.asarray(k, dtype=x.dtype)
    maxnorm = (1.0 - eps) / jnp.sqrt(jnp.abs(k))
    norm = _last_norm(x)
    return jnp.where(norm > maxnorm, x / norm * maxnorm, x)


def lambda_x(x, k=-1.0, keepdims=False):
    """Conformal factor 2 / (1 + k ||x||^2), floored (math_.py:381-383)."""
    k = jnp.asarray(k, dtype=x.dtype)
    sq = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    return 2.0 / jnp.maximum(1.0 + k * sq, NORM_FLOOR)


def mobius_add(x, y, k=-1.0):
    """Mobius gyrovector addition x (+)_k y (math_.py:536-555)."""
    k = jnp.asarray(k, dtype=jnp.result_type(x, y))
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1.0 - 2.0 * k * xy - k * y2) * x + (1.0 + k * x2) * y
    denom = 1.0 - 2.0 * k * xy + (k * k) * x2 * y2
    return num / jnp.maximum(denom, NORM_FLOOR)


def gyration(u, v, w, k=-1.0):
    """gyr[u, v] w — simplified closed form (math_.py:657-676)."""
    k = jnp.asarray(k, dtype=jnp.result_type(u, v, w))
    u2 = jnp.sum(u * u, axis=-1, keepdims=True)
    v2 = jnp.sum(v * v, axis=-1, keepdims=True)
    uv = jnp.sum(u * v, axis=-1, keepdims=True)
    uw = jnp.sum(u * w, axis=-1, keepdims=True)
    vw = jnp.sum(v * w, axis=-1, keepdims=True)
    k2 = k * k
    a = -k2 * uw * v2 - k * vw + 2.0 * k2 * uv * vw
    b = -k2 * vw * u2 + k * uw
    d = 1.0 - 2.0 * k * uv + k2 * u2 * v2
    return w + 2.0 * (a * u + b * v) / jnp.maximum(d, NORM_FLOOR)


def expmap0(u, k=-1.0):
    """Exponential map at the origin (math_.py:1132-1136)."""
    u_norm = _last_norm(u)
    return tan_k(u_norm, k) * (u / u_norm)


def logmap0(y, k=-1.0):
    """Logarithmic map at the origin (math_.py:1267-1270)."""
    y_norm = _last_norm(y)
    return (y / y_norm) * artan_k(y_norm, k)


def expmap(x, u, k=-1.0):
    """Exponential map at x (math_.py:1097-1103)."""
    u_norm = _last_norm(u)
    lam = lambda_x(x, k, keepdims=True)
    second = tan_k(lam / 2.0 * u_norm, k) * (u / u_norm)
    return mobius_add(x, second, k)


def retr(x, u, k=-1.0):
    """First-order retraction: project(x + u) — geoopt PoincareBall.retr."""
    return project(x + u, k)


def parallel_transport(x, y, v, k=-1.0):
    """P_{x->y}(v) = gyr[y, -x] v * lambda_x / lambda_y (math_.py:1739-1745)."""
    return (
        gyration(y, -x, v, k)
        * lambda_x(x, k, keepdims=True)
        / lambda_x(y, k, keepdims=True)
    )


def mobius_matvec(m, x, k=-1.0):
    """Mobius matrix-vector multiply with exact zero-vector guard
    (math_.py:1307-1323). ``m``: (out, in); ``x``: (..., in)."""
    x_norm = _last_norm(x)
    mx = x @ m.T
    mx_norm = _last_norm(mx)
    res = tan_k(mx_norm / x_norm * artan_k(x_norm, k), k) * (mx / mx_norm)
    all_zero = jnp.all(mx == 0, axis=-1, keepdims=True)
    return jnp.where(all_zero, jnp.zeros((), dtype=res.dtype), res)


def mobius_pointwise_mul(w, x, k=-1.0):
    """Mobius pointwise (diagonal-matrix) multiply (math_.py:1361-1372)."""
    x_norm = _last_norm(x)
    wx = w * x
    wx_norm = _last_norm(wx)
    res = tan_k(wx_norm / x_norm * artan_k(x_norm, k), k) * (wx / wx_norm)
    all_zero = jnp.all(jnp.isclose(wx, 0.0), axis=-1, keepdims=True)
    return jnp.where(all_zero, jnp.zeros((), dtype=res.dtype), res)


def mobius_fn_apply(fn, x, k=-1.0):
    """Apply a Euclidean fn in the tangent space at 0 (logmap0 -> fn -> expmap0)."""
    return project(expmap0(fn(logmap0(x, k)), k), k)


def dist(x, y, k=-1.0, keepdims=False):
    """Geodesic distance 2 artan_k(||(-x) (+) y||) (math_.py:892-902)."""
    return 2.0 * artan_k(_last_norm(mobius_add(-x, y, k), keepdims=keepdims), k)


def dist0(x, k=-1.0, keepdims=False):
    """Distance to the origin."""
    return 2.0 * artan_k(_last_norm(x, keepdims=keepdims), k)


def dist2plane(x, p, a, k=-1.0, signed=False):
    """Distance from x to the hyperplane through p with normal a
    (math_.py:1645-1666; only the k<0 arsin_k branch)."""
    k = jnp.asarray(k, dtype=x.dtype)
    diff = mobius_add(-p, x, k)
    diff_norm2 = jnp.maximum(jnp.sum(diff * diff, axis=-1), NORM_FLOOR)
    sc_diff_a = jnp.sum(diff * a, axis=-1)
    if not signed:
        sc_diff_a = jnp.abs(sc_diff_a)
    a_norm = jnp.sqrt(jnp.sum(a * a, axis=-1))
    num = 2.0 * sc_diff_a
    denom = (1.0 + k * diff_norm2) * a_norm
    # clamp_abs with eps=1e-15 (math_.py clamp_abs)
    denom = jnp.sign(denom) * jnp.maximum(jnp.abs(denom), NORM_FLOOR)
    # arsin_k for k<0 reduces to arsinh(x * sqrt|k|)/sqrt|k|
    sqrt_abs_k = jnp.sqrt(jnp.abs(k))
    ratio = num / denom * sqrt_abs_k
    return jnp.arcsinh(ratio) / sqrt_abs_k


def _sign(x):
    """geoopt.utils.sign: never returns 0 (sign(0) = +1)."""
    return jnp.sign(jnp.sign(x) + 0.5)


def _clamp_abs(x, eps=NORM_FLOOR):
    """geoopt.utils.clamp_abs: floor |x| at eps, preserving (nonzero) sign."""
    return _sign(x) * jnp.maximum(jnp.abs(x), eps)


def antipode(x, k=-1.0):
    """Antipodal point (math_.py:1940-1952). For k <= 0 (the entire HypAD
    regime) the antipode is simply -x; the k > 0 geodesic construction is
    out of scope for this k<0 core."""
    return -x


def mobius_scalar_mul(r, x, k=-1.0):
    """Mobius scalar multiplication r (x) x (math_.py:853-858):
    tan_k(r * artan_k(||x||)) * x/||x||."""
    x_norm = _last_norm(x)
    return tan_k(r * artan_k(x_norm, k), k) * (x / x_norm)


def weighted_midpoint(xs, weights=None, k=-1.0, reducedim=None,
                      keepdim=False, lincomb=False, posweight=False,
                      coadd=False):
    """Einstein midpoint in Poincare coordinates (math_.py:2026-2090):

        mid = 1/2 (x) ( sum_i a_i lam(x_i) x_i / sum_j |a_j| (lam(x_j) - 1) )

    Reduces over ``reducedim`` (default: every axis except the last);
    the last axis is the manifold dimension. Only the k <= 0 branches are
    carried (the k > 0 antipode check, math_.py:2064-2075, never fires for
    the ball).
    """
    xs = jnp.asarray(xs)
    if reducedim is None:
        reducedim = tuple(range(xs.ndim - 1))
    elif isinstance(reducedim, int):
        reducedim = (reducedim,)
    else:
        reducedim = tuple(reducedim)
    gamma = lambda_x(xs, k, keepdims=True)
    if weights is None:
        weights = jnp.ones((), dtype=xs.dtype)
        scalar_weights = True
    else:
        weights = jnp.asarray(weights, dtype=xs.dtype)[..., None]
        scalar_weights = False
    if posweight and not scalar_weights:
        xs = jnp.where(weights < 0, antipode(xs, k), xs)
        weights = jnp.abs(weights)
    denominator = jnp.sum((gamma - 1.0) * jnp.abs(weights), axis=reducedim,
                          keepdims=True)
    nominator = jnp.sum(gamma * weights * xs, axis=reducedim, keepdims=True)
    two_mean = nominator / _clamp_abs(denominator, 1e-10)
    if lincomb or coadd:
        a_mean = two_mean
    else:
        k_ = jnp.asarray(k, dtype=xs.dtype)
        a_mean = two_mean / (
            1.0 + jnp.sqrt(1.0 + k_ * jnp.sum(two_mean ** 2, axis=-1,
                                              keepdims=True)))
    if lincomb:
        if scalar_weights:
            alpha = weights
            for d in reducedim:
                alpha = alpha * xs.shape[d]
        else:
            alpha = jnp.sum(jnp.broadcast_to(weights, gamma.shape),
                            axis=reducedim, keepdims=True)
        a_mean = mobius_scalar_mul(alpha / 2.0, a_mean, k)
    if not keepdim:
        a_mean = a_mean.reshape([s for i, s in enumerate(a_mean.shape)
                                 if i not in reducedim])
    return a_mean


def arsin_k(x, k=-1.0):
    """arsin_kappa, k<0 branch: arsinh(x sqrt|k|)/sqrt|k| (math_.py:266-290)."""
    k = jnp.asarray(k, dtype=jnp.result_type(x))
    sqrt_abs_k = jnp.sqrt(jnp.abs(k))
    return jnp.arcsinh(x * sqrt_abs_k) / sqrt_abs_k


def dist2plane_matmul(x, p, z, k=-1.0):
    """Batched distance-to-hyperplanes in matmul form (math_.py:2135-2159).

    ``x``: (..., D) ball points; ``p``: (D, P) hyperplane points; ``z``:
    (D, P) hyperplane tangents (reduction over dim=-2 as in the spec).
    Returns (..., P) signed distances scaled by the tangent norms.
    """
    k = jnp.asarray(k, dtype=jnp.result_type(x))
    z_norm = jnp.maximum(
        jnp.sqrt(jnp.sum(z * z, axis=-2, keepdims=True)), NORM_FLOOR)
    z_unit = z / z_norm

    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-2, keepdims=True)
    pz = jnp.sum(p * z_unit, axis=-2, keepdims=True)

    inner = (x @ z_unit
             - (1.0 + 2.0 * k * (x @ p) - k * x2)
             / jnp.maximum(1.0 + k * x2, NORM_FLOOR) * pz)
    distance = arsin_k(
        2.0 / jnp.maximum(1.0 + k * p2, NORM_FLOOR) * inner, k)
    return 2.0 * distance * z_norm


def inner(x, u, v, k=-1.0, keepdims=False):
    """Riemannian inner product of tangent vectors u, v at x:
    lambda_x^2 <u, v> (math_.py:386-431)."""
    lam = lambda_x(x, k, keepdims=True)
    return lam * lam * jnp.sum(u * v, axis=-1, keepdims=keepdims)


def norm(x, u, k=-1.0, keepdims=False):
    """Riemannian norm of tangent vector u at x: lambda_x ||u||_2
    (math_.py:433-473). NOTE the reference applies ``keepdim`` to BOTH
    factors (lambda_x and the norm), reproduced here."""
    return lambda_x(x, k, keepdims=keepdims) * jnp.sqrt(
        jnp.sum(u * u, axis=-1, keepdims=keepdims))


def mobius_sub(x, y, k=-1.0):
    """Mobius gyrovector subtraction x (-)_k y = x (+)_k (-y)
    (math_.py:558-589)."""
    return mobius_add(x, -y, k)


def mobius_coadd(x, y, k=-1.0):
    """Mobius cogyrovector addition (math_.py:678-744):
    ((1 + k||y||^2) x + (1 + k||x||^2) y) / (1 - k^2 ||x||^2 ||y||^2)."""
    k = jnp.asarray(k, dtype=jnp.result_type(x, y))
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    num = (1.0 + k * y2) * x + (1.0 + k * x2) * y
    denom = 1.0 - (k * k) * x2 * y2
    return num / jnp.maximum(denom, NORM_FLOOR)


def mobius_cosub(x, y, k=-1.0):
    """Mobius cogyrovector subtraction: x coadd (-y) (math_.py:747-780)."""
    return mobius_coadd(x, -y, k)


def logmap(x, y, k=-1.0):
    """Logarithmic map of y at x (math_.py:1188-1231):
    2 artan_k(||(-x)(+)y||) * ((-x)(+)y) / (lambda_x ||(-x)(+)y||).
    Inverse of :func:`expmap` at x (identity-tested)."""
    sub = mobius_add(-x, y, k)
    sub_norm = _last_norm(sub)
    lam = lambda_x(x, k, keepdims=True)
    return 2.0 * artan_k(sub_norm, k) * (sub / (lam * sub_norm))


def dist_matmul(x, y, k=-1.0):
    """Pairwise geodesic distances in matmul form (math_.py:905-947):
    ``x``: (..., N, D), ``y``: (D, M) -> (..., N, M). The squared mobius_add
    norm is expanded so the N x M grid needs one GEMM, not an N x M x D
    intermediate — the MXU-friendly form of :func:`dist`."""
    k = jnp.asarray(k, dtype=jnp.result_type(x))
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-2, keepdims=True)
    xy = x @ y
    num = x2 - 2.0 * xy + y2
    denom = jnp.maximum(1.0 + 2.0 * k * xy + (k * k) * x2 * y2, NORM_FLOOR)
    return 2.0 * artan_k(jnp.sqrt(jnp.maximum(num / denom, NORM_FLOOR)), k)


def geodesic(t, x, y, k=-1.0):
    """Point at parameter t along the geodesic from x to y
    (math_.py:978-1045): x (+) t (x) ((-x) (+) y)."""
    v = mobius_add(-x, y, k)
    tv = mobius_scalar_mul(t, v, k)
    return mobius_add(x, tv, k)


def geodesic_unit(t, x, u, k=-1.0):
    """Unit-speed geodesic from x with direction u at arclength t
    (math_.py:1139-1186): x (+) tan_k(t/2) u/||u||."""
    u_norm = _last_norm(u)
    second = tan_k(t / 2.0, k) * (u / u_norm)
    return mobius_add(x, second, k)


def mobius_fn_apply_chain(x, *fns, k=-1.0):
    """Sequential gyrovector function application (math_.py:1374-1428):
    ONE logmap0/expmap0 round trip around the whole chain. NOTE: like the
    reference, the result is NOT projected back to the ball (unlike
    :func:`mobius_fn_apply`, whose reference wrapper projects)."""
    if not fns:
        return x
    ex = logmap0(x, k)
    for fn in fns:
        ex = fn(ex)
    return expmap0(ex, k)


def egrad2rgrad(x, grad, k=-1.0):
    """Euclidean-to-Riemannian gradient: grad / lambda_x^2 (math_.py:1843-1845)."""
    lam = lambda_x(x, k, keepdims=True)
    return grad / (lam * lam)


def acosh_poincare_distance(u, v, eps=ACOSH_EPS):
    """The *explicit* Poincare distance used by the reference training loss
    and detector: acosh(1 + 2 d2 / ((1-||u||^2)(1-||v||^2)) + 1e-7)
    (reference train.py:226-230, utils/anomaly_detection_utils.py:58-66).

    NOTE: intentionally NOT the same function as :func:`dist` — the reference
    never uses gmath.dist for the loss, and parity requires this acosh form
    with its additive 1e-7 fudge and *unclamped* (1 - ||.||^2) denominators.
    Reduces over the last axis; returns shape ``u.shape[:-1]``.
    """
    sqdist = jnp.sum((u - v) ** 2, axis=-1)
    squnorm = jnp.sum(u * u, axis=-1)
    sqvnorm = jnp.sum(v * v, axis=-1)
    x_temp = 1.0 + 2.0 * sqdist / ((1.0 - squnorm) * (1.0 - sqvnorm)) + eps
    return jnp.arccosh(x_temp)
