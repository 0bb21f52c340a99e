"""Unsigned SQUARED distance kernels for contact stencils, plus closest-point
type classifiers and the parallel edge-edge mollifier.

TPU-first re-derivation of the reference's symbolic-toolbox kernels
(reference: src/CollisionObject/MeshCollisionUtils.hpp — d_PP :156, d_PE :227,
d_PT :685, d_EE :1287, dType_PT :2160, dType_EE :2073, mollifier
compute_e/q/eps_x :2834-2982). The reference generates explicit polynomial
gradient/Hessian code; here each distance is a tiny smooth closed-form
function and derivatives come from `jax.grad`/`jax.hessian`, which produce the
same values to machine precision (verified by tests/test_distance.py).

Conventions
-----------
* All distances are SQUARED distances (matching the reference, so that the
  barrier/dHat semantics line up exactly).
* A contact stencil is 4 vertex positions `x` of shape (4, 3). Reduced types
  use a prefix of the rows and ignore the rest (their derivative w.r.t.
  ignored rows is exactly 0, so padded rows are harmless).
* ctype codes (CTYPE_*): 0 = PP (x0,x1), 1 = PE (x0; x1,x2),
  2 = PT (x0; x1,x2,x3), 3 = EE (x0,x1; x2,x3).

Everything is written for a single stencil and `vmap`-ed by callers.
"""

import jax
import jax.numpy as jnp

CTYPE_PP = 0
CTYPE_PE = 1
CTYPE_PT = 2
CTYPE_EE = 3


def _safe_div(num, den):
    """num/den with a guarded denominator so padded/degenerate lanes in
    fixed-shape candidate tensors yield finite garbage instead of NaN
    (callers mask them out). Active lanes always have den > 0."""
    ok = den > 0
    return jnp.where(ok, num, 0.0) / jnp.where(ok, den, 1.0)

# ---------------------------------------------------------------------------
# squared distances (smooth in the interior of their classification region)
# ---------------------------------------------------------------------------


def d_PP(p0, p1):
    """Squared point-point distance (reference MeshCollisionUtils.hpp:156)."""
    d = p0 - p1
    return jnp.dot(d, d)


def d_PE(p, e0, e1):
    """Squared point-line distance (reference MeshCollisionUtils.hpp:227).

    Valid when the closest point lies in the edge interior.
    """
    e = e1 - e0
    c = jnp.cross(e, p - e0)
    return _safe_div(jnp.dot(c, c), jnp.dot(e, e))


def d_PT(p, t0, t1, t2):
    """Squared point-plane distance (reference MeshCollisionUtils.hpp:685).

    Valid when the closest point lies in the triangle interior.
    """
    n = jnp.cross(t1 - t0, t2 - t0)
    q = jnp.dot(p - t0, n)
    return _safe_div(q * q, jnp.dot(n, n))


def d_EE(a0, a1, b0, b1):
    """Squared line-line distance (reference MeshCollisionUtils.hpp:1287).

    Valid when the closest points lie in both edge interiors and the edges
    are not parallel.
    """
    n = jnp.cross(a1 - a0, b1 - b0)
    q = jnp.dot(a0 - b0, n)
    return _safe_div(q * q, jnp.dot(n, n))


def stencil_dist2(ctype, x):
    """Squared distance of a reduced stencil `x` (4,3) with type `ctype`."""
    return jax.lax.switch(
        ctype,
        [
            lambda x: d_PP(x[0], x[1]),
            lambda x: d_PE(x[0], x[1], x[2]),
            lambda x: d_PT(x[0], x[1], x[2], x[3]),
            lambda x: d_EE(x[0], x[1], x[2], x[3]),
        ],
        x,
    )


def stencil_dist2_grad(ctype, x):
    """(4,3) gradient of stencil_dist2 w.r.t. the stencil positions."""
    return jax.grad(lambda x: stencil_dist2(ctype, x))(x)


def stencil_dist2_hess(ctype, x):
    """(12,12) Hessian of stencil_dist2 w.r.t. the flattened stencil."""
    f = lambda xf: stencil_dist2(ctype, xf.reshape(4, 3))
    return jax.hessian(f)(x.reshape(12))


# ---------------------------------------------------------------------------
# actual (region-aware) distances — used by broad-phase checks / diagnostics
# ---------------------------------------------------------------------------


def point_edge_dist2(p, e0, e1):
    """Region-aware squared point-edge distance
    (reference MeshCollisionUtils.hpp computePointEdgeD :2255)."""
    e = e1 - e0
    t = _safe_div(jnp.dot(p - e0, e), jnp.dot(e, e))
    t = jnp.clip(t, 0.0, 1.0)
    d = p - (e0 + t * e)
    return jnp.dot(d, d)


def point_triangle_dist2(p, t0, t1, t2):
    """Region-aware squared point-triangle distance via dType dispatch
    (mirrors reference computePointTriD, MeshCollisionUtils.hpp:2299)."""
    dt = dtype_PT(p, t0, t1, t2)
    branches = [
        lambda: d_PP(p, t0),
        lambda: d_PP(p, t1),
        lambda: d_PP(p, t2),
        lambda: d_PE(p, t0, t1),
        lambda: d_PE(p, t1, t2),
        lambda: d_PE(p, t2, t0),
        lambda: d_PT(p, t0, t1, t2),
    ]
    return jax.lax.switch(dt, branches)


def edge_edge_dist2(a0, a1, b0, b1):
    """Region-aware squared edge-edge distance via dType dispatch
    (mirrors reference computeEdgeEdgeD, MeshCollisionUtils.hpp:2365)."""
    dt = dtype_EE(a0, a1, b0, b1)
    branches = [
        lambda: d_PP(a0, b0),
        lambda: d_PP(a0, b1),
        lambda: d_PE(a0, b0, b1),
        lambda: d_PP(a1, b0),
        lambda: d_PP(a1, b1),
        lambda: d_PE(a1, b0, b1),
        lambda: d_PE(b0, a0, a1),
        lambda: d_PE(b1, a0, a1),
        lambda: d_EE(a0, a1, b0, b1),
    ]
    return jax.lax.switch(dt, branches)


# ---------------------------------------------------------------------------
# closest-point-type classifiers
# ---------------------------------------------------------------------------


def _edge_region_params(p, e0, e1, n):
    """In-plane coordinates of p relative to edge (e0,e1): (t along the edge,
    s along the outward direction edge x n). Matches the diagonal 2x2 system
    the reference solves in dType_PT (MeshCollisionUtils.hpp:2254-2276)."""
    e = e1 - e0
    out = jnp.cross(e, n)
    r = p - e0
    t = _safe_div(jnp.dot(r, e), jnp.dot(e, e))
    s = _safe_div(jnp.dot(r, out), jnp.dot(out, out))
    return t, s


def dtype_PT(p, t0, t1, t2):
    """Closest-point type of point vs triangle, codes as the reference
    (MeshCollisionUtils.hpp:2160-2211):
      0,1,2 = PP with t0/t1/t2; 3,4,5 = PE with (t0,t1)/(t1,t2)/(t2,t0);
      6 = interior PT.
    """
    n = jnp.cross(t1 - t0, t2 - t0)
    ta, sa = _edge_region_params(p, t0, t1, n)  # edge 01
    tb, sb = _edge_region_params(p, t1, t2, n)  # edge 12
    tc, sc = _edge_region_params(p, t2, t0, n)  # edge 20

    in_a = (ta > 0.0) & (ta < 1.0) & (sa >= 0.0)
    in_b = (tb > 0.0) & (tb < 1.0) & (sb >= 0.0)
    in_c = (tc > 0.0) & (tc < 1.0) & (sc >= 0.0)

    pp0 = (ta <= 0.0) & (tc >= 1.0)
    pp1 = (tb <= 0.0) & (ta >= 1.0)
    pp2 = (tc <= 0.0) & (tb >= 1.0)

    # reference precedence: edge01, edge12, edge20, then PP checks, else PT
    code = jnp.where(
        in_a,
        3,
        jnp.where(
            in_b,
            4,
            jnp.where(
                in_c,
                5,
                jnp.where(pp0, 0, jnp.where(pp1, 1, jnp.where(pp2, 2, 6))),
            ),
        ),
    )
    return code.astype(jnp.int32)


def dtype_EE(a0, a1, b0, b1):
    """Closest-point type of edge (a0,a1) vs edge (b0,b1), codes as the
    reference (MeshCollisionUtils.hpp:2073-2158):
      0 = PP a0b0, 1 = PP a0b1, 2 = PE a0-(b0,b1),
      3 = PP a1b0, 4 = PP a1b1, 5 = PE a1-(b0,b1),
      6 = PE b0-(a0,a1), 7 = PE b1-(a0,a1), 8 = interior EE.
    Includes the reference's nearly-parallel deflection (cross norm below
    a threshold * |u|^2*|v|^2 pushes the interior case onto an edge
    endpoint). The threshold is DTYPE-AWARE: the reference's 1e-20
    (MeshCollisionUtils.hpp:2075) is an f64 fp guard that f32 can never
    reach — structured-grid scenes hold edge pairs parallel to ~1e-5 rad
    whose interior-EE formula is pure cancellation noise in f32 (d^2 came
    out ~0 for pairs 0.7 grid spacings apart, activating the barrier on
    far pairs and NaN-ing its gradient: the 12_matOnBoard first-step
    failure). At sin^2(theta) < 1e-6 the PE/PP distance differs from the
    true EE distance by O(theta^2) and the parallel-EE mollifier has
    already suppressed the EE barrier, so deflection is both accurate and
    consistent.
    """
    u = a1 - a0
    v = b1 - b0
    w = a0 - b0
    a = jnp.dot(u, u)
    b = jnp.dot(u, v)
    c = jnp.dot(v, v)
    d = jnp.dot(u, w)
    e = jnp.dot(v, w)
    D = a * c - b * b

    sN = b * e - c * d
    tN_mid = a * e - b * d

    uxv = jnp.cross(u, v)
    para_eps = 1e-20 if jnp.result_type(a0) == jnp.float64 else 1e-6
    para = (jnp.dot(uxv, w) == 0.0) | (jnp.dot(uxv, uxv) < para_eps * a * c)
    # interior-s case with parallel deflection
    mid_deflect = (tN_mid > 0.0) & (tN_mid < D) & para
    mid_low = mid_deflect & (sN < D / 2)

    case_s = jnp.where(
        sN <= 0.0, 0, jnp.where(sN >= D, 1, jnp.where(mid_deflect, jnp.where(mid_low, 0, 1), 2))
    )
    # case_s: 0 -> s=0 edge (tN=e, tD=c, default 2); 1 -> s=1 edge
    # (tN=e+b, tD=c, default 5); 2 -> interior (tN=mid, tD=D, default 8)
    tN = jnp.where(case_s == 0, e, jnp.where(case_s == 1, e + b, tN_mid))
    tD = jnp.where(case_s == 2, D, c)
    default = jnp.where(case_s == 0, 2, jnp.where(case_s == 1, 5, 8))

    # t <= 0 -> b0 visible: classify s against edge A
    t_lo = jnp.where(-d <= 0.0, 0, jnp.where(-d >= a, 3, 6))
    # t >= 1 -> b1 visible
    t_hi = jnp.where((-d + b) <= 0.0, 1, jnp.where((-d + b) >= a, 4, 7))

    code = jnp.where(tN <= 0.0, t_lo, jnp.where(tN >= tD, t_hi, default))
    return code.astype(jnp.int32)


# ---------------------------------------------------------------------------
# parallel edge-edge mollifier (makes the EE barrier C1 across dTypes)
# ---------------------------------------------------------------------------


def ee_cross_sq_norm(a0, a1, b0, b1):
    """|(a1-a0) x (b1-b0)|^2 (reference computeEECrossSqNorm,
    MeshCollisionUtils.hpp:2770)."""
    c = jnp.cross(a1 - a0, b1 - b0)
    return jnp.dot(c, c)


def eps_x_ee(a0_rest, a1_rest, b0_rest, b1_rest):
    """Mollifier threshold eps_x = 1e-3 |ea|^2 |eb|^2 in REST positions
    (reference compute_eps_x, MeshCollisionUtils.hpp:2976)."""
    ea = a0_rest - a1_rest
    eb = b0_rest - b1_rest
    return 1e-3 * jnp.dot(ea, ea) * jnp.dot(eb, eb)


def mollifier_ee(x, eps_x):
    """Mollifier e(x) on a 4-vertex EE stencil (a0,a1,b0,b1):
    q(c) = (2 - c/eps_x) * (c/eps_x) for c < eps_x, else 1
    (reference compute_q/compute_e, MeshCollisionUtils.hpp:2834-2866).
    Smooth in x; derivative handled by autodiff."""
    c = ee_cross_sq_norm(x[0], x[1], x[2], x[3])
    r = c / eps_x
    return jnp.where(c < eps_x, (2.0 - r) * r, 1.0)
