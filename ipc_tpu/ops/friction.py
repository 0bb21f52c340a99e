"""Lagged smoothed-Coulomb friction kernels.

Mirrors the reference's FrictionUtils.hpp (reference:
src/CollisionObject/FrictionUtils.hpp:24-343): per-contact-type tangent
bases, closest-point weights, relative tangential displacement operators, and
the static-friction clamping functions f0/f1/f2 (C0/C1/C2 orders; the
reference default is SFCLAMPING_ORDER=1, src/Utils/Types.hpp:42).

A friction stencil reuses the unified 4-vertex layout of ops.distance with
the same ctype codes. The lagged quantities (multiplier lambda, closest-point
coords beta/gamma/eta, tangent basis) are captured at the previous outer
iterate and held constant during the Newton solve, so the friction energy is
a smooth function of the displacement dx = x - x_lagged only.

All functions take a single stencil and are vmapped by callers.
"""

import jax.numpy as jnp

__all__ = [
    "f0_sf",
    "f1_sf_over_x",
    "f2_sf",
    "tangent_basis",
    "closest_point_coords",
    "rel_dx",
    "rel_dx_weights",
]


# ---------------------------------------------------------------------------
# static-friction clamping f0 (energy), f1/|x| (gradient), f2 (curvature)
# x2 = squared tangential relative displacement norm, eps = eps_v * h band
# (reference FrictionUtils.hpp:262-343). Valid for x2 <= eps^2; callers
# switch to the linear |x| regime above the band, exactly as the reference
# call sites do (SelfCollisionHandler.cpp:2584-2592).
# ---------------------------------------------------------------------------


def f0_sf(x2, eps, order: int = 1):
    if order == 0:
        return x2 / (2.0 * eps) + eps / 2.0
    if order == 1:
        return x2 * (-jnp.sqrt(x2) / 3.0 + eps) / (eps * eps) + eps / 3.0
    if order == 2:
        return x2 * (0.25 * x2 - (jnp.sqrt(x2) - 1.5 * eps) * eps) / (eps**3) + eps / 4.0
    raise ValueError(f"unsupported clamping order {order}")


def f1_sf_over_x(x2, eps, order: int = 1):
    """f0'(|x|) / |x| — the factor applied to the tangential direction."""
    if order == 0:
        return jnp.full_like(x2, 1.0 / eps)
    if order == 1:
        return (-jnp.sqrt(x2) + 2.0 * eps) / (eps * eps)
    if order == 2:
        return (x2 - (3.0 * jnp.sqrt(x2) - 3.0 * eps) * eps) / (eps**3)
    raise ValueError(f"unsupported clamping order {order}")


def f2_sf(x2, eps, order: int = 1):
    """d(f1/|x|)-related curvature term used by the friction Hessian."""
    if order == 0:
        return jnp.full_like(x2, 1.0 / eps)
    if order == 1:
        return 2.0 * (eps - jnp.sqrt(x2)) / (eps * eps)
    if order == 2:
        return 3.0 * (x2 - (2.0 * jnp.sqrt(x2) - eps) * eps) / (eps**3)
    raise ValueError(f"unsupported clamping order {order}")


# ---------------------------------------------------------------------------
# tangent bases (3x2, columns orthonormal, spanning the sliding plane)
# ---------------------------------------------------------------------------


def _normalize(v):
    n = jnp.linalg.norm(v)
    return v / jnp.where(n > 0, n, 1.0)


def _basis_pt(x):
    """PT stencil (p; t0,t1,t2) (reference computeTangentBasis_PT :24)."""
    v12 = x[2] - x[1]
    c0 = _normalize(v12)
    c1 = _normalize(jnp.cross(jnp.cross(v12, x[3] - x[1]), v12))
    return jnp.stack([c0, c1], axis=1)


def _basis_ee(x):
    """EE stencil (a0,a1,b0,b1) (reference computeTangentBasis_EE :87)."""
    v01 = x[1] - x[0]
    c0 = _normalize(v01)
    c1 = _normalize(jnp.cross(jnp.cross(v01, x[3] - x[2]), v01))
    return jnp.stack([c0, c1], axis=1)


def _basis_pe(x):
    """PE stencil (p; e0,e1) (reference computeTangentBasis_PE :161)."""
    v12 = x[2] - x[1]
    c0 = _normalize(v12)
    c1 = _normalize(jnp.cross(v12, x[0] - x[1]))
    return jnp.stack([c0, c1], axis=1)


def _basis_pp(x):
    """PP stencil (p0,p1) (reference computeTangentBasis_PP :217)."""
    v01 = x[1] - x[0]
    ex = jnp.array([1.0, 0.0, 0.0], x.dtype)
    ey = jnp.array([0.0, 1.0, 0.0], x.dtype)
    xc = jnp.cross(ex, v01)
    yc = jnp.cross(ey, v01)
    use_x = jnp.dot(xc, xc) > jnp.dot(yc, yc)
    first = jnp.where(use_x, xc, yc)
    c0 = _normalize(first)
    c1 = _normalize(jnp.cross(v01, first))
    return jnp.stack([c0, c1], axis=1)


def tangent_basis(ctype, x):
    """(3,2) tangent basis for a stencil (vmap over pairs)."""
    import jax

    return jax.lax.switch(ctype, [_basis_pp, _basis_pe, _basis_pt, _basis_ee], x)


# ---------------------------------------------------------------------------
# closest-point coordinates (2-vector; unused slots zero)
# ---------------------------------------------------------------------------


def _cp_pt(x):
    """beta of the closest point on the triangle (reference
    computeClosestPoint_PT :36): solves the 2x2 normal equations."""
    e1 = x[2] - x[1]
    e2 = x[3] - x[1]
    r = x[0] - x[1]
    a = jnp.dot(e1, e1)
    b = jnp.dot(e1, e2)
    c = jnp.dot(e2, e2)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) > 0, det, 1.0)
    b1 = (c * jnp.dot(e1, r) - b * jnp.dot(e2, r)) / det
    b2 = (a * jnp.dot(e2, r) - b * jnp.dot(e1, r)) / det
    return jnp.array([b1, b2], x.dtype)


def _cp_ee(x):
    """gamma on both edges (reference computeClosestPoint_EE :99)."""
    e01 = x[1] - x[0]
    e23 = x[3] - x[2]
    e20 = x[0] - x[2]
    a = jnp.dot(e01, e01)
    b = -jnp.dot(e23, e01)
    c = jnp.dot(e23, e23)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) > 0, det, 1.0)
    r0 = -jnp.dot(e20, e01)
    r1 = jnp.dot(e20, e23)
    g1 = (c * r0 - b * r1) / det
    g2 = (a * r1 - b * r0) / det
    return jnp.array([g1, g2], x.dtype)


def _cp_pe(x):
    """eta along the edge (reference computeClosestPoint_PE :172)."""
    e12 = x[2] - x[1]
    eta = jnp.dot(x[0] - x[1], e12) / jnp.dot(e12, e12)
    return jnp.array([eta, 0.0], x.dtype)


def _cp_pp(x):
    return jnp.zeros(2, x.dtype)


def closest_point_coords(ctype, x):
    import jax

    return jax.lax.switch(ctype, [_cp_pp, _cp_pe, _cp_pt, _cp_ee], x)


# ---------------------------------------------------------------------------
# relative displacement: relDX = W(coords) . dx  with per-type weights
# (reference computeRelDX_* and liftRelDXTanToMesh_*). We express both the
# forward contraction and the lift through one (4,) weight vector so that
# energy/grad/Hess all come from the same linear operator.
# ---------------------------------------------------------------------------


def rel_dx_weights(ctype, coords):
    """Per-vertex weights w (4,) with relDX = sum_i w_i dx_i.

    PP: ( 1, -1,  0,  0)
    PE: ( 1, eta-1, -eta, 0)
    PT: ( 1, b1+b2-1, -b1, -b2)
    EE: (1-g1, g1, g2-1, -g2)
    """
    import jax

    def w_pp(c):
        return jnp.array([1.0, -1.0, 0.0, 0.0], c.dtype)

    def w_pe(c):
        return jnp.array([1.0, c[0] - 1.0, -c[0], 0.0], c.dtype)

    def w_pt(c):
        return jnp.array([1.0, c[0] + c[1] - 1.0, -c[0], -c[1]], c.dtype)

    def w_ee(c):
        return jnp.array([1.0 - c[0], c[0], c[1] - 1.0, -c[1]], c.dtype)

    return jax.lax.switch(ctype, [w_pp, w_pe, w_pt, w_ee], coords)


def rel_dx(ctype, coords, dx):
    """Relative displacement (3,) of a stencil displacement dx (4,3)."""
    w = rel_dx_weights(ctype, coords)
    return w @ dx
