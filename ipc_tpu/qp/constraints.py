"""Collision constraint values/gradients for the QP/SQP comparison path.

Vectorized TPU ports of the reference's three constraint formula families
(reference: src/CollisionObject/CollisionConstraints.cpp):

  volume     (:146-167)  — tet volume of the 4-point stencil; also serves
                           NONSMOOTH_NEWMARK (reference maps both enums here)
  graphics   (:208-315)  — plane/normal gap at the CURRENT configuration
                           [Harmon et al. 2008]; also serves GAP_FUNCTION
  verschoor  (:317-520)  — normal gap at the contact point located by CCD
                           toi between x_prev and x [Verschoor et al. 2019];
                           also serves CMR and STIV

Each works on a 4-vertex stencil (PT: p,t0,t1,t2 / EE: a0,a1,b0,b1) and
returns (c, grad_c (4,3)). The QP linearizes  ∇c(x)·Δx ≥ -c(x) + offset
(reference updateConstraints_QP, SelfCollisionHandler.cpp:1788-1879).

NOTE the reference's vertex-order quirk, preserved here: VOLUME swaps
triangle points 1 and 2 ("Swap order to counter-clockwise",
CollisionConstraints.cpp:36-41) — handled by the caller passing the PT
stencil straight; we do the swap inside volume_pt.
"""

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

__all__ = ["constraint_c_grad", "FAMILY_OF_TYPE"]

# reference enum name (lowercased) -> formula family
FAMILY_OF_TYPE = {
    "volume": "volume",
    "nonsmooth_newmark": "volume",
    "graphics": "graphics",
    "gap_function": "graphics",
    "verschoor": "verschoor",
    "cmr": "verschoor",
    "stiv": "verschoor",
}


def _normalize(v, eps=1e-30):
    n = jnp.linalg.norm(v)
    return v / jnp.maximum(n, eps)


def _barycentric(p, a, b, c):
    """Barycentric coordinates of p in the plane of (a,b,c)
    (reference barycentric_coordinates, CollisionConstraints.cpp:181-207)."""
    v0, v1, v2 = b - a, c - a, p - a
    d00 = jnp.dot(v0, v0)
    d01 = jnp.dot(v0, v1)
    d11 = jnp.dot(v1, v1)
    d20 = jnp.dot(v2, v0)
    d21 = jnp.dot(v2, v1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    w1 = (d11 * d20 - d01 * d21) / denom
    w2 = (d00 * d21 - d01 * d20) / denom
    return jnp.stack([1.0 - w1 - w2, w1, w2])


def _ee_params(v0, v1, v2, v3):
    """Closest-point line parameters (t0, t1) between segments via the
    reference's 3x3 solve (CollisionConstraints.cpp:225-255)."""
    d0 = v1 - v0
    d1 = v3 - v2
    d2 = jnp.cross(d1, d0)
    A = jnp.stack([d0, -d1, d2], axis=1)
    ok = jnp.abs(jnp.linalg.det(A)) > 1e-30
    Asafe = jnp.where(ok, A, jnp.eye(3, dtype=A.dtype))
    params = jnp.linalg.solve(Asafe, v2 - v0)
    return params, ok


# -- volume family ----------------------------------------------------------


def _volume_c(x4):
    """Signed tet volume with the reference's counter-clockwise swap for PT
    stencils (v1 <-> v2 relative to our stencil order)."""
    v0, v1, v2, v3 = x4[0], x4[1], x4[3], x4[2]
    return jnp.dot(v3 - v0, jnp.cross(v1 - v0, v2 - v0))


def _volume(x4_prev, x4, toi):
    c = _volume_c(x4)
    g = jax.grad(_volume_c)(x4)
    return c, g


# -- graphics family --------------------------------------------------------


def _graphics_pt(x4):
    p, t0, t1, t2 = x4[0], x4[1], x4[2], x4[3]
    n = _normalize(jnp.cross(t1 - t0, t2 - t0))
    c = jnp.dot(n, p - t0)
    proj = p - c * n
    bc = _barycentric(proj, t0, t1, t2)
    g = jnp.stack([n, -bc[0] * n, -bc[1] * n, -bc[2] * n])
    return c, g


def _graphics_ee(x4):
    v0, v1, v2, v3 = x4[0], x4[1], x4[2], x4[3]
    params, ok = _ee_params(v0, v1, v2, v3)
    t0 = jnp.clip(params[0], 0.0, 1.0)
    t1 = jnp.clip(params[1], 0.0, 1.0)
    p0 = v0 + t0 * (v1 - v0)
    p1 = v2 + t1 * (v3 - v2)
    n = _normalize(jnp.cross(v3 - v2, v1 - v0))
    c = jnp.dot(n, p1 - p0)
    g = jnp.stack([-(1.0 - t0) * n, -t0 * n, (1.0 - t1) * n, t1 * n])
    c = jnp.where(ok, c, 1e28)
    g = jnp.where(ok, g, 0.0)
    return c, g


# -- verschoor family -------------------------------------------------------


def _verschoor_pt(x4_prev, x4, toi):
    xt = x4_prev + toi * (x4 - x4_prev)
    bc = _barycentric(xt[0], xt[1], xt[2], xt[3])
    vc = bc[0] * x4[1] + bc[1] * x4[2] + bc[2] * x4[3]
    n = _normalize(jnp.cross(x4[2] - x4[1], x4[3] - x4[1]))
    c = jnp.dot(n, x4[0] - vc)
    g = jnp.stack([n, -bc[0] * n, -bc[1] * n, -bc[2] * n])
    bad = (toi < 0.0) | (toi > 1.0) | ~jnp.isfinite(toi)
    return jnp.where(bad, 1e28, c), jnp.where(bad, 0.0, g)


def _verschoor_ee(x4_prev, x4, toi):
    xt = x4_prev + toi * (x4 - x4_prev)
    params, ok = _ee_params(xt[0], xt[1], xt[2], xt[3])
    t0 = jnp.clip(params[0], 0.0, 1.0)
    t1 = jnp.clip(params[1], 0.0, 1.0)
    p0 = x4[0] + t0 * (x4[1] - x4[0])
    p1 = x4[2] + t1 * (x4[3] - x4[2])
    n = _normalize(jnp.cross(x4[3] - x4[2], x4[1] - x4[0]))
    c = jnp.dot(n, p1 - p0)
    g = jnp.stack([-(1.0 - t0) * n, -t0 * n, (1.0 - t1) * n, t1 * n])
    bad = (toi < 0.0) | (toi > 1.0) | ~jnp.isfinite(toi) | ~ok
    return jnp.where(bad, 1e28, c), jnp.where(bad, 0.0, g)


def constraint_c_grad(ctype, x4_prev, x4, is_ee, toi):
    """(c, grad (4,3)) of one active pair for constraint family `ctype`
    (a static string). is_ee selects the EE formula where families split."""
    fam = FAMILY_OF_TYPE[ctype.lower()]
    if fam == "volume":
        return _volume(x4_prev, x4, toi)
    if fam == "graphics":
        c_pt, g_pt = _graphics_pt(x4)
        c_ee, g_ee = _graphics_ee(x4)
        return jnp.where(is_ee, c_ee, c_pt), jnp.where(is_ee, g_ee, g_pt)
    c_pt, g_pt = _verschoor_pt(x4_prev, x4, toi)
    c_ee, g_ee = _verschoor_ee(x4_prev, x4, toi)
    return jnp.where(is_ee, c_ee, c_pt), jnp.where(is_ee, g_ee, g_pt)
