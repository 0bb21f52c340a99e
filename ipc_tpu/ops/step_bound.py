"""Inversion-free step-size bound per tetrahedron.

Mirrors the reference's computeInjectiveStepSize_3d (reference:
src/Utils/get_feasible_steps.cpp:110-209, called from Energy::filterStepSize,
src/Energy/Energy.cpp:565-582): for a tet with current edge matrix A and
search-direction edge matrix B, find the smallest positive root t* of

    det(A + t B) = slackness * det(A)      (slackness = 0.2)

and bound the Newton step by t* so no element can invert along the step.
det(A + tB) expands to the cubic  c3 t^3 + c2 t^2 + c1 t + c0  with
    c3 = det(B),  c2 = tr(adj(B) A),  c1 = tr(adj(A) B),  c0 = det(A),
solved here in closed form (trigonometric/Cardano, branch-free with masks)
instead of the reference's std::complex Cardano.
"""

import jax
import jax.numpy as jnp

__all__ = ["smallest_positive_root_cubic", "injective_step_bound"]

_INF = 1e30
_HI = jax.lax.Precision.HIGHEST  # full-precision 3x3 products on TPU


def _adjugate3(M):
    """Adjugate (transposed cofactor matrix) of a 3x3."""
    c = jnp.stack(
        [
            jnp.cross(M[:, 1], M[:, 2]),
            jnp.cross(M[:, 2], M[:, 0]),
            jnp.cross(M[:, 0], M[:, 1]),
        ],
        axis=0,
    )
    return c


def smallest_positive_root_cubic(c3, c2, c1, c0, eps=1e-12):
    """Smallest strictly-positive real root of c3 x^3+c2 x^2+c1 x+c0, else INF.

    Branch-free (mask-based) handling of the cubic/quadratic/linear
    degenerations; elementwise over arrays.
    """
    big = jnp.asarray(_INF, c0.dtype)

    def pos_or_inf(x, valid):
        return jnp.where(valid & (x > 0) & jnp.isfinite(x), x, big)

    # ---- linear: c1 x + c0 = 0
    lin_valid = jnp.abs(c1) > eps
    x_lin = -c0 / jnp.where(lin_valid, c1, 1.0)
    root_lin = pos_or_inf(x_lin, lin_valid)

    # ---- quadratic: c2 x^2 + c1 x + c0 = 0 (stable form)
    quad_valid = jnp.abs(c2) > eps
    disc_q = c1 * c1 - 4.0 * c2 * c0
    has_q = quad_valid & (disc_q >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc_q, 0.0))
    qq = -0.5 * (c1 + jnp.sign(c1) * sq)
    qq = jnp.where(jnp.abs(qq) > eps, qq, 1.0)
    xq1 = qq / jnp.where(quad_valid, c2, 1.0)
    xq2 = c0 / qq
    root_quad = jnp.minimum(pos_or_inf(xq1, has_q), pos_or_inf(xq2, has_q))
    root_quad = jnp.where(quad_valid, root_quad, root_lin)

    # ---- cubic: normalize to x^3 + p2 x^2 + p1 x + p0
    cub_valid = jnp.abs(c3) > eps
    d = jnp.where(cub_valid, c3, 1.0)
    p2, p1, p0 = c2 / d, c1 / d, c0 / d
    # depressed: x = y - p2/3 ;  y^3 + py + q = 0
    s = p2 / 3.0
    p = p1 - p2 * s
    q = p0 - s * p1 + 2.0 * s * s * s
    disc = 0.25 * q * q + p * p * p / 27.0

    # one real root (disc > 0): Cardano
    sd = jnp.sqrt(jnp.maximum(disc, 0.0))
    u3 = -0.5 * q + sd
    v3 = -0.5 * q - sd
    cbrt = lambda t: jnp.sign(t) * jnp.abs(t) ** (1.0 / 3.0)
    y_single = cbrt(u3) + cbrt(v3)
    root_single = pos_or_inf(y_single - s, cub_valid)

    # three real roots (disc <= 0): trigonometric
    pm = jnp.minimum(p, -eps)  # p < 0 in this regime
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    acos_arg = jnp.clip(3.0 * q / (pm * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    y0 = m * jnp.cos(theta)
    y1 = m * jnp.cos(theta - two_pi_3)
    y2 = m * jnp.cos(theta - 2.0 * two_pi_3)
    r_tri = jnp.minimum(
        jnp.minimum(pos_or_inf(y0 - s, cub_valid), pos_or_inf(y1 - s, cub_valid)),
        pos_or_inf(y2 - s, cub_valid),
    )

    root_cubic = jnp.where(disc > 0.0, root_single, r_tri)
    return jnp.where(cub_valid, root_cubic, root_quad)


def injective_step_bound(A, B, slackness=0.2, eps=1e-12):
    """Largest safe step for one tet: A = current edge matrix (3x3, columns =
    x_i - x_0), B = search-direction edge matrix. Returns t* such that
    det(A + t B) stays above slackness*det(A) for t in [0, t*). INF if the
    whole ray is safe. Elementwise-safe to vmap over tets."""
    adjA = _adjugate3(A)
    adjB = _adjugate3(B)
    detA = jnp.linalg.det(A)
    c3 = jnp.linalg.det(B)
    c2 = jnp.trace(jnp.matmul(adjB, A, precision=_HI))
    c1 = jnp.trace(jnp.matmul(adjA, B, precision=_HI))
    c0 = (1.0 - slackness) * detA
    return smallest_positive_root_cubic(c3, c2, c1, c0, eps)
