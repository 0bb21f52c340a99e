"""Continuous collision detection: vectorized additive CCD (ACCD).

Replaces the reference's CTCD floating-point root finder / Tight-Inclusion
interval CCD (reference: SelfCollisionHandler largestFeasibleStepSize*
:982-1787, CCD-Wrapper dependency, CCDUtils.cpp) with Additive CCD
[Li, Kaufman, Jiang 2021, "Codimensional Incremental Potential Contact",
Algorithm offered in its supplement] — chosen because it is a short
fixed-iteration loop of distance evaluations (branch-free with masks,
vmap-able over the whole candidate tensor) instead of a branchy interval
subdivision, and it is CONSERVATIVE: it advances time by amounts that
provably cannot close more than the remaining gap, and stops leaving a
gap of `eta = (1 - slackness) * d0` — the same distance-slackness policy
as the reference's CTCD usage (SelfCollisionHandler.cpp:1020-1060).

All queries are 4-vertex stencils (p, t0, t1, t2) or (a0, a1, b0, b1) with
per-vertex displacements; the result is the largest safe step in [0, 1].
"""

import jax
import jax.numpy as jnp

from ipc_tpu.ops import distance as D

__all__ = ["accd_pt", "accd_ee", "accd_min_alpha", "ti_pt", "ti_ee"]


def _accd(x4, p4, dist2_fn, slackness, max_iter, t_max=1.0):
    """Core ACCD loop for one stencil.

    x4: (4,3) positions, p4: (4,3) displacements over the full step,
    dist2_fn: (4,3) -> squared distance. Returns safe step in (0, t_max].
    """
    dtype = x4.dtype
    # remove common translation (it cannot change the distance)
    p_bar = p4.mean(axis=0)
    p4 = p4 - p_bar[None, :]
    # max relative approach speed bound: |u_first_part| + |u_second_part|
    nrm = jnp.linalg.norm(p4, axis=1)
    l_p = jnp.maximum(nrm[0], 0.0) + jnp.maximum(
        jnp.maximum(nrm[1], nrm[2]), nrm[3]
    )
    # NOTE: for PT the first part is the point (row 0), the rest the
    # triangle; for EE rows (0,1) vs (2,3) — handled by caller passing
    # l_p split; here we use a safe over-bound max(first two)+max(last two)
    l_p_ee = jnp.maximum(nrm[0], nrm[1]) + jnp.maximum(nrm[2], nrm[3])
    l_p = jnp.maximum(l_p, l_p_ee)  # conservative for both layouts

    d0 = jnp.sqrt(jnp.maximum(dist2_fn(x4), 0.0))
    g = slackness * d0  # gap to preserve

    no_motion = l_p <= 0.0

    def body(_, carry):
        t, done = carry
        d = jnp.sqrt(jnp.maximum(dist2_fn(x4 + t * p4), 0.0))
        step = 0.9 * (d - g) / jnp.maximum(l_p, 1e-30)
        t_new = jnp.minimum(t + step, t_max)
        # stop when the remaining advance is negligible or gap reached
        done_new = done | (step <= 1e-6 * jnp.maximum(d0, 1e-30)) | (t >= t_max)
        t_new = jnp.where(done, t, t_new)
        return t_new, done_new

    t0 = jnp.asarray(0.0, dtype)
    t, _ = jax.lax.fori_loop(0, max_iter, body, (t0, no_motion))
    t = jnp.where(no_motion, jnp.asarray(t_max, dtype), t)
    # never return exactly 0: the caller treats 0 as a CCD failure; the
    # reference instead relies on its tiny-alpha fallback
    return jnp.maximum(t, jnp.asarray(0.0, dtype))


def accd_pt(x4, p4, slackness=0.2, max_iter=64):
    """Safe step for a point-triangle stencil (p, t0, t1, t2)."""
    f = lambda y: D.point_triangle_dist2(y[0], y[1], y[2], y[3])
    return _accd(x4, p4, f, slackness, max_iter)


def accd_ee(x4, p4, slackness=0.2, max_iter=64):
    """Safe step for an edge-edge stencil (a0, a1, b0, b1)."""
    f = lambda y: D.edge_edge_dist2(y[0], y[1], y[2], y[3])
    return _accd(x4, p4, f, slackness, max_iter)


# ---------------------------------------------------------------------------
# Tight-Inclusion-style interval CCD (the reference's provably-conservative
# option: CCD-Wrapper TightInclusion, SelfCollisionHandler.cpp:690-869 /
# :1370-1633, error bound CCDUtils.cpp:22-91). TPU reformulation: the
# separation function
#     VF:  q(t,u,v) = p(t) - ((1-u-v) v0(t) + u v1(t) + v v2(t))
#     EE:  q(t,u,v) = (1-u) a0(t) + u a1(t) - (1-v) b0(t) - v b1(t)
# with linear vertex motion is affine in (u,v) for fixed t and affine in t
# for fixed (u,v), so over a cell [ta,tb] x (full (u,v) domain) its EXACT
# per-coordinate range is spanned by the evaluations at the domain's corner
# points (6 for VF: t in {ta,tb} x simplex corners; 8 for EE). A root can
# exist in [ta,tb] only if every coordinate's [min,max] (inflated by the
# floating-point error bound + minimum separation) straddles zero. The
# earliest-root search is then a fixed-count bisection on t alone — no
# (t,u,v) subdivision stack, so it vmaps over the whole candidate tensor.
#
# SEPARATION-ALIGNED FRAME: q = 0 iff R q = 0 for any rotation R, and R q
# is still affine in (t, u, v), so its per-coordinate range over a cell is
# still spanned by the rotated corner evaluations — the box test stays
# sound under ANY fixed rotation. Tightness, however, depends on the frame:
# in world axes a tangential slide at constant clearance d0 mixes the
# separation into all three coordinates and the box straddles zero (the
# t-only bisection then crawls — the reference works around the same
# looseness with its no_zero_toi / 0.8x-ms retry chain,
# SelfCollisionHandler.cpp:1447-1471). Aligning one axis of R with the
# INITIAL separation direction keeps that coordinate pinned near d0 for
# sliding contacts, so the whole interval is certified root-free in one
# test. The frame comes from the gradient of the squared-distance kernel
# (the exact separation direction at t=0) and costs one 3x3 basis per pair.
# ---------------------------------------------------------------------------


def _sep_frame(x4, kind):
    """Rotation (3,3) whose FIRST row is the initial separation direction.

    PT: grad of d2 w.r.t. the point = 2 (p - closest_point) — the separation
    direction whenever d0 > 0. EE: grad w.r.t. (a0 + a1) = 2 (ca - cb)
    collapsed over the barycentric weights. Falls back to the identity when
    the gradient vanishes (touching/degenerate) — still sound."""
    if kind == "pt":
        g = jax.grad(lambda p: D.point_triangle_dist2(p, x4[1], x4[2], x4[3]))(x4[0])
    else:
        g = jax.grad(
            lambda a: D.edge_edge_dist2(a[0], a[1], x4[2], x4[3])
        )(x4[:2]).sum(axis=0)
    n = jnp.linalg.norm(g)
    ok = n > 1e-30
    e0 = jnp.where(ok, g / jnp.where(ok, n, 1.0), jnp.asarray([1.0, 0.0, 0.0], x4.dtype))
    # any orthonormal completion (branch-free Gram-Schmidt on the less
    # aligned coordinate axis)
    a = jnp.where(
        jnp.abs(e0[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], x4.dtype),
        jnp.asarray([0.0, 1.0, 0.0], x4.dtype),
    )
    e1 = a - (a @ e0) * e0
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-30)
    e2 = jnp.cross(e0, e1)
    return jnp.stack([e0, e1, e2])


def _ti_corner_evals(x4, p4, t, kind):
    """Separation-function corner evaluations at time t: (K,3)."""
    y = x4 + t * p4
    if kind == "pt":
        # (u,v) simplex corners: (0,0) -> t0, (1,0) -> t1, (0,1) -> t2
        return jnp.stack([y[0] - y[1], y[0] - y[2], y[0] - y[3]])
    # EE: (u,v) in [0,1]^2 corners
    return jnp.stack([y[0] - y[2], y[0] - y[3], y[1] - y[2], y[1] - y[3]])


def _ti_root_free(x4, p4, ta, tb, ms, err, kind, R=None):
    """True when [ta,tb] provably contains NO root (per-coordinate box of
    R q, inflated by ms+err, excludes 0). R (3,3) is the separation-aligned
    frame (sound for any rotation; None = world axes)."""
    qa = _ti_corner_evals(x4, p4, ta, kind)
    qb = _ti_corner_evals(x4, p4, tb, kind)
    q = jnp.concatenate([qa, qb])  # (2K,3)
    if R is not None:
        q = q @ R.T
    lo = q.min(axis=0) - (ms + err)
    hi = q.max(axis=0) + (ms + err)
    return jnp.any((lo > 0.0) | (hi < 0.0))


def _ti(x4, p4, kind, t_max=1.0, ms=0.0, max_iter=32):
    """Earliest-root lower bound by bisection; returns a conservative safe
    step in [0, t_max] (no root in [0, t] up to ms + rounding error)."""
    dtype = x4.dtype
    # floating-point inclusion error bound (reference CCDUtils.cpp:22-91
    # scales machine epsilon by the cubed magnitude bound of the inputs;
    # q is a degree<=2 polynomial of the inputs here, one multiply-add
    # chain deep, so eps * m^2-scale suffices — keep their cubic form for
    # extra conservatism)
    eps = jnp.asarray(
        2.220446049250313e-16 if dtype == jnp.float64 else 1.1920929e-7, dtype
    )
    m = jnp.maximum(jnp.abs(x4).max(), jnp.abs(x4 + p4).max())
    m = jnp.maximum(m, 1.0)
    # 2x on top of the reference-form bound absorbs the extra rounding of
    # the frame rotation (rows are unit vectors: no magnitude growth)
    err = 24.0 * eps * m * m

    R = _sep_frame(x4, kind)

    t_max = jnp.asarray(t_max, dtype)
    # quick accept: whole interval root-free
    free_all = _ti_root_free(x4, p4, jnp.asarray(0.0, dtype), t_max, ms, err, kind, R)

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        first_free = _ti_root_free(x4, p4, lo, mid, ms, err, kind, R)
        lo_new = jnp.where(first_free, mid, lo)
        hi_new = jnp.where(first_free, hi, mid)
        return lo_new, hi_new

    lo0 = jnp.asarray(0.0, dtype)
    lo, hi = jax.lax.fori_loop(0, max_iter, body, (lo0, t_max))
    return jnp.where(free_all, t_max, lo)


def ti_pt(x4, p4, t_max=1.0, ms=0.0, max_iter=32):
    """Conservative safe step for a point-triangle stencil (p,t0,t1,t2),
    Tight-Inclusion-style (minimum separation ms)."""
    return _ti(x4, p4, "pt", t_max, ms, max_iter)


def ti_ee(x4, p4, t_max=1.0, ms=0.0, max_iter=32):
    """Conservative safe step for an edge-edge stencil (a0,a1,b0,b1)."""
    return _ti(x4, p4, "ee", t_max, ms, max_iter)


def accd_min_alpha(x, dx, pt_vids, pt_valid, ee_vids, ee_valid, slackness=0.2, max_iter=64):
    """Global min safe step over all candidate stencils (vmapped)."""
    a_pt = jax.vmap(accd_pt, in_axes=(0, 0, None, None))(
        x[pt_vids], dx[pt_vids], slackness, max_iter
    )
    a_ee = jax.vmap(accd_ee, in_axes=(0, 0, None, None))(
        x[ee_vids], dx[ee_vids], slackness, max_iter
    )
    a_pt = jnp.where(pt_valid, a_pt, jnp.inf)
    a_ee = jnp.where(ee_valid, a_ee, jnp.inf)
    return jnp.minimum(
        a_pt.min() if a_pt.size else jnp.inf, a_ee.min() if a_ee.size else jnp.inf
    )
