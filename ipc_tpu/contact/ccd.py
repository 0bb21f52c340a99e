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

__all__ = ["accd_pt", "accd_ee", "accd_min_alpha"]


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
