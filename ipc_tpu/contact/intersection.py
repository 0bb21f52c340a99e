"""Edge-triangle intersection test — the post-step/line-search failsafe.

Mirrors the reference's checkEdgeTriIntersection / isIntersected safeguard
(reference: SelfCollisionHandler.cpp:3204-3343, used in lineSearch
Optimizer.cpp:2719-2735 and as the post-step verification
Optimizer.cpp:1471-1491). Uses signed-volume orientation tests over a
broad-phase-filtered candidate tensor; ties (degenerate/coplanar
configurations) count as intersecting, keeping the test conservative.
"""

import jax
import jax.numpy as jnp

__all__ = ["segment_triangle_intersects", "any_edge_tri_intersection"]


def _orient_sign(a, b, c, d):
    """Error-filtered sign of the signed volume of tetra (a,b,c,d): 0 when
    |det| is below a floating-point noise bound, so exactly coplanar
    configurations (perturbed by rotation/transform roundoff) classify as
    degenerate instead of flipping sign randomly (the same idea as
    Shewchuk's static filter; the reference gets this robustness from igl
    exact predicates / CTCD tolerances).

    The bound is POSITION-AWARE: thr = 16 eps X mpp, where X is the max
    coordinate magnitude and mpp the largest pairwise product of the
    difference-vector norms — the first-order det perturbation from
    inputs rounded to +-eps*X. The previous DIFFERENCE-relative bound
    (1e-4 * |u||v||w| in f32) over-filtered by orders of magnitude when
    edges are short relative to the miss distance: dolphinFunnel's thin
    fins held near-miss edge-triangle pairs whose orientation signs were
    zeroed, the "inside" test then counted them as intersecting, the
    scripted-drag backtracking loop saw a phantom intersection at EVERY
    scale, and the dolphin stayed frozen for three rounds (flat sysE,
    |v| = 0, al_iters = steps). A coordinate-scaled bound keeps exactly
    the configurations whose sign IS rounding noise (coplanar sheets at
    any scene scale) and nothing else."""
    u, v, w = b - a, c - a, d - a
    det = jnp.dot(jnp.cross(u, v), w)
    X = jnp.max(jnp.abs(jnp.stack([a, b, c, d])))
    um, vm, wm = jnp.abs(u).max(), jnp.abs(v).max(), jnp.abs(w).max()
    mpp = jnp.maximum(jnp.maximum(um * vm, um * wm), vm * wm)
    eps = 1e-15 if det.dtype == jnp.float64 else 1.2e-7
    thr = 16.0 * eps * X * mpp
    return jnp.where(jnp.abs(det) <= thr, 0.0, jnp.sign(det))


def segment_triangle_intersects(p, q, a, b, c):
    """True if segment (p,q) PROPERLY crosses triangle (a,b,c): the
    endpoints lie strictly on opposite sides of the plane and the segment
    passes through the (closed) triangle. Coplanar/touching configurations
    return False — the barrier + CCD keep states strictly separated, and a
    flat kinematic obstacle is exactly coplanar with its own edges forever
    (which a closed-sign test would flag every step); a real penetration
    crosses by a finite depth, far above the degeneracy filter."""
    s_p = _orient_sign(a, b, c, p)
    s_q = _orient_sign(a, b, c, q)
    crosses = s_p * s_q < 0.0  # strictly opposite sides
    s1 = _orient_sign(p, q, a, b)
    s2 = _orient_sign(p, q, b, c)
    s3 = _orient_sign(p, q, c, a)
    inside = ((s1 >= 0) & (s2 >= 0) & (s3 >= 0)) | ((s1 <= 0) & (s2 <= 0) & (s3 <= 0))
    return crosses & inside


def any_edge_tri_intersection(x, edge_vids, tri_vids, pairs, valid):
    """Any proper intersection among candidate (edge, tri) index pairs.

    pairs: (C,2) of (eI, sfI) from the broad phase at gap 0; shared-vertex
    pairs must be pre-excluded by the caller's validity mask."""
    e = edge_vids[jnp.maximum(pairs[:, 0], 0)]
    t = tri_vids[jnp.maximum(pairs[:, 1], 0)]
    hit = jax.vmap(
        lambda ev, tv: segment_triangle_intersects(
            x[ev[0]], x[ev[1]], x[tv[0]], x[tv[1]], x[tv[2]]
        )
    )(e, t)
    return jnp.any(hit & valid)
