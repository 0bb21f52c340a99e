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


def _orient(a, b, c, d):
    """Signed volume sign of tetra (a,b,c,d)."""
    return jnp.dot(jnp.cross(b - a, c - a), d - a)


def segment_triangle_intersects(p, q, a, b, c):
    """True if segment (p,q) PROPERLY crosses triangle (a,b,c): the
    endpoints lie strictly on opposite sides of the plane and the segment
    passes through the (closed) triangle. Coplanar/touching configurations
    return False — the barrier + CCD keep states strictly separated, and a
    flat kinematic obstacle is exactly coplanar with its own edges forever
    (which a closed-sign test would flag every step)."""
    v_p = _orient(a, b, c, p)
    v_q = _orient(a, b, c, q)
    crosses = v_p * v_q < 0.0  # strictly opposite sides
    s1 = _orient(p, q, a, b)
    s2 = _orient(p, q, b, c)
    s3 = _orient(p, q, c, a)
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
