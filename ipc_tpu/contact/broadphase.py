"""Broad-phase candidate generation over padded fixed-shape tensors.

The TPU-native replacement for the reference's SpatialHash<3>
(reference: src/Utils/SpatialHash.hpp:46-201 static build, :589-750 swept
CCD build, query* methods :258-832). Instead of voxel buckets + per-query
std::unordered_set (pointer-chasing, dynamic sizes), we generate candidates
by tiled AABB-overlap tests compacted into fixed-capacity index tensors with
an overflow flag:

  * primitive AABBs are built from current positions, optionally swept along
    a displacement (for CCD) and inflated by a gap (sqrt(dHat) for the
    constraint set — same inflation the reference applies in its queries);
  * the (N_a x N_b) overlap mask is evaluated in one shot (XLA tiles it) and
    compacted with a size-capped nonzero — O(N^2) bbox tests, but each test
    is ~10 VPU flops, so up to ~10^4 primitives per side this beats any
    pointer-chasing hash on TPU. A sort-based grid hash replaces this for
    larger scenes (see contact/spatial_hash.py).

Outputs are (cap, 2) int32 index pairs padded with -1, plus the true count
(count > cap means overflow: the caller grows the cap and re-traces, the
fixed-shape analog of the reference's dynamically-sized candidate lists).

Topology exclusion masks (shared vertices, both-sides-DBC) mirror the
reference's computeConstraintSet filters (SelfCollisionHandler.cpp:2184-2189,
:2296-2302).
"""

import jax
import jax.numpy as jnp

__all__ = [
    "vert_aabbs",
    "edge_aabbs",
    "tri_aabbs",
    "overlap_pairs",
    "pt_candidates",
    "ee_candidates",
]


def vert_aabbs(x, verts, disp=None, gap=0.0):
    """(n,2,3) AABBs of vertices, swept along disp and inflated by gap."""
    p = x[verts]
    lo, hi = p, p
    if disp is not None:
        q = p + disp[verts]
        lo, hi = jnp.minimum(lo, q), jnp.maximum(hi, q)
    return jnp.stack([lo - gap, hi + gap], axis=1)


def _prim_aabbs(x, prims, disp, gap):
    p = x[prims]  # (n,k,3)
    lo = p.min(axis=1)
    hi = p.max(axis=1)
    if disp is not None:
        q = p + disp[prims]
        lo = jnp.minimum(lo, q.min(axis=1))
        hi = jnp.maximum(hi, q.max(axis=1))
    return jnp.stack([lo - gap, hi + gap], axis=1)


def edge_aabbs(x, edges, disp=None, gap=0.0):
    return _prim_aabbs(x, edges, disp, gap)


def tri_aabbs(x, tris, disp=None, gap=0.0):
    return _prim_aabbs(x, tris, disp, gap)


def prim_motion(x, prims, disp):
    """Relative-motion filter inputs for one primitive family.

    Returns (raw_boxes (N,2,3): position AABBs, no sweep/inflation;
    u (N,3): mean vertex displacement; w (N,): max |disp_v - u| over the
    primitive's vertices). For any point p on the primitive at sweep
    fraction tau, |disp_p(tau) - tau*u_mean| <= w, so the pairwise distance
    anywhere along the linear sweep is lower-bounded by
    box_dist(raw_q, raw_t) - (|u_q - u_t| + w_q + w_t). disp=None means a
    zero sweep (u = w = 0)."""
    p = x[prims] if prims.ndim == 2 else x[prims][:, None, :]
    rb = jnp.stack([p.min(axis=1), p.max(axis=1)], axis=1)
    if disp is None:
        return rb, jnp.zeros_like(rb[:, 0]), jnp.zeros_like(rb[:, 0, 0])
    d = disp[prims] if prims.ndim == 2 else disp[prims][:, None, :]
    u = d.mean(axis=1)
    w = jnp.sqrt(
        jnp.sum((d - u[:, None, :]) ** 2, axis=2)
    ).max(axis=1)
    return rb, u, w


def reach_mask(motion_a, motion_b, gap):
    """(na, nb) bool: pair CAN come within `gap` along the sweep — the
    relative-motion reachability filter. Evaluated in f32 with a 1e-5
    relative threshold inflation, EXACTLY mirroring the grid path's packed
    f32 payload math (spatial_hash._query_block) so the dense and grid
    broad phases emit identical candidate sets (exact-parity tests)."""
    rb_a, u_a, w_a = motion_a
    rb_b, u_b, w_b = motion_b
    lo_a = rb_a[:, 0].astype(jnp.float32)[:, None, :]
    hi_a = rb_a[:, 1].astype(jnp.float32)[:, None, :]
    lo_b = rb_b[:, 0].astype(jnp.float32)[None, :, :]
    hi_b = rb_b[:, 1].astype(jnp.float32)[None, :, :]
    g = jnp.maximum(jnp.maximum(lo_a - hi_b, lo_b - hi_a), 0.0)
    d2 = jnp.sum(g * g, axis=-1)
    du = u_a.astype(jnp.float32)[:, None, :] - u_b.astype(jnp.float32)[None, :, :]
    rel = (
        jnp.sqrt(jnp.sum(du * du, axis=-1))
        + w_a.astype(jnp.float32)[:, None] + w_b.astype(jnp.float32)[None, :]
    )
    reach = (jnp.asarray(gap, jnp.float32) + rel) * jnp.float32(1.0 + 1e-5)
    return d2 <= reach * reach


def overlap_pairs(boxes_a, boxes_b, valid_mask, cap):
    """Compact (i,j) with AABB overlap and valid_mask[i,j] into (cap,2).

    Returns (pairs (cap,2) int32 padded with -1, count int32). count is the
    TRUE number of overlaps; count > cap signals overflow.
    """
    lo_a, hi_a = boxes_a[:, 0], boxes_a[:, 1]
    lo_b, hi_b = boxes_b[:, 0], boxes_b[:, 1]
    # (na, nb): all three axes overlap
    sep = (lo_a[:, None, :] > hi_b[None, :, :]) | (lo_b[None, :, :] > hi_a[:, None, :])
    overlap = ~jnp.any(sep, axis=2) & valid_mask
    count = overlap.sum(dtype=jnp.int32)
    idx_a, idx_b = jnp.nonzero(
        overlap, size=cap, fill_value=-1
    )
    pairs = jnp.stack([idx_a, idx_b], axis=1).astype(jnp.int32)
    return pairs, count


def pt_candidates(x, surf_verts, surf_tris, dbc_mask, cap, disp=None, gap=0.0):
    """Point-triangle candidates: (cap,2) of (svI, sfI) index pairs.

    Excludes pairs where the vertex belongs to the triangle, and pairs where
    all four vertices are DBC (reference SelfCollisionHandler.cpp:2184-2189).
    """
    vb = vert_aabbs(x, surf_verts, disp, gap)
    tb = tri_aabbs(x, surf_tris, disp, gap)
    vid = surf_verts[:, None]  # (Sv,1)
    in_tri = jnp.any(vid[:, None, :] == surf_tris[None, :, :], axis=2)  # (Sv,S)
    all_dbc = dbc_mask[surf_verts][:, None] & jnp.all(dbc_mask[surf_tris], axis=1)[None, :]
    valid = ~in_tri & ~all_dbc
    valid = valid & reach_mask(
        prim_motion(x, surf_verts, disp), prim_motion(x, surf_tris, disp), gap
    )
    return overlap_pairs(vb, tb, valid, cap)


def et_candidates(x, surf_edges, surf_tris, cap, disp=None, gap=0.0, dbc_mask=None):
    """Edge-triangle candidates for the intersection failsafe: (cap,2) of
    (eI, sfI), excluding pairs sharing a vertex (adjacent geometry is
    degenerate for the parity test) and all-DBC pairs (kinematic geometry
    is never checked against itself, matching the reference which only
    runs checkEdgeTriIntersection deformable-vs-CO and self)."""
    eb = edge_aabbs(x, surf_edges, disp, gap)
    tb = tri_aabbs(x, surf_tris, disp, gap)
    shared = jnp.any(
        surf_edges[:, None, :, None] == surf_tris[None, :, None, :], axis=(2, 3)
    )
    valid = ~shared
    if dbc_mask is not None:
        e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)
        t_dbc = jnp.all(dbc_mask[surf_tris], axis=1)
        valid = valid & ~(e_dbc[:, None] & t_dbc[None, :])
    valid = valid & reach_mask(
        prim_motion(x, surf_edges, disp), prim_motion(x, surf_tris, disp), gap
    )
    return overlap_pairs(eb, tb, valid, cap)


def ee_candidates(x, surf_edges, dbc_mask, cap, disp=None, gap=0.0):
    """Edge-edge candidates: (cap,2) of (eI, eJ) with eI < eJ.

    Excludes shared-vertex pairs and all-DBC pairs (reference
    SelfCollisionHandler.cpp:2294-2302)."""
    eb = edge_aabbs(x, surf_edges, disp, gap)
    ne = surf_edges.shape[0]
    shared = jnp.any(
        surf_edges[:, None, :, None] == surf_edges[None, :, None, :], axis=(2, 3)
    )
    upper = jnp.arange(ne)[:, None] < jnp.arange(ne)[None, :]
    all_dbc = jnp.all(dbc_mask[surf_edges], axis=1)
    both_dbc = all_dbc[:, None] & all_dbc[None, :]
    valid = upper & ~shared & ~both_dbc
    em = prim_motion(x, surf_edges, disp)
    valid = valid & reach_mask(em, em, gap)
    return overlap_pairs(eb, eb, valid, cap)
