"""Sort-based uniform-grid spatial hash on device — the scalable broad phase.

The dense AABB-overlap mask in contact/broadphase.py is O(Na*Nb) memory and
work; fine below ~10^4 primitives per side, fatal at the 100K-tet scale the
framework targets. This module is the TPU-native equivalent of the
reference's SpatialHash<3> (reference: src/Utils/SpatialHash.hpp:46-201
static build, :589-750 swept build, query* :258-832), rebuilt as a
sort-based fixed-shape pipeline (the standard GPU broad-phase design,
re-expressed for XLA):

  build (target side):
    1. per-primitive AABB (swept + gap-inflated);
    2. cell size = max AABB extent (traced scalar!) so every box overlaps
       at most 2 cells per axis -> exactly 8 cell registrations, deduped
       BY HASH (so each target appears at most once per bucket);
    3. hash cell coords into H buckets, sort (hash, prim), compute each
       entry's rank within its bucket via searchsorted, scatter into a
       (H+1, K) bucket table (row H is the invalid sentinel).
  query (canonical-cell, sort-free):
    each query primitive reads its <= 8 corner buckets -> (Q, 8K) target
    ids. A pair (q, t) is accepted ONLY in its canonical overlap cell
    c = max(q_cell_min, t_cell_min): c lies in both primitives' cell spans
    whenever their AABBs overlap, both sides registered it, and it is
    unique — so every overlapping pair is emitted exactly once with no
    per-row dedup sort (hash collisions only add false bucket reads, which
    the canonical-cell + exact-AABB tests reject).

Everything is fixed-shape: H, K, and the output cap are static; true counts
are returned for overflow-driven re-tracing, exactly like broadphase.py.
"""

import jax
import jax.numpy as jnp

from ipc_tpu.contact import broadphase as BP

__all__ = ["HashGrid", "build_grid", "query_pairs", "fused_candidates"]

_PRIMES = (73856093, 19349663, 83492791)


def _cell_hash(idx, H):
    """(…,3) int32 cell coords -> bucket id in [0, H)."""
    h = (
        idx[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ idx[..., 1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ idx[..., 2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    )
    return (h % jnp.uint32(H)).astype(jnp.int32)


_OFFS = [[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)]


def _corner_cells(boxes, origin, cell):
    """((N,8,3) corner cell coords, (N,3) i0, (N,3) i1). Because the cell
    size >= the max AABB extent, each box spans at most 2 cells per axis."""
    i0 = jnp.floor((boxes[:, 0] - origin[None, :]) / cell).astype(jnp.int32)
    i1 = jnp.floor((boxes[:, 1] - origin[None, :]) / cell).astype(jnp.int32)
    offs = jnp.asarray(_OFFS, jnp.int32)  # (8,3)
    span = i1 - i0  # 0 or 1 per axis
    corner = i0[:, None, :] + jnp.minimum(offs[None, :, :], span[:, None, :])
    return corner, i0, i1


class HashGrid:
    """Static-shape bucket table (pytree-friendly plain arrays)."""

    def __init__(self, table, origin, cell, t_i0, t_i1, H, K, overflow):
        self.table = table  # (H+1, K) int32 prim ids, -1 empty
        self.origin = origin
        self.cell = cell
        self.t_i0 = t_i0  # (N,3) target min-corner cells
        self.t_i1 = t_i1  # (N,3) target max-corner cells
        self.H = H
        self.K = K
        self.overflow = overflow  # int32: max bucket occupancy seen


def grid_geometry(*box_groups, min_cell=1e-30):
    """Shared (origin, cell) over several AABB sets so one grid build can
    serve queries from all of them."""
    ext = jnp.maximum(
        jnp.asarray(0.0, box_groups[0].dtype),
        jnp.stack([(b[:, 1] - b[:, 0]).max() for b in box_groups]).max(),
    )
    cell = jnp.maximum(ext, min_cell) * 1.001  # margin >> f32 eps so
    # floor((lo+ext)/cell) - floor(lo/cell) <= 1 holds under rounding
    origin = jnp.stack([b[:, 0].min(axis=0) for b in box_groups]).min(axis=0)
    return origin, cell


def build_grid(boxes, H, K, min_cell=1e-30, geom=None):
    """Insert target AABBs (N,2,3) into an (H+1,K) bucket table."""
    N = boxes.shape[0]
    if geom is None:
        geom = grid_geometry(boxes, min_cell=min_cell)
    origin, cell = geom
    corner, i0, i1 = _corner_cells(boxes, origin, cell)
    h = _cell_hash(corner, H)  # (N,8)
    # dedup registrations BY HASH: two corners of one box that land in the
    # same bucket (same cell, or distinct cells whose hashes collide) must
    # register once, or the canonical-cell query would emit the pair twice
    eq = h[:, :, None] == h[:, None, :]  # (N,8,8)
    first = jnp.argmax(eq, axis=2)
    keep = first == jnp.arange(8)[None, :]
    cells = jnp.where(keep, h, H)
    flat_h = cells.reshape(-1)
    flat_p = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, 8)).reshape(-1)
    order = jnp.argsort(flat_h)
    sh = flat_h[order]
    sp = flat_p[order]
    firstpos = jnp.searchsorted(sh, sh, side="left")
    rank = jnp.arange(sh.shape[0], dtype=jnp.int32) - firstpos.astype(jnp.int32)
    overflow = jnp.where(sh < H, rank + 1, 0).max()
    valid = (sh < H) & (rank < K)
    row = jnp.where(valid, sh, H)
    col = jnp.clip(rank, 0, K - 1)
    table = jnp.full((H + 1, K), -1, jnp.int32)
    table = table.at[row, col].set(jnp.where(valid, sp, -1))
    # the sentinel row may have been written by masked lanes; clear it
    table = table.at[H].set(-1)
    return HashGrid(table, origin, cell, i0, i1, H, K, overflow)


def query_pairs(grid: HashGrid, q_boxes, t_boxes, valid_fn, cap):
    """Candidate (q, t) pairs whose exact AABBs overlap, each exactly once.

    valid_fn(q_ids (Q,8K), t_ids (Q,8K)) -> bool mask of admissible pairs
    (topology/DBC exclusions). Returns (pairs (cap,2) int32 padded -1,
    true count, bucket overflow flag)."""
    Q = q_boxes.shape[0]
    K = grid.K
    corner, q_i0, q_i1 = _corner_cells(q_boxes, grid.origin, grid.cell)
    h = _cell_hash(corner, H=grid.H)  # (Q,8)
    # dedup the reads by CELL COORDS only (two distinct corner cells with
    # colliding hashes must both be read: either could be a canonical cell)
    eqc = (corner[:, :, None, :] == corner[:, None, :, :]).all(-1)
    keep = jnp.argmax(eqc, axis=2) == jnp.arange(8)[None, :]
    cells = jnp.where(keep, h, grid.H)
    cand = grid.table[cells].reshape(Q, 8 * K)  # (Q,8K) target ids, -1 empty
    t_idx = jnp.maximum(cand, 0)
    # canonical overlap cell: c = max(q_i0, t_i0); accept a candidate only
    # when it was found by reading exactly cell c, and c lies in both spans
    t0 = grid.t_i0[t_idx]  # (Q,8K,3)
    t1 = grid.t_i1[t_idx]
    canon = jnp.maximum(q_i0[:, None, :], t0)
    corner_rep = jnp.repeat(corner, K, axis=1)  # (Q,8K,3) read-cell coords
    at_canon = (corner_rep == canon).all(-1)
    in_spans = (canon <= t1).all(-1) & (canon <= q_i1[:, None, :]).all(-1)
    # exact AABB overlap
    qlo = q_boxes[:, 0][:, None, :]
    qhi = q_boxes[:, 1][:, None, :]
    tlo = t_boxes[t_idx, 0]
    thi = t_boxes[t_idx, 1]
    sep = jnp.any((qlo > thi) | (tlo > qhi), axis=2)
    q_ids = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[:, None], cand.shape)
    mask = (cand >= 0) & at_canon & in_spans & ~sep & valid_fn(q_ids, t_idx)
    count = mask.sum(dtype=jnp.int32)
    qi, ti = jnp.nonzero(mask, size=cap, fill_value=-1)
    pairs = jnp.stack(
        [
            jnp.where(qi >= 0, q_ids[jnp.maximum(qi, 0), jnp.maximum(ti, 0)], -1),
            jnp.where(qi >= 0, t_idx[jnp.maximum(qi, 0), jnp.maximum(ti, 0)], -1),
        ],
        axis=1,
    ).astype(jnp.int32)
    return pairs, count, grid.overflow


# ---------------------------------------------------------------------------
# candidate generators (same contract as contact/broadphase.py)
# ---------------------------------------------------------------------------


def _pt_valid(surf_verts, surf_tris, dbc_mask):
    v_dbc = dbc_mask[surf_verts]
    t_dbc = jnp.all(dbc_mask[surf_tris], axis=1)

    def valid(q_ids, t_ids):
        vid = surf_verts[q_ids]
        in_tri = jnp.any(vid[..., None] == surf_tris[t_ids], axis=-1)
        all_dbc = v_dbc[q_ids] & t_dbc[t_ids]
        return ~in_tri & ~all_dbc

    return valid


def _ee_valid(surf_edges, dbc_mask):
    e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)

    def valid(q_ids, t_ids):
        upper = q_ids < t_ids
        shared = jnp.any(
            surf_edges[q_ids][..., :, None] == surf_edges[t_ids][..., None, :],
            axis=(-2, -1),
        )
        both_dbc = e_dbc[q_ids] & e_dbc[t_ids]
        return upper & ~shared & ~both_dbc

    return valid


def _et_valid(surf_edges, surf_tris, dbc_mask):
    if dbc_mask is not None:
        e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)
        t_dbc = jnp.all(dbc_mask[surf_tris], axis=1)

    def valid(q_ids, t_ids):
        shared = jnp.any(
            surf_edges[q_ids][..., :, None] == surf_tris[t_ids][..., None, :],
            axis=(-2, -1),
        )
        ok = ~shared
        if dbc_mask is not None:
            ok = ok & ~(e_dbc[q_ids] & t_dbc[t_ids])
        return ok

    return valid


def pt_candidates(x, surf_verts, surf_tris, dbc_mask, cap, disp=None, gap=0.0,
                  H=None, K=32):
    nS = surf_tris.shape[0]
    H = H or _default_H(nS)
    vb = BP.vert_aabbs(x, surf_verts, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    grid = build_grid(tb, H, K)
    return query_pairs(grid, vb, tb, _pt_valid(surf_verts, surf_tris, dbc_mask), cap)


def ee_candidates(x, surf_edges, dbc_mask, cap, disp=None, gap=0.0, H=None, K=32):
    nE = surf_edges.shape[0]
    H = H or _default_H(nE)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    grid = build_grid(eb, H, K)
    return query_pairs(grid, eb, eb, _ee_valid(surf_edges, dbc_mask), cap)


def et_candidates(x, surf_edges, surf_tris, cap, disp=None, gap=0.0,
                  dbc_mask=None, H=None, K=32):
    nS = surf_tris.shape[0]
    H = H or _default_H(nS)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    grid = build_grid(tb, H, K)
    return query_pairs(grid, eb, tb, _et_valid(surf_edges, surf_tris, dbc_mask), cap)


def fused_candidates(x, surf_verts, surf_edges, surf_tris, dbc_mask,
                     cap_pt, cap_ee, cap_et, disp=None, gap=0.0, K=32,
                     with_et=True):
    """One broad phase serving all three queries of a Newton iteration.

    Computes each primitive family's swept+inflated AABBs ONCE, builds ONE
    triangle grid (shared by the PT and the edge-triangle-intersection
    queries) and ONE edge grid, and runs the three queries against them —
    the fused analog of the reference's per-call SpatialHash rebuilds
    (Optimizer.cpp:2447-2498 builds one hash and issues typed queries; the
    TPU cost model makes the shared build matter even more).

    Returns dict(pt=(pairs,count), ee=(pairs,count), et=(pairs,count),
    overflow=max bucket occupancy across both grids).
    """
    nS = surf_tris.shape[0]
    nE = surf_edges.shape[0]
    vb = BP.vert_aabbs(x, surf_verts, disp, gap)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    tri_grid = build_grid(tb, _default_H(nS), K)
    edge_grid = build_grid(eb, _default_H(nE), K)
    pt_pairs, pt_count, ov1 = query_pairs(
        tri_grid, vb, tb, _pt_valid(surf_verts, surf_tris, dbc_mask), cap_pt
    )
    ee_pairs, ee_count, ov2 = query_pairs(
        edge_grid, eb, eb, _ee_valid(surf_edges, dbc_mask), cap_ee
    )
    if with_et:
        et_pairs, et_count, _ = query_pairs(
            tri_grid, eb, tb, _et_valid(surf_edges, surf_tris, dbc_mask), cap_et
        )
    else:
        et_pairs = jnp.full((cap_et, 2), -1, jnp.int32)
        et_count = jnp.asarray(0, jnp.int32)
    return dict(
        pt=(pt_pairs, pt_count),
        ee=(ee_pairs, ee_count),
        et=(et_pairs, et_count),
        overflow=jnp.maximum(ov1, ov2),
    )


def _default_H(n):
    h = 1
    while h < 2 * max(n, 1):
        h *= 2
    return h
