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
       at most 2 cells per axis -> exactly 8 (deduped) cell registrations;
    3. hash cell coords into H buckets, sort (hash, prim), compute each
       entry's rank within its bucket via searchsorted, scatter into a
       (H+1, K) bucket table (row H is the invalid sentinel). Hash
       collisions only create false-positive candidates — the exact AABB
       test filters them.
  query:
    each query primitive reads its <= 8 buckets -> (Q, 8K) target ids,
    row-sorts to mask duplicates (a pair found via two shared cells must
    not enter the energy twice), applies the exact AABB-overlap + validity
    mask, and compacts with a size-capped nonzero.

Everything is fixed-shape: H, K, and the output cap are static; true counts
are returned for overflow-driven re-tracing, exactly like broadphase.py.
"""

import jax
import jax.numpy as jnp

from ipc_tpu.contact import broadphase as BP

__all__ = ["HashGrid", "build_grid", "query_pairs"]

_PRIMES = (73856093, 19349663, 83492791)


def _cell_hash(idx, H):
    """(…,3) int32 cell coords -> bucket id in [0, H)."""
    h = (
        idx[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ idx[..., 1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ idx[..., 2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    )
    return (h % jnp.uint32(H)).astype(jnp.int32)


def _prim_cells(boxes, origin, cell, H):
    """(N,8) deduped bucket ids per primitive (duplicates -> sentinel H)."""
    i0 = jnp.floor((boxes[:, 0] - origin[None, :]) / cell).astype(jnp.int32)
    i1 = jnp.floor((boxes[:, 1] - origin[None, :]) / cell).astype(jnp.int32)
    # at most 2 cells per axis because cell >= max extent
    offs = jnp.asarray(
        [[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)], jnp.int32
    )  # (8,3)
    span = i1 - i0  # 0 or 1 per axis
    corner = i0[:, None, :] + jnp.minimum(offs[None, :, :], span[:, None, :])
    h = _cell_hash(corner, H)  # (N,8)
    # dedup within the 8 (same coords -> same hash); keep first occurrence
    eq_prev = (corner[:, :, None, :] == corner[:, None, :, :]).all(-1)  # (N,8,8)
    first = jnp.argmax(eq_prev, axis=2)  # first j with equal coords
    keep = first == jnp.arange(8)[None, :]
    return jnp.where(keep, h, H)


class HashGrid:
    """Static-shape bucket table (pytree-friendly plain arrays)."""

    def __init__(self, table, origin, cell, H, K, overflow):
        self.table = table  # (H+1, K) int32 prim ids, -1 empty
        self.origin = origin
        self.cell = cell
        self.H = H
        self.K = K
        self.overflow = overflow  # int32: max bucket occupancy seen


def build_grid(boxes, H, K, min_cell=1e-30):
    """Insert target AABBs (N,2,3) into an (H+1,K) bucket table."""
    N = boxes.shape[0]
    ext = (boxes[:, 1] - boxes[:, 0]).max()
    cell = jnp.maximum(ext, min_cell) * 1.001  # margin >> f32 eps so
    # floor((lo+ext)/cell) - floor(lo/cell) <= 1 holds under rounding
    origin = boxes[:, 0].min(axis=0)
    cells = _prim_cells(boxes, origin, cell, H)  # (N,8) with sentinel H
    flat_h = cells.reshape(-1)
    flat_p = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, 8)).reshape(-1)
    order = jnp.argsort(flat_h)
    sh = flat_h[order]
    sp = flat_p[order]
    first = jnp.searchsorted(sh, sh, side="left")
    rank = jnp.arange(sh.shape[0], dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.where(sh < H, rank + 1, 0).max()
    valid = (sh < H) & (rank < K)
    row = jnp.where(valid, sh, H)
    col = jnp.clip(rank, 0, K - 1)
    table = jnp.full((H + 1, K), -1, jnp.int32)
    table = table.at[row, col].set(jnp.where(valid, sp, -1))
    # the sentinel row may have been written by masked lanes; clear it
    table = table.at[H].set(-1)
    return HashGrid(table, origin, cell, H, K, overflow)


def query_pairs(grid: HashGrid, q_boxes, t_boxes, valid_fn, cap):
    """Candidate (q, t) pairs whose exact AABBs overlap.

    valid_fn(q_ids (Q,8K), t_ids (Q,8K)) -> bool mask of admissible pairs
    (topology/DBC exclusions). Returns (pairs (cap,2) int32 padded -1,
    true count, bucket overflow flag)."""
    Q = q_boxes.shape[0]
    K = grid.K
    cells = _prim_cells(q_boxes, grid.origin, grid.cell, grid.H)  # (Q,8)
    cand = grid.table[cells].reshape(Q, 8 * K)  # (Q, 8K) target ids, -1 empty
    # row-dedup: sort ids, mask repeats
    cand_sorted = jnp.sort(cand, axis=1)
    dup = jnp.concatenate(
        [
            jnp.zeros((Q, 1), bool),
            cand_sorted[:, 1:] == cand_sorted[:, :-1],
        ],
        axis=1,
    )
    cand_ok = (cand_sorted >= 0) & ~dup
    t_idx = jnp.maximum(cand_sorted, 0)
    # exact AABB overlap
    qlo = q_boxes[:, 0][:, None, :]
    qhi = q_boxes[:, 1][:, None, :]
    tlo = t_boxes[t_idx, 0]
    thi = t_boxes[t_idx, 1]
    sep = jnp.any((qlo > thi) | (tlo > qhi), axis=2)
    q_ids = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[:, None], cand_sorted.shape)
    mask = cand_ok & ~sep & valid_fn(q_ids, t_idx)
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
# drop-in candidate generators (same contract as contact/broadphase.py)
# ---------------------------------------------------------------------------


def pt_candidates(x, surf_verts, surf_tris, dbc_mask, cap, disp=None, gap=0.0,
                  H=None, K=32):
    nS = surf_tris.shape[0]
    H = H or _default_H(nS)
    vb = BP.vert_aabbs(x, surf_verts, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    grid = build_grid(tb, H, K)
    v_dbc = dbc_mask[surf_verts]
    t_dbc = jnp.all(dbc_mask[surf_tris], axis=1)

    def valid(q_ids, t_ids):
        vid = surf_verts[q_ids]
        in_tri = jnp.any(vid[..., None] == surf_tris[t_ids], axis=-1)
        all_dbc = v_dbc[q_ids] & t_dbc[t_ids]
        return ~in_tri & ~all_dbc

    pairs, count, overflow = query_pairs(grid, vb, tb, valid, cap)
    return pairs, count, overflow


def ee_candidates(x, surf_edges, dbc_mask, cap, disp=None, gap=0.0, H=None, K=32):
    nE = surf_edges.shape[0]
    H = H or _default_H(nE)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    grid = build_grid(eb, H, K)
    e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)

    def valid(q_ids, t_ids):
        upper = q_ids < t_ids
        shared = jnp.any(
            surf_edges[q_ids][..., :, None] == surf_edges[t_ids][..., None, :],
            axis=(-2, -1),
        )
        both_dbc = e_dbc[q_ids] & e_dbc[t_ids]
        return upper & ~shared & ~both_dbc

    pairs, count, overflow = query_pairs(grid, eb, eb, valid, cap)
    return pairs, count, overflow


def et_candidates(x, surf_edges, surf_tris, cap, disp=None, gap=0.0,
                  dbc_mask=None, H=None, K=32):
    nS = surf_tris.shape[0]
    H = H or _default_H(nS)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    grid = build_grid(tb, H, K)
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

    pairs, count, overflow = query_pairs(grid, eb, tb, valid, cap)
    return pairs, count, overflow


def _default_H(n):
    h = 1
    while h < 2 * max(n, 1):
        h *= 2
    return h
