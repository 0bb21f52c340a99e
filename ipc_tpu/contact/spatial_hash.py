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
       (H+1, K) bucket table (row H is the invalid sentinel);
    4. pack each target's payload — cell coords + span bits + bitcast AABB
       + family data (vertex ids, DBC bit) — into ONE row of an (N, W)
       int32 array, so the query reads everything it needs about a target
       with a single contiguous row gather.
  query (canonical-cell, sort-free):
    each query primitive reads its <= 8 corner buckets -> (Q, 8K) target
    ids -> ONE payload gather. A pair (q, t) is accepted ONLY in its
    canonical overlap cell c = max(q_cell_min, t_cell_min): c lies in both
    primitives' cell spans whenever their AABBs overlap, both sides
    registered it, and it is unique — so every overlapping pair is emitted
    exactly once with no per-row dedup sort (hash collisions only add
    false bucket reads, which the canonical-cell + exact-AABB tests
    reject). All q-side data is indexed per ROW (Q,1), never per slot —
    the TPU cost of this query is ~one wide row-gather per slot, nothing
    else.

Everything is fixed-shape: H, K, and the output cap are static; true counts
are returned for overflow-driven re-tracing, exactly like broadphase.py.

Packing limits: cell coords are packed 16 bits for x/y and 29 bits for z
(cell size >= the largest primitive extent, so a scene would need >65536
primitive-sized cells along one axis to overflow — far beyond any IPC
scene; the dense path serves tiny-primitive micro-scenes anyway).
"""

import jax
import jax.numpy as jnp

from ipc_tpu.contact import broadphase as BP

__all__ = [
    "HashGrid",
    "build_grid",
    "query_pairs",
    "fused_candidates",
    "fused_candidates_spmd",
]

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
    """Static-shape bucket table + packed per-target payload."""

    def __init__(self, table, payload, origin, cell, H, K, overflow):
        self.table = table  # (H+1, K) int32 prim ids, -1 empty
        self.payload = payload  # (N+1, 8+E) packed rows; row N = sentinel
        self.origin = origin
        self.cell = cell
        self.H = H
        self.K = K
        self.overflow = overflow  # int32: max bucket occupancy seen


def grid_geometry(*box_groups, min_cell=1e-30, excludes=None):
    """Shared (origin, cell) over several AABB sets so one grid build can
    serve queries from all of them.

    excludes: optional per-group bool masks of OVERSIZED primitives (the
    dense big-prim path, see dense_pairs): excluded prims contribute
    neither to the cell size nor to the origin — one kinematic plane
    triangle must not inflate the cell until every deformable primitive
    lands in the same bucket (the 1_squeezeOut grid_K=80492 failure; the
    reference never inserts obstacle prims at all, its hash covers only
    the deformable mesh, Optimizer.cpp:259 sh.build(result,...))."""
    if excludes is None:
        excludes = (None,) * len(box_groups)
    exts, los = [], []
    for b, m in zip(box_groups, excludes):
        e = b[:, 1] - b[:, 0]
        lo = b[:, 0]
        # a single non-finite box (NaN-poisoned iterate) must not poison
        # the shared cell size/origin — such prims register nowhere (see
        # build_grid) and the finite rest of the grid stays usable
        fin = jnp.isfinite(b).all(axis=(1, 2))
        e = jnp.where(fin[:, None], e, jnp.asarray(0.0, e.dtype))
        lo = jnp.where(fin[:, None], lo, jnp.asarray(jnp.inf, lo.dtype))
        if m is not None:
            e = jnp.where(m[:, None], jnp.asarray(0.0, e.dtype), e)
            lo = jnp.where(m[:, None], jnp.asarray(jnp.inf, lo.dtype), lo)
        exts.append(e.max())
        los.append(lo.min(axis=0))
    ext = jnp.maximum(jnp.asarray(0.0, box_groups[0].dtype), jnp.stack(exts).max())
    cell = jnp.maximum(ext, min_cell) * 1.001  # margin >> f32 eps so
    # floor((lo+ext)/cell) - floor(lo/cell) <= 1 holds under rounding
    origin = jnp.stack(los).min(axis=0)
    return origin, cell


def _pack_payload(boxes, i0, i1, extra, motion=None):
    """(N, 8+E[+10]) int32 rows: [cw0, cw1, lo.xyz, hi.xyz (bitcast f32),
    extra, motion?].

    cw0 = i0x<<16 | i0y; cw1 = i0z<<3 | span bits. Coordinates are
    non-negative whenever the grid origin lower-bounds the target boxes
    (build_grid's geometry guarantees it).

    motion: optional (raw_boxes (N,2,3), u (N,3), w (N,)) — UNswept,
    UNinflated position AABBs plus the primitive's mean displacement and
    max per-vertex deviation from it, bitcast into 10 trailing f32
    columns. Queries use them for the relative-motion reachability filter
    (see _query_block)."""
    span = i1 - i0
    cw0 = (i0[:, 0] << 16) | i0[:, 1]
    cw1 = (i0[:, 2] << 3) | (span[:, 0] << 2) | (span[:, 1] << 1) | span[:, 2]
    fbits = jax.lax.bitcast_convert_type(
        boxes.astype(jnp.float32).reshape(-1, 6), jnp.int32
    )
    cols = [cw0[:, None], cw1[:, None], fbits]
    if extra is not None:
        cols.append(extra.astype(jnp.int32))
    if motion is not None:
        rb, u, w = motion
        mf = jnp.concatenate(
            [rb.reshape(-1, 6), u, w[:, None]], axis=1
        ).astype(jnp.float32)
        cols.append(jax.lax.bitcast_convert_type(mf, jnp.int32))
    rows = jnp.concatenate(cols, axis=1)
    # sentinel row for empty slots (id -1): cells that can never be canonical
    sent = jnp.full((1, rows.shape[1]), -1, jnp.int32)
    return jnp.concatenate([rows, sent], axis=0)


prim_motion = BP.prim_motion


def build_grid(boxes, H, K, min_cell=1e-30, geom=None, extra=None, motion=None,
               exclude=None):
    """Insert target AABBs (N,2,3) into an (H+1,K) bucket table.

    extra: optional (N,E) int32 family columns (vertex ids, DBC bits)
    appended to the packed payload so queries need no further t-side
    gathers. motion: optional prim_motion() triple appended as 10 f32
    columns for the query-side relative-motion filter. exclude: optional
    (N,) bool — oversized prims handled by the dense big-prim path are
    never inserted (and never count toward bucket overflow); their payload
    rows are packed but unreachable."""
    N = boxes.shape[0]
    if geom is None:
        geom = grid_geometry(boxes, min_cell=min_cell,
                             excludes=None if exclude is None else (exclude,))
    origin, cell = geom
    # non-finite boxes (a NaN-poisoned iterate) register nowhere: without
    # this, floor(NaN) collapses every such prim into one bucket and the
    # run dies with a misleading capacity-regrowth error instead of the
    # true "non-finite state" diagnosis (two rounds of matOnBoard FAIL
    # records said "needs the hierarchical grid" when the state was NaN)
    bad = ~jnp.isfinite(boxes).all(axis=(1, 2))
    corner, i0, i1 = _corner_cells(boxes, origin, cell)
    h = _cell_hash(corner, H)  # (N,8)
    # dedup registrations BY HASH: two corners of one box that land in the
    # same bucket (same cell, or distinct cells whose hashes collide) must
    # register once, or the canonical-cell query would emit the pair twice
    eq = h[:, :, None] == h[:, None, :]  # (N,8,8)
    first = jnp.argmax(eq, axis=2)
    keep = first == jnp.arange(8)[None, :]
    cells = jnp.where(keep, h, H)
    cells = jnp.where(bad[:, None], H, cells)
    if exclude is not None:
        cells = jnp.where(exclude[:, None], H, cells)
    flat_h = cells.reshape(-1)
    flat_p = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, 8)).reshape(-1)
    order = jnp.argsort(flat_h)
    sh = flat_h[order]
    sp = flat_p[order]
    # rank within bucket = position - first position of this hash value;
    # first positions via a cummax over run starts (a searchsorted here
    # lowers to a vmapped binary-search while-loop — far slower on TPU)
    idx = jnp.arange(sh.shape[0], dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sh[1:] != sh[:-1]])
    firstpos = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - firstpos
    overflow = jnp.where(sh < H, rank + 1, 0).max()
    valid = (sh < H) & (rank < K)
    row = jnp.where(valid, sh, H)
    col = jnp.clip(rank, 0, K - 1)
    table = jnp.full((H + 1, K), -1, jnp.int32)
    table = table.at[row, col].set(jnp.where(valid, sp, -1))
    # the sentinel row may have been written by masked lanes; clear it
    table = table.at[H].set(-1)
    payload = _pack_payload(boxes, i0, i1, extra, motion)
    return HashGrid(table, payload, origin, cell, H, K, overflow)


# per-tile (rows x slots) element budget for the chunked query: bounds the
# working set of the compaction sort and the payload gathers at ~tens of MB
# regardless of scene size (the un-chunked (Q, 8K) expansion wanted 35.8 GB
# at dolphinFunnel scale — 1.09M query edges x 64 slots x an 11-wide fused
# sort operand TPU-tiled to minor-dim 128)
_TILE_ELEMS = 1 << 22


def _query_block(grid: HashGrid, q_boxes, q_rows, valid_fn, q_motion=None,
                 gap=0.0, t_off=0):
    """Candidate mask for ONE block of query rows.

    q_boxes (B,2,3); q_rows (B,) GLOBAL row ids handed to valid_fn. Returns
    (mask (B,row_cap) bool, t_idx (B,row_cap) int32, row_overflow scalar:
    the K' needed so 3K' covers the fullest row).

    t_off: global row id of the grid's target row 0 — nonzero when the
    table indexes a SHARD of the target primitives (the SPMD ring query,
    fused_candidates_spmd); payload gathers stay local, while valid_fn
    and the emitted t ids see global rows.

    q_motion: optional (raw_boxes (B,2,3), u (B,3), w (B,)) query-side
    prim_motion(); requires the grid built with matching target motion
    columns. Enables the relative-motion reachability filter: a slot pair
    survives only if box_dist(raw_q, raw_t) <= gap + |u_q-u_t| + w_q + w_t
    — a provably conservative bound on whether the pair can come within
    `gap` anywhere on the linear sweep. For coherent sweeps (the scripted
    twist family: every primitive travels far, neighbors travel TOGETHER)
    this collapses the emitted candidate count from swept-AABB-overlap
    scale to true near-pair scale — the fixed-shape answer to the
    reference's per-pair streamed narrow phase whose memory high-water is
    the active set, not the candidate product
    (SelfCollisionHandler.cpp:2447-2478; mat100x100_twist's 330 GB regrow,
    BATTERY_r3.json)."""
    K = grid.K
    B = q_boxes.shape[0]
    corner, q_i0, q_i1 = _corner_cells(q_boxes, grid.origin, grid.cell)
    h = _cell_hash(corner, H=grid.H)  # (B,8)
    # dedup the reads by CELL COORDS only (two distinct corner cells with
    # colliding hashes must both be read: either could be a canonical cell)
    eqc = (corner[:, :, None, :] == corner[:, None, :, :]).all(-1)
    keep = jnp.argmax(eqc, axis=2) == jnp.arange(8)[None, :]
    cells = jnp.where(keep, h, grid.H)
    cand = grid.table[cells].reshape(B, 8 * K)  # (B,8K) target ids, -1 empty
    # row compaction: most slots are empty (-1), and every downstream cost
    # (payload gather, canonical/AABB tests, the nonzero scatter) scales
    # with slot count — sort the valid SLOT IDS to the front (a 2-operand
    # lane-wise bitonic sort; the old 5-operand sort materialized an
    # 11-wide fused operand) and keep 3K per row; cand and the read-cell
    # coords are then fetched by take-along/row gathers on the compacted
    # (B, 3K) shape only. Overflowing rows are reported through the
    # bucket-overflow channel so grid_K (and with it 3K) grows and the
    # build re-traces.
    row_cap = min(3 * K, 8 * K)
    keys = (cand < 0).astype(jnp.int32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (B, 8 * K), 1)
    _, sidx = jax.lax.sort((keys, slots), dimension=1, num_keys=1)
    row_counts = jnp.sum(cand >= 0, axis=1, dtype=jnp.int32)
    row_overflow = (row_counts.max() + 2) // 3  # K' needed so 3K' >= rows
    sidx = sidx[:, :row_cap]
    cand = jnp.take_along_axis(cand, sidx, axis=1)
    # read-cell coords of the compacted slots: slot s read corner s // K
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    corner_rep = corner[rows, sidx // K]  # (B,row_cap,3)
    t_idx = jnp.maximum(cand, 0) + t_off
    # ONE wide row gather fetches everything about each candidate target
    # (empty slots read the sentinel row, whose cells never match)
    pay = grid.payload[jnp.where(cand >= 0, cand, grid.payload.shape[0] - 1)]
    cw0, cw1 = pay[..., 0], pay[..., 1]
    t0x, t0y = cw0 >> 16, cw0 & 0xFFFF
    t0z = cw1 >> 3
    t1x = t0x + ((cw1 >> 2) & 1)
    t1y = t0y + ((cw1 >> 1) & 1)
    t1z = t0z + (cw1 & 1)
    # canonical overlap cell: c = max(q_i0, t_i0); accept a candidate only
    # when it was found by reading exactly cell c, and c lies in both spans
    cx = jnp.maximum(q_i0[:, None, 0], t0x)
    cy = jnp.maximum(q_i0[:, None, 1], t0y)
    cz = jnp.maximum(q_i0[:, None, 2], t0z)
    at_canon = (
        (corner_rep[..., 0] == cx)
        & (corner_rep[..., 1] == cy)
        & (corner_rep[..., 2] == cz)
    )
    in_spans = (
        (cx <= t1x) & (cy <= t1y) & (cz <= t1z)
        & (cx <= q_i1[:, None, 0]) & (cy <= q_i1[:, None, 1])
        & (cz <= q_i1[:, None, 2])
    )
    # exact AABB overlap (bitcast roundtrip is value-exact)
    tbox = jax.lax.bitcast_convert_type(pay[..., 2:8], jnp.float32)
    qlo = q_boxes[:, 0].astype(jnp.float32)[:, None, :]
    qhi = q_boxes[:, 1].astype(jnp.float32)[:, None, :]
    sep = jnp.any((qlo > tbox[..., 3:6]) | (tbox[..., 0:3] > qhi), axis=2)
    # non-finite query boxes emit nothing (floor(NaN) cell coords are
    # platform-defined garbage that could alias a real canonical cell)
    q_fin = jnp.isfinite(q_boxes).all(axis=(1, 2))
    mask = (cand >= 0) & at_canon & in_spans & ~sep & q_fin[:, None]
    W = grid.payload.shape[1]
    mask = mask & valid_fn(
        q_rows, t_idx, pay[..., 8:W - 10] if q_motion is not None else pay[..., 8:]
    )
    if q_motion is not None:
        # relative-motion reachability (docstring): everything in f32 with
        # a 1e-5 relative threshold inflation covering the bitcast/cast
        # rounding of f64 inputs (f32 eps 6e-8 << 1e-5)
        q_rb, q_u, q_w = q_motion
        tm = jax.lax.bitcast_convert_type(pay[..., W - 10:], jnp.float32)
        t_lo, t_hi, t_u, t_w = tm[..., 0:3], tm[..., 3:6], tm[..., 6:9], tm[..., 9]
        q_lo = q_rb[:, 0].astype(jnp.float32)[:, None, :]
        q_hi = q_rb[:, 1].astype(jnp.float32)[:, None, :]
        g = jnp.maximum(jnp.maximum(q_lo - t_hi, t_lo - q_hi), 0.0)
        d2 = jnp.sum(g * g, axis=-1)
        du = q_u.astype(jnp.float32)[:, None, :] - t_u
        rel = (
            jnp.sqrt(jnp.sum(du * du, axis=-1))
            + q_w.astype(jnp.float32)[:, None] + t_w
        )
        reach = (jnp.asarray(gap, jnp.float32) + rel) * jnp.float32(1.0 + 1e-5)
        mask = mask & (d2 <= reach * reach)
    return mask, t_idx, row_overflow


def query_pairs(grid: HashGrid, q_boxes, valid_fn, cap, tile_elems=_TILE_ELEMS,
                q_row0=0, q_motion=None, gap=0.0, t_off=0):
    """Candidate (q, t) pairs whose exact AABBs overlap, each exactly once.

    valid_fn(q_rows (B,), t_ids (B,3K), extra (B,3K,E)) -> bool mask of
    admissible pairs (topology/DBC exclusions); q_rows must be indexed
    per-row ((B,1)-broadcast), never per-slot. Returns (pairs (cap,2)
    int32 padded -1, true count, bucket overflow flag).

    Memory scaling: when Q x 8K exceeds the tile budget, the query axis is
    CHUNKED — fixed-size query tiles run sequentially under lax.fori_loop,
    each compacting its hits into the shared (cap,2) output at a running
    offset. HBM use is O(tile) + O(cap) instead of O(Q*K): this is what
    lets reference-scale scenes (dolphinFunnel's 1.09M edge queries,
    armadillo 122K/219K) fit a 16 GB chip. The reference hash achieves the
    same bound host-side with dynamic per-voxel lists
    (src/Utils/SpatialHash.hpp:46-201: output ~ occupied voxels)."""
    Q = q_boxes.shape[0]
    K = grid.K
    slots = 8 * K
    row_cap = min(3 * K, slots)
    if Q * slots <= 2 * tile_elems:
        q_rows = jnp.arange(Q, dtype=jnp.int32)
        mask, t_idx, row_ov = _query_block(
            grid, q_boxes, q_rows, valid_fn, q_motion, gap, t_off
        )
        count = mask.sum(dtype=jnp.int32)
        # 1D nonzero: a 2D nonzero scatters one coordinate array PER OUTPUT
        # DIMENSION (measured as the dominant query cost); flattening emits
        # a single scatter and the row/slot split is two cheap ops
        (flat,) = jnp.nonzero(mask.reshape(-1), size=cap, fill_value=-1)
        ok = flat >= 0
        fi = jnp.maximum(flat, 0)
        qi = q_row0 + fi // row_cap
        pairs = jnp.stack(
            [
                jnp.where(ok, qi, -1),
                jnp.where(ok, t_idx.reshape(-1)[fi], -1),
            ],
            axis=1,
        ).astype(jnp.int32)
        return pairs, count, jnp.maximum(grid.overflow, row_ov)

    # ---- chunked path ----
    QB = max(256, tile_elems // slots)
    n_tiles = -(-Q // QB)
    pad = n_tiles * QB - Q
    if pad:
        # pad with copies of row 0; padded rows are masked by q_rows >= Q
        qb = jnp.concatenate(
            [q_boxes, jnp.broadcast_to(q_boxes[:1], (pad,) + q_boxes.shape[1:])]
        )
    else:
        qb = q_boxes
    qm = None
    if q_motion is not None:
        qm = tuple(
            jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
            ) if pad else a
            for a in q_motion
        )
    tile_cap = min(cap, QB * row_cap)

    def body(i, carry):
        out, total, off, row_ov = carry
        start = i * QB
        blk = jax.lax.dynamic_slice_in_dim(qb, start, QB)
        mblk = (
            None if qm is None
            else tuple(jax.lax.dynamic_slice_in_dim(a, start, QB) for a in qm)
        )
        q_rows = start + jnp.arange(QB, dtype=jnp.int32)
        mask, t_idx, ov = _query_block(grid, blk, q_rows, valid_fn, mblk, gap,
                                       t_off)
        mask = mask & (q_rows < Q)[:, None]
        cnt = mask.sum(dtype=jnp.int32)
        (flat,) = jnp.nonzero(mask.reshape(-1), size=tile_cap, fill_value=-1)
        ok = flat >= 0
        fi = jnp.maximum(flat, 0)
        rows = jnp.stack(
            [q_row0 + start + fi // row_cap, t_idx.reshape(-1)[fi]], axis=1
        ).astype(jnp.int32)
        # valid hits are packed at the front of `flat`; append them to the
        # shared output at the running offset (writes past cap drop — the
        # true count still records the overflow for the regrow protocol)
        dst = jnp.where(ok, off + jnp.arange(tile_cap, dtype=jnp.int32), cap)
        out = out.at[dst].set(rows, mode="drop")
        return (
            out,
            total + cnt,
            jnp.minimum(off + jnp.minimum(cnt, tile_cap), cap),
            jnp.maximum(row_ov, ov),
        )

    out0 = jnp.full((cap, 2), -1, jnp.int32)
    z = jnp.asarray(0, jnp.int32)
    out, total, _, row_ov = jax.lax.fori_loop(
        0, n_tiles, body, (out0, z, z, z)
    )
    return out, total, jnp.maximum(grid.overflow, row_ov)


# ---------------------------------------------------------------------------
# oversized-primitive (dense) path
#
# The canonical-cell grid requires cell >= the max inserted AABB extent, so
# ONE oversized primitive (a kinematic plane/container triangle spanning the
# whole domain) inflates the cell until every deformable primitive lands in
# a handful of buckets — 1_squeezeOut regrew grid_K to 80,492 (120 GB of
# tables). The reference never meets this: its hash holds only the
# deformable surface and obstacle prims are query-side walkers
# (MeshCO.cpp:1091/1404 queryTriangleForPoints against the deformable grid).
# The fixed-shape TPU analog: statically classify prims whose REST extent is
# far above the population (SelfContact._classify_big), keep them out of the
# grid AND out of the grid's cell-size computation, and sweep them against
# all primitives with a dense chunked (Q x B) AABB+motion test — B is small
# (<= 512), so the dense product is cheap, branch-free VPU work.
# ---------------------------------------------------------------------------


def _gather_motion(m, ids):
    rb, u, w = m
    return rb[ids], u[ids], w[ids]


def _reach_ok(q_rb, q_u, q_w, t_rb, t_u, t_w, gap):
    """Relative-motion reachability on raw (Q,*) x (B,*) arrays — the same
    f32 formula and 1e-5 inflation as _query_block, so the dense and grid
    paths emit identical candidate sets."""
    q_lo = q_rb[:, 0].astype(jnp.float32)[:, None, :]
    q_hi = q_rb[:, 1].astype(jnp.float32)[:, None, :]
    t_lo = t_rb[None, :, 0].astype(jnp.float32)
    t_hi = t_rb[None, :, 1].astype(jnp.float32)
    g = jnp.maximum(jnp.maximum(q_lo - t_hi, t_lo - q_hi), 0.0)
    d2 = jnp.sum(g * g, axis=-1)
    du = q_u.astype(jnp.float32)[:, None, :] - t_u.astype(jnp.float32)[None]
    rel = (
        jnp.sqrt(jnp.sum(du * du, axis=-1))
        + q_w.astype(jnp.float32)[:, None]
        + t_w.astype(jnp.float32)[None]
    )
    reach = (jnp.asarray(gap, jnp.float32) + rel) * jnp.float32(1.0 + 1e-5)
    return d2 <= reach * reach


def dense_pairs(q_boxes, q_motion, t_ids, t_boxes, t_motion, valid_fn, t_extra,
                cap, gap=0.0, swap=False, q_row0=0, tile_elems=_TILE_ELEMS):
    """(q, t) candidates of ALL query prims against a SMALL oversized set.

    t_ids (B,) GLOBAL ids of the big prims; t_boxes/t_motion/t_extra their
    gathered rows. valid_fn has the query_pairs contract (t_ids and extra
    arrive (1,B)-broadcast). Chunked over Q like query_pairs when Q x B
    exceeds the tile budget. swap=True emits (t, q) rows (big edges swept
    with triangles as the query side). Returns (pairs (cap,2) padded -1,
    true count)."""
    Q = q_boxes.shape[0]
    B = t_boxes.shape[0]
    t_ids_b = t_ids[None, :]
    extra_b = None if t_extra is None else t_extra[None, :, :]
    tlo = t_boxes[None, :, 0].astype(jnp.float32)
    thi = t_boxes[None, :, 1].astype(jnp.float32)

    def block(qb, qm, q_rows):
        qlo = qb[:, 0].astype(jnp.float32)[:, None, :]
        qhi = qb[:, 1].astype(jnp.float32)[:, None, :]
        sep = jnp.any((qlo > thi) | (tlo > qhi), axis=2)
        m = ~sep & valid_fn(q_rows, t_ids_b, extra_b)
        if qm is not None and t_motion is not None:
            m = m & _reach_ok(qm[0], qm[1], qm[2], *t_motion, gap)
        return m

    def pack(flat, start):
        ok = flat >= 0
        fi = jnp.maximum(flat, 0)
        qi = q_row0 + start + fi // B
        ti = t_ids[fi % B]
        a, b = (ti, qi) if swap else (qi, ti)
        return jnp.stack(
            [jnp.where(ok, a, -1), jnp.where(ok, b, -1)], axis=1
        ).astype(jnp.int32), ok

    if Q * B <= 2 * tile_elems:
        q_rows = jnp.arange(Q, dtype=jnp.int32)
        m = block(q_boxes, q_motion, q_rows)
        count = m.sum(dtype=jnp.int32)
        (flat,) = jnp.nonzero(m.reshape(-1), size=cap, fill_value=-1)
        pairs, _ = pack(flat, 0)
        return pairs, count

    QB = max(256, tile_elems // max(B, 1))
    n_tiles = -(-Q // QB)
    pad = n_tiles * QB - Q
    qb_all = (
        jnp.concatenate(
            [q_boxes, jnp.broadcast_to(q_boxes[:1], (pad,) + q_boxes.shape[1:])]
        ) if pad else q_boxes
    )
    qm_all = None
    if q_motion is not None:
        qm_all = tuple(
            jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
            ) if pad else a
            for a in q_motion
        )
    tile_cap = min(cap, QB * B)

    def body(i, carry):
        out, total, off = carry
        start = i * QB
        blk = jax.lax.dynamic_slice_in_dim(qb_all, start, QB)
        mblk = (
            None if qm_all is None
            else tuple(jax.lax.dynamic_slice_in_dim(a, start, QB) for a in qm_all)
        )
        q_rows = start + jnp.arange(QB, dtype=jnp.int32)
        m = block(blk, mblk, q_rows) & (q_rows < Q)[:, None]
        cnt = m.sum(dtype=jnp.int32)
        (flat,) = jnp.nonzero(m.reshape(-1), size=tile_cap, fill_value=-1)
        rows, ok = pack(flat, start)
        dst = jnp.where(ok, off + jnp.arange(tile_cap, dtype=jnp.int32), cap)
        out = out.at[dst].set(rows, mode="drop")
        return (
            out,
            total + cnt,
            jnp.minimum(off + jnp.minimum(cnt, tile_cap), cap),
        )

    out0 = jnp.full((cap, 2), -1, jnp.int32)
    z = jnp.asarray(0, jnp.int32)
    out, total, _ = jax.lax.fori_loop(0, n_tiles, body, (out0, z, z))
    return out, total


def append_pairs(out, count, cap, extra_pairs, extra_count):
    """Append a packed (capX,2) pair list at the running offset of `out`
    ((cap,2), -1-padded, `count` true pairs so far). Writes past cap drop;
    the summed count still records the overflow for the regrow protocol."""
    ok = extra_pairs[:, 0] >= 0
    base = jnp.minimum(count, cap)
    dst = jnp.where(
        ok, base + jnp.arange(extra_pairs.shape[0], dtype=jnp.int32), cap
    )
    out = out.at[dst].set(extra_pairs, mode="drop")
    return out, count + extra_count


def _q_excl(valid_fn, big_mask):
    """Drop rows whose QUERY prim is oversized (covered by dense_pairs;
    as grid queries their 8-corner walk would miss interior cells)."""
    def valid(q_rows, t_ids, extra):
        return valid_fn(q_rows, t_ids, extra) & ~big_mask[q_rows][:, None]

    return valid


def _ee_dense_valid(surf_edges, e_dbc, big_mask):
    """EE validity for the dense pass (t = big edges): small-q pairs are
    unique by construction (t is big, q is not); big-q pairs dedup by
    global order, exactly once per unordered pair across grid+dense."""
    def valid(q_rows, t_ids, extra):
        ev = surf_edges[q_rows]
        a, b = ev[:, 0][:, None], ev[:, 1][:, None]
        shared = (
            (a == extra[..., 0]) | (a == extra[..., 1])
            | (b == extra[..., 0]) | (b == extra[..., 1])
        )
        both_dbc = e_dbc[q_rows][:, None] & (extra[..., 2] > 0)
        ordered = (~big_mask[q_rows][:, None]) | (q_rows[:, None] < t_ids)
        return ordered & ~shared & ~both_dbc

    return valid


def _te_dense_valid(surf_tris, dbc_mask, tri_big_mask, t_dbc=None):
    """Triangle-as-query vs big-edge-as-target validity (the swapped ET
    dense pass); big tris excluded (already covered by the edgesxbig-tris
    pass)."""
    if t_dbc is None:
        t_dbc = (
            jnp.zeros(surf_tris.shape[0], bool)
            if dbc_mask is None
            else jnp.all(dbc_mask[surf_tris], axis=1)
        )

    def valid(q_rows, t_ids, extra):
        tv = surf_tris[q_rows]  # (Q,3)
        shared = jnp.zeros((), bool)
        for i in range(3):
            c = tv[:, i][:, None]
            shared = shared | (c == extra[..., 0]) | (c == extra[..., 1])
        both_dbc = t_dbc[q_rows][:, None] & (extra[..., 2] > 0)
        ok = ~shared & ~both_dbc
        if tri_big_mask is not None:
            ok = ok & ~tri_big_mask[q_rows][:, None]
        return ok

    return valid


# ---------------------------------------------------------------------------
# candidate generators (same contract as contact/broadphase.py)
# ---------------------------------------------------------------------------


def _tri_extra(surf_tris, dbc_mask, t_dbc=None):
    """(S,4) payload columns for a triangle grid: 3 vert ids + all-DBC
    (a zero column when no DBC mask applies)."""
    if t_dbc is None:
        t_dbc = (
            jnp.zeros(surf_tris.shape[0], jnp.int32)
            if dbc_mask is None
            else jnp.all(dbc_mask[surf_tris], axis=1).astype(jnp.int32)
        )
    return jnp.concatenate(
        [surf_tris.astype(jnp.int32), t_dbc.astype(jnp.int32)[:, None]], axis=1
    )


def _edge_extra(surf_edges, dbc_mask, e_dbc=None):
    """(E,3) payload columns for an edge grid: 2 vert ids + all-DBC."""
    if e_dbc is None:
        e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)
    return jnp.concatenate(
        [surf_edges.astype(jnp.int32), e_dbc.astype(jnp.int32)[:, None]], axis=1
    )


def _pt_valid(surf_verts, dbc_mask, v_dbc=None):
    """surf_verts/v_dbc are the QUERY-side arrays aligned to q_boxes rows —
    the full lists single-chip, the local shard inside the shard_map path
    (where v_dbc must be pre-gathered because dbc_mask is vertex-sharded)."""
    if v_dbc is None:
        v_dbc = dbc_mask[surf_verts]

    def valid(q_rows, t_ids, extra):
        vid = surf_verts[q_rows][:, None]  # (Q,1)
        in_tri = (
            (vid == extra[..., 0]) | (vid == extra[..., 1]) | (vid == extra[..., 2])
        )
        all_dbc = v_dbc[q_rows][:, None] & (extra[..., 3] > 0)
        return ~in_tri & ~all_dbc

    return valid


def _ee_valid(surf_edges, dbc_mask, e_dbc=None, q_off=0):
    """q_off: global row id of local query row 0 — the upper-triangle pair
    dedup (q < t) compares GLOBAL edge indices (t_ids from the merged
    table are always global)."""
    if e_dbc is None:
        e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)

    def valid(q_rows, t_ids, extra):
        upper = (q_off + q_rows)[:, None] < t_ids
        ev = surf_edges[q_rows]  # (Q,2)
        a, b = ev[:, 0][:, None], ev[:, 1][:, None]
        shared = (
            (a == extra[..., 0]) | (a == extra[..., 1])
            | (b == extra[..., 0]) | (b == extra[..., 1])
        )
        both_dbc = e_dbc[q_rows][:, None] & (extra[..., 2] > 0)
        return upper & ~shared & ~both_dbc

    return valid


def _et_valid(surf_edges, dbc_mask, e_dbc=None):
    if e_dbc is None and dbc_mask is not None:
        e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)

    def valid(q_rows, t_ids, extra):
        ev = surf_edges[q_rows]
        a, b = ev[:, 0][:, None], ev[:, 1][:, None]
        shared = (
            (a == extra[..., 0]) | (a == extra[..., 1]) | (a == extra[..., 2])
            | (b == extra[..., 0]) | (b == extra[..., 1]) | (b == extra[..., 2])
        )
        ok = ~shared
        if e_dbc is not None:
            ok = ok & ~(e_dbc[q_rows][:, None] & (extra[..., 3] > 0))
        return ok

    return valid


def pt_candidates(x, surf_verts, surf_tris, dbc_mask, cap, disp=None, gap=0.0,
                  H=None, K=32):
    nS = surf_tris.shape[0]
    H = H or _default_H(nS)
    vb = BP.vert_aabbs(x, surf_verts, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    vm = prim_motion(x, surf_verts, disp)
    tm = prim_motion(x, surf_tris, disp)
    geom = grid_geometry(vb, tb)
    grid = build_grid(tb, H, K, geom=geom, extra=_tri_extra(surf_tris, dbc_mask),
                      motion=tm)
    return query_pairs(grid, vb, _pt_valid(surf_verts, dbc_mask), cap,
                       q_motion=vm, gap=gap)


def ee_candidates(x, surf_edges, dbc_mask, cap, disp=None, gap=0.0, H=None, K=32):
    nE = surf_edges.shape[0]
    H = H or _default_H(nE)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    em = prim_motion(x, surf_edges, disp)
    grid = build_grid(eb, H, K, extra=_edge_extra(surf_edges, dbc_mask), motion=em)
    return query_pairs(grid, eb, _ee_valid(surf_edges, dbc_mask), cap,
                       q_motion=em, gap=gap)


def _dense_et(et_pairs, et_count, cap_et, eb, em, tb, tm, surf_edges,
              surf_tris, dbc_mask, big, t_extra, e_extra, gap):
    """The two dense ET passes (all edges x big tris; non-big tris x big
    edges, swapped) appended to the grid ET output. Complete and disjoint:
    grid covers small x small, pass 1 covers * x big-tri, pass 2 covers
    big-edge x small-tri."""
    bt_ids, bt_mask = big.get("tri_ids"), big.get("tri_mask")
    be_ids = big.get("edge_ids")
    if bt_ids is not None:
        d_pairs, d_cnt = dense_pairs(
            eb, em, bt_ids, tb[bt_ids], _gather_motion(tm, bt_ids),
            _et_valid(surf_edges, dbc_mask), t_extra[bt_ids], cap_et, gap=gap,
        )
        et_pairs, et_count = append_pairs(et_pairs, et_count, cap_et,
                                          d_pairs, d_cnt)
    if be_ids is not None:
        d_pairs, d_cnt = dense_pairs(
            tb, tm, be_ids, eb[be_ids], _gather_motion(em, be_ids),
            _te_dense_valid(surf_tris, dbc_mask, bt_mask),
            e_extra[be_ids], cap_et, gap=gap, swap=True,
        )
        et_pairs, et_count = append_pairs(et_pairs, et_count, cap_et,
                                          d_pairs, d_cnt)
    return et_pairs, et_count


def et_candidates(x, surf_edges, surf_tris, cap, disp=None, gap=0.0,
                  dbc_mask=None, H=None, K=32, big=None):
    nS = surf_tris.shape[0]
    H = H or _default_H(nS)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    em = prim_motion(x, surf_edges, disp)
    tm = prim_motion(x, surf_tris, disp)
    t_extra = _tri_extra(surf_tris, dbc_mask)
    bt_mask = big.get("tri_mask") if big else None
    be_mask = big.get("edge_mask") if big else None
    geom = grid_geometry(eb, tb, excludes=(be_mask, bt_mask))
    grid = build_grid(tb, H, K, geom=geom, extra=t_extra, motion=tm,
                      exclude=bt_mask)
    valid = _et_valid(surf_edges, dbc_mask)
    if be_mask is not None:
        valid = _q_excl(valid, be_mask)
    pairs, count, ov = query_pairs(grid, eb, valid, cap, q_motion=em, gap=gap)
    if big:
        e_extra = _edge_extra(surf_edges, dbc_mask)
        pairs, count = _dense_et(pairs, count, cap, eb, em, tb, tm,
                                 surf_edges, surf_tris, dbc_mask, big,
                                 t_extra, e_extra, gap)
    return pairs, count, ov


def fused_candidates(x, surf_verts, surf_edges, surf_tris, dbc_mask,
                     cap_pt, cap_ee, cap_et, disp=None, gap=0.0, K=32,
                     with_et=True, big=None):
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
    # relative-motion filter inputs: raw boxes + mean displacement +
    # deviation per primitive (see _query_block docstring); always on, so
    # the dense/grid/SPMD paths emit identical candidate sets
    vm = prim_motion(x, surf_verts, disp)
    em = prim_motion(x, surf_edges, disp)
    tm = prim_motion(x, surf_tris, disp)
    # one shared geometry: vert/edge boxes are contained in the tri boxes'
    # extent (every surface vert/edge belongs to a triangle), but include
    # them anyway so packed cell coords are provably non-negative.
    # Oversized prims (big) are excluded from the geometry, the tables, and
    # the query rows; dense_pairs sweeps them below.
    bt_mask = big.get("tri_mask") if big else None
    be_mask = big.get("edge_mask") if big else None
    t_extra = _tri_extra(surf_tris, dbc_mask)
    e_extra = _edge_extra(surf_edges, dbc_mask)
    tgeom = grid_geometry(vb, eb, tb, excludes=(None, be_mask, bt_mask))
    tri_grid = build_grid(tb, _default_H(nS), K, geom=tgeom,
                          extra=t_extra, motion=tm, exclude=bt_mask)
    edge_grid = build_grid(eb, _default_H(nE), K, geom=tgeom,
                           extra=e_extra, motion=em, exclude=be_mask)
    ee_valid = _ee_valid(surf_edges, dbc_mask)
    et_valid = _et_valid(surf_edges, dbc_mask)
    if be_mask is not None:
        ee_valid = _q_excl(ee_valid, be_mask)
        et_valid = _q_excl(et_valid, be_mask)
    pt_pairs, pt_count, ov1 = query_pairs(
        tri_grid, vb, _pt_valid(surf_verts, dbc_mask), cap_pt,
        q_motion=vm, gap=gap,
    )
    ee_pairs, ee_count, ov2 = query_pairs(
        edge_grid, eb, ee_valid, cap_ee,
        q_motion=em, gap=gap,
    )
    if with_et:
        et_pairs, et_count, _ = query_pairs(
            tri_grid, eb, et_valid, cap_et,
            q_motion=em, gap=gap,
        )
    else:
        et_pairs = jnp.full((cap_et, 2), -1, jnp.int32)
        et_count = jnp.asarray(0, jnp.int32)
    if big:
        bt_ids = big.get("tri_ids")
        be_ids = big.get("edge_ids")
        if bt_ids is not None:
            d_pairs, d_cnt = dense_pairs(
                vb, vm, bt_ids, tb[bt_ids], _gather_motion(tm, bt_ids),
                _pt_valid(surf_verts, dbc_mask), t_extra[bt_ids],
                cap_pt, gap=gap,
            )
            pt_pairs, pt_count = append_pairs(pt_pairs, pt_count, cap_pt,
                                              d_pairs, d_cnt)
        if be_ids is not None:
            e_dbc = (
                jnp.zeros(surf_edges.shape[0], bool) if dbc_mask is None
                else jnp.all(dbc_mask[surf_edges], axis=1)
            )
            d_pairs, d_cnt = dense_pairs(
                eb, em, be_ids, eb[be_ids], _gather_motion(em, be_ids),
                _ee_dense_valid(surf_edges, e_dbc, be_mask),
                e_extra[be_ids], cap_ee, gap=gap,
            )
            ee_pairs, ee_count = append_pairs(ee_pairs, ee_count, cap_ee,
                                              d_pairs, d_cnt)
        if with_et:
            et_pairs, et_count = _dense_et(
                et_pairs, et_count, cap_et, eb, em, tb, tm,
                surf_edges, surf_tris, dbc_mask, big, t_extra, e_extra, gap,
            )
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


# ---------------------------------------------------------------------------
# SPMD broad phase: shard the build AND the query transients over devices
# ---------------------------------------------------------------------------


def fused_candidates_spmd(device_mesh, axis, x, surf_verts, surf_edges,
                          surf_tris, dbc_mask, cap_pt, cap_ee, cap_et,
                          disp=None, gap=0.0, K=32, with_et=True):
    """`fused_candidates` under `shard_map`: every broad-phase transient —
    AABB lists, the build's (N,8) registration sort, the query tiles'
    (B, 8K) expansions, and the emitted candidate tensors — lives 1/n per
    device (SURVEY §2.3(b), §5 "chunked pairwise interaction sweeps over
    sharded surface primitives"; the reference's analog is TBB threads
    over dynamic per-voxel lists, src/Utils/SpatialHash.hpp:46-201).

    Decomposition (distributed table, ring query — round 5; the round-4
    design all-gathered the per-shard tables into an (H+1, n*K) merged
    table on EVERY device, so the dominant broad-phase transient did not
    shrink with n — the round-4 review's 1.06x temp finding):
      * each device builds a bucket table over ITS shard of the target
        primitives (same hash space H, same grid geometry via pmin/pmax);
        table entries index the LOCAL payload, which travels with it;
      * n ring rounds: every device queries ITS query-prim shard against
        the currently-visiting (table, payload) shard — emitted t ids are
        globalized by the visiting shard's row offset (t_off) — then
        ppermutes the shard to the next device. After n rounds each
        device has tested its queries against every target exactly once;
      * per-round hits append into the device's (cap/n, 2) output
        (append_pairs running offset).
    Per-device transients are now O(table/n + payload/n + query tile +
    cap/n) — nothing holds the whole table or payload.

    K is the PER-SHARD bucket capacity here, and the overflow channel
    reports per-shard occupancy — the pipeline's grid_K regrow protocol
    adapts to the sharded load unchanged. Counts are reported as
    max(global true count, n * max per-shard count) so cap regrowth sized
    from them always yields per-shard capacity >= the fullest shard.

    Leading dims of all primitive arrays must divide the axis size
    (parallel.sharding.shard_mesh_data pads with inert sentinels)."""
    from jax import shard_map

    n = int(device_mesh.shape[axis])
    P = jax.sharding.PartitionSpec

    nS = int(surf_tris.shape[0])
    nE = int(surf_edges.shape[0])
    nV = int(surf_verts.shape[0])
    H_tri = _default_H(nS)
    H_edge = _default_H(nE)
    cap_pt_loc = -(-int(cap_pt) // n)
    cap_ee_loc = -(-int(cap_ee) // n)
    cap_et_loc = -(-int(cap_et) // n)

    # boxes + DBC columns OUTSIDE the shard_map region: they gather from
    # vertex-sharded arrays (x, disp, dbc_mask), which the auto-partitioner
    # handles; the results are primitive-aligned and shard cleanly
    vb = BP.vert_aabbs(x, surf_verts, disp, gap)
    eb = BP.edge_aabbs(x, surf_edges, disp, gap)
    tb = BP.tri_aabbs(x, surf_tris, disp, gap)
    v_dbc = dbc_mask[surf_verts]
    e_dbc = jnp.all(dbc_mask[surf_edges], axis=1)
    t_dbc = jnp.all(dbc_mask[surf_tris], axis=1)
    # relative-motion filter columns (see _query_block docstring); always
    # on, matching fused_candidates / the dense path exactly
    vm = prim_motion(x, surf_verts, disp)
    em = prim_motion(x, surf_edges, disp)
    tm = prim_motion(x, surf_tris, disp)

    def body(vb, eb, tb, sv, v_dbc, se, e_dbc, st, t_dbc, vm, em, tm):
        me = jax.lax.axis_index(axis)
        E_loc = se.shape[0]
        V_loc = sv.shape[0]
        S_loc = st.shape[0]

        # shared grid geometry (grid_geometry semantics under collectives)
        ext_loc = jnp.maximum(
            jnp.asarray(0.0, vb.dtype),
            jnp.stack([(b[:, 1] - b[:, 0]).max() for b in (vb, eb, tb)]).max(),
        )
        ext = jax.lax.pmax(ext_loc, axis)
        cell = jnp.maximum(ext, 1e-30) * 1.001
        origin_loc = jnp.stack([b[:, 0].min(axis=0) for b in (vb, eb, tb)]).min(axis=0)
        origin = jax.lax.pmin(origin_loc, axis)
        geom = (origin, cell)

        tri_g = build_grid(tb, H_tri, K, geom=geom,
                           extra=_tri_extra(st, None, t_dbc), motion=tm)
        edge_g = build_grid(eb, H_edge, K, geom=geom,
                            extra=_edge_extra(se, None, e_dbc), motion=em)
        build_ov = jax.lax.pmax(
            jnp.maximum(tri_g.overflow, edge_g.overflow), axis
        )

        perm = [(i, (i + 1) % n) for i in range(n)]
        pt_valid_fn = _pt_valid(sv, None, v_dbc=v_dbc)
        ee_valid_fn = _ee_valid(se, None, e_dbc=e_dbc, q_off=me * E_loc)
        et_valid_fn = _et_valid(se, None, e_dbc=e_dbc)

        def round_body(r, c):
            (t_tab, t_pay, e_tab, e_pay,
             pt_pairs, pt_c, ee_pairs, ee_c, et_pairs, et_c, ov) = c
            # owner of the visiting shard: tables rotate forward, so after
            # r hops device `me` holds the shard built by (me - r) mod n
            src = (me - r) % n
            tri_grid = HashGrid(t_tab, t_pay, origin, cell, H_tri, K, 0)
            edge_grid = HashGrid(e_tab, e_pay, origin, cell, H_edge, K, 0)
            p, cnt, o1 = query_pairs(
                tri_grid, vb, pt_valid_fn, cap_pt_loc,
                q_row0=me * V_loc, q_motion=vm, gap=gap, t_off=src * S_loc,
            )
            pt_pairs, pt_c = append_pairs(pt_pairs, pt_c, cap_pt_loc, p, cnt)
            p, cnt, o2 = query_pairs(
                edge_grid, eb, ee_valid_fn, cap_ee_loc,
                q_row0=me * E_loc, q_motion=em, gap=gap, t_off=src * E_loc,
            )
            ee_pairs, ee_c = append_pairs(ee_pairs, ee_c, cap_ee_loc, p, cnt)
            if with_et:
                p, cnt, o3 = query_pairs(
                    tri_grid, eb, et_valid_fn, cap_et_loc,
                    q_row0=me * E_loc, q_motion=em, gap=gap,
                    t_off=src * S_loc,
                )
                et_pairs, et_c = append_pairs(
                    et_pairs, et_c, cap_et_loc, p, cnt
                )
            else:
                o3 = jnp.asarray(0, jnp.int32)
            ov = jnp.maximum(ov, jnp.maximum(o1, jnp.maximum(o2, o3)))
            t_tab = jax.lax.ppermute(t_tab, axis, perm)
            t_pay = jax.lax.ppermute(t_pay, axis, perm)
            e_tab = jax.lax.ppermute(e_tab, axis, perm)
            e_pay = jax.lax.ppermute(e_pay, axis, perm)
            return (t_tab, t_pay, e_tab, e_pay,
                    pt_pairs, pt_c, ee_pairs, ee_c, et_pairs, et_c, ov)

        init = (
            tri_g.table, tri_g.payload, edge_g.table, edge_g.payload,
            jnp.full((cap_pt_loc, 2), -1, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.full((cap_ee_loc, 2), -1, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.full((cap_et_loc, 2), -1, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
        )
        out = jax.lax.fori_loop(0, n, round_body, init)
        (_, _, _, _,
         pt_pairs, pt_c, ee_pairs, ee_c, et_pairs, et_c, q_ov) = out

        def counts(c_loc):
            return jnp.maximum(
                jax.lax.psum(c_loc, axis), n * jax.lax.pmax(c_loc, axis)
            )

        return (
            pt_pairs, counts(pt_c),
            ee_pairs, counts(ee_c),
            et_pairs, counts(et_c),
            jnp.maximum(build_ov, jax.lax.pmax(q_ov, axis)),
        )

    sharded = shard_map(
        body,
        mesh=device_mesh,
        in_specs=(
            P(axis, None, None), P(axis, None, None), P(axis, None, None),
            P(axis), P(axis), P(axis, None), P(axis), P(axis, None), P(axis),
            # motion triples: leading-axis prefix spec covers all 3 leaves
            P(axis), P(axis), P(axis),
        ),
        out_specs=(
            P(axis, None), P(), P(axis, None), P(), P(axis, None), P(), P(),
        ),
        check_vma=False,
    )
    pt_pairs, pt_count, ee_pairs, ee_count, et_pairs, et_count, ov = sharded(
        vb, eb, tb,
        surf_verts, v_dbc, surf_edges, e_dbc, surf_tris, t_dbc,
        vm, em, tm,
    )
    return dict(
        pt=(pt_pairs, pt_count),
        ee=(ee_pairs, ee_count),
        et=(et_pairs, et_count),
        overflow=ov,
    )
