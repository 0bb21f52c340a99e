"""Two-level aggregation preconditioner for the matrix-free Newton solve.

TPU-native analog of the reference's AMG option (reference:
src/LinSysSolver/AMGCLSolver.cpp:24-47 — smoothed-aggregation AMG +
Chebyshev relaxation inside CG). Block-Jacobi alone leaves the low-frequency
elastic modes to CG, which costs O(100) iterations per Newton solve on stiff
meshes; one piecewise-constant coarse space removes exactly those modes:

  M^-1 = J^-1 + P A_c^-1 P^T            (additive two-level Schwarz)

* P is the piecewise-constant prolongator over vertex AGGREGATES built once
  per scene on the host: vertices are sorted along a Morton (z-order) curve
  of their rest positions and chunked into spatially-compact groups, so
  restriction/prolongation are a segment-sum / gather — no sparse matrices.
* A_c = P^T A P (exact Galerkin product of the same SPD per-element /
  per-pair blocks the operator multiplies with, with DBC rows masked out)
  is a small dense (3C,3C) SPD matrix, assembled once per Newton iteration
  and explicitly inverted; each PCG application is then one segment-sum,
  one dense matvec, one gather.

Assembly cost notes (v5e-measured): slicing each (12,12) block 16 ways and
issuing 16 scatter-adds dominated the whole Newton iteration. Instead the
16 corner-pair 3x3 blocks come from ONE transpose, the static tet family is
summed with a precomputed sort + cumsum segment-sum (fp error lands in a
PRECONDITIONER — harmless), and each dynamic family (contact/friction
pairs) issues ONE scatter-add over flattened (cell_i*C + cell_j) ids.

Both terms are SPD, so CG theory applies unchanged.
"""

import numpy as np

import jax.numpy as jnp

__all__ = ["build_aggregates", "make_coarse_assembler"]


def _morton3(q):
    """Interleave 10 bits per axis -> 30-bit z-order code. q: (V,3) uint32."""
    def spread(x):
        x = x.astype(np.uint64) & 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def build_aggregates(x_rest, size=32, max_coarse=1024):
    """(V,) int32 aggregate ids + aggregate count C.

    Morton-sort rest positions, chunk `size` consecutive vertices per
    aggregate (spatially compact, always balanced). C is capped so the
    dense coarse factorization stays negligible at any mesh scale."""
    X = np.asarray(x_rest, np.float64)
    V = X.shape[0]
    size = max(size, int(np.ceil(V / max_coarse)))
    ext = np.maximum(X.max(axis=0) - X.min(axis=0), 1e-30).max()
    q = np.floor((X - X.min(axis=0)) / ext * 1023.0).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable")
    agg = np.empty(V, np.int32)
    agg[order] = (np.arange(V) // size).astype(np.int32)
    C = int(agg.max()) + 1
    return agg, C


def _corner_pair_blocks(H, k, free_rows):
    """(N,3k,3k) -> (N*k*k, 3, 3) corner-pair blocks via one transpose,
    with DBC rows/cols zeroed (free_rows: (N,k))."""
    N = H.shape[0]
    Hk = H.reshape(N, k, 3, k, 3).transpose(0, 1, 3, 2, 4)  # (N,k,k,3,3)
    Hk = Hk * free_rows[:, :, None, None, None] * free_rows[:, None, :, None, None]
    return Hk.reshape(N * k * k, 3, 3)


def make_coarse_assembler(agg, C, dbc_mask, dtype, tets=None):
    """Returns (assemble, precond_term).

    assemble(mass, contributions, tet_H=None) -> (3C,3C) inverse of the
    Galerkin coarse matrix; `contributions` is a list of (vids (N,k),
    H (N,3k,3k)) DYNAMIC block families (contact pairs k=4, surface-vertex
    blocks k=1); `tet_H` is the (T,12,12) per-tet family matching the
    `tets` passed at construction (static topology -> sort+cumsum path).
    precond_term(Ainv, r) -> P A_c^-1 P^T r  (the coarse correction).
    """
    agg_np = np.asarray(agg)
    dbc_np = np.asarray(dbc_mask)
    agg = jnp.asarray(agg_np, jnp.int32)
    free = (~dbc_mask).astype(dtype)

    if tets is not None:
        tets_np = np.asarray(tets)
        ca = agg_np[tets_np]  # (T,4)
        ids = (ca[:, :, None] * C + ca[:, None, :]).reshape(-1)  # (T*16,)
        perm = np.argsort(ids, kind="stable")
        counts = np.bincount(ids, minlength=C * C)
        ends = np.cumsum(counts)
        starts = ends - counts
        tet_free = jnp.asarray((~dbc_np[tets_np]).astype(np.float32), dtype)
        perm_j = jnp.asarray(perm.astype(np.int32))
        ends_j = jnp.asarray(ends.astype(np.int32))
        starts_j = jnp.asarray(starts.astype(np.int32))
        tet_cells = jnp.asarray(ids.astype(np.int32))

        def tet_coarse(tet_H):
            from ipc_tpu.parallel.spmd import active_mesh

            if active_mesh() is not None:
                # SPMD: the sort+cumsum segment-sum permutes a GLOBAL
                # (16T, 9) buffer with a static data-dependent permutation
                # — the partitioner can only replicate + all-reduce it
                # (measured as THE dominant per-device transient: 4 live
                # global-size copies, the round-4 1.06x temp finding).
                # A scatter-add keeps rows sharded by tet and psums only
                # the (C*C, 3, 3) coarse output.
                rows = _corner_pair_blocks(tet_H, 4, tet_free)
                return (
                    jnp.zeros((C * C, 3, 3), dtype)
                    .at[tet_cells]
                    .add(rows)
                    .reshape(C, C, 3, 3)
                )
            rows = _corner_pair_blocks(tet_H, 4, tet_free).reshape(-1, 9)
            rows = rows[perm_j]
            csum = jnp.concatenate(
                [jnp.zeros((1, 9), dtype), jnp.cumsum(rows, axis=0)], axis=0
            )
            return (csum[ends_j] - csum[starts_j]).reshape(C, C, 3, 3)
    else:
        tet_coarse = None

    def assemble(mass, contributions, tet_H=None, scalar_contribs=()):
        A = jnp.zeros((C * C, 3, 3), dtype)
        # lumped mass on the diagonal (free vertices only)
        m_c = jnp.zeros((C,), dtype).at[agg].add(mass * free)
        diag_cells = jnp.arange(C, dtype=jnp.int32) * (C + 1)
        A = A.at[diag_cells].add(
            m_c[:, None, None] * jnp.eye(3, dtype=dtype)[None]
        )
        for vids, H in contributions:
            k = vids.shape[1]
            f = free[vids]  # (N,k) — DBC rows/cols are identity in the
            # fine operator and excluded from the coarse space
            rows = _corner_pair_blocks(H, k, f)
            ca_d = agg[vids]  # (N,k)
            cells = (ca_d[:, :, None] * C + ca_d[:, None, :]).reshape(-1)
            A = A.at[cells].add(rows)
        # scalar-weight families (contact/friction pairs): each 3x3 corner-
        # pair block enters as (trace/3) * I — a 9x smaller scatter. This is
        # a preconditioner-quality tradeoff only: it keeps the (huge) barrier
        # stiffness visible to the coarse grid (dropping it doubles PCG
        # iterations in contact-rich scenes) at ~1/9 the assembly cost that
        # dominated the Newton iteration at 100K tets.
        As = jnp.zeros((C * C,), dtype)
        for vids, H in scalar_contribs:
            k = vids.shape[1]
            f = free[vids]
            N = H.shape[0]
            Hk = H.reshape(N, k, 3, k, 3)
            tr = (Hk[:, :, 0, :, 0] + Hk[:, :, 1, :, 1] + Hk[:, :, 2, :, 2]) / 3.0
            tr = tr * f[:, :, None] * f[:, None, :]
            ca_d = agg[vids]
            cells = (ca_d[:, :, None] * C + ca_d[:, None, :]).reshape(-1)
            As = As.at[cells].add(tr.reshape(-1))
        A = A + As[:, None, None] * jnp.eye(3, dtype=dtype)[None]
        A = A.reshape(C, C, 3, 3)
        if tet_coarse is not None and tet_H is not None:
            A = A + tet_coarse(tet_H)
        Ad = A.transpose(0, 2, 1, 3).reshape(3 * C, 3 * C)
        # symmetrize (the cumsum path commits fp rounding) + tiny
        # trace-scaled regularization: keeps empty/all-DBC aggregates
        # invertible without perturbing the correction meaningfully
        Ad = 0.5 * (Ad + Ad.T)
        tr = jnp.trace(Ad) / (3 * C)
        Ad = Ad + (1e-8 * tr + 1e-30) * jnp.eye(3 * C, dtype=dtype)
        return jnp.linalg.inv(Ad)

    def precond_term(Ainv, r):
        rc = jnp.zeros((C, 3), dtype).at[agg].add(r * free[:, None])
        zc = jnp.matmul(Ainv, rc.reshape(-1)).reshape(C, 3)
        return zc[agg] * free[:, None]

    return assemble, precond_term
