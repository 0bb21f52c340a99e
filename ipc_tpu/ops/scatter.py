"""Static-topology scatter-add as a precomputed gather-sum.

XLA lowers `out.at[ids].add(vals)` to a serialized scatter (~15-30 cycles
per row on TPU) even when `ids` is a compile-time constant. For the mesh's
fixed tet topology — the Hv product, the gradient assembly, and the
block-diagonal extraction all scatter per-corner rows into vertices EVERY
PCG iteration — we instead precompute, per vertex, the list of (tet,corner)
rows that touch it, and sum them with one static gather + a dense axis
reduction. Exact same arithmetic values and a fixed summation order
(deterministic), at VPU gather/add speed.

Under an active SPMD mesh the gather table would expand sharded rows, so
that branch falls back to `out.at[ids].add(vals)`: still run-to-run
deterministic, but its float reduction order differs from the single-chip
gather-sum (bitwise results can differ across chip counts).

The reference's analog is its CSR outer-index precomputation
(reference: src/LinSysSolver/LinSysSolver.hpp:331-449 builds the sparse
pattern once and TBB-reduces into it); this is the fixed-shape TPU version.
"""

import numpy as np

import jax.numpy as jnp

__all__ = ["make_gather_sum"]


def make_gather_sum(ids, n_out):
    """ids: (N,) int numpy array of output rows (static). Returns
    `apply(vals)` mapping (N, ...) -> (n_out, ...) with
    apply(vals)[k] = sum over {i : ids[i] == k} of vals[i].

    Internally an (n_out, D) row table padded with N (an appended zero
    row), D = max multiplicity. Cost: one gather of n_out*D rows + a
    length-D tree sum — no serialized scatter anywhere."""
    ids = np.asarray(ids)
    N = int(ids.shape[0])
    # ids >= n_out are SINKS: their rows are dropped entirely (used by the
    # pallas Hv path to park block-padding rows without inflating any real
    # vertex's multiplicity)
    counts = np.bincount(ids[ids < n_out], minlength=n_out)
    D = max(1, int(counts.max()))
    table = np.full((n_out, D), N, np.int32)
    slot = np.zeros(n_out, np.int64)
    for i, k in enumerate(ids):
        if k < n_out:
            table[k, slot[k]] = i
            slot[k] += 1
    table_j = jnp.asarray(table)
    ids_j = jnp.asarray(np.where(ids < n_out, ids, n_out).astype(np.int32))

    def apply(vals):
        from ipc_tpu.parallel.spmd import active_mesh

        if active_mesh() is not None:
            # Under SPMD the (n_out, D, ...) gather table expands the
            # input D-fold and XLA all-reduces that expansion (55 MB/device
            # for the 96K-tet coarse assembly); the scatter-add form keeps
            # the input sharded — each device scatters ITS rows into a
            # local partial and the partitioner psums only the n_out-sized
            # output. Single-chip keeps the gather-sum (serialized scatter
            # is 15-30 cycles/row on TPU).
            out = jnp.zeros((n_out + 1,) + vals.shape[1:], vals.dtype)
            return out.at[ids_j].add(vals)[:n_out]
        pad = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
        ext = jnp.concatenate([vals, pad], axis=0)
        return ext[table_j].sum(axis=1)

    return apply
