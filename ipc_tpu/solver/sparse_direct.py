"""Sparse direct Newton solve — the CHOLMOD-class escape hatch.

The reference's recommended production solver is CHOLMOD behind its
LinSysSolver abstraction (reference src/LinSysSolver/CHOLMODSolver.*,
selected in README; Eigen SimplicialLLT as fallback). The TPU production
path is the matrix-free PCG (solver/pcg.py), but SURVEY §7.1 budgets a
CPU sparse-direct escape hatch for f64 debugging parity at scales where
the dense path's O(9V^2) memory (solver/direct.py) is absurd.

This module assembles a scipy CSC matrix from the same per-family block
lists the matrix-free operator multiplies with and factorizes it with
SuperLU (scipy.sparse.linalg.splu — the environment has no CHOLMOD/
scikit-sparse; SuperLU plays the same exact-solve role on an SPD system).
The solve runs on the HOST via `jax.pure_callback` so the jitted Newton
loop can call it transparently: this is a debugging/parity path — host
round-trips are the accepted cost (SimParams.linsys="sparse").

Memory/time: O(nnz) assembly; factorization fill-in is the usual sparse
Cholesky story (~100k-tet meshes factor in seconds on CPU).
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["sparse_solve_host", "make_sparse_solver"]


def _coo_from_families(n_verts, mass, families, dbc_mask):
    """COO triplets of the (3V,3V) Newton matrix.

    families: list of (vids (N,k) int, H (N,3k,3k)) numpy arrays; DBC
    rows/cols are projected to identity (reference LinSysSolver.hpp
    setUnit_row/col semantics), realized here by dropping any triplet
    touching a DBC vertex and adding 1.0 on DBC diagonal entries.
    """
    rows, cols, vals = [], [], []
    free = ~dbc_mask

    # lumped mass diagonal on free vertices
    vidx = np.arange(n_verts)
    for c in range(3):
        d = 3 * vidx + c
        rows.append(d[free])
        cols.append(d[free])
        vals.append(mass[free])

    for vids, H in families:
        N, k = vids.shape
        if N == 0:
            continue
        Hb = H.reshape(N, k, 3, k, 3)
        # (N,k,k) pair grid of 3x3 blocks
        ri = (3 * vids[:, :, None, None, None] + np.arange(3)[None, None, None, :, None])
        ci = (3 * vids[:, None, :, None, None] + np.arange(3)[None, None, None, None, :])
        ri = np.broadcast_to(ri, (N, k, k, 3, 3))
        ci = np.broadcast_to(ci, (N, k, k, 3, 3))
        vv = Hb.transpose(0, 1, 3, 2, 4)  # (N,k,k,3,3)
        keep = free[vids]  # (N,k)
        km = keep[:, :, None, None, None] & keep[:, None, :, None, None]
        km = np.broadcast_to(km, ri.shape)
        rows.append(ri[km])
        cols.append(ci[km])
        vals.append(vv[km])

    # identity on DBC diagonal
    if dbc_mask.any():
        d = (3 * vidx[dbc_mask][:, None] + np.arange(3)[None, :]).reshape(-1)
        rows.append(d)
        cols.append(d)
        vals.append(np.ones(d.shape[0], mass.dtype))

    return (
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate([np.asarray(v, np.float64).reshape(-1) for v in vals]),
    )


def sparse_solve_host(n_verts, mass, families, dbc_mask, rhs):
    """Host-side exact solve A dx = rhs (all numpy; f64 factorization)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    r, c, v = _coo_from_families(
        n_verts, np.asarray(mass, np.float64), families, np.asarray(dbc_mask, bool)
    )
    A = sp.coo_matrix((v, (r, c)), shape=(3 * n_verts, 3 * n_verts)).tocsc()
    lu = spla.splu(A)
    dx = lu.solve(np.asarray(rhs, np.float64).reshape(-1))
    return dx.reshape(n_verts, 3)


def make_sparse_solver(n_verts, dtype):
    """Jit-compatible wrapper: (mass, dbc_mask, rhs, families) -> dx via a
    host callback. `families` is a list of (vids, H) jax arrays whose
    shapes are fixed per trace (padded rows carry zero blocks, which add
    exact zeros to the matrix)."""

    def solve(mass, dbc_mask, rhs, families):
        flat = []
        for vids, H in families:
            flat.extend([vids, H])

        def host_fn(mass_np, dbc_np, rhs_np, *flat_np):
            fams = [
                (np.asarray(flat_np[2 * i]), np.asarray(flat_np[2 * i + 1], np.float64))
                for i in range(len(flat_np) // 2)
            ]
            out = sparse_solve_host(n_verts, mass_np, fams, dbc_np, rhs_np)
            return out.astype(np.dtype(dtype))

        return jax.pure_callback(
            host_fn,
            jax.ShapeDtypeStruct((n_verts, 3), dtype),
            mass, dbc_mask, rhs, *flat,
        )

    return solve
