"""Dense direct Newton solve — the debugging/parity escape hatch.

The reference ships three direct solvers behind its LinSysSolver abstraction
(CHOLMOD, Eigen SimplicialLLT, AMGCL; reference: src/LinSysSolver/). The
TPU production path is the matrix-free PCG (solver/pcg.py) — no global
matrix exists — but an EXACT solve is invaluable for debugging Newton
behavior and for small-scene parity runs, so this module assembles the full
dense (3V,3V) system from the same per-family blocks the operator
multiplies with and solves it with a Cholesky factorization on device.

Memory is O(9 V^2): fine below ~5K vertices, absurd beyond — callers gate
on size (SimParams.linsys="dense").
"""

import jax
import jax.numpy as jnp

__all__ = ["assemble_dense", "dense_solve"]

_HI = jax.lax.Precision.HIGHEST


def assemble_dense(n_verts, mass, contribs, dbc_mask):
    """(3V,3V) Newton matrix from block families.

    contribs: list of (vids (N,k), H (N,3k,3k)); mass adds the lumped
    diagonal; DBC rows/cols become identity (the reference's unit-row/col
    projection, LinSysSolver.hpp setUnit_row/col)."""
    V = n_verts
    A = jnp.zeros((V * V, 3, 3), mass.dtype)
    diag_cells = jnp.arange(V, dtype=jnp.int32) * (V + 1)
    A = A.at[diag_cells].add(
        mass[:, None, None] * jnp.eye(3, dtype=mass.dtype)[None]
    )
    for vids, H in contribs:
        k = vids.shape[1]
        N = H.shape[0]
        Hk = H.reshape(N, k, 3, k, 3).transpose(0, 1, 3, 2, 4)  # (N,k,k,3,3)
        cells = (vids[:, :, None] * V + vids[:, None, :]).reshape(-1)
        A = A.at[cells].add(Hk.reshape(-1, 3, 3))
    A = A.reshape(V, V, 3, 3)
    free = (~dbc_mask).astype(mass.dtype)
    A = A * free[:, None, None, None] * free[None, :, None, None]
    Ad = A.transpose(0, 2, 1, 3).reshape(3 * V, 3 * V)
    # identity on DBC rows/cols
    dbc3 = jnp.repeat(dbc_mask, 3)
    Ad = Ad + jnp.diag(dbc3.astype(mass.dtype))
    return Ad


def dense_solve(Ad, rhs):
    """Solve via Cholesky (the matrix is SPD by construction — every block
    family is SPD-projected). rhs: (V,3) -> dx (V,3)."""
    L = jnp.linalg.cholesky(Ad)
    y = jax.scipy.linalg.solve_triangular(L, rhs.reshape(-1), lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return x.reshape(rhs.shape)
