"""Rotation-consistent (flip-corrected) 3x3 SVD, batched for TPU.

Semantics follow the reference's AutoFlipSVD (reference:
src/Utils/AutoFlipSVD.hpp:19-120, backed by the JIXIE implicit-QR SVD in
src/Utils/SVD/ImplicitQRSVD.h): F = U diag(sigma) V^T with U, V PROPER
rotations (det = +1) and the sign of any reflection pushed into the LAST
singular value, so sigma[0] >= sigma[1] >= |sigma[2]| and sigma[2] < 0 iff
det(F) < 0. This is the form stretch-invariant elasticity energies need.

Two implementations:
  * `svd3_flip`   — wraps `jnp.linalg.svd` (LAPACK/XLA) + sign fix. Reference
                    quality; used in tests as ground truth.
  * `svd3_jacobi` — branch-free cyclic-Jacobi eigensolver on F^T F followed by
                    an orthonormalized U recovery. Pure jnp arithmetic, no
                    custom calls: vmaps/fuses well on the TPU VPU and is the
                    production path for per-tet kernels.
Both are safe at (near-)degenerate F: U, V are always orthonormal.
"""

import jax
import jax.numpy as jnp

__all__ = ["svd3_flip", "svd3_jacobi", "eigh3_jacobi"]

# TPU matmuls default to bf16 MXU passes; these 3x3 products are accuracy-
# critical (they feed distances, step bounds, and Newton assembly), so pin
# full-precision accumulation. Verified on-chip: without this the f32
# reconstruction error is ~2e-2, with it ~2e-6.
_HI = jax.lax.Precision.HIGHEST


def svd3_flip(F):
    """Flip-corrected SVD of a single 3x3 matrix via jnp.linalg.svd."""
    U, s, Vt = jnp.linalg.svd(F, full_matrices=True)
    V = Vt.T
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(V)
    # push reflections of U and V into the last column + last singular value
    U = U.at[:, 2].multiply(detU)
    V = V.at[:, 2].multiply(detV)
    s = s.at[2].multiply(detU * detV)
    return U, s, V


def _jacobi_rotation(app, aqq, apq):
    """Branch-free symmetric Jacobi rotation (c, s) for pivot (p, q)."""
    eps = jnp.asarray(1e-300 if app.dtype == jnp.float64 else 1e-37, app.dtype)
    pivot_ok = jnp.abs(apq) > eps
    tau = (aqq - app) / (2.0 * jnp.where(pivot_ok, apq, 1.0))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)  # tau==0 -> 45 degrees
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(pivot_ok, c, 1.0)
    s = jnp.where(pivot_ok, s, 0.0)
    return c, s


def _apply_jacobi(A, V, p, q):
    """One Jacobi rotation on symmetric A (pivot p<q), accumulating into V."""
    c, s = _jacobi_rotation(A[p, p], A[q, q], A[p, q])
    # G = I with G[p,p]=c, G[q,q]=c, G[p,q]=s, G[q,p]=-s ; A <- G^T A G
    rp = c * A[p, :] - s * A[q, :]
    rq = s * A[p, :] + c * A[q, :]
    A = A.at[p, :].set(rp).at[q, :].set(rq)
    cp = c * A[:, p] - s * A[:, q]
    cq = s * A[:, p] + c * A[:, q]
    A = A.at[:, p].set(cp).at[:, q].set(cq)
    vp = c * V[:, p] - s * V[:, q]
    vq = s * V[:, p] + c * V[:, q]
    V = V.at[:, p].set(vp).at[:, q].set(vq)
    return A, V


def eigh3_jacobi(A, sweeps: int = 6, sort: bool = True):
    """Eigendecomposition of a symmetric 3x3 via fixed-count cyclic Jacobi.

    Returns (eigvals, eigvecs) with eigvals sorted DESCENDING (unless
    sort=False — PSD clamping is order-invariant, and the sort is the
    expensive part when vmapped: a per-element dynamic gather) and eigvecs
    a proper rotation (det +1). Fixed iteration count keeps it
    jit/vmap-clean.
    """
    V = jnp.eye(3, dtype=A.dtype)
    for _ in range(sweeps):
        A, V = _apply_jacobi(A, V, 0, 1)
        A, V = _apply_jacobi(A, V, 0, 2)
        A, V = _apply_jacobi(A, V, 1, 2)
    w = jnp.diagonal(A)
    if not sort:
        return w, V

    # descending 3-sort as a branch-free compare-swap network on columns
    # (an argsort + fancy-index vmaps into a slow batched dynamic gather)
    def cswap(w, V, i, j):
        do = w[i] < w[j]
        wi, wj = jnp.where(do, w[j], w[i]), jnp.where(do, w[i], w[j])
        Vi = jnp.where(do, V[:, j], V[:, i])
        Vj = jnp.where(do, V[:, i], V[:, j])
        w = w.at[i].set(wi).at[j].set(wj)
        V = V.at[:, i].set(Vi).at[:, j].set(Vj)
        return w, V

    w, V = cswap(w, V, 0, 1)
    w, V = cswap(w, V, 0, 2)
    w, V = cswap(w, V, 1, 2)
    # keep V a proper rotation after the column permutation
    V = V.at[:, 2].multiply(jnp.linalg.det(V))
    return w, V


def _normalize_or(v, fallback):
    n2 = jnp.dot(v, v)
    eps = jnp.asarray(1e-300 if v.dtype == jnp.float64 else 1e-37, v.dtype)
    good = n2 > eps
    return jnp.where(good, v / jnp.sqrt(jnp.where(good, n2, 1.0)), fallback)


def svd3_jacobi(F, sweeps: int = 6):
    """Flip-corrected SVD of a single 3x3 via Jacobi on F^T F (vmap me).

    Degenerate-rank safe: U columns are re-orthonormalized with cross
    products, so U is always a proper rotation; the (possibly negative)
    sigma[2] is recovered as u2 . (F v2).
    """
    _, V = eigh3_jacobi(jnp.matmul(F.T, F, precision=_HI), sweeps)
    B = jnp.matmul(F, V, precision=_HI)  # = U diag(sigma)
    e0 = jnp.array([1.0, 0.0, 0.0], F.dtype)
    u0 = _normalize_or(B[:, 0], e0)
    b1 = B[:, 1] - jnp.dot(u0, B[:, 1]) * u0
    # fallback direction orthogonal to u0 (pick the most orthogonal axis)
    axes = jnp.eye(3, dtype=F.dtype)
    k = jnp.argmin(jnp.abs(u0))
    alt = jnp.cross(u0, axes[k])
    alt = alt / jnp.linalg.norm(alt)
    u1 = _normalize_or(b1, alt)
    u2 = jnp.cross(u0, u1)  # guarantees det(U) = +1
    U = jnp.stack([u0, u1, u2], axis=1)
    s = jnp.array(
        [jnp.dot(u0, B[:, 0]), jnp.dot(u1, B[:, 1]), jnp.dot(u2, B[:, 2])],
        F.dtype,
    )
    return U, s, V
