"""SPD projection by eigenvalue clamping ("makePD").

Mirrors the reference's IglUtils::makePD / makePD2d (reference:
src/Utils/IglUtils.hpp:119-177): negative eigenvalues of a symmetric matrix
are clamped to zero so that per-element/per-pair Hessian blocks stay positive
semi-definite before entering the Newton system — the core of IPC's
projected-Newton robustness.

`make_psd` handles any NxN symmetric (used for 12x12 contact-pair blocks and
3x3 sigma-space Hessians); `make_psd2` is the closed-form 2x2 used for the
twist/flip blocks of the elasticity eigensystem.
"""

import jax
import jax.numpy as jnp

__all__ = ["make_psd", "make_psd2"]

_HI = jax.lax.Precision.HIGHEST  # full-precision accumulation on TPU


def make_psd(A):
    """Clamp negative eigenvalues of symmetric A (single matrix; vmap me).

    Fast exit logic (the reference skips work when the matrix is diagonally
    dominant) is left to XLA; the eigh is batched by callers.
    """
    A = 0.5 * (A + A.T)
    w, Q = jnp.linalg.eigh(A)
    w = jnp.maximum(w, 0.0)
    return jnp.matmul(Q * w[None, :], Q.T, precision=_HI)


def make_psd2(A):
    """Closed-form SPD projection of a symmetric 2x2 (reference makePD2d,
    src/Utils/IglUtils.hpp:153-177)."""
    a, b, d = A[0, 0], A[0, 1], A[1, 1]
    tr = a + d
    diff = a - d
    rad = jnp.sqrt(diff * diff + 4.0 * b * b)
    l0 = 0.5 * (tr - rad)  # smaller eigenvalue
    l1 = 0.5 * (tr + rad)
    l0c = jnp.maximum(l0, 0.0)
    l1c = jnp.maximum(l1, 0.0)
    # eigenvector for l1: (b, l1 - a) unless b == 0
    eps = jnp.asarray(1e-300 if A.dtype == jnp.float64 else 1e-37, A.dtype)
    off = jnp.abs(b) > eps
    v1 = jnp.where(
        off,
        jnp.array([1.0, 0.0], A.dtype) * b + jnp.array([0.0, 1.0], A.dtype) * (l1 - a),
        jnp.where(a >= d, jnp.array([1.0, 0.0], A.dtype), jnp.array([0.0, 1.0], A.dtype)),
    )
    n2 = jnp.dot(v1, v1)
    v1 = v1 / jnp.sqrt(jnp.where(n2 > 0, n2, 1.0))
    v0 = jnp.array([-v1[1], v1[0]], A.dtype)
    V = jnp.stack([v0, v1], axis=1)
    return jnp.matmul(V * jnp.array([l0c, l1c], A.dtype)[None, :], V.T, precision=_HI)
