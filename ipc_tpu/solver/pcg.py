"""Matrix-free preconditioned conjugate gradient.

The TPU-native replacement for the reference's direct-solver stack
(reference: src/LinSysSolver/ — block-CSR assembly LinSysSolver.hpp:46-150,
CHOLMOD factorize/solve CHOLMODSolver.cpp, AMGCL CG AMGCLSolver.cpp:24-47).
No global sparse matrix is ever formed: the Newton system operator is a
closure that gathers per-element/per-pair blocks, multiplies, and
scatter-adds — all fused by XLA. The preconditioner is per-vertex 3x3
block-Jacobi (the reference's own AMGCL configuration validates cheap
local preconditioning on these systems).

The solve runs a fixed-shape `lax.while_loop` with a relative-residual
tolerance and an iteration cap, so it jits once and stays on device.
"""

import jax
import jax.numpy as jnp

from ipc_tpu.parallel.spmd import constrain

__all__ = ["pcg", "block_jacobi_inverse", "apply_block_precond"]

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.vdot(a, b)


def pcg(operator, b, precond, x0=None, tol=1e-5, maxiter=1000):
    """Solve A x = b with preconditioned CG.

    operator: v -> A v  (same pytree/array shape as b)
    precond:  r -> M^-1 r
    Returns (x, iters, rel_residual).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    # under an active SPMD context these pin the CG vectors to the
    # leading-axis sharding (each device stores V/n rows; the operator's
    # gathers/reductions become XLA-inserted collectives); no-ops otherwise
    b = constrain(b)
    x0 = constrain(x0)

    b_norm2 = _dot(b, b)
    atol2 = tol * tol * jnp.maximum(b_norm2, 1e-300)

    r0 = constrain(b - operator(x0))
    z0 = constrain(precond(r0))
    p0 = z0
    rz0 = _dot(r0, z0)

    def cond(carry):
        x, r, p, rz, k = carry
        return (_dot(r, r) > atol2) & (k < maxiter)

    def body(carry):
        x, r, p, rz, k = carry
        Ap = constrain(operator(p))
        pAp = _dot(p, Ap)
        alpha = rz / jnp.where(pAp != 0.0, pAp, 1.0)
        x = constrain(x + alpha * p)
        r = constrain(r - alpha * Ap)
        z = constrain(precond(r))
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
        p = constrain(z + beta * p)
        return x, r, p, rz_new, k + 1

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    rel = jnp.sqrt(_dot(r, r) / jnp.maximum(b_norm2, 1e-300))
    return x, k, rel


def block_jacobi_inverse(diag_blocks, reg=0.0):
    """Invert (V,3,3) per-vertex diagonal blocks (batched closed-form 3x3
    inverse via the adjugate; falls back to identity on singular blocks)."""
    A = diag_blocks
    if reg:
        A = A + reg * jnp.eye(3, dtype=A.dtype)[None]
    c0 = jnp.cross(A[:, :, 1], A[:, :, 2], axis=1)
    c1 = jnp.cross(A[:, :, 2], A[:, :, 0], axis=1)
    c2 = jnp.cross(A[:, :, 0], A[:, :, 1], axis=1)
    det = jnp.sum(A[:, :, 0] * c0, axis=1)
    adjT = jnp.stack([c0, c1, c2], axis=1)  # rows of adjugate
    ok = jnp.abs(det) > 1e-300
    inv = adjT / jnp.where(ok, det, 1.0)[:, None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    return jnp.where(ok[:, None, None], inv, eye)


def apply_block_precond(inv_blocks, r):
    """Apply (V,3,3) inverse blocks to a (V,3) residual."""
    return jnp.einsum("vij,vj->vi", inv_blocks, r, precision=_HI)
