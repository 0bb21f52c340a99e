"""Matrix-free ADMM QP solver — the TPU-native OSQP replacement.

The reference hands its QP subproblems to OSQP (reference: solveQP_OSQP,
Optimizer.cpp:778-864; src/Utils/OSQPWrapper.h), which is itself an ADMM
method on sparse matrices. Here the SAME operator-splitting iteration runs
matrix-free on device:

    minimize    1/2 x^T P x + q^T x
    subject to  A x >= l

    x-update:  (P + sigma I + rho A^T A) x = sigma x_prev - q + A^T(rho z - y)
               solved by PCG with the caller's matrix-free P
    z-update:  z = max(A x + y/rho, l)         (projection; upper bound inf)
    y-update:  y = y + rho (A x - z)

Convergence uses OSQP's primal/dual residual pair. The dual returned is
`-y` mapped to the reference's convention (it negates OSQP duals for its
Fischer-Burmeister check, Optimizer.cpp:917-921; we return lambda >= 0
directly).

A is the constraint Jacobian over fixed-cap active pairs: each row is a
12-entry stencil gradient, so A v / A^T w are one gather / one scatter.
"""

import jax
import jax.numpy as jnp

from ipc_tpu.solver.pcg import pcg

__all__ = ["admm_qp"]

_HI = jax.lax.Precision.HIGHEST


def admm_qp(P_apply, q, A_rows, A_vids, A_valid, l, precond=None,
            rho=1e5, sigma=1e-6, iters=200, pcg_tol=1e-4, pcg_maxiter=200,
            eps_abs=1e-6):
    """Solve the QP; returns (x (V,3), lam (K,), iterations).

    P_apply: v (V,3) -> P v (V,3) (matrix-free SPD objective Hessian)
    q: (V,3) linear term
    A_rows: (K,4,3) constraint gradients; A_vids: (K,4) vertex ids;
    A_valid: (K,) mask (padded rows inert); l: (K,) lower bounds.
    """
    K = A_rows.shape[0]
    dtype = q.dtype
    rho = jnp.asarray(rho, dtype)
    sigma = jnp.asarray(sigma, dtype)
    valid = A_valid
    rows = jnp.where(valid[:, None, None], A_rows, 0.0)
    l = jnp.where(valid, l, 0.0)

    def A_apply(v):
        return jnp.einsum("kij,kij->k", rows, v[A_vids], precision=_HI)

    def AT_apply(w):
        contrib = rows * w[:, None, None]
        return jnp.zeros_like(q).at[A_vids.reshape(-1)].add(
            contrib.reshape(-1, 3)
        )

    def kkt(v):
        return P_apply(v) + sigma * v + rho * AT_apply(A_apply(v))

    def body(c):
        x, z, y, k, _ = c
        rhs = sigma * x - q + AT_apply(rho * z - y)
        x_new, _, _ = pcg(kkt, rhs, precond or (lambda r: r),
                          x0=x, tol=pcg_tol, maxiter=pcg_maxiter)
        Ax = A_apply(x_new)
        z_new = jnp.maximum(Ax + y / rho, l)
        y_new = y + rho * (Ax - z_new)
        r_prim = jnp.abs(jnp.where(valid, Ax - z_new, 0.0)).max()
        r_dual = jnp.abs(rho * AT_apply(z_new - z)).max()
        done = (r_prim < eps_abs) & (r_dual < eps_abs)
        return x_new, z_new, y_new, k + 1, done

    def cond(c):
        _, _, _, k, done = c
        return (~done) & (k < iters)

    x0 = jnp.zeros_like(q)
    z0 = jnp.maximum(A_apply(x0), l)
    y0 = jnp.zeros((K,), dtype)
    x, z, y, k, _ = jax.lax.while_loop(
        cond, body, (x0, z0, y0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    # lambda >= 0 multipliers of Ax >= l (OSQP's y is their negative)
    lam = jnp.maximum(-y, 0.0)
    return x, lam, k
