"""Micro-profile of the per-tet elasticity Hessian pipeline on the TPU:
SVD vs sigma-space derivatives vs SPD projections vs the kron/einsum
assembly. Usage: python benchmarks/profile_hess.py [T] [reps]"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from ipc_tpu.energy import elasticity as EL
    from ipc_tpu.ops.spd import make_psd2
    from ipc_tpu.ops.svd3 import eigh3_jacobi, svd3_jacobi

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rng = np.random.default_rng(0)
    F = jnp.asarray(
        np.eye(3)[None] + 0.3 * rng.standard_normal((T, 3, 3)), jnp.float32
    )
    S = 0.5 * (F + jnp.swapaxes(F, 1, 2))
    mu = jnp.full((T,), 1e4, jnp.float32)
    lam = jnp.full((T,), 1e4, jnp.float32)

    def rec(name, sec):
        print(f"{name:26s} {sec * 1e3:9.2f} ms")

    svd = jax.jit(jax.vmap(svd3_jacobi))
    rec("svd3_jacobi", timeit(svd, reps, F))
    eig_s = jax.jit(jax.vmap(lambda A: eigh3_jacobi(A, sort=True)))
    rec("eigh3(sorted)", timeit(eig_s, reps, S))
    eig_u = jax.jit(jax.vmap(lambda A: eigh3_jacobi(A, sort=False)))
    rec("eigh3(unsorted)", timeit(eig_u, reps, S))
    spd3 = jax.jit(jax.vmap(EL._spd3))
    rec("_spd3", timeit(spd3, reps, S))
    p2 = jax.jit(jax.vmap(make_psd2))
    rec("make_psd2 (x1)", timeit(p2, reps, S[:, :2, :2]))

    U, s, V = svd(F)

    dpdf_p = jax.jit(jax.vmap(
        lambda U, s, V, mu, lam: EL._dPdF(U, s, V, mu, lam, "NH", True)))
    rec("dPdF(project)", timeit(dpdf_p, reps, U, s, V, mu, lam))
    dpdf_n = jax.jit(jax.vmap(
        lambda U, s, V, mu, lam: EL._dPdF(U, s, V, mu, lam, "NH", False)))
    rec("dPdF(noproject)", timeit(dpdf_n, reps, U, s, V, mu, lam))


if __name__ == "__main__":
    main()


def bisect():
    import jax
    import jax.numpy as jnp

    from ipc_tpu.energy import elasticity as EL

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.standard_normal((T, 4, 3)) * 0.1, jnp.float32)
    ri = jnp.asarray(np.eye(3)[None] + 0.1 * rng.standard_normal((T, 3, 3)),
                     jnp.float32)
    vol = jnp.full((T,), 1e-3, jnp.float32)
    mu = jnp.full((T,), 1e4, jnp.float32)
    lam = jnp.full((T,), 1e4, jnp.float32)

    def rec(name, sec):
        print(f"{name:26s} {sec * 1e3:9.2f} ms")

    full = jax.jit(jax.vmap(
        lambda a, b, c, d, e: EL._elem_hess(a, b, c, d, e, "NH", True)))
    rec("elem_hess(project)", timeit(full, reps, x4, ri, vol, mu, lam))
    noproj = jax.jit(jax.vmap(
        lambda a, b, c, d, e: EL._elem_hess(a, b, c, d, e, "NH", False)))
    rec("elem_hess(noproject)", timeit(noproj, reps, x4, ri, vol, mu, lam))

    def upto_dpdf(a, b, c, d, e, project):
        U, s, V = EL._elem_svd(a, b, c)
        return EL._dPdF(U, s, V, d, e, "NH", project)

    f1 = jax.jit(jax.vmap(lambda a, b, c, d, e: upto_dpdf(a, b, c, d, e, True)))
    rec("svd+dPdF(project)", timeit(f1, reps, x4, ri, vol, mu, lam))
    f2 = jax.jit(jax.vmap(lambda a, b, c, d, e: upto_dpdf(a, b, c, d, e, False)))
    rec("svd+dPdF(noproject)", timeit(f2, reps, x4, ri, vol, mu, lam))

    dPdF = f2(x4, ri, vol, mu, lam)

    def tail(dPdF, b, c):
        W = EL.elem_weights(b)
        T4 = dPdF.reshape(3, 3, 3, 3)
        H = jnp.einsum("mj,ns,ijrs->minr", W, W,  T4,
                       precision=jax.lax.Precision.HIGHEST)
        return c * H.reshape(12, 12)

    f3 = jax.jit(jax.vmap(tail))
    rec("W-einsum tail", timeit(f3, reps, dPdF, ri, vol))


if __name__ == "__main__" and len(sys.argv) > 3:
    bisect()
