"""Diagnostic CLI — numerical checkers runnable on demand.

The analog of the reference's Diagnostic sub-project
(reference: src/Projects/Diagnostic/Diagnostic.cpp:56-700, ~20 modes):
derivative unit tests for energies and distance kernels, dType fuzzing,
CCD probes, and solver checks, exposed as named modes:

    python -m ipc_tpu.diagnostic sigma_derivs      (reference mode 11)
    python -m ipc_tpu.diagnostic dist_derivs       (mode 14)
    python -m ipc_tpu.diagnostic dtype_fuzz        (mode 15)
    python -m ipc_tpu.diagnostic ee_dist           (mode 16)
    python -m ipc_tpu.diagnostic ccd_probe         (modes 17/18/25)
    python -m ipc_tpu.diagnostic grad_check <scene> (Optimizer::checkGradient)
    python -m ipc_tpu.diagnostic solver_check      (modes 22/23: PCG on a
                                                    random SPD block system)

Each mode prints PASS/FAIL with the measured error; exit code 0 iff all
checks pass.
"""

import sys

import numpy as np


def _fd(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (f(xp) - f(xm)) / (2 * eps)
        it.iternext()
    return g


def sigma_derivs():
    """Sigma-space dE/d2E checks for NH and FCR (reference mode 11)."""
    import jax.numpy as jnp

    from ipc_tpu.energy.elasticity import MODELS
    from ipc_tpu.mesh import lame_params

    mu, lam = lame_params(1e5, 0.4)
    rng = np.random.default_rng(0)
    worst = 0.0
    for name, m in MODELS.items():
        for _ in range(10):
            s = rng.uniform(0.3, 2.0, 3)
            g = np.asarray(m["dE"](jnp.asarray(s), mu, lam))
            g_fd = _fd(lambda s: float(m["E"](jnp.asarray(s), mu, lam)), s, 1e-7)
            err = np.abs(g - g_fd).max() / max(1.0, np.abs(g_fd).max())
            worst = max(worst, err)
            H = np.asarray(m["d2E"](jnp.asarray(s), mu, lam))
            H_fd = np.stack(
                [_fd(lambda s: float(m["dE"](jnp.asarray(s), mu, lam)[i]), s, 1e-7) for i in range(3)]
            )
            err = np.abs(H - H_fd).max() / max(1.0, np.abs(H_fd).max())
            worst = max(worst, err)
    ok = worst < 1e-4
    print(f"sigma_derivs: {'PASS' if ok else 'FAIL'} (max rel err {worst:.3e})")
    return ok


def dist_derivs():
    """Distance-kernel gradient/Hessian FD checks (reference mode 14)."""
    import jax
    import jax.numpy as jnp

    from ipc_tpu.ops import distance as D

    rng = np.random.default_rng(1)
    worst = 0.0
    for ct in range(4):
        for _ in range(10):
            x = rng.uniform(-1, 1, (4, 3))
            g = np.asarray(D.stencil_dist2_grad(ct, jnp.asarray(x)))
            g_fd = _fd(lambda x: float(D.stencil_dist2(ct, jnp.asarray(x))), x)
            worst = max(worst, np.abs(g - g_fd).max() / max(1.0, np.abs(g_fd).max()))
    ok = worst < 1e-4
    print(f"dist_derivs: {'PASS' if ok else 'FAIL'} (max rel err {worst:.3e})")
    return ok


def dtype_fuzz(n=2000):
    """dType classification consistency fuzz (reference mode 15): the
    region-aware distance must lower-bound every reduced candidate."""
    import jax
    import jax.numpy as jnp

    from ipc_tpu.ops import distance as D

    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 4, 3)))

    @jax.jit
    @jax.vmap
    def chk(x):
        d_pt = D.point_triangle_dist2(x[0], x[1], x[2], x[3])
        m_pt = jnp.stack(
            [
                D.d_PP(x[0], x[1]),
                D.d_PP(x[0], x[2]),
                D.d_PP(x[0], x[3]),
                D.point_edge_dist2(x[0], x[1], x[2]),
                D.point_edge_dist2(x[0], x[2], x[3]),
                D.point_edge_dist2(x[0], x[3], x[1]),
            ]
        ).min()
        d_ee = D.edge_edge_dist2(x[0], x[1], x[2], x[3])
        m_ee = jnp.stack(
            [
                D.point_edge_dist2(x[0], x[2], x[3]),
                D.point_edge_dist2(x[1], x[2], x[3]),
                D.point_edge_dist2(x[2], x[0], x[1]),
                D.point_edge_dist2(x[3], x[0], x[1]),
            ]
        ).min()
        return (d_pt <= m_pt + 1e-12) & (d_ee <= m_ee + 1e-12)

    ok = bool(np.asarray(chk(X)).all())
    print(f"dtype_fuzz: {'PASS' if ok else 'FAIL'} ({n} samples)")
    return ok


def ee_dist():
    """EE distance + mollifier checks (reference mode 16/24)."""
    import jax.numpy as jnp

    from ipc_tpu.ops import distance as D

    x = jnp.asarray([[-1.0, 0, 0], [1, 0, 0], [0, 0.5, -1], [0, 0.5, 1]])
    d = float(D.edge_edge_dist2(x[0], x[1], x[2], x[3]))
    ok = abs(d - 0.25) < 1e-12
    # nearly parallel pair is mollified
    xp = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0.0, 0.01, 1e-4], [1.0, 0.01, 0]])
    e = float(D.mollifier_ee(xp, D.eps_x_ee(xp[0], xp[1], xp[2], xp[3])))
    ok = ok and 0.0 < e < 1.0
    print(f"ee_dist: {'PASS' if ok else 'FAIL'} (d={d}, mollifier={e:.3g})")
    return ok


def ccd_probe():
    """Interactive-style CCD probes (reference modes 17/18/25)."""
    import jax.numpy as jnp

    from ipc_tpu.contact.ccd import accd_ee, accd_pt
    from ipc_tpu.ops import distance as D

    ok = True
    x4 = jnp.asarray([[0.25, 1.0, 0.25], [0, 0, 0], [1, 0, 0], [0, 0, 1]])
    p4 = jnp.asarray([[0.0, -2.0, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])
    t = float(accd_pt(x4, p4, 0.2, 64))
    d_at_t = float(D.point_triangle_dist2(*(x4 + t * p4)))
    print(f"  PT head-on: toi={t:.4f} (exact impact 0.5), d(toi)={d_at_t:.3e}")
    ok = ok and 0.3 < t < 0.5 and d_at_t > 0
    x4 = jnp.asarray([[-1.0, 1, 0], [1, 1, 0], [0, 0, -1], [0, 0, 1]])
    p4 = jnp.asarray([[0.0, -2, 0], [0, -2, 0], [0, 0, 0], [0, 0, 0]])
    t = float(accd_ee(x4, p4, 0.2, 64))
    d_at_t = float(D.edge_edge_dist2(*(x4 + t * p4)))
    print(f"  EE head-on: toi={t:.4f} (exact impact 0.5), d(toi)={d_at_t:.3e}")
    ok = ok and 0.3 < t < 0.5 and d_at_t > 0
    print(f"ccd_probe: {'PASS' if ok else 'FAIL'}")
    return ok


def solver_check():
    """PCG on a random block-SPD system (reference modes 22/23/105)."""
    import jax.numpy as jnp

    from ipc_tpu.solver.pcg import apply_block_precond, block_jacobi_inverse, pcg

    rng = np.random.default_rng(3)
    n = 200
    A = rng.normal(size=(3 * n, 3 * n))
    A = A @ A.T + 3 * n * np.eye(3 * n)
    b = rng.normal(size=(n, 3))
    Aj = jnp.asarray(A)
    op = lambda v: (Aj @ v.reshape(-1)).reshape(n, 3)
    diag = jnp.asarray(
        np.stack([A[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] for i in range(n)])
    )
    inv = block_jacobi_inverse(diag)
    x, it, rel = pcg(op, jnp.asarray(b), lambda r: apply_block_precond(inv, r), tol=1e-10)
    err = float(np.abs(A @ np.asarray(x).reshape(-1) - b.reshape(-1)).max())
    ok = err < 1e-6
    print(f"solver_check: {'PASS' if ok else 'FAIL'} (iters={int(it)}, residual {err:.3e})")
    return ok


def grad_check(scene_path, steps=1):
    """Full-objective FD gradient check on a scene (reference
    Optimizer::checkGradient, Optimizer.cpp:3780-3826)."""
    import jax
    import jax.numpy as jnp

    from ipc_tpu.config import load_config
    from ipc_tpu.sim import Simulation

    cfg = load_config(scene_path)
    sim = Simulation(cfg)
    st = sim.stepper
    state = sim.initial_state()
    for _ in range(steps):
        state, _ = st.step(state)
    x = state.x
    x_tilde = st.compute_x_tilde(state)
    cand = st._candidates(x)
    kappa = st.suggest_kappa(st.dHat)
    g = np.asarray(st._grad(x, x_tilde, kappa, st.dHat, cand, None))
    xn = np.asarray(x)
    rng = np.random.default_rng(0)
    worst = 0.0
    for vi in rng.choice(len(xn), min(5, len(xn)), replace=False):
        if bool(np.asarray(st.mesh.dbc_mask)[vi]):
            continue
        for c in range(3):
            eps = 1e-7
            xp, xm = xn.copy(), xn.copy()
            xp[vi, c] += eps
            xm[vi, c] -= eps
            fd = (
                st._energy_f(jnp.asarray(xp), x_tilde, kappa, st.dHat, cand, None)
                - st._energy_f(jnp.asarray(xm), x_tilde, kappa, st.dHat, cand, None)
            ) / (2 * eps)
            scale = max(1.0, abs(fd))
            worst = max(worst, abs(g[vi, c] - fd) / scale)
    ok = worst < 1e-3
    print(f"grad_check({scene_path}): {'PASS' if ok else 'FAIL'} (max rel err {worst:.3e})")
    return ok


MODES = {
    "sigma_derivs": sigma_derivs,
    "dist_derivs": dist_derivs,
    "dtype_fuzz": dtype_fuzz,
    "ee_dist": ee_dist,
    "ccd_probe": ccd_probe,
    "solver_check": solver_check,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    mode = argv[0]
    if mode == "all":
        ok = all(fn() for fn in MODES.values())
    elif mode == "grad_check":
        ok = grad_check(argv[1], int(argv[2]) if len(argv) > 2 else 1)
    elif mode in MODES:
        ok = MODES[mode]()
    else:
        print(f"unknown mode {mode}; modes: {', '.join(MODES)} grad_check")
        return 2
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
