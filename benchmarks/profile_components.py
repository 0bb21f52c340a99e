"""Component-level timing of the IPC step on the real TPU.

Times each jitted piece of the Newton iteration separately (broad phase,
elasticity Hessian blocks, active contact blocks, full search_dir with PCG,
energy eval, CCD) so optimization effort lands on the actual bottleneck —
the analog of the reference's Timer activity breakdown
(reference main.cpp:1323-1380, info.txt).

Usage: python benchmarks/profile_components.py [n_cells] [reps]
"""

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

    import __graft_entry__ as ge
    from ipc_tpu.energy import elasticity as EL

    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    st = ge._build_scene(n_cells=n_cells, dtype=np.float32)
    mesh, sc, p = st.mesh, st.sc, st.p
    print(f"tets={mesh.tets.shape[0]} surf_tris={mesh.surf_tris.shape[0]} "
          f"caps: pt={sc.cap_pt} ee={sc.cap_ee} et={sc.cap_et} "
          f"act_pt={sc.cap_act_pt} act_ee={sc.cap_act_ee}")

    state = st.initial_state()
    x = state.x
    dHat = st.dHat
    gap = float(np.sqrt(dHat))
    kappa = jnp.asarray(st.suggest_kappa(dHat), st.dtype)
    zeros = jnp.zeros_like(x)

    cand = st._build_cand(x, zeros, gap)
    x_tilde = st.compute_x_tilde(state)

    rows = []

    def rec(name, sec):
        rows.append((name, sec))
        print(f"{name:28s} {sec * 1e3:9.2f} ms")

    rec("broad_phase+stencils",
        timeit(lambda: st._build_cand(x, zeros, gap), reps))
    hess = jax.jit(lambda x: EL.elasticity_hessian_blocks(x, mesh, p.model, True))
    rec("elasticity_hess_blocks", timeit(lambda: hess(x), reps))
    hess_np = jax.jit(lambda x: EL.elasticity_hessian_blocks(x, mesh, p.model, False))
    rec("elasticity_hess_noproj", timeit(lambda: hess_np(x), reps))
    egrad = jax.jit(lambda x: EL.elasticity_gradient(x, mesh, p.model))
    rec("elasticity_grad", timeit(lambda: egrad(x), reps))
    act = jax.jit(lambda x, cand: sc.hessian_blocks_active(x, cand, kappa, dHat, True))
    rec("contact_hess_active", timeit(lambda: act(x, cand), reps))
    rec("energy_eval(ls trial)",
        timeit(lambda: st._energy(x, x_tilde, kappa, dHat, cand, None), reps))
    rec("gradient", timeit(lambda: st._grad(x, x_tilde, kappa, dHat, cand, None), reps))
    rec("ccd_alpha",
        timeit(lambda: st._ccd_alpha(x, -0.01 * jnp.ones_like(x), cand), reps))
    rec("search_dir(full+PCG)",
        timeit(lambda: st._search_dir(x, x_tilde, kappa, dHat, cand, None), reps))

    total = sum(s for _, s in rows)
    print(f"{'sum(components)':28s} {total * 1e3:9.2f} ms  "
          f"(search_dir counted once)")


if __name__ == "__main__":
    main()
