"""Per-component wall-clock breakdown of one Newton iteration on real HW.

Times each hot-path stage of the jitted step in isolation (each stage jitted
separately, warmed up, then timed over repeats with block_until_ready):
candidate build, gradient, elasticity Hessian blocks, active contact blocks
(with the 12x12 eigh), a single PCG operator apply, the full PCG solve,
energy evaluation (one line-search trial), ACCD, and the intersection
failsafe. Prints a table + the implied per-Newton-iteration cost.

Usage: python tools/profile_step.py [n_cells]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import __graft_entry__ as ge
    from ipc_tpu.energy import elasticity as EL
    from ipc_tpu.solver.pcg import apply_block_precond, block_jacobi_inverse, pcg

    stepper = ge._build_scene(n_cells=n_cells, dtype=np.float32)
    mesh = stepper.mesh
    p = stepper.p
    sc = stepper.sc
    dHat = stepper.dHat
    gap = float(np.sqrt(dHat))
    state = stepper.initial_state()
    # advance a few steps so boxes are in contact (worst-case iteration)
    from ipc_tpu.jit_step import make_jit_step

    step = make_jit_step(stepper, donate=False)
    for _ in range(14):
        state, stats = step(state)
    jax.block_until_ready(state.x)
    print(
        f"tets={mesh.tets.shape[0]} verts={mesh.x_rest.shape[0]} "
        f"newton_iters={int(stats.newton_iters)} pcg_total={int(stats.pcg_iters_total)} "
        f"pt={int(stats.pt_count)}/{sc.cap_pt} ee={int(stats.ee_count)}/{sc.cap_ee} "
        f"act_pt={int(stats.active_pt_max)}/{sc.cap_act_pt} "
        f"act_ee={int(stats.active_ee_max)}/{sc.cap_act_ee}"
    )
    x = state.x
    kappa = jnp.asarray(float(stats.kappa), x.dtype)
    x_tilde = x + 0.01

    f_cand = jax.jit(lambda x: sc.build_candidates(x, jnp.zeros_like(x), gap))
    cand = f_cand(x)
    ms_cand = timed(f_cand, x)

    f_grad = jax.jit(
        lambda x: stepper._grad_fn(x, x_tilde, kappa, cand)
        if hasattr(stepper, "_grad_fn")
        else sc.gradient(x, cand, kappa, dHat)
        + stepper.w_el * EL.elasticity_gradient(x, mesh, p.model)
    )
    ms_grad = timed(f_grad, x)

    f_hel = jax.jit(lambda x: EL.elasticity_hessian_blocks(x, mesh, p.model, True))
    Hel = f_hel(x)
    ms_hel = timed(f_hel, x)

    f_hact = jax.jit(lambda x: sc.hessian_blocks_active(x, cand, kappa, dHat, True))
    vids_act, H_act, active_count = f_hact(x)
    active_count = int(active_count[0]) + int(active_count[1])
    ms_hact = timed(f_hact, x)

    dbc = mesh.dbc_mask
    tets = mesh.tets
    _HI = jax.lax.Precision.HIGHEST

    def scatter12(out, vids, H, v):
        v4 = v[vids].reshape(-1, 12)
        hv = jnp.einsum("cij,cj->ci", H, v4, precision=_HI)
        return out.at[vids.reshape(-1)].add(hv.reshape(-1, 3))

    def operator(v):
        v = jnp.where(dbc[:, None], 0.0, v)
        out = mesh.mass[:, None] * v
        out = scatter12(out, tets, Hel, v)
        out = scatter12(out, vids_act, H_act, v)
        return jnp.where(dbc[:, None], v, out)

    f_hv = jax.jit(operator)
    ms_hv = timed(f_hv, x, repeats=30)

    def diag12(diag, vids, H):
        H4 = H.reshape(-1, 4, 3, 4, 3)
        for c in range(4):
            diag = diag.at[vids[:, c]].add(H4[:, c, :, c, :])
        return diag

    from ipc_tpu.solver.coarse import build_aggregates, make_coarse_assembler

    if p.coarse_precond:
        agg, n_coarse = build_aggregates(np.asarray(mesh.x_rest))
        coarse_assemble, coarse_term = make_coarse_assembler(
            agg, n_coarse, dbc, x.dtype
        )
    else:
        coarse_assemble = coarse_term = None

    def full_pcg(g):
        diag = mesh.mass[:, None, None] * jnp.eye(3, dtype=x.dtype)[None]
        diag = diag12(diag, tets, Hel)
        diag = diag12(diag, vids_act, H_act)
        inv_diag = block_jacobi_inverse(diag)
        if coarse_assemble is not None:
            Ainv_c = coarse_assemble(mesh.mass, [(tets, Hel), (vids_act, H_act)])
            precond = lambda r: apply_block_precond(inv_diag, r) + coarse_term(Ainv_c, r)
        else:
            precond = lambda r: apply_block_precond(inv_diag, r)
        dx, iters, rel = pcg(
            operator,
            -g,
            precond,
            tol=p.pcg_tol,
            maxiter=p.pcg_maxiter,
        )
        return dx, iters

    g = f_grad(x)
    f_pcg = jax.jit(full_pcg)
    dx, iters = f_pcg(g)
    ms_pcg = timed(f_pcg, g, repeats=5)
    n_pcg = int(iters)

    f_energy = jax.jit(lambda x: sc.energy(x, cand, kappa, dHat)
                       + stepper.w_el * EL.elasticity_energy(x, mesh, p.model))
    ms_energy = timed(f_energy, x)

    f_ccd = jax.jit(lambda x, d: sc.ccd_alpha(x, d, cand, 0.2, p.ccd_max_iter))
    ms_ccd = timed(f_ccd, x, dx)

    f_et = jax.jit(lambda x, d: sc.et_pairs(x, d))
    et_p, et_v, _ = f_et(x, dx)
    ms_et = timed(f_et, x, dx)
    f_isect = jax.jit(lambda x: sc.intersects_pairs(x, et_p, et_v))
    ms_isect = timed(f_isect, x)

    print(f"candidate build        {ms_cand:8.2f} ms")
    print(f"gradient               {ms_grad:8.2f} ms")
    print(f"elasticity H blocks    {ms_hel:8.2f} ms")
    print(f"active contact blocks  {ms_hact:8.2f} ms  (active={int(active_count)})")
    print(f"one Hv apply           {ms_hv:8.2f} ms")
    print(f"PCG solve ({n_pcg:4d} it)    {ms_pcg:8.2f} ms")
    print(f"energy eval            {ms_energy:8.2f} ms")
    print(f"ACCD                   {ms_ccd:8.2f} ms")
    print(f"ET pairs build         {ms_et:8.2f} ms")
    print(f"intersection check     {ms_isect:8.2f} ms")
    per_iter = ms_cand + ms_grad + ms_hel + ms_hact + ms_pcg + 3 * ms_energy + ms_ccd + ms_et + ms_isect
    print(f"--> implied per-Newton-iteration: {per_iter:.1f} ms")


if __name__ == "__main__":
    main()
