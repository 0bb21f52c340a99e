"""Micro-profile of hot-path subcomponents at scale (real TPU).

Apportions the tools/profile_step.py stage costs into their inner pieces:
elasticity SVD vs dPdF vs final einsum, barrier gradient over caps vs
actives, the 12x12 eigh in contact blocks, and the energy eval split.

Usage: python benchmarks/profile_micro.py [n_cells]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def timed(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import __graft_entry__ as ge
    from ipc_tpu.energy import elasticity as EL
    from ipc_tpu.contact import selfcollision as SC
    from ipc_tpu.ops.svd3 import svd3_jacobi

    stepper = ge._build_scene(n_cells=n_cells, dtype=np.float32)
    mesh = stepper.mesh
    p = stepper.p
    sc = stepper.sc
    dHat = stepper.dHat
    gap = float(np.sqrt(dHat))
    state = stepper.initial_state()
    from ipc_tpu.jit_step import make_jit_step

    step = make_jit_step(stepper, donate=False)
    for _ in range(14):
        state, stats = step(state)
    jax.block_until_ready(state.x)
    x = state.x
    kappa = jnp.asarray(float(stats.kappa), x.dtype)
    print(f"tets={mesh.tets.shape[0]} caps pt={sc.cap_pt} ee={sc.cap_ee} "
          f"act={sc.cap_act_pt}+{sc.cap_act_ee}")

    cand = jax.jit(lambda x: sc.build_candidates(x, jnp.zeros_like(x), gap))(x)

    # --- elasticity internals ---
    x4 = x[mesh.tets]
    f_svd = jax.jit(lambda x4: jax.vmap(svd3_jacobi)(
        jax.vmap(EL.deformation_gradient)(x4, mesh.rest_inv)))
    print(f"el SVD only             {timed(f_svd, x4):8.2f} ms")
    f_e = jax.jit(lambda x: EL.elasticity_energy(x, mesh, p.model))
    print(f"el energy               {timed(f_e, x):8.2f} ms")
    f_g = jax.jit(lambda x: EL.elasticity_gradient(x, mesh, p.model))
    print(f"el gradient             {timed(f_g, x):8.2f} ms")
    f_h = jax.jit(lambda x: EL.elasticity_hessian_blocks(x, mesh, p.model, True))
    print(f"el hessian blocks       {timed(f_h, x):8.2f} ms")
    f_hnp = jax.jit(lambda x: EL.elasticity_hessian_blocks(x, mesh, p.model, False))
    print(f"el hessian no-project   {timed(f_hnp, x):8.2f} ms")

    # --- barrier internals ---
    f_bg = jax.jit(lambda x: sc.gradient(x, cand, kappa, dHat))
    print(f"barrier grad (caps)     {timed(f_bg, x):8.2f} ms")
    f_be = jax.jit(lambda x: sc.energy(x, cand, kappa, dHat))
    print(f"barrier energy (caps)   {timed(f_be, x):8.2f} ms")
    f_hact = jax.jit(lambda x: sc.hessian_blocks_active(x, cand, kappa, dHat, True))
    print(f"contact blocks+eigh     {timed(f_hact, x):8.2f} ms")
    f_hactnp = jax.jit(lambda x: sc.hessian_blocks_active(x, cand, kappa, dHat, False))
    print(f"contact blocks no-proj  {timed(f_hactnp, x):8.2f} ms")

    # eigh isolated at the active caps
    Ca = sc.cap_act_pt + sc.cap_act_ee
    H = jnp.eye(12, dtype=x.dtype)[None] * jnp.ones((Ca, 1, 1), x.dtype)
    f_eigh = jax.jit(lambda H: jax.vmap(SC.make_psd)(H))
    print(f"12x12 eigh x{Ca:6d}     {timed(f_eigh, H):8.2f} ms")

    # --- compacted active-set paths ---
    f_as = jax.jit(lambda x: sc.active_set(x, cand, dHat))
    act = f_as(x)
    print(f"active_set compaction   {timed(f_as, x):8.2f} ms")
    f_asw = jax.jit(
        lambda x: sc.active_set(x, cand, dHat, disp=0.01 * x, cap_scale=2)
    )
    print(f"active_set swept (2x)   {timed(f_asw, x):8.2f} ms")
    f_bga = jax.jit(lambda x: sc.gradient_active(x, act, kappa, dHat))
    print(f"barrier grad (active)   {timed(f_bga, x):8.2f} ms")
    f_bea = jax.jit(lambda x: sc.energy_active(x, act, kappa, dHat))
    print(f"barrier energy (active) {timed(f_bea, x):8.2f} ms")
    f_ha = jax.jit(
        lambda x: sc.hessian_blocks_from_active(x, act, kappa, dHat, True)
    )
    print(f"contact blocks (active) {timed(f_ha, x):8.2f} ms")

    # friction capture + energy (mirror jit_step.capture_friction)
    def cap_fric(x):
        x_sv = x[mesh.surf_verts]
        hs_lams = []
        for hs in stepper.halfspaces:
            if hs.params.friction > 0.0:
                m = hs.active_mask(x_sv, dHat)
                hs_lams.append(hs.friction_lambda(x_sv, m, kappa, dHat))
            else:
                hs_lams.append(None)
        return dict(
            hs=hs_lams, sc=sc.capture_friction(x, cand, kappa, dHat),
            anchor=x, eps2=jnp.asarray(stepper.fric_dhat_target, x.dtype),
        )

    fr = jax.jit(cap_fric)(x)
    f_fe = jax.jit(lambda x: stepper._friction_energy(x, fr))
    print(f"friction energy         {timed(f_fe, x):8.2f} ms")


if __name__ == "__main__":
    main()
