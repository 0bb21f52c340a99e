"""Fully-on-device time step: the production TPU path.

The host-orchestrated loop in timestepper.py mirrors the reference's control
flow for debuggability, but every host<->device synchronization costs ~2 s
through the TPU tunnel of this environment (and ~us..ms anywhere else), so
the production path compiles the ENTIRE step — candidate build, Newton loop,
PCG, ACCD, line search with intersection safeguard, adaptive kappa — into
one jitted function with `lax.while_loop`s. One dispatch per time step, zero
syncs; stats come back as a fixed-size struct.

Differences from the host path (both intentional, documented for parity):
  * the Armijo line search and the intersection safeguard are merged into a
    single backtracking condition (the reference applies them sequentially,
    which accepts the same step sizes up to the halving grid).
  * adaptive-kappa DOUBLING (reference postLineSearch close-constraint
    tracking, Optimizer.cpp:2356-2446) runs INSIDE the device Newton loop:
    kappa lives in the while_loop carry, and an iteration whose accepted
    step lets any previously-close (d^2 < dTol) active constraint get
    closer doubles kappa (clamped at 100x suggestKappa). The comparison is
    pre-step vs post-step distances over the iteration's own compacted
    line-search active set + analytic half-space distances — the same
    same-constraint comparison the reference makes, expressed fixed-shape.

Scripted scenes run FULLY on device (reference AnimScripter state that the
host path keeps in Python lives in SimState.aux instead):
  * velocity turning points (reference velocityTurningPoints,
    AnimScripter.cpp:1556-1808) are traced predicates whose sign/active
    arrays persist in aux (scripting.DeviceTurning);
  * ACO moving analytic planes (AST_ACOSQUASH/6/SHEAR,
    AnimScripter.cpp:1832-1890) carry plane origins + velocities in aux;
    every half-space kernel receives the current traced offset D;
  * moving-DBC augmented Lagrangian (reference m_projectDBC + rho_DBC
    machinery, Optimizer.cpp:2168-2203, AnimScripter.cpp:2302-2380) runs
    inside the SAME Newton while_loop: when the CCD-clamped scripted motion
    cannot complete, the loop starts with DBC rows unprojected and the AL
    pull -sqrt(m) lam.(x-t) + rho/2 m |x-t|^2 active (lambda, rho, and the
    AL-mode flag live in the carry); on completion the flag flips and the
    remaining iterations run projected — one trace serves both modes.

Capacity overflow is reported in the returned stats (counts vs caps); the
caller grows capacities between steps and re-traces, never mid-step.
"""

from dataclasses import dataclass, replace
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ipc_tpu.energy import elasticity as EL
from ipc_tpu.ops.scatter import make_gather_sum
from ipc_tpu.scripting import device_closures
from ipc_tpu.solver.coarse import build_aggregates, make_coarse_assembler
from ipc_tpu.solver.pcg import apply_block_precond, block_jacobi_inverse, pcg
from ipc_tpu.timestepper import SimState

_HI = jax.lax.Precision.HIGHEST

__all__ = ["JitStepStats", "initial_device_aux", "make_jit_step"]


@dataclass(frozen=True)
class JitStepStats:
    """Fixed-shape per-step stats (pytree) — fetch asynchronously."""

    newton_iters: Any
    kappa: Any
    kappa_doublings: Any  # postLineSearch doublings inside the device loop
    dist_to_opt: Any
    pt_count: Any
    ee_count: Any
    et_count: Any
    active_pt_max: Any  # grow sc.cap_act_pt/_ee past these before next run
    active_ee_max: Any
    last_alpha: Any
    energy: Any
    pcg_iters_total: Any
    script_scale: Any  # completed fraction of the scripted DBC motion
    bucket_overflow: Any  # max grid-bucket occupancy seen (grow sc.grid_K)
    fric_count: Any  # true active friction pairs (grow sc.cap_fric)
    al_iters: Any  # Newton iterations spent in moving-DBC AL mode
    sweep_clamps: Any  # iterations whose line-search start hit the span clamp


jax.tree_util.register_dataclass(
    JitStepStats,
    data_fields=[
        "newton_iters",
        "kappa",
        "kappa_doublings",
        "dist_to_opt",
        "pt_count",
        "ee_count",
        "et_count",
        "active_pt_max",
        "active_ee_max",
        "last_alpha",
        "energy",
        "pcg_iters_total",
        "script_scale",
        "bucket_overflow",
        "fric_count",
        "al_iters",
        "sweep_clamps",
    ],
    meta_fields=[],
)


def initial_device_aux(stepper):
    """SimState.aux for the fully-jitted step: turning-rule state and moving
    analytic-plane state, or None when the scene needs neither. Pass the
    result to the first step's SimState (dataclasses.replace(state, aux=...));
    the step returns the updated aux in its output state."""
    from ipc_tpu.scripting import DeviceTurning

    aux = {}
    script = stepper.script
    if script is not None and script.turning:
        turn = DeviceTurning(
            script.turning, len(script.dbc_groups), len(script.handles)
        )
        aux["turn_sign"], aux["turn_active"] = turn.init(stepper.dtype)
    if getattr(stepper, "hs_moving", False):
        aux["hs_origin"] = jnp.asarray(stepper.hs_origin, stepper.dtype)
        aux["aco_vel"] = jnp.asarray(
            np.asarray(stepper.script.aco_vel, float), stepper.dtype
        )
    return aux or None


def make_jit_step(stepper, max_newton=64, max_linesearch=40, donate=True,
                  burst=None):
    """Build a jitted `state -> (state, JitStepStats)` for an IPCStepper.

    All solver semantics (objective terms, SPD blocks, ACCD, safeguards)
    are the same functions the host path uses — they are traced into one
    program here instead of being dispatched one by one.
    """
    mesh = stepper.mesh
    p = stepper.p
    sc = stepper.sc
    # static tet topology: assemble per-corner rows into vertices with a
    # precomputed gather-sum (a scatter-add here costs ~20x more on TPU and
    # runs EVERY PCG iteration)
    n_verts = int(mesh.x_rest.shape[0])
    gsum_tet = make_gather_sum(np.asarray(mesh.tets).reshape(-1), n_verts)
    # pallas gather-free Hv kernel (f32 on a real TPU only; ops/pallas_hv)
    hv_plan = hv_prep_H = hv_rows_fn = gsum_hv = None
    import os as _os

    # IPC_NO_PALLAS=1 forces the jnp Hv route — the TPU-worker-crash
    # bisection lever (a Pallas DMA fault is one candidate cause)
    if (stepper.dtype == jnp.float32 and jax.default_backend() == "tpu"
            and not _os.environ.get("IPC_NO_PALLAS")):
        from ipc_tpu.ops.pallas_hv import make_hv_rows, plan_hv_blocks

        hv_plan = plan_hv_blocks(np.asarray(mesh.tets), n_verts)
        if hv_plan.ok:
            hv_prep_H, hv_rows_fn = make_hv_rows(hv_plan)
            gsum_hv = make_gather_sum(
                np.asarray(hv_plan.ids_pad).reshape(-1), n_verts
            )
        else:
            hv_plan = None
    dt = stepper.dt
    dtSq = stepper.dtSq
    w_el = stepper.w_el  # h^2 (BE) or beta h^2 (Newmark)
    is_nm = stepper.is_nm
    dHat = stepper.dHat
    gap = float(np.sqrt(dHat))
    target_gres = stepper.target_gres
    kappa_sug = stepper.suggest_kappa(dHat)
    kappa_max = 100.0 * kappa_sug
    dTol = stepper.dTol  # "close constraint" threshold (dtol_rel^2 * diag^2)
    scene_diag = float(np.sqrt(stepper.bbox_diag2))
    gravity = jnp.asarray(stepper.gravity)
    dbc = mesh.dbc_mask
    sv = mesh.surf_verts
    dbc_sv = stepper._dbc_sv
    dtype = stepper.dtype
    solve_fric = stepper._solve_fric
    # two-level preconditioner setup (host-side, once per trace)
    if p.coarse_precond:
        agg, n_coarse = build_aggregates(np.asarray(mesh.x_rest))
        coarse_assemble, coarse_term = make_coarse_assembler(
            agg, n_coarse, dbc, dtype, tets=np.asarray(mesh.tets)
        )
    else:
        coarse_assemble = coarse_term = None
    # scripted DBC motion + NBC forces on device (reference stepAnimScript,
    # AnimScripter.cpp:1398-2276). Mesh-sequence scripts need per-frame file
    # IO and must use the host path.
    script = stepper.script
    if script is not None and script.host_only():
        raise ValueError(
            "mesh-sequence scripted scenes need per-frame file IO and the "
            "host path"
        )
    disp_fn, fext_fn, turn = (
        device_closures(script, dtype, dt)
        if script is not None
        else (None, None, None)
    )
    # moving analytic planes (reference ACO scripts): plane origins and
    # velocities are traced state in SimState.aux; every half-space kernel
    # below takes the current traced offset D
    hs_moving = bool(getattr(stepper, "hs_moving", False))
    n_hs = len(stepper.halfspaces)
    hs_normals = (
        np.stack([hs._n for hs in stepper.halfspaces])
        if n_hs
        else np.zeros((0, 3))
    )
    aco_kind = script.aco_kind if (script is not None and hs_moving) else None
    # moving-DBC augmented-Lagrangian statics (reference Optimizer.cpp:
    # 2168-2203): all DBC vertices are pulled to their full scripted
    # destinations when the CCD-clamped motion cannot complete
    use_al = (
        disp_fn is not None and p.mdbc_al and bool(np.asarray(dbc).any())
    )
    if use_al:
        al_verts = np.where(np.asarray(dbc))[0].astype(np.int32)
        al_m = jnp.asarray(np.asarray(mesh.mass)[al_verts], dtype)
        al_sqrtm = jnp.sqrt(al_m)
        cn_mbc = float(stepper.cn_mbc)
        # AL episode + projected follow-up share one loop; give it headroom
        max_newton = max(max_newton, 160)
    voxel = float(stepper.voxel)

    def aco_update(x_sv, orig, vel):
        """Traced mirror of IPCStepper._step_aco (reference stepAnimScript
        AST_ACOSQUASH/6/SHEAR branches, AnimScripter.cpp:1832-1890): flip
        velocities on the squash-separation conditions, then move each
        plane by a CCD-clamped fraction of vel*dt (HalfSpace::move,
        slackness 0.5). Returns (orig', vel', hsD (n_hs,), veldt)."""
        if aco_kind == "squash" and n_hs >= 2:
            f = jnp.where(orig[1, 0] - orig[0, 0] < 0.1, -1.0, 1.0).astype(dtype)
            vel = vel.at[0, 0].multiply(f).at[1, 0].multiply(f)
        elif aco_kind == "squash6" and n_hs >= 6:
            for a, b, ax, thr in ((0, 1, 0, 0.2), (2, 3, 1, 0.2), (4, 5, 2, 0.2)):
                f = jnp.where(orig[b, ax] - orig[a, ax] < thr, -1.0, 1.0).astype(dtype)
                vel = vel.at[a, ax].multiply(f).at[b, ax].multiply(f)
        elif aco_kind == "squashshear" and n_hs >= 2:
            tgt = vel.at[0].set(0.0).at[1].set(
                jnp.asarray([0.0, 1.0, 0.0], dtype)
            )
            vel = jnp.where(orig[1, 0] - orig[0, 0] < 0.8, tgt, vel)
        veldt = vel * dt
        rows = []
        for i, hs in enumerate(stepper.halfspaces):
            n_i = jnp.asarray(hs_normals[i], dtype)
            D_i = -(orig[i] @ n_i)
            s = hs.move_bound_t(x_sv, veldt[i], D_i, slackness=0.5)
            rows.append(orig[i] + s * veldt[i])
        orig = jnp.stack(rows)
        hsD = -jnp.einsum("ij,ij->i", orig, jnp.asarray(hs_normals, dtype))
        return orig, vel, hsD, veldt

    def x_tilde_of(state):
        g = gravity[None, :].astype(dtype)
        if is_nm:
            beta = p.nm_beta
            xt = (
                state.x_prev
                + dt * state.v
                + beta * dtSq * g
                + (0.5 - beta) * dtSq * state.a
            )
        else:
            xt = state.x_prev + dt * state.v + dtSq * g
        # DBC rows hold at the current (possibly scripted) position — the
        # host path's compute_x_tilde does the same
        return jnp.where(dbc[:, None], state.x, xt)

    def build_cand(x, disp, with_et=True):
        if sc is None:
            return None
        return sc.build_candidates(x, disp, gap, with_et=with_et)

    # compensated (double-float) energy accumulation for f32 runs: the
    # barrier term is ~1e-7 of inertia+elasticity in a contact step, so a
    # plain-f32 `E_try <= E0` cannot see it; (hi, lo) pairs give the line
    # search ~48-bit resolution while staying in f32 TPU vector ops
    # (ops/compensated.py; the f64 reference needs none of this)
    use_df = dtype == jnp.float32 and getattr(p, "compensated_energy", True)
    if use_df:
        from ipc_tpu.ops.compensated import df_add, df_leq, df_sum, df_to_float

        def e_zero():
            z = jnp.asarray(0.0, dtype)
            return (z, z)

        def e_add_s(E, s):  # plain scalar term
            return df_add(E, (s, jnp.zeros_like(s)))

        def e_add_v(E, v):  # per-element term array, df-summed
            return df_add(E, df_sum(v.reshape(-1)))

        def e_add_t(E, t):  # already a (hi, lo) pair
            return df_add(E, t)

        e_leq = df_leq

        def e_sel(c, a, b):
            return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]))

        e_out = df_to_float
    else:

        def e_zero():
            return jnp.asarray(0.0, dtype)

        def e_add_s(E, s):
            return E + s

        def e_add_v(E, v):
            return E + v.sum()

        def e_add_t(E, t):
            return E + t

        def e_leq(a, b):
            return a <= b

        e_sel = jnp.where

        def e_out(E):
            return E

    def _hsd(hsD, i):
        return None if hsD is None else hsD[i]

    def energy(x, x_tilde, kappa, cand, fric, damp, fext=None, act=None,
               hsD=None, alw=None):
        E = e_add_v(e_zero(), w_el * EL.elasticity_energy_per_elem(x, mesh, p.model))
        dxv = x - x_tilde
        E = e_add_v(E, 0.5 * mesh.mass[:, None] * dxv * dxv)
        if alw is not None:
            # moving-DBC augmented Lagrangian (reference augmentMDBCEnergy,
            # AnimScripter.cpp:2302-2309): -sqrt(m) lam.(x-t) + rho/2 m|x-t|^2
            dxt = x[al_verts] - alw["target"]
            E = e_add_s(E, -jnp.sum(al_sqrtm[:, None] * alw["lam"] * dxt))
            E = e_add_s(E, 0.5 * alw["w"] * jnp.sum(al_m[:, None] * dxt * dxt))
        if fext is not None:
            E = e_add_s(E, -w_el * jnp.sum(
                jnp.where(dbc[:, None], 0.0, mesh.mass[:, None] * fext * x)
            ))
        x_sv = x[sv]
        for i, hs in enumerate(stepper.halfspaces):
            E = e_add_s(E, hs.energy(x_sv, kappa, dHat, D=_hsd(hsD, i)))
        if sc is not None:
            # a compacted (possibly line-search-swept) active set evaluates
            # the same barrier sum over ~10-50x fewer rows (see ActiveSet)
            if act is not None:
                E = e_add_t(E, sc.energy_active(x, act, kappa, dHat, df=use_df))
            else:
                E = e_add_s(E, sc.energy(x, cand, kappa, dHat))
        E = e_add_s(E, stepper._friction_energy(x, fric))
        if damp is not None:
            dxd = jnp.where(dbc[:, None], 0.0, x - damp["x_ref"])
            v4 = dxd[mesh.tets].reshape(-1, 12)
            Av = jnp.einsum("tij,tj->ti", damp["blocks"], v4, precision=_HI)
            E = e_add_v(E, 0.5 * v4 * Av)
        return E

    def gradient(x, x_tilde, kappa, cand, fric, damp, fext=None, act=None,
                 hsD=None, alw=None, dbc_t=None):
        g = w_el * EL.elasticity_gradient(x, mesh, p.model, vert_sum=gsum_tet)
        g = g + mesh.mass[:, None] * (x - x_tilde)
        if alw is not None:
            dxt = x[al_verts] - alw["target"]
            g = g.at[al_verts].add(
                -al_sqrtm[:, None] * alw["lam"] + alw["w"] * al_m[:, None] * dxt
            )
        if fext is not None:
            g = g - w_el * mesh.mass[:, None] * fext
        x_sv = x[sv]
        g_sv = jnp.zeros_like(x_sv)
        for i, hs in enumerate(stepper.halfspaces):
            g_sv = g_sv + hs.grad_sv(x_sv, kappa, dHat, D=_hsd(hsD, i))
        g = g.at[sv].add(g_sv)
        if sc is not None:
            g = g + (
                sc.gradient_active(x, act, kappa, dHat)
                if act is not None
                else sc.gradient(x, cand, kappa, dHat)
            )
        g = g + stepper._friction_gradient(x, fric)
        if damp is not None:
            dxd = jnp.where(dbc[:, None], 0.0, x - damp["x_ref"])
            v4 = dxd[mesh.tets].reshape(-1, 12)
            Av = jnp.einsum("tij,tj->ti", damp["blocks"], v4, precision=_HI)
            g = g + gsum_tet(Av.reshape(-1, 3))
        dproj = dbc if dbc_t is None else dbc_t
        return jnp.where(dproj[:, None], 0.0, g)

    # coarse-assembly cadence: the (C,C)-cell scatters cost ~60 ms per
    # call at 100K tets — far too much per Newton iteration — but only a
    # few ms at 6K where fresher preconditioning pays. Lag the assembly to
    # once per step only for large meshes.
    lag_coarse = int(mesh.tets.shape[0]) >= 32768

    def assemble_coarse(x, kappa, cand, fric, damp, hsD=None):
        """Exact Galerkin coarse matrix of every block family (a one-step-
        stale preconditioner is still SPD and nearly as effective; AL pull
        blocks are omitted — preconditioner quality only)."""
        if coarse_assemble is None:
            return None
        Hel = w_el * EL.elasticity_hessian_blocks(x, mesh, p.model, True)
        if damp is not None:
            Hel = Hel + damp["blocks"]
        x_sv = x[sv]
        Hsv = jnp.zeros((sv.shape[0], 3, 3), x.dtype)
        for i, hs in enumerate(stepper.halfspaces):
            Hsv = Hsv + hs.hess_blocks_sv(x_sv, kappa, dHat, D=_hsd(hsD, i))
        contribs = [(sv[:, None], Hsv)]
        if sc is not None:
            vids_act, H_act, _ = sc.hessian_blocks_active(
                x, cand, kappa, dHat, True
            )
            contribs.append((vids_act, H_act))
        for ids, Hf in stepper._friction_hessians(x, fric):
            contribs.append((ids, Hf))
        return coarse_assemble(mesh.mass, contribs, tet_H=Hel)

    def search_dir(x, x_tilde, kappa, cand, fric, damp, fext=None, dx0=None,
                   Ainv_c=None, hsD=None, alw=None, dbc_t=None):
        if not lag_coarse and coarse_assemble is not None:
            Ainv_c = None  # assembled fresh below
        from ipc_tpu.parallel.spmd import constrain

        if dbc_t is None:
            dbc_t = dbc
        # ONE candidate->active compaction per Newton iteration feeds the
        # barrier gradient AND the 12x12 block construction
        act = sc.active_set(x, cand, dHat) if sc is not None else None
        g = constrain(gradient(x, x_tilde, kappa, cand, fric, damp, fext, act,
                               hsD, alw, dbc_t))
        Hel = w_el * EL.elasticity_hessian_blocks(x, mesh, p.model, True)
        if damp is not None:
            Hel = Hel + damp["blocks"]
        x_sv = x[sv]
        Hsv = jnp.zeros((sv.shape[0], 3, 3), x.dtype)
        for i, hs in enumerate(stepper.halfspaces):
            Hsv = Hsv + hs.hess_blocks_sv(x_sv, kappa, dHat, D=_hsd(hsD, i))
        fric_blocks = stepper._friction_hessians(x, fric)
        if sc is not None:
            vids_act, H_act, active_count = sc.hessian_blocks_from_active(
                x, act, kappa, dHat, True
            )
        else:
            vids_act = H_act = None
            active_count = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        tets = mesh.tets

        def scatter12(out, vids, H, v):
            v4 = v[vids].reshape(-1, 12)
            hv = jnp.einsum("cij,cj->ci", H, v4, precision=_HI)
            return out.at[vids.reshape(-1)].add(hv.reshape(-1, 3))

        Ht_pallas = hv_prep_H(Hel) if hv_plan is not None else None

        def scatter12_tet(out, H, v):
            if hv_plan is not None:
                # pallas window kernel: no row gathers, one-hot MXU
                # selection (exact), block-padded rows drop into a sink
                return out + gsum_hv(hv_rows_fn(Ht_pallas, v))
            # static topology: gather-sum instead of scatter-add
            v4 = v[tets].reshape(-1, 12)
            hv = jnp.einsum("cij,cj->ci", H, v4, precision=_HI)
            return out + gsum_tet(hv.reshape(-1, 3))

        def operator(v):
            v = jnp.where(dbc_t[:, None], 0.0, v)
            out = mesh.mass[:, None] * v
            if alw is not None:
                out = out.at[al_verts].add(
                    (alw["w"] * al_m)[:, None] * v[al_verts]
                )
            out = scatter12_tet(out, Hel, v)
            out = out.at[sv].add(jnp.einsum("vij,vj->vi", Hsv, v[sv], precision=_HI))
            if H_act is not None:
                out = scatter12(out, vids_act, H_act, v)
            for ids, Hf in fric_blocks:
                out = scatter12(out, ids, Hf, v)
            out = jnp.where(dbc_t[:, None], 0.0, out)
            return jnp.where(dbc_t[:, None], v, out)

        # corner-diagonal 3x3 blocks of (N,12,12) via ONE static column
        # gather (element (c,i,c,j) sits at flat column c*39 + i*12 + j;
        # per-corner slicing materializes 16 badly-laid-out slices instead)
        dix = jnp.asarray(
            [c * 39 + i * 12 + j for c in range(4) for i in range(3) for j in range(3)],
            jnp.int32,
        )

        def diag_blocks12(H):
            return jnp.take(H.reshape(H.shape[0], 144), dix, axis=1).reshape(
                -1, 4, 3, 3
            )

        def diag12(diag, vids, H):
            return diag.at[vids.reshape(-1)].add(diag_blocks12(H).reshape(-1, 3, 3))

        diag = mesh.mass[:, None, None] * jnp.eye(3, dtype=x.dtype)[None]
        if alw is not None:
            diag = diag.at[al_verts].add(
                (alw["w"] * al_m)[:, None, None]
                * jnp.eye(3, dtype=x.dtype)[None]
            )
        diag = diag + gsum_tet(diag_blocks12(Hel).reshape(-1, 3, 3))
        diag = diag.at[sv].add(Hsv)
        if H_act is not None:
            diag = diag12(diag, vids_act, H_act)
        for ids, Hf in fric_blocks:
            diag = diag12(diag, ids, Hf)
        eye = jnp.eye(3, dtype=x.dtype)[None]
        diag = jnp.where(dbc_t[:, None, None], eye, diag)
        inv_diag = block_jacobi_inverse(diag)

        if not lag_coarse and coarse_assemble is not None:
            contribs = [(sv[:, None], Hsv)]
            if H_act is not None:
                contribs.append((vids_act, H_act))
            for ids, Hf in fric_blocks:
                contribs.append((ids, Hf))
            Ainv_c = coarse_assemble(mesh.mass, contribs, tet_H=Hel)
        if Ainv_c is not None:
            def precond(r):
                return apply_block_precond(inv_diag, r) + coarse_term(Ainv_c, r)
        else:
            def precond(r):
                return apply_block_precond(inv_diag, r)

        dx, iters, rel = pcg(
            operator,
            -g,
            precond,
            x0=dx0,
            tol=p.pcg_tol,
            maxiter=p.pcg_maxiter,
        )
        # GD fail-safe on PCG breakdown (see timestepper.search_dir)
        bad = (~jnp.isfinite(dx).all()) | (~jnp.isfinite(rel)) | (rel > 1.0)
        dx = jnp.where(bad, apply_block_precond(inv_diag, -g), dx)
        return dx, g, iters, active_count

    def feasible_alpha_local(x, dx, hsD=None, dbc_sv_t=None):
        """Inversion cubic + analytic half-space bound (no mesh CCD)."""
        if dbc_sv_t is None:
            dbc_sv_t = dbc_sv
        alpha = jnp.asarray(1.0, dtype)
        alpha = jnp.minimum(alpha, EL.filter_step_size(x, dx, mesh, p.model))
        x_sv = x[sv]
        p_sv = dx[sv]
        for i, hs in enumerate(stepper.halfspaces):
            alpha = jnp.minimum(
                alpha,
                hs.largest_feasible_step(
                    x_sv, p_sv, dbc_sv_t, p.ccd_slackness_a, D=_hsd(hsD, i)
                ),
            )
        return alpha

    def init_kappa(x, x_tilde, cand, hsD=None):
        """Device initKappa: balance unit-kappa contact gradient."""
        g_E = w_el * EL.elasticity_gradient(
            x, mesh, p.model, vert_sum=gsum_tet
        ) + mesh.mass[:, None] * (x - x_tilde)
        x_sv = x[sv]
        g_sv = jnp.zeros_like(x_sv)
        for i, hs in enumerate(stepper.halfspaces):
            g_sv = g_sv + hs.grad_sv(x_sv, 1.0, dHat, D=_hsd(hsD, i))
        g_c = jnp.zeros_like(x).at[sv].add(g_sv)
        if sc is not None:
            g_c = g_c + sc.gradient_active(
                x, sc.active_set(x, cand, dHat), 1.0, dHat
            )
        free = ~dbc[:, None]
        g_E = jnp.where(free, g_E, 0.0)
        g_c = jnp.where(free, g_c, 0.0)
        denom = jnp.sum(g_c * g_c)
        min_k = -jnp.sum(g_c * g_E) / jnp.where(denom > 0, denom, 1.0)
        kappa = jnp.where((denom > 0) & (min_k > 0), jnp.maximum(min_k, kappa_sug), kappa_sug)
        return jnp.minimum(kappa, kappa_max)

    def capture_friction(x, x_prev, kappa, cand, hsD=None, hs_veldt=None):
        if not solve_fric:
            return None
        x_sv = x[sv]
        hs_lams = []
        for i, hs in enumerate(stepper.halfspaces):
            if hs.params.friction > 0.0:
                D_i = _hsd(hsD, i)
                m = hs.active_mask(x_sv, dHat, D=D_i)
                hs_lams.append(hs.friction_lambda(x_sv, m, kappa, dHat, D=D_i))
            else:
                hs_lams.append(None)
        sc_state = None
        if sc is not None and (sc.friction > 0.0 or sc.vert_mu is not None):
            sc_state = sc.capture_friction(x, cand, kappa, dHat)
        return dict(
            hs=hs_lams,
            sc=sc_state,
            anchor=x_prev,
            # the jit path runs no fricDHat homotopy (see module docstring);
            # use the target smoothing directly
            eps2=jnp.asarray(stepper.fric_dhat_target, dtype),
            # moving planes drag their contacts (VDiff -= velocitydt,
            # HalfSpace.cpp:286); only squashshear sets a nonzero veldt
            hs_veldt=hs_veldt,
        )

    def newton_solve(x, x_tilde, kappa, fric, cand0, damp, fext=None,
                     Ainv_c=None, hsD=None, al0=None, carry=None,
                     burst=None):
        """Newton loop with candidate carrying: the swept candidate set
        built in iteration k (gap sqrt(dHat), swept along the accepted
        step) provably covers every pair within sqrt(dHat) of iterate
        k+1, so ONE broad phase per iteration serves the next gradient/
        Hessian, the CCD, and every line-search trial (the reference
        instead rebuilds its hash per iteration AND per trial,
        Optimizer.cpp:2766-2805).

        `al0` (moving-DBC AL, only when use_al): dict(target (n_al,3),
        denom scalar, blocked bool). The loop starts in AL mode when
        blocked: DBC rows unprojected, AL pull active, rho/lambda schedule
        per reference Optimizer.cpp:2176-2203; on completion the mode flag
        flips in the carry and the remaining iterations run projected."""

        def cond(c):
            go = (~c["done"]) & (c["k"] < max_newton)
            if burst is not None:
                # bounded-dispatch mode: the axon tunnel kills any single
                # dispatch at ~60 s wall (measured, tools/
                # tpu_watchdog_probe.py: a pure-matmul while_loop died at
                # 62 s with the same UNAVAILABLE error as every contact-
                # rich battery scene). Capping iterations per dispatch and
                # looping on the host keeps each dispatch under the limit.
                go = go & (c["j"] < burst)
            return go

        def body(c):
            x = c["x"]
            cand = c["cand"]
            kappa = c["kappa"]
            if al0 is not None:
                al_in = c["al"]
                fal = jnp.where(al_in, 1.0, 0.0).astype(dtype)
                alw = dict(
                    w=fal * c["rho"],
                    lam=fal[None, None] * c["lam"],
                    target=al0["target"],
                )
                dbc_t = dbc & ~al_in
                dbc_sv_t = dbc_sv & ~al_in
            else:
                al_in = jnp.asarray(False)
                alw = None
                dbc_t = None
                dbc_sv_t = None
            # PCG warm start: successive Newton directions are highly
            # correlated, so seed with the previous one
            dx, g, pcg_iters, active_count = search_dir(
                x, x_tilde, kappa, cand, fric, damp, fext, c["dx"], Ainv_c,
                hsD, alw, dbc_t
            )
            dist = jnp.abs(dx).max()
            # AL mode has its own termination (completion flips the mode);
            # the gradient-residual test applies only once projected
            converged = (c["k"] > 0) & (dist < target_gres) & (~al_in)

            alpha0 = feasible_alpha_local(x, dx, hsD, dbc_sv_t)
            # swept-span clamp (reference swept SpatialHash::build,
            # SpatialHash.hpp:613-618: spanSize = alpha * mean |searchDir
            # components over surface verts| / voxelSize; alpha /= spanSize
            # when > 1 "for CCD spatial hash efficiency"). For this
            # fixed-shape broad phase it is also the memory guard: an
            # unclamped degenerate sweep (floppy-sheet Newton direction)
            # inflates the shared grid cell until one bucket holds most
            # primitives (mat100x100 regrew to a 330 GB request,
            # BATTERY_r3.json). A 16-voxel max-travel rule additionally
            # bounds single-outlier sweeps a mean cannot see. Measured in
            # the CO-MOVING frame (see SelfContact.build_candidates): the
            # broad phase subtracts the mean displacement, so a rigid
            # common motion neither inflates the grid nor costs step size.
            p_sv = dx[sv]
            p_sv_abs = jnp.abs(p_sv - jnp.mean(p_sv, axis=0))
            span = alpha0 * p_sv_abs.mean() / voxel
            alpha1 = jnp.where(span > 1.0, alpha0 / span, alpha0)
            alpha1 = jnp.minimum(
                alpha1, 16.0 * voxel / jnp.maximum(p_sv_abs.max(), 1e-30)
            )
            clamped = alpha1 < alpha0
            alpha0 = alpha1
            if sc is not None:
                # ONE fused broad phase per iteration: the swept candidates
                # carry the PT/EE barrier+CCD stencils AND the edge-triangle
                # pairs for the line-search intersection predicate (swept by
                # the pre-CCD alpha0*dx, a superset of any accepted step)
                cand_sweep = build_cand(x, alpha0 * dx)
                t = sc.ccd_alpha(
                    x, alpha0 * dx, cand_sweep, 1.0 - p.ccd_slackness_m, p.ccd_max_iter
                )
                alpha0 = alpha0 * t
                et_p, et_v = cand_sweep.et_pairs, cand_sweep.et_valid
            else:
                cand_sweep = cand
            # ONE swept compaction serves E0 and every line-search trial:
            # pairs that can reach d^2 < dHat anywhere on [x, x+alpha0*dx]
            # (per-pair travel bound; 2x the point-active capacity)
            ls_act = (
                sc.active_set(x, cand_sweep, dHat, disp=alpha0 * dx, cap_scale=2)
                if sc is not None
                else None
            )
            E0 = energy(x, x_tilde, kappa, cand_sweep, fric, damp, fext, ls_act,
                        hsD, alw)

            def ls_cond(ls):
                alpha, j, ok, E_last = ls
                return (~ok) & (j < max_linesearch)

            def ls_body(ls):
                alpha, j, ok, E_last = ls
                x_try = x + alpha * dx
                E_try = energy(
                    x_try, x_tilde, kappa, cand_sweep, fric, damp, fext, ls_act,
                    hsD, alw
                )
                good = e_leq(E_try, E0)
                if sc is not None:
                    good = good & (~sc.intersects_pairs(x_try, et_p, et_v))
                alpha_next = jnp.where(good, alpha, alpha * 0.5)
                return alpha_next, j + 1, good, E_try

            alpha, _, accepted, E_acc = jax.lax.while_loop(
                ls_cond, ls_body,
                (alpha0, jnp.asarray(0, jnp.int32), jnp.asarray(False), E0),
            )
            # stall detection: an exhausted or vanishing line search means
            # the iterate is at the dtype's energy noise floor (f32 runs hit
            # this well above target_gres); stop instead of spinning to the
            # iteration cap (the reference's tiny-step fail-safes play the
            # same role, Optimizer.cpp:2067-2149)
            stalled = (~accepted) | (alpha < 1e-6)
            x_new = jnp.where(accepted, x + alpha * dx, x)
            # the accepted trial's energy IS E(x_new) (same candidate set);
            # when rejected x_new == x and E0 applies — no extra energy eval
            E_new = e_sel(accepted, E_acc, E0)

            from ipc_tpu.parallel.spmd import constrain as _cstr

            take = ~converged
            # postLineSearch adaptive-kappa doubling (reference
            # Optimizer.cpp:2356-2446): if an accepted step let any
            # previously-close constraint (d^2 < dTol at x) get no farther,
            # double kappa for the remaining iterations. Same-constraint
            # pre/post comparison over this iteration's compacted active
            # set + the analytic half-space distances (fixed shapes).
            if p.adaptive_kappa and (ls_act is not None or stepper.halfspaces):
                import ipc_tpu.contact.selfcollision as _SC

                def _closer(xa, xb):
                    got = jnp.asarray(False)
                    if ls_act is not None:
                        dp0, de0 = _SC.active_dist2(
                            xa, ls_act.vids_p, ls_act.vids_e
                        )
                        dp1, de1 = _SC.active_dist2(
                            xb, ls_act.vids_p, ls_act.vids_e
                        )
                        got |= jnp.any(
                            ls_act.ok_p & (dp0 < dTol) & (dp1 <= dp0)
                        )
                        got |= jnp.any(
                            ls_act.ok_e & (de0 < dTol) & (de1 <= de0)
                        )
                    # the reference's close-constraint set holds only
                    # non-DBC codim-3 vertices (CollisionObject.h
                    # computeConstraintSet: !isDBCVertex && vICoDim==3); a
                    # pinned vertex resting within dTol of a plane must not
                    # ratchet kappa to the clamp
                    for i_hs, hs in enumerate(stepper.halfspaces):
                        h0 = hs.dist2(xa[sv], D=_hsd(hsD, i_hs))
                        h1 = hs.dist2(xb[sv], D=_hsd(hsD, i_hs))
                        got |= jnp.any((~dbc_sv) & (h0 < dTol) & (h1 <= h0))
                    return got

                double = accepted & take & _closer(x, x_new)
                kappa_next = jnp.where(
                    double, jnp.minimum(kappa * 2.0, kappa_max), kappa
                )
            else:
                double = jnp.asarray(False)
                kappa_next = kappa

            out = dict()
            if al0 is not None:
                # moving-DBC AL control after the accepted iterate
                # (reference Optimizer.cpp:2176-2203): completion (moved >
                # 1-1e-3) flips to projected mode; otherwise double rho on
                # regressing progress, and near the MDBC tolerance either
                # double rho (incomplete) or update lambda (converging).
                rho, lam = c["rho"], c["lam"]
                dxt_new = x_new[al_verts] - al0["target"]
                moved = 1.0 - jnp.sqrt(jnp.sum(dxt_new * dxt_new)) / al0["denom"]
                finished = (moved > 1.0 - 1e-3) | (c["k"] >= 100)
                apply = al_in & (~finished)
                grow_a = (moved < c["lastmv"]) & (rho < 1e8)
                near = dist < cn_mbc
                grow_b = (~grow_a) & near & (moved < 0.99) & (rho < 1e8)
                upd_lam = (~grow_a) & near & ~((moved < 0.99) & (rho < 1e8))
                out["rho"] = jnp.where(apply & (grow_a | grow_b), rho * 2.0, rho)
                out["lam"] = jnp.where(
                    apply & upd_lam,
                    lam - rho * al_sqrtm[:, None] * dxt_new,
                    lam,
                )
                out["lastmv"] = jnp.where(apply, moved, c["lastmv"])
                # a stalled line search also ends the AL episode (the host
                # path breaks out of the AL sub-solve and continues with the
                # projected follow-up, timestepper._solve_mdbc_al)
                out["al"] = al_in & (~finished) & (~stalled)
                out["al_iters"] = c["al_iters"] + jnp.where(al_in, 1, 0)
            return dict(
                **out,
                kappa=kappa_next,
                n_doubles=c["n_doubles"] + double.astype(jnp.int32),
                x=_cstr(jnp.where(take, x_new, x)),
                cand=cand_sweep,
                dx=dx,
                j=c["j"] + 1,
                k=c["k"] + jnp.where(take, 1, 0),
                done=converged | (stalled & (~al_in)),
                n_clamps=c["n_clamps"] + (clamped & take).astype(jnp.int32),
                dist=dist,
                alpha=jnp.where(take, alpha, c["alpha"]),
                energy=jnp.where(take, e_out(E_new), c["energy"]),
                pt_count=jnp.maximum(c["pt_count"], cand.pt_count if cand is not None else 0),
                ee_count=jnp.maximum(c["ee_count"], cand.ee_count if cand is not None else 0),
                et_count=jnp.maximum(c["et_count"], cand_sweep.et_count if cand_sweep is not None else 0),
                # the swept set lives in a 2x-capacity buffer, so its count
                # demands cap_act >= ceil(cnt/2) — fold into the same max
                active_pt_max=jnp.maximum(
                    jnp.maximum(c["active_pt_max"], active_count[0]),
                    (ls_act.cnt_pt + 1) // 2 if ls_act is not None else 0,
                ),
                active_ee_max=jnp.maximum(
                    jnp.maximum(c["active_ee_max"], active_count[1]),
                    (ls_act.cnt_ee + 1) // 2 if ls_act is not None else 0,
                ),
                pcg_total=c["pcg_total"] + jnp.where(take, pcg_iters, 0),
                bucket_ov=jnp.maximum(
                    c["bucket_ov"],
                    cand_sweep.bucket_overflow if cand_sweep is not None else 0,
                ),
            )

        init = dict(
            kappa=jnp.asarray(kappa, dtype),
            n_doubles=jnp.asarray(0, jnp.int32),
            x=x,
            cand=cand0,
            dx=jnp.zeros_like(x),
            j=jnp.asarray(0, jnp.int32),
            k=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            dist=jnp.asarray(jnp.inf, dtype),
            alpha=jnp.asarray(1.0, dtype),
            energy=jnp.asarray(0.0, dtype),
            pt_count=jnp.asarray(0, jnp.int32),
            ee_count=jnp.asarray(0, jnp.int32),
            et_count=jnp.asarray(0, jnp.int32),
            active_pt_max=jnp.asarray(0, jnp.int32),
            active_ee_max=jnp.asarray(0, jnp.int32),
            pcg_total=jnp.asarray(0, jnp.int32),
            n_clamps=jnp.asarray(0, jnp.int32),
            bucket_ov=cand0.bucket_overflow if cand0 is not None else jnp.asarray(0, jnp.int32),
        )
        if al0 is not None:
            init.update(
                al=al0["blocked"],
                rho=jnp.asarray(1.0e6, dtype),
                lam=jnp.zeros((al_verts.shape[0], 3), dtype),
                lastmv=jnp.asarray(0.0, dtype),
                al_iters=jnp.asarray(0, jnp.int32),
            )
        if carry is not None:
            init = dict(carry, j=jnp.asarray(0, jnp.int32))
        return jax.lax.while_loop(cond, body, init)

    need_aux = turn is not None or hs_moving

    def _prologue(state: SimState):
        """Everything before the Newton loop: scripted motion, warm start,
        kappa init, friction capture, candidate build. Returns the
        (possibly script-advanced) state, aux_out, script_scale, and the
        newton_solve argument dict."""
        if need_aux and not isinstance(state.aux, dict):
            raise ValueError(
                "this scene carries device-script state (turning rules / "
                "moving planes): initialize SimState.aux with "
                "jit_step.initial_device_aux(stepper) before stepping"
            )
        aux_out = dict(state.aux) if isinstance(state.aux, dict) else None
        x_s = state.x
        # velocity turning points (reference velocityTurningPoints handling
        # in stepAnimScript): evaluate the traced rules at the current
        # positions, persist sign/active in aux, and scale the scripted
        # linear velocities by the resulting per-group/handle factors
        gfac = hfac = None
        if turn is not None:
            tsign, tact = turn.update(
                x_s, state.aux["turn_sign"], state.aux["turn_active"]
            )
            aux_out["turn_sign"], aux_out["turn_active"] = tsign, tact
            gfac, hfac = turn.gfac(tsign), turn.hfac(tsign)
        # ACO moving analytic planes: advance origins/velocities in aux and
        # hand every kernel below the current traced plane offsets
        hsD = None
        hs_veldt = None
        if hs_moving:
            orig, avel, hsD, veldt = aco_update(
                x_s[sv], state.aux["hs_origin"], state.aux["aco_vel"]
            )
            aux_out["hs_origin"], aux_out["aco_vel"] = orig, avel
            if aco_kind == "squashshear":
                hs_veldt = [veldt[i] for i in range(n_hs)]
        script_scale = jnp.asarray(1.0, dtype)
        al0 = None
        if disp_fn is not None:
            # scripted DBC motion, clamped exactly like the reference
            # stepAnimScript: elasticity inversion filter + swept-span
            # clamp + mesh CCD + intersection backtracking
            # (AnimScripter.cpp:2158-2250). The ET pairs are built swept by
            # the clamped displacement so one broad phase covers every
            # trial. A completed fraction < 1 raises the moving-DBC AL mode
            # inside the Newton loop (al0 below).
            disp = disp_fn(x_s, state.t, gfac, hfac)
            script_scale = jnp.minimum(
                script_scale, EL.filter_step_size(x_s, disp, mesh, p.model)
            )
            # co-moving magnitude, like the Newton-direction clamp above
            d_sv = disp[sv]
            d_sv_abs = jnp.abs(d_sv - jnp.mean(d_sv, axis=0))
            span = script_scale * d_sv_abs.mean() / voxel
            script_scale = jnp.where(
                span > 1.0, script_scale / span, script_scale
            )
            script_scale = jnp.minimum(
                script_scale,
                16.0 * voxel / jnp.maximum(d_sv_abs.max(), 1e-30),
            )
            if sc is not None:
                cand_s = build_cand(x_s, script_scale * disp)
                script_scale = script_scale * sc.ccd_alpha(
                    x_s, script_scale * disp, cand_s,
                    1.0 - p.ccd_slackness_m, p.ccd_max_iter,
                )

                def sb_cond(c):
                    s, done = c
                    return (~done) & (s > 1e-6)

                def sb_body(c):
                    s, _ = c
                    hit = sc.intersects_pairs(
                        x_s + s * disp, cand_s.et_pairs, cand_s.et_valid
                    )
                    return jnp.where(hit, s * 0.5, s), ~hit

                script_scale, ok = jax.lax.while_loop(
                    sb_cond, sb_body, (script_scale, jnp.asarray(False))
                )
                script_scale = jnp.where(ok, script_scale, 0.0)
            if use_al:
                # full scripted destinations of the DBC vertices (reference
                # targetPos, AnimScripter.cpp:2151-2158); blocked when the
                # clamps kept the motion from completing
                dnorm = jnp.sqrt(jnp.sum(disp * disp))
                al0 = dict(
                    target=x_s[al_verts] + disp[al_verts],
                    denom=jnp.maximum(dnorm, 1e-30),
                    blocked=(script_scale < 1.0 - 1e-3) & (dnorm > 0.0),
                )
            state = replace(
                state, x=x_s + script_scale * disp, x_prev=state.x_prev
            )
        fext = fext_fn(state.t) if fext_fn is not None else None
        x_tilde = x_tilde_of(state)
        if al0 is not None:
            # AL mode frees the DBC rows: their inertia target is the last
            # committed position (reference computeXTilta keeps V_prev for
            # DBC vertices; host mirror timestepper._solve_mdbc_al)
            x_tilde = jnp.where(
                dbc[:, None] & al0["blocked"], state.x_prev, x_tilde
            )
        x0 = state.x
        # warm start: feasibility-filtered inertia predictor (reference
        # initX mode 1 family, Optimizer.cpp:924-1233) — saves roughly one
        # Newton iteration per step in free flight and is CCD-safe
        dx0 = x_tilde - x0
        dx0 = jnp.where(dbc[:, None], 0.0, dx0)
        a0 = feasible_alpha_local(x0, dx0, hsD)
        if sc is not None:
            # ONE swept broad phase serves the warm-start CCD AND the first
            # Newton iteration: the sweep covers [x0, x0 + a0*dx0], so its
            # candidate set is a superset of any unswept build at the
            # accepted endpoint (distance filters downstream discard the
            # extras). Building a separate cand0 here would add a fourth
            # identical broad-phase region to the compiled program — a
            # measurable share of the 25-35 min TPU compiles of scripted
            # scenes.
            cand_ws = build_cand(x0, a0 * dx0, with_et=False)
            a0 = a0 * sc.ccd_alpha(
                x0, a0 * dx0, cand_ws, 1.0 - p.ccd_slackness_m, p.ccd_max_iter
            )
            cand0 = cand_ws
        else:
            cand0 = None
        x0 = x0 + a0 * dx0
        kappa = (
            init_kappa(x0, x_tilde, cand0, hsD)
            if p.adaptive_kappa
            else jnp.asarray(
                min(p.kappa, kappa_max) if p.kappa > 0 else kappa_sug, dtype
            )
        )
        fric = capture_friction(x0, state.x_prev, kappa, cand0, hsD, hs_veldt)
        damp = None
        if p.damping_stiff > 0.0:
            blocks = (p.damping_stiff / dt) * EL.elasticity_hessian_blocks(
                state.x_prev, mesh, p.model, True
            )
            damp = dict(blocks=blocks, x_ref=state.x_prev)
        Ainv_c0 = (
            assemble_coarse(x0, kappa, cand0, fric, damp, hsD)
            if lag_coarse
            else None
        )
        return state, aux_out, script_scale, dict(
            x0=x0, x_tilde=x_tilde, kappa=kappa, fric=fric, cand0=cand0,
            damp=damp, fext=fext, Ainv_c0=Ainv_c0, hsD=hsD, al0=al0,
        )

    def _epilogue(state, aux_out, script_scale, fric, out):
        """Velocity/acceleration update + stats from the final Newton
        carry (BE or Newmark per is_nm)."""
        x = out["x"]
        if is_nm:
            g = gravity[None, :].astype(dtype)
            beta, gamma = p.nm_beta, p.nm_gamma
            v = state.v + dt * (1.0 - gamma) * state.a
            a = (x - x_tilde) / (dtSq * beta) + g
            v = v + dt * gamma * a
        else:
            v = (x - state.x_prev) / dt
            a = (v - state.v) / dt
        new_state = replace(
            state, x=x, x_prev=x, v=v, a=a, t=state.t + dt,
            step=state.step + 1, aux=aux_out,
        )
        stats = JitStepStats(
            newton_iters=out["k"],
            kappa=out["kappa"],
            kappa_doublings=out["n_doubles"],
            dist_to_opt=out["dist"],
            pt_count=out["pt_count"],
            ee_count=out["ee_count"],
            et_count=out["et_count"],
            active_pt_max=out["active_pt_max"],
            active_ee_max=out["active_ee_max"],
            last_alpha=out["alpha"],
            energy=out["energy"],
            pcg_iters_total=out["pcg_total"],
            script_scale=script_scale,
            bucket_overflow=out["bucket_ov"],
            fric_count=(
                fric["sc"]["count"]
                if fric is not None and fric.get("sc") is not None
                else jnp.asarray(0, jnp.int32)
            ),
            al_iters=out.get("al_iters", jnp.asarray(0, jnp.int32)),
            sweep_clamps=out["n_clamps"],
        )
        return new_state, stats

    def step(state: SimState):
        state, aux_out, script_scale, pa = _prologue(state)
        out = newton_solve(
            pa["x0"], pa["x_tilde"], pa["kappa"], pa["fric"], pa["cand0"],
            pa["damp"], pa["fext"], pa["Ainv_c0"], pa["hsD"], pa["al0"]
        )
        return _epilogue(state, aux_out, script_scale, pa["fric"], out)

    if burst is not None:
        # bounded-dispatch mode (see newton_solve's cond): three compiled
        # programs + a host loop, so no single dispatch can trip the
        # tunnel's ~60 s wall limit. The carry and argument pytrees stay
        # on device between dispatches.
        def begin(state: SimState):
            state, aux_out, script_scale, pa = _prologue(state)
            carry = newton_solve(
                pa["x0"], pa["x_tilde"], pa["kappa"], pa["fric"],
                pa["cand0"], pa["damp"], pa["fext"], pa["Ainv_c0"],
                pa["hsD"], pa["al0"], burst=0,
            )
            return state, aux_out, script_scale, pa, carry

        def run_burst(pa, carry):
            return newton_solve(
                carry["x"], pa["x_tilde"], carry["kappa"], pa["fric"],
                pa["cand0"], pa["damp"], pa["fext"], pa["Ainv_c0"],
                pa["hsD"], pa["al0"], carry=carry, burst=burst,
            )

        def finish(state, aux_out, script_scale, pa, carry):
            return _epilogue(state, aux_out, script_scale, pa["fric"], carry)

        return jax.jit(begin), jax.jit(run_burst), jax.jit(finish), max_newton

    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)
