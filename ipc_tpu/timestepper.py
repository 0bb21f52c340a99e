"""Projected-Newton interior-point time stepper.

The TPU-native replacement for the reference's Optimizer<3>
(reference: src/TimeStepper/Optimizer.hpp/.cpp): backward-Euler incremental
potential minimization with barrier contact, adaptive kappa, feasible-step
filtering (element inversion + half-space closed form + mesh CCD),
backtracking line search with intersection safeguard, and lagged friction —
organized as jitted fixed-shape kernels driven by a thin host loop (the
Newton iteration count and homotopy schedule are data-dependent; everything
inside an iteration runs on device).

Objective per step (BE; reference computeEnergyVal, Optimizer.cpp:3198-3404):

    E(x) = 1/2 ||x - xTilde||^2_M            (inertia)
         + h^2 Psi(x)                        (elasticity)
         - h^2 sum m_v f_NBC . x_v           (Neumann BC work)
         + kappa * sum_k b(d_k, dHat)        (contact barrier, all candidate
                                              pairs; dup-counting is implicit
                                              in the candidate sum)
         + sum_k mu lam_k f0(|u_k|)          (lagged friction)

with xTilde = x_prev + h v + h^2 g (reference computeXTilta,
Optimizer.cpp:1235-1278). Newton direction solves (M + h^2 H_Psi + kappa H_b
+ H_f) p = -grad with SPD-projected blocks via matrix-free PCG.

Adaptive kappa follows the reference (suggestKappa/initKappa/upperBoundKappa
Optimizer.cpp:2215-2313, doubling in postLineSearch :2356-2446).
Convergence: ||p||_inf < targetGRes = sqrt(relGL2Tol * bboxDiag^2 * h^2)
(updateTargetGRes, Optimizer.cpp:2941-2945).

The per-Newton-iteration pipeline mirrors solveSub_IP (Optimizer.cpp:
1821-2213): candidates (constraint set) -> gradient/Hessian -> PCG ->
feasible step (inversion cubic + half-space closed form + ACCD over swept
candidates) -> backtracking line search with intersection safeguard ->
adaptive-kappa update.
"""

from dataclasses import dataclass, field
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ipc_tpu.energy import elasticity as EL
from ipc_tpu.solver.pcg import apply_block_precond, block_jacobi_inverse, pcg

_HI = jax.lax.Precision.HIGHEST

__all__ = ["SimParams", "SimState", "IPCStepper", "StepStats"]


@dataclass(frozen=True)
class SimParams:
    """Static solve parameters (host floats; defaults = reference defaults,
    src/Config.hpp:90-145, src/TimeStepper/Optimizer.cpp:69-346)."""

    dt: float = 0.025
    gravity: tuple = (0.0, -9.80665, 0.0)
    model: str = "NH"
    dhat_rel: float = 1e-3  # dHat = dhat_rel^2 * bboxDiag2 (squared units)
    epsv_rel: float = 1e-3  # per second
    # the reference's CODE fallback is 1e-8 (Optimizer.cpp:97) but every
    # shipped scene sets `tol 1e-2` -> relGL2Tol = 1e-4 (README "Script
    # Settings"); use the practical default — it is also what keeps f32
    # above its convergence noise floor
    rel_gl2_tol: float = 1e-4
    dtol_rel: float = 1e-9
    kappa: float = 0.0  # 0 -> suggest + adaptive
    kappa_min_mult: float = 1e11
    adaptive_kappa: bool = True
    fric_iter_amt: int = 1
    warm_start: int = 0  # reference initX modes (Optimizer.cpp:924-1233):
                         # 0 none; 1 explicit Euler dt*v; 2 xHat predictor
                         # dt*v + g dt^2 (BE) / + g dt^2/2 (NM); 3 symplectic
                         # Euler (adds dx_Elastic); 4 uniformly-accelerated
                         # (adds dx_Elastic/2). All are feasibility-filtered
                         # (inversion + CCD) before acceptance.
    max_newton: int = 10000
    # inexact Newton: a loose relative linear-solve tolerance; the Armijo
    # line search guarantees descent regardless (any PCG iterate of an SPD
    # system applied to -g is a descent direction)
    pcg_tol: float = 1e-2
    pcg_maxiter: int = 1000
    # two-level aggregation preconditioner (solver/coarse.py) — the analog
    # of the reference's AMGCL smoothed-aggregation option
    coarse_precond: bool = True
    # "pcg" (production, matrix-free) or "dense" (exact Cholesky on the
    # assembled system; the CHOLMOD/EigenLibSolver-role debug path,
    # solver/direct.py — O(V^2) memory, small scenes only)
    linsys: str = "pcg"
    # moving-DBC augmented Lagrangian: when scripted motion cannot complete
    # (CCD/intersection-limited), free the DBC verts and pull them to their
    # targets with an AL penalty (reference m_projectDBC/rho_DBC machinery,
    # Optimizer.cpp:2168-2203, AnimScripter.cpp:2302-2380)
    mdbc_al: bool = True
    ccd_slackness_a: float = 0.9  # analytic CO step slack (solveSub_IP :1885)
    ccd_slackness_m: float = 0.8  # mesh CCD: keep 1-slackness of the gap
    ccd_max_iter: int = 64
    dhat_target_rel: float = 1e-3  # sqrt-units; homotopy stops here
                                   # (reference dHatTarget, Optimizer.cpp:283-289)
    time_integration: str = "BE"
    nm_beta: float = 0.25
    nm_gamma: float = 0.5
    damping_stiff: float = 0.0
    # friction-smoothing homotopy (reference fricDHat0/fricDHatTarget from
    # tuning[4]/tuning[5], Optimizer.cpp:291-304; sqrt-units relative to
    # bboxDiag, multiplied by dt^2*bboxDiag2 to give the eps^2 the friction
    # kernels consume). Defaults make fricDHat0 == fricDHatTarget ==
    # epsv_h^2 — i.e. the homotopy is a no-op unless a scene's tuning sets
    # a larger initial smoothing.
    fric_dhat0_rel: float = 1e-3
    fric_dhat_target_rel: float = 1e-3


@dataclass(frozen=True)
class SimState:
    """Dynamic simulation state (pytree). `t` and `step` are DATA leaves
    (traced scalars), not metadata — otherwise every step would change the
    jit signature and force a recompile."""

    x: Any
    x_prev: Any
    v: Any
    a: Any
    t: Any = 0.0
    step: Any = 0
    # elastic correction x - xTilta of the last solve (reference dx_Elastic,
    # Optimizer.cpp:574-583); None unless warm_start >= 3 needs it
    dx_el: Any = None
    # device-script state for the fully-jitted step (dict or None): turning-
    # rule sign/active arrays and moving analytic-plane origins/velocities
    # (reference AnimScripter's stateful velocityTurningPoints + ACO plane
    # motion; see jit_step.initial_aux). The host path keeps this state in
    # Python objects instead and leaves aux None.
    aux: Any = None


jax.tree_util.register_dataclass(
    SimState, data_fields=["x", "x_prev", "v", "a", "t", "step", "dx_el", "aux"],
    meta_fields=[]
)


@dataclass
class StepStats:
    """Per-step solve statistics (iterStats.txt analog, Optimizer.cpp:1360)."""

    iters: int = 0
    alphas: list = field(default_factory=list)
    energies: list = field(default_factory=list)
    grad_inf: list = field(default_factory=list)
    n_constraints: list = field(default_factory=list)
    kappa: float = 0.0
    pcg_iters: list = field(default_factory=list)
    intersection_backtracks: int = 0
    # postLineSearch kappa doublings (reference Optimizer.cpp:2356-2446) —
    # evidence for whether the jit path's doubling-free schedule suffices
    kappa_doublings: int = 0
    # iterations whose line-search start was reduced by the swept-span
    # clamp (reference SpatialHash.hpp:613-618) — binding-cap visibility
    sweep_clamps: int = 0
    # Newton iterations spent in moving-DBC augmented-Lagrangian mode
    al_iters: int = 0


class IPCStepper:
    """Host orchestrator owning jitted device kernels for one scene."""

    def __init__(self, mesh, meta, params: SimParams, halfspaces=(),
                 self_contact=None, script=None, nbc=None):
        self.mesh = mesh
        self.meta = meta
        self.p = params
        self.halfspaces = list(halfspaces)
        self.sc = self_contact  # contact.pipeline.SelfContact or None
        self.script = script
        self.nbc = nbc

        self.dtype = mesh.x_rest.dtype
        self.dt = params.dt
        self.dtSq = params.dt * params.dt
        # elasticity/NBC weight: h^2 (BE) or beta h^2 (Newmark; reference
        # computeEnergyVal TIT_NM branch, Optimizer.cpp:3216-3224)
        self.is_nm = params.time_integration == "NM"
        self.w_el = self.dtSq * (params.nm_beta if self.is_nm else 1.0)
        self.bbox_diag2 = meta.bbox_diag2
        self.dHat = (params.dhat_rel**2) * self.bbox_diag2
        self.dHat_target = (params.dhat_target_rel**2) * self.bbox_diag2
        self.dTol = (params.dtol_rel**2) * self.bbox_diag2
        self.target_gres = np.sqrt(params.rel_gl2_tol * self.bbox_diag2 * self.dtSq)
        # MDBC pull threshold (reference CN_MBC, Optimizer.cpp:268)
        self.cn_mbc = np.sqrt(1e-4 * self.bbox_diag2 * self.dtSq)
        self.epsv_h = params.epsv_rel * np.sqrt(self.bbox_diag2) * params.dt
        # fricDHat homotopy state (reference Optimizer.cpp:291-304, 1776-1780)
        self.fric_dhat0 = (params.fric_dhat0_rel**2) * self.dtSq * self.bbox_diag2
        self.fric_dhat_target = (
            (params.fric_dhat_target_rel**2) * self.dtSq * self.bbox_diag2
        )
        self.fric_dhat = self.fric_dhat0
        self.avg_node_mass = meta.avg_node_mass
        self.gravity = np.asarray(params.gravity)

        # moving analytic half-spaces (reference ACO scripts; CollisionObject
        # velocitydt + HalfSpace::move): host-side plane state. When a scene
        # binds an ACO script to its planes, every jitted kernel receives the
        # CURRENT plane offsets as a traced (n_hs,) array `hs_D` (one extra
        # trace vs the static-plane variant, then cached), and the lagged
        # friction sees each plane's per-step displacement (veldt).
        self.hs_origin = (
            np.array([np.asarray(h.params.origin, float) for h in self.halfspaces])
            if self.halfspaces
            else np.zeros((0, 3))
        )
        self.hs_veldt = np.zeros_like(self.hs_origin)
        self.hs_moving = bool(
            script is not None
            and getattr(script, "aco_kind", None)
            and self.halfspaces
        )
        self._hs_D = None  # traced (n_hs,) plane-offset override when moving
        if self.hs_moving:
            self._refresh_hs_D()

        self._sv = mesh.surf_verts
        self._dbc_sv = mesh.dbc_mask[mesh.surf_verts]
        # broad-phase voxel size for the swept-span clamp (reference builds
        # its CCD hash at voxelSize = avgEdgeLen/3, Optimizer.cpp:1894, and
        # clamps the sweep so the MEAN per-component travel stays inside one
        # voxel, SpatialHash.hpp:613-618)
        xr = np.asarray(mesh.x_rest, np.float64)
        se = np.asarray(mesh.surf_edges)
        if len(se):
            self.voxel = float(
                np.linalg.norm(xr[se[:, 0]] - xr[se[:, 1]], axis=1).mean() / 3.0
            )
        else:
            self.voxel = float(np.sqrt(meta.bbox_diag2)) / 3.0
        self._solve_fric = any(hs.params.friction > 0.0 for hs in self.halfspaces) or (
            self.sc is not None
            and (self.sc.friction > 0.0 or self.sc.vert_mu is not None)
        )

        self._build_kernels()

    # ------------------------------------------------------------------
    # moving analytic half-spaces (reference ACO scripts)
    # ------------------------------------------------------------------

    def _refresh_hs_D(self):
        """Recompute the traced plane-offset array from the host origins."""
        self._hs_D = jnp.asarray(
            [-(h._n @ o) for h, o in zip(self.halfspaces, self.hs_origin)],
            self.dtype,
        )

    def _step_aco(self, x_sv_np):
        """Advance scripted analytic-plane motion one step (reference
        stepAnimScript AST_ACOSQUASH/6/SHEAR, AnimScripter.cpp:1832-1890):
        flip velocities on the squash-separation conditions, then move each
        plane by a CCD-clamped fraction of vel*dt (HalfSpace::move,
        slackness 0.5). ACOSquashShear alone sets velocitydt so the plane
        motion enters the friction terms (the reference leaves velocitydt
        zero for the other two)."""
        script = self.script
        vel = script.aco_vel
        orig = self.hs_origin
        kind = script.aco_kind
        if kind == "squash" and len(orig) >= 2:
            if orig[1][0] - orig[0][0] < 0.1:
                vel[0][0] *= -1.0
                vel[1][0] *= -1.0
        elif kind == "squash6" and len(orig) >= 6:
            for a, b, ax, thr in ((0, 1, 0, 0.2), (2, 3, 1, 0.2), (4, 5, 2, 0.2)):
                if orig[b][ax] - orig[a][ax] < thr:
                    vel[a][ax] *= -1.0
                    vel[b][ax] *= -1.0
        elif kind == "squashshear" and len(orig) >= 2:
            if orig[1][0] - orig[0][0] < 0.8:
                vel[0][:] = 0.0
                vel[1][:] = (0.0, 1.0, 0.0)
        self.hs_veldt[:] = 0.0
        for i, hs in enumerate(self.halfspaces):
            if i >= len(vel):
                break
            dX = np.asarray(vel[i], float) * self.dt
            if not np.any(dX):
                continue
            if kind == "squashshear":
                self.hs_veldt[i] = dX
            D_i = -(hs._n @ self.hs_origin[i])
            s = hs.move_bound(x_sv_np, dX, D=D_i, slackness=0.5)
            self.hs_origin[i] = self.hs_origin[i] + s * dX
        self._refresh_hs_D()

    # ------------------------------------------------------------------
    # swept-span clamp (reference SpatialHash.hpp:589-619)
    # ------------------------------------------------------------------

    def _sweep_clamp(self, alpha, dx):
        """Clamp the line-search start so the swept candidate build stays
        sane (reference swept `SpatialHash::build`: spanSize = alpha *
        mean|searchDir components over surface verts| / voxelSize; if
        spanSize > 1 the step size is divided by it "for CCD spatial hash
        efficiency"). For this fixed-shape broad phase the clamp is also a
        memory guard: an unclamped degenerate sweep (floppy-sheet Newton
        direction) inflates the shared grid cell until one bucket holds
        most primitives (the mat100x100 330 GB failure, BATTERY_r3.json).
        A max-travel rule (16 voxels) additionally bounds single-outlier
        sweeps that a mean can't see. Measured in the CO-MOVING frame
        (SelfContact.build_candidates subtracts the mean displacement), so
        rigid common motion costs no step size. Returns (alpha, clamped?)."""
        p_sv = np.asarray(dx)[np.asarray(self._sv)]
        p_sv = np.abs(p_sv - p_sv.mean(axis=0))
        pSize = float(p_sv.mean())  # sum |components| / (nSV * 3)
        clamped = False
        span = alpha * pSize / self.voxel
        if span > 1.0:
            alpha /= span
            clamped = True
        mt = float(p_sv.max())
        if alpha * mt > 16.0 * self.voxel:
            alpha = 16.0 * self.voxel / mt
            clamped = True
        return alpha, clamped

    # ------------------------------------------------------------------
    # kappa schedule (reference Optimizer.cpp:2215-2313)
    # ------------------------------------------------------------------

    def suggest_kappa(self, dHat):
        # host-float C2 barrier Hessian at d = 1e-16*bboxDiag^2 (exact f64
        # regardless of the device dtype; reference suggestKappa)
        import math

        d = 1e-16 * self.bbox_diag2
        t = d - dHat
        H_b = -2.0 * math.log(d / dHat) - 4.0 * t / d + (t * t) / (d * d)
        return self.p.kappa_min_mult * self.avg_node_mass / (4e-16 * self.bbox_diag2 * H_b)

    def upper_bound_kappa(self, kappa, dHat):
        return min(kappa, 100.0 * self.suggest_kappa(dHat))

    def init_kappa(self, x, x_tilde, kappa, dHat, cand, fric):
        """Balance the unit-kappa contact gradient against the remaining
        objective gradient on free DOFs (reference initKappa)."""
        g_E = np.asarray(self._grad_no_contact(x, x_tilde, fric))
        g_c = np.asarray(self._grad_contact_unit(x, dHat, cand, self._hs_D))
        free = ~np.asarray(self.mesh.dbc_mask)
        g_E, g_c = g_E[free], g_c[free]
        denom = float((g_c * g_c).sum())
        if denom <= 0.0:
            return kappa
        min_kappa = -float((g_c * g_E).sum()) / denom
        if min_kappa > 0.0:
            kappa = max(kappa, min_kappa)
        kappa = max(kappa, self.suggest_kappa(dHat))
        return self.upper_bound_kappa(kappa, dHat)

    # ------------------------------------------------------------------
    # jitted kernels
    # ------------------------------------------------------------------

    def _build_kernels(self):
        from ipc_tpu.ops.scatter import make_gather_sum
        from ipc_tpu.solver.coarse import build_aggregates, make_coarse_assembler

        mesh = self.mesh
        p = self.p
        # static tet topology: gather-sum assembly (see ops/scatter.py)
        gsum_tet = make_gather_sum(
            np.asarray(mesh.tets).reshape(-1), int(mesh.x_rest.shape[0])
        )
        dtSq = self.w_el
        model = p.model
        sv = self._sv
        sc = self.sc
        if p.coarse_precond:
            agg, n_coarse = build_aggregates(np.asarray(mesh.x_rest))
            coarse_assemble, coarse_term = make_coarse_assembler(
                agg, n_coarse, mesh.dbc_mask, self.dtype,
                tets=np.asarray(mesh.tets),
            )
        else:
            coarse_assemble = coarse_term = None

        def hsD(hs_D, i):
            """Per-plane traced offset override (None -> static plane)."""
            return None if hs_D is None else hs_D[i]

        # compensated (double-float) accumulation for f32 host runs: the
        # barrier term is ~1e-7 of inertia+elasticity, so a plain-f32 sum
        # loses it before the Python-f64 line-search comparison ever sees
        # it. With df=True the kernel returns a (hi, lo) pair summed to
        # ~48 mantissa bits; the host collapses it in f64 (see _energy_f).
        # f64 host runs need none of this (ops/compensated.py rationale).
        use_df = self.dtype == jnp.float32 and getattr(p, "compensated_energy", True)
        if use_df:
            from ipc_tpu.ops.compensated import df_add, df_sum

        def energy(x, x_tilde, kappa, dHat, cand, fric, fext=None, damp=None,
                   mdbc=None, hs_D=None):
            if use_df:
                E = df_sum(dtSq * EL.elasticity_energy_per_elem(x, mesh, model))
                add_v = lambda E, v: df_add(E, df_sum(v.reshape(-1)))
                add_s = lambda E, s: df_add(E, (s, jnp.zeros_like(s)))
                add_t = df_add
            else:
                E = dtSq * EL.elasticity_energy(x, mesh, model)
                add_v = lambda E, v: E + v.sum()
                add_s = lambda E, s: E + s
                add_t = add_s
            dx = x - x_tilde
            E = add_v(E, 0.5 * mesh.mass[:, None] * dx * dx)
            if mdbc is not None:
                # moving-DBC augmented Lagrangian (reference augmentMDBCEnergy,
                # AnimScripter.cpp:2302-2309): -sqrt(m) lam.(x-t) + rho/2 m|x-t|^2
                dxt = x[mdbc["verts"]] - mdbc["target"]
                E = add_s(E, -jnp.sum(mdbc["sqrtm"][:, None] * mdbc["lam"] * dxt))
                E = add_s(E, 0.5 * mdbc["rho"] * jnp.sum(mdbc["m"][:, None] * dxt * dxt))
            if fext is not None:
                # NBC work: -h^2 sum m_v f_v . x_v on free vertices
                E = add_s(E, -dtSq * jnp.sum(
                    jnp.where(mesh.dbc_mask[:, None], 0.0, mesh.mass[:, None] * fext * x)
                ))
            x_sv = x[sv]
            for i, hs in enumerate(self.halfspaces):
                E = add_s(E, hs.energy(x_sv, kappa, dHat, D=hsD(hs_D, i)))
            if sc is not None and cand is not None:
                if use_df:
                    E = add_t(E, sc.energy_df(x, cand, kappa, dHat))
                else:
                    E = add_s(E, sc.energy(x, cand, kappa, dHat))
            E = add_s(E, self._friction_energy(x, fric))
            if damp is not None:
                # lagged Rayleigh damping 1/2 dx^T A dx with A = the SPD
                # elasticity Hessian at the last committed state scaled by
                # dampingStiff/dt (reference computeDampingMtr + energy term
                # Optimizer.cpp:3381-3400)
                dxd = jnp.where(mesh.dbc_mask[:, None], 0.0, x - damp["x_ref"])
                v4 = dxd[mesh.tets].reshape(-1, 12)
                Av = jnp.einsum("tij,tj->ti", damp["blocks"], v4, precision=_HI)
                E = add_v(E, 0.5 * v4 * Av)
            return E

        def grad(x, x_tilde, kappa, dHat, cand, fric, fext=None, damp=None,
                 mdbc=None, hs_D=None):
            g = dtSq * EL.elasticity_gradient(x, mesh, model, vert_sum=gsum_tet)
            g = g + mesh.mass[:, None] * (x - x_tilde)
            if mdbc is not None:
                dxt = x[mdbc["verts"]] - mdbc["target"]
                g = g.at[mdbc["verts"]].add(
                    -mdbc["sqrtm"][:, None] * mdbc["lam"]
                    + mdbc["rho"] * mdbc["m"][:, None] * dxt
                )
            if fext is not None:
                g = g - dtSq * mesh.mass[:, None] * fext
            x_sv = x[sv]
            g_sv = jnp.zeros_like(x_sv)
            for i, hs in enumerate(self.halfspaces):
                g_sv = g_sv + hs.grad_sv(x_sv, kappa, dHat, D=hsD(hs_D, i))
            g = g.at[sv].add(g_sv)
            if sc is not None and cand is not None:
                g = g + sc.gradient(x, cand, kappa, dHat)
            g = g + self._friction_gradient(x, fric)
            if damp is not None:
                dxd = jnp.where(mesh.dbc_mask[:, None], 0.0, x - damp["x_ref"])
                v4 = dxd[mesh.tets].reshape(-1, 12)
                Av = jnp.einsum("tij,tj->ti", damp["blocks"], v4, precision=_HI)
                g = g + gsum_tet(Av.reshape(-1, 3))
            return jnp.where(mesh.dbc_mask[:, None], 0.0, g)

        # lag the coarse assembly to once per sub-solve only at scale
        # (see jit_step.py rationale)
        lag_coarse = int(mesh.tets.shape[0]) >= 32768

        def assemble_coarse(x, kappa, dHat, cand, fric, damp=None, mdbc=None,
                            hs_D=None):
            """Coarse matrix once per sub-solve (lagged; see jit_step)."""
            if coarse_assemble is None:
                return None
            Hel = dtSq * EL.elasticity_hessian_blocks(x, mesh, model, True)
            if damp is not None:
                Hel = Hel + damp["blocks"]
            x_sv = x[sv]
            Hsv = jnp.zeros((sv.shape[0], 3, 3), x.dtype)
            for i, hs in enumerate(self.halfspaces):
                Hsv = Hsv + hs.hess_blocks_sv(x_sv, kappa, dHat, D=hsD(hs_D, i))
            contribs = [(sv[:, None], Hsv)]
            if sc is not None and cand is not None:
                vids_act, H_act, _ = sc.hessian_blocks_active(
                    x, cand, kappa, dHat, True
                )
                contribs.append((vids_act, H_act))
            for ids, Hf in self._friction_hessians(x, fric):
                contribs.append((ids, Hf))
            if mdbc is not None:
                contribs.append((
                    mdbc["verts"][:, None],
                    (mdbc["rho"] * mdbc["m"])[:, None, None]
                    * jnp.eye(3, dtype=x.dtype)[None],
                ))
            return coarse_assemble(mesh.mass, contribs, tet_H=Hel)

        def search_dir(x, x_tilde, kappa, dHat, cand, fric, fext=None, damp=None,
                       mdbc=None, ainv_c=None, hs_D=None):
            g = grad(x, x_tilde, kappa, dHat, cand, fric, fext, damp, mdbc, hs_D)
            Hel = dtSq * EL.elasticity_hessian_blocks(x, mesh, model, True)
            x_sv = x[sv]
            Hsv = jnp.zeros((sv.shape[0], 3, 3), x.dtype)
            for i, hs in enumerate(self.halfspaces):
                Hsv = Hsv + hs.hess_blocks_sv(x_sv, kappa, dHat, D=hsD(hs_D, i))
            fric_blocks = self._friction_hessians(x, fric)  # list of (ids, H)
            if sc is not None and cand is not None:
                vids_act, H_act, active_count = sc.hessian_blocks_active(
                    x, cand, kappa, dHat, True
                )
            else:
                vids_act = H_act = None
                active_count = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))

            dbc = mesh.dbc_mask
            tets = mesh.tets

            def scatter12(out, vids, H, v):
                v4 = v[vids].reshape(-1, 12)
                hv = jnp.einsum("cij,cj->ci", H, v4, precision=_HI)
                return out.at[vids.reshape(-1)].add(hv.reshape(-1, 3))

            def scatter12_tet(out, H, v):
                v4 = v[tets].reshape(-1, 12)
                hv = jnp.einsum("cij,cj->ci", H, v4, precision=_HI)
                return out + gsum_tet(hv.reshape(-1, 3))

            def operator(v):
                v = jnp.where(dbc[:, None], 0.0, v)
                out = mesh.mass[:, None] * v
                if mdbc is not None:
                    out = out.at[mdbc["verts"]].add(
                        (mdbc["rho"] * mdbc["m"])[:, None] * v[mdbc["verts"]]
                    )
                out = scatter12_tet(out, Hel, v)
                out = out.at[sv].add(
                    jnp.einsum("vij,vj->vi", Hsv, v[sv], precision=_HI)
                )
                if H_act is not None:
                    out = scatter12(out, vids_act, H_act, v)
                for ids, Hf in fric_blocks:
                    out = scatter12(out, ids, Hf, v)
                out = jnp.where(dbc[:, None], 0.0, out)
                return jnp.where(dbc[:, None], v, out)

            dix = jnp.asarray(
                [c * 39 + i * 12 + j
                 for c in range(4) for i in range(3) for j in range(3)],
                jnp.int32,
            )

            def diag_blocks12(H):
                return jnp.take(H.reshape(H.shape[0], 144), dix, axis=1).reshape(
                    -1, 4, 3, 3
                )

            def diag12(diag, vids, H):
                return diag.at[vids.reshape(-1)].add(
                    diag_blocks12(H).reshape(-1, 3, 3)
                )

            diag = mesh.mass[:, None, None] * jnp.eye(3, dtype=x.dtype)[None]
            if mdbc is not None:
                diag = diag.at[mdbc["verts"]].add(
                    (mdbc["rho"] * mdbc["m"])[:, None, None]
                    * jnp.eye(3, dtype=x.dtype)[None]
                )
            diag = diag + gsum_tet(diag_blocks12(Hel).reshape(-1, 3, 3))
            diag = diag.at[sv].add(Hsv)
            if H_act is not None:
                diag = diag12(diag, vids_act, H_act)
            for ids, Hf in fric_blocks:
                diag = diag12(diag, ids, Hf)
            eye = jnp.eye(3, dtype=x.dtype)[None]
            diag = jnp.where(dbc[:, None, None], eye, diag)
            inv_diag = block_jacobi_inverse(diag)

            if not lag_coarse and coarse_assemble is not None:
                contribs = [(sv[:, None], Hsv)]
                if H_act is not None:
                    contribs.append((vids_act, H_act))
                for ids, Hf in fric_blocks:
                    contribs.append((ids, Hf))
                if mdbc is not None:
                    contribs.append((
                        mdbc["verts"][:, None],
                        (mdbc["rho"] * mdbc["m"])[:, None, None]
                        * jnp.eye(3, dtype=x.dtype)[None],
                    ))
                ainv_c = coarse_assemble(mesh.mass, contribs, tet_H=Hel)
            if ainv_c is not None:
                def precond(r):
                    return apply_block_precond(inv_diag, r) + coarse_term(ainv_c, r)
            else:
                def precond(r):
                    return apply_block_precond(inv_diag, r)

            rhs = -g
            if p.linsys in ("dense", "sparse"):
                contribs = [(tets, Hel), (sv[:, None], Hsv)]
                if H_act is not None:
                    contribs.append((vids_act, H_act))
                for ids, Hf in fric_blocks:
                    contribs.append((ids, Hf))
                if mdbc is not None:
                    contribs.append((
                        mdbc["verts"][:, None],
                        (mdbc["rho"] * mdbc["m"])[:, None, None]
                        * jnp.eye(3, dtype=x.dtype)[None],
                    ))
                if p.linsys == "sparse":
                    # CHOLMOD-class exact solve on the host (SuperLU);
                    # medium-scale f64 parity path (solver/sparse_direct.py)
                    from ipc_tpu.solver.sparse_direct import make_sparse_solver

                    solve_cb = make_sparse_solver(int(x.shape[0]), x.dtype)
                    dx = solve_cb(mesh.mass, mesh.dbc_mask, rhs, contribs)
                else:
                    from ipc_tpu.solver.direct import assemble_dense, dense_solve

                    Ad = assemble_dense(
                        x.shape[0], mesh.mass, contribs, mesh.dbc_mask
                    )
                    dx = dense_solve(Ad, rhs)
                iters = jnp.asarray(1, jnp.int32)
                rel = jnp.asarray(0.0, x.dtype)
            else:
                dx, iters, rel = pcg(
                    operator,
                    rhs,
                    precond,
                    tol=p.pcg_tol,
                    maxiter=p.pcg_maxiter,
                )
            # fail-safe: on PCG breakdown (NaN/no progress) fall back to the
            # block-Jacobi-preconditioned gradient direction (the reference
            # falls back to diag-preconditioned GD when CHOLMOD reports
            # non-SPD, Optimizer.cpp:2330-2354)
            bad = (~jnp.isfinite(dx).all()) | (~jnp.isfinite(rel)) | (rel > 1.0)
            dx = jnp.where(bad, apply_block_precond(inv_diag, rhs), dx)
            return dx, g, iters, rel, active_count

        def feasible_step_local(x, dx, hs_D=None):
            """Inversion cubic + half-space closed form (no mesh CCD)."""
            alpha = jnp.asarray(1.0, x.dtype)
            alpha = jnp.minimum(alpha, EL.filter_step_size(x, dx, mesh, model))
            x_sv = x[sv]
            p_sv = dx[sv]
            for i, hs in enumerate(self.halfspaces):
                alpha = jnp.minimum(
                    alpha,
                    hs.largest_feasible_step(
                        x_sv, p_sv, self._dbc_sv, p.ccd_slackness_a,
                        D=hsD(hs_D, i),
                    ),
                )
            return alpha

        def jacobi_dir(x, x_tilde, kappa, dHat, cand, fric, hs_D=None):
            """Block-Jacobi-preconditioned steepest descent direction
            (reference initX mode 5, Optimizer.cpp:1082-1110, which divides
            by the scalar Hessian diagonal; the 3x3 block version is the
            same idea with the block structure we already assemble)."""
            g = grad(x, x_tilde, kappa, dHat, cand, fric, hs_D=hs_D)
            Hel = dtSq * EL.elasticity_hessian_blocks(x, mesh, model, True)
            x_sv = x[sv]
            Hsv = jnp.zeros((sv.shape[0], 3, 3), x.dtype)
            for i, hs in enumerate(self.halfspaces):
                Hsv = Hsv + hs.hess_blocks_sv(x_sv, kappa, dHat, D=hsD(hs_D, i))
            dix = jnp.asarray(
                [c * 39 + i * 12 + j
                 for c in range(4) for i in range(3) for j in range(3)],
                jnp.int32,
            )
            d4 = jnp.take(Hel.reshape(Hel.shape[0], 144), dix, axis=1).reshape(
                -1, 4, 3, 3
            )
            diag = mesh.mass[:, None, None] * jnp.eye(3, dtype=x.dtype)[None]
            diag = diag + gsum_tet(d4.reshape(-1, 3, 3))
            diag = diag.at[sv].add(Hsv)
            if sc is not None and cand is not None:
                vids_act, H_act, _ = sc.hessian_blocks_active(
                    x, cand, kappa, dHat, True
                )
                da = jnp.take(
                    H_act.reshape(H_act.shape[0], 144), dix, axis=1
                ).reshape(-1, 4, 3, 3)
                diag = diag.at[vids_act.reshape(-1)].add(da.reshape(-1, 3, 3))
            eye = jnp.eye(3, dtype=x.dtype)[None]
            diag = jnp.where(mesh.dbc_mask[:, None, None], eye, diag)
            return -apply_block_precond(block_jacobi_inverse(diag), g)

        self._energy = jax.jit(energy)
        self._energy_df = use_df
        self._lag_coarse = lag_coarse
        self._assemble_coarse = jax.jit(assemble_coarse)
        self._grad = jax.jit(grad)
        self._jacobi_dir = jax.jit(jacobi_dir)
        self._search_dir = jax.jit(search_dir)
        self._feasible_step_local = jax.jit(feasible_step_local)

        def grad_no_contact(x, x_tilde, fric):
            g = dtSq * EL.elasticity_gradient(x, mesh, model, vert_sum=gsum_tet)
            g = g + mesh.mass[:, None] * (x - x_tilde)
            g = g + self._friction_gradient(x, fric)
            return g

        def grad_contact_unit(x, dHat, cand, hs_D=None):
            x_sv = x[sv]
            g_sv = jnp.zeros_like(x_sv)
            for i, hs in enumerate(self.halfspaces):
                g_sv = g_sv + hs.grad_sv(x_sv, 1.0, dHat, D=hsD(hs_D, i))
            g = jnp.zeros_like(x).at[sv].add(g_sv)
            if sc is not None and cand is not None:
                g = g + sc.gradient(x, cand, 1.0, dHat)
            return g

        self._grad_no_contact = jax.jit(grad_no_contact)
        self._grad_contact_unit = jax.jit(grad_contact_unit)
        if p.damping_stiff > 0.0:
            self._damping_blocks = jax.jit(
                lambda x: (p.damping_stiff / self.dt)
                * EL.elasticity_hessian_blocks(x, mesh, model, True)
            )

        if sc is not None:
            self._build_cand = jax.jit(
                lambda x, disp, gap: sc.build_candidates(x, disp, gap)
            )

            def cand_dists(x, cand):
                from ipc_tpu.contact import selfcollision as SCmod
                from ipc_tpu.ops import distance as Dmod

                d_pt = jax.vmap(
                    lambda x4: Dmod.stencil_dist2(*SCmod.pt_reduce(x4))
                )(x[cand.pt_vids])
                d_ee = jax.vmap(
                    lambda x4: Dmod.stencil_dist2(*SCmod.ee_reduce(x4))
                )(x[cand.ee_vids])
                d_pt = jnp.where(cand.pt_valid, d_pt, jnp.inf)
                d_ee = jnp.where(cand.ee_valid, d_ee, jnp.inf)
                return d_pt, d_ee

            self._cand_dists = jax.jit(cand_dists)
            self._ccd_alpha = jax.jit(
                lambda x, dx, cand: sc.ccd_alpha(
                    x, dx, cand, 1.0 - p.ccd_slackness_m, p.ccd_max_iter
                )
            )
            self._has_intersection = jax.jit(lambda x: sc.has_intersection(x))
            self._n_active = jax.jit(lambda x, cand, dHat: sc.n_active(x, cand, dHat))

    # ------------------------------------------------------------------
    # friction term helpers (fric is a dict or None)
    # ------------------------------------------------------------------

    def _energy_f(self, *args, **kw):
        """Host scalar objective: collapse the kernel's compensated
        (hi, lo) pair in Python f64 — the line-search comparisons then see
        ~48 mantissa bits of the f32 accumulation (plain float for f64
        runs)."""
        E = self._energy(*args, **kw)
        if self._energy_df:
            return float(E[0]) + float(E[1])
        return float(E)

    def _friction_energy(self, x, fric):
        if fric is None:
            return jnp.asarray(0.0, x.dtype)
        E = jnp.asarray(0.0, x.dtype)
        x_sv = x[self._sv]
        veldts = fric.get("hs_veldt") or [None] * len(self.halfspaces)
        for hs, st, vdt in zip(self.halfspaces, fric["hs"], veldts):
            if hs.params.friction > 0.0:
                E = E + hs.friction_energy(
                    x_sv, fric["anchor"][self._sv], st, fric["eps2"], veldt=vdt
                )
        if fric.get("sc") is not None:
            from ipc_tpu.contact import selfcollision as SCmod

            E = E + SCmod.friction_energy(
                fric["sc"], x, fric["anchor"], fric["eps2"], 1.0
            )
        return E

    def _friction_gradient(self, x, fric):
        if fric is None:
            return jnp.zeros_like(x)
        g = jnp.zeros_like(x)
        x_sv = x[self._sv]
        veldts = fric.get("hs_veldt") or [None] * len(self.halfspaces)
        for hs, st, vdt in zip(self.halfspaces, fric["hs"], veldts):
            if hs.params.friction > 0.0:
                g = g.at[self._sv].add(
                    hs.friction_grad_sv(
                        x_sv, fric["anchor"][self._sv], st, fric["eps2"], veldt=vdt
                    )
                )
        if fric.get("sc") is not None:
            from ipc_tpu.contact import selfcollision as SCmod

            g = g + SCmod.friction_gradient(
                fric["sc"], x, fric["anchor"], fric["eps2"], 1.0, x.shape[0]
            )
        return g

    def _friction_hessians(self, x, fric):
        """Returns a list of (vids (C,4), H (C,12,12)) plus folds the
        half-space per-vertex blocks into 12x12 shape-compatible wrappers."""
        out = []
        if fric is None:
            return out
        x_sv = x[self._sv]
        veldts = fric.get("hs_veldt") or [None] * len(self.halfspaces)
        for hs, st, vdt in zip(self.halfspaces, fric["hs"], veldts):
            if hs.params.friction > 0.0:
                H3 = hs.friction_hess_blocks_sv(
                    x_sv, fric["anchor"][self._sv], st, fric["eps2"], veldt=vdt
                )
                # embed (Sv,3,3) into (Sv,12,12) on stencil (v,v,v,v)/4? No:
                # use a dedicated 1-vertex scatter via 12x12 with only the
                # (0,0) block and vids = (v,v,v,v) would overcount. Instead
                # wrap as its own operator-friendly pair list with vids
                # (Sv,4) = (v,0,0,0) and H zero except block (0,0).
                C = H3.shape[0]
                H12 = jnp.zeros((C, 12, 12), x.dtype).at[:, :3, :3].set(H3)
                vids = jnp.stack(
                    [self._sv, jnp.zeros_like(self._sv), jnp.zeros_like(self._sv), jnp.zeros_like(self._sv)],
                    axis=1,
                )
                out.append((vids, H12))
        if fric.get("sc") is not None:
            from ipc_tpu.contact import selfcollision as SCmod

            Hs = SCmod.friction_hessian_blocks(
                fric["sc"], x, fric["anchor"], fric["eps2"], 1.0
            )
            out.append((fric["sc"]["vids"], Hs))
        return out

    def _capture_friction(self, x, x_anchor, kappa, dHat, cand):
        """Capture all lagged friction state at iterate x."""
        if not self._solve_fric:
            return None
        x_sv = x[self._sv]
        hs_lams = []
        hs_veldt = None
        if self.hs_moving:
            hs_veldt = [
                jnp.asarray(v, self.dtype) if np.any(v) else None
                for v in self.hs_veldt
            ]
        for i, hs in enumerate(self.halfspaces):
            if hs.params.friction > 0.0:
                D_i = None if self._hs_D is None else self._hs_D[i]
                m = hs.active_mask(x_sv, dHat, D=D_i)
                hs_lams.append(hs.friction_lambda(x_sv, m, kappa, dHat, D=D_i))
            else:
                hs_lams.append(None)
        sc_state = None
        if (
            self.sc is not None
            and (self.sc.friction > 0.0 or self.sc.vert_mu is not None)
            and cand is not None
        ):
            while True:
                sc_state = self.sc.capture_friction(x, cand, kappa, dHat)
                if not self.sc.ensure_fric_cap(int(sc_state["count"])):
                    break
        return dict(
            hs=hs_lams,
            sc=sc_state,
            anchor=x_anchor,
            eps2=jnp.asarray(self.fric_dhat, self.dtype),
            hs_veldt=hs_veldt,
        )

    # ------------------------------------------------------------------
    # time stepping
    # ------------------------------------------------------------------

    def compute_x_tilde(self, state: SimState):
        g = jnp.asarray(self.gravity, self.dtype)
        if self.is_nm:
            # Newmark predictor (reference computeXTilta TIT_NM branch,
            # Optimizer.cpp:1262-1276)
            beta = self.p.nm_beta
            xt = (
                state.x_prev
                + self.dt * state.v
                + beta * self.dtSq * g[None, :]
                + (0.5 - beta) * self.dtSq * state.a
            )
        else:
            xt = state.x_prev + self.dt * state.v + self.dtSq * g[None, :]
        # DBC rows: hold at the current (possibly scripted) position
        # (reference computeXTilta uses V_prev for DBC; scripted motion has
        # already moved x by the time the solve starts)
        return jnp.where(self.mesh.dbc_mask[:, None], state.x, xt)

    def initial_state(self, x0=None, v0=None):
        x = jnp.asarray(x0 if x0 is not None else self.mesh.x_rest, self.dtype)
        v = jnp.asarray(v0, self.dtype) if v0 is not None else jnp.zeros_like(x)
        return SimState(x=x, x_prev=x, v=v, a=jnp.zeros_like(x))

    def _candidates(self, x, disp=None):
        """Constraint-set candidates at x (gap sqrt(dHat)), optionally swept
        by disp; handles capacity growth (host sync per build)."""
        if self.sc is None:
            return None
        gap = float(np.sqrt(self.dHat))
        while True:
            cand = self._build_cand(x, disp if disp is not None else jnp.zeros_like(x), gap)
            if not self.sc.ensure_caps(cand):
                return cand
            # caps grew: re-trace via fresh jit closure
            self._build_kernels()

    def step(self, state: SimState, verbose=False):
        """Advance one time step (reference Optimizer::solve + fullyImplicit_IP,
        Optimizer.cpp:509-602, 1517-1819)."""
        p = self.p
        stats = StepStats()
        x = state.x
        dHat = self.dHat

        # scripted DBC motion (reference stepAnimScript, AnimScripter.cpp:
        # 1398-2276): move Dirichlet vertices along their scripted rigid
        # motion before the implicit solve — clamped by the inversion
        # filter, mesh CCD, and intersection backtracking exactly like the
        # reference (:2158-2250). An incomplete move (completed < 1-1e-3)
        # triggers the moving-DBC augmented Lagrangian below.
        completed = 1.0
        mdbc_targets = None
        # scripted analytic-plane motion (reference ACO scripts) runs first,
        # exactly like stepAnimScript's ACO branches: CCD-clamped plane move
        # + velocity flips, before any DBC/solve work this step
        if self.hs_moving:
            self._step_aco(np.asarray(x)[np.asarray(self._sv)])
        if self.script is not None and self.script.has_motion():
            disp_np = self.script.step_displacement(np.asarray(x), float(state.t), self.dt)
            if np.any(disp_np):
                disp = jnp.asarray(disp_np, self.dtype)
                scale = min(1.0, float(self._feasible_step_local(x, disp, self._hs_D)))
                # swept-span clamp on the scripted sweep too (the reference
                # stepAnimScript CCD goes through the same clamped swept
                # build); the MDBC AL below completes any clamped remainder
                scale, _ = self._sweep_clamp(scale, disp)
                if self.sc is not None:
                    cand_s = self._candidates(x, disp=scale * disp)
                    scale = float(self._ccd_alpha(x, scale * disp, cand_s)) * scale
                while True:
                    x_try = x + scale * disp
                    if self.sc is None:
                        x = x_try
                        break
                    hit, _ = self._has_intersection(x_try)
                    if not bool(hit):
                        x = x_try
                        break
                    scale *= 0.5
                    if scale < 1e-6:
                        if not p.mdbc_al:
                            raise RuntimeError(
                                "scripted motion cannot avoid intersection"
                            )
                        scale = 0.0
                        break
                completed = scale
                if completed < 1.0 - 1e-3:
                    # targets = full scripted destination of every DBC vertex
                    # (reference targetPos, AnimScripter.cpp:2151-2158)
                    dbc_np = np.asarray(self.mesh.dbc_mask)
                    verts = np.where(dbc_np)[0].astype(np.int32)
                    target = np.asarray(state.x)[verts] + disp_np[verts]
                    denom = float(np.linalg.norm(disp_np))
                    mdbc_targets = (verts, jnp.asarray(target, self.dtype), denom)
            state = SimState(x=x, x_prev=state.x_prev, v=state.v, a=state.a,
                             t=state.t, step=state.step)

        x_tilde = self.compute_x_tilde(state)
        x = state.x

        if p.warm_start > 0:
            if p.warm_start == 5:
                # Jacobi warm start (reference initX case 5): one
                # diagonally-preconditioned descent step on the full
                # objective at the suggested kappa
                cand_j = self._candidates(x)
                dx0 = self._jacobi_dir(
                    x, x_tilde, self.suggest_kappa(dHat), dHat, cand_j, None,
                    self._hs_D,
                )
            else:
                g_dtSq = jnp.asarray(self.gravity, self.dtype)[None, :] * self.dtSq
                if self.is_nm:
                    g_dtSq = 0.5 * g_dtSq
                if p.warm_start == 1:
                    dx0 = self.dt * state.v
                else:
                    dx0 = self.dt * state.v + g_dtSq
                if p.warm_start >= 3 and state.dx_el is not None:
                    c = {3: (1.0, 2.0), 4: (0.5, 1.0)}.get(p.warm_start, (0.0, 0.0))
                    dx0 = dx0 + (c[1] if self.is_nm else c[0]) * state.dx_el
            dx0 = jnp.where(self.mesh.dbc_mask[:, None], 0.0, dx0)
            alpha = float(self._feasible_step_local(x, dx0, self._hs_D))
            alpha, _ = self._sweep_clamp(alpha, dx0)
            if self.sc is not None:
                cand_ws = self._candidates(x, disp=alpha * dx0)
                alpha = min(alpha, float(self._ccd_alpha(x, alpha * dx0, cand_ws)) * alpha)
            x = x + alpha * dx0

        cand = self._candidates(x)

        # NBC force field for this step (constant over the solve)
        fext = None
        if self.script is not None and self.script.nbc_groups:
            f = self.script.nbc_force(float(state.t), x.shape[0])
            if np.any(f):
                fext = jnp.asarray(f, self.dtype)

        # kappa init (reference fullyImplicit_IP :1536-1550)
        kappa = p.kappa
        if kappa > 0.0:
            kappa = self.upper_bound_kappa(kappa, dHat)
        else:
            kappa = self.suggest_kappa(dHat)
        if p.adaptive_kappa:
            kappa = self.init_kappa(x, x_tilde, kappa, dHat, cand, None)

        fric = self._capture_friction(x, state.x_prev, kappa, dHat, cand)

        damp = None
        if self.p.damping_stiff > 0.0:
            # A = (dampingStiff / dt) * H_psi at the last committed state
            # (reference computeDampingMtr: coef = energyParams *
            # dampingStiff / dt, WITHOUT the dtSq of the Newton Hessian)
            damp = dict(blocks=self._damping_blocks(state.x_prev), x_ref=state.x_prev)

        # outer homotopy/friction loop (reference fullyImplicit_IP
        # :1613-1787): with the default config dHat == dHatTarget so the
        # dHat branch is a no-op and fricIterAmt bounds the friction loop
        if mdbc_targets is not None and p.mdbc_al:
            x = self._solve_mdbc_al(
                x, state, mdbc_targets, kappa, dHat, fric, stats, verbose, fext, damp
            )
        fric_iter = 0
        self.fric_dhat = self.fric_dhat0  # reset per step (Optimizer.cpp:1533)
        while True:
            x = self._solve_sub_ip(x, x_tilde, kappa, dHat, fric, stats, verbose, fext, damp)
            fric_iter += 1
            update_dhat = dHat > self.dHat_target * (1.0 + 1e-12)
            # fricIterAmt bounds the loop only once fricDHat has reached
            # its target (reference Optimizer.cpp:1717-1736); until then
            # the smoothing homotopy keeps the loop alive
            at_fric_target = self.fric_dhat <= self.fric_dhat_target * (1.0 + 1e-12)
            update_fric = self._solve_fric
            fric_refreshed = False
            if update_fric and at_fric_target:
                if p.fric_iter_amt > 0 and fric_iter >= p.fric_iter_amt:
                    update_fric = False
                else:
                    # refreshed-tangent convergence test (Optimizer.cpp:
                    # 1717-1740): recapture lambda/tangent at the converged
                    # iterate and probe the Newton direction — if it is
                    # already below tolerance, the friction fixed point has
                    # converged. This is the TERMINATION rule for
                    # fricIterAmt <= 0 scenes (masonryArch's fricIterAmt -1
                    # looped forever without it).
                    cand = self._candidates(x)
                    fric_probe = self._capture_friction(x, state.x_prev, kappa, dHat, cand)
                    while True:
                        dx_p, _, _, _, ac = self._search_dir(
                            x, x_tilde, kappa, dHat, cand, fric_probe, fext,
                            damp, None, None, self._hs_D
                        )
                        if self.sc is None or not self.sc.ensure_active_cap(
                            int(ac[0]), int(ac[1])
                        ):
                            break
                        self._build_kernels()
                    if float(jnp.abs(dx_p).max()) < self.target_gres:
                        update_fric = False
                    else:
                        fric = fric_probe  # the refreshed capture — at
                        # unchanged fric_dhat the loop-bottom recapture
                        # would be identical, so skip it there
                        fric_refreshed = True
            if not update_dhat and not update_fric:
                break
            if fric_iter >= 1000:
                # unbounded-fixed-point failsafe: the reference's loop has
                # no such bound, but an explicit diagnostic beats a silent
                # hang (cf. its dTol tiny-distance break, Optimizer.cpp:1716)
                raise RuntimeError(
                    f"friction/homotopy outer loop did not converge in "
                    f"{fric_iter} iterations (fricIterAmt={p.fric_iter_amt})"
                )
            if update_dhat:
                dHat = max(dHat * 0.5, self.dHat_target)
                fric_refreshed = False  # the capture depends on dHat
                if p.adaptive_kappa:
                    cand = self._candidates(x)
                    kappa = self.init_kappa(x, x_tilde, kappa, dHat, cand, fric)
            if update_fric and not at_fric_target:
                # fricDHat *= 0.5 toward target (Optimizer.cpp:1776-1780)
                self.fric_dhat = max(self.fric_dhat * 0.5, self.fric_dhat_target)
                fric_refreshed = False
            if (update_fric or update_dhat) and not fric_refreshed:
                cand = self._candidates(x)
                fric = self._capture_friction(x, state.x_prev, kappa, dHat, cand)

        stats.kappa = kappa

        # blow-up detectors (reference Optimizer.cpp:1385-1460): non-finite
        # state or absurd displacement aborts with diagnostics instead of
        # silently continuing
        if not bool(jnp.isfinite(x).all()):
            raise RuntimeError(f"state blow-up: non-finite positions at step {int(state.step)}")
        max_disp = float(jnp.abs(x - state.x_prev).max())
        if max_disp * max_disp > 100.0 * self.bbox_diag2:
            raise RuntimeError(
                f"state blow-up: displacement {max_disp:.3g} exceeds 10x scene "
                f"diagonal at step {int(state.step)}"
            )

        # integrator update (reference Optimizer::solve :570-596)
        if self.is_nm:
            g = jnp.asarray(self.gravity, self.dtype)
            beta, gamma = self.p.nm_beta, self.p.nm_gamma
            v_new = state.v + self.dt * (1.0 - gamma) * state.a
            a_new = (x - x_tilde) / (self.dtSq * beta) + g[None, :]
            v_new = v_new + self.dt * gamma * a_new
        else:
            v_new = (x - state.x_prev) / self.dt
            a_new = (v_new - state.v) / self.dt
        dx_el = (x - x_tilde) if self.p.warm_start >= 3 else None
        return (
            SimState(
                x=x, x_prev=x, v=v_new, a=a_new, t=state.t + self.dt,
                step=state.step + 1, dx_el=dx_el,
            ),
            stats,
        )

    def _solve_sub_ip(self, x, x_tilde, kappa, dHat, fric, stats, verbose, fext=None,
                      damp=None, mdbc=None, mdbc_denom=None):
        """Newton loop (reference solveSub_IP, Optimizer.cpp:1821-2213).

        With `mdbc` set, runs in moving-DBC augmented-Lagrangian mode: the
        AL terms enter every energy/gradient/Hessian, and the reference's
        per-iteration rho doubling / lambda update / completion check
        (Optimizer.cpp:2168-2203) runs after each accepted step."""
        p = self.p
        close_d2 = None
        last_move = 0.0
        ainv_c = None
        for k in range(p.max_newton):
            cand = self._candidates(x)
            if k == 0 and self._lag_coarse:
                # lagged coarse preconditioner: assembled once per
                # sub-solve at the entry iterate (see assemble_coarse)
                ainv_c = self._assemble_coarse(
                    x, kappa, dHat, cand, fric, damp, mdbc, self._hs_D
                )
            while True:
                dx, g, pcg_iters, pcg_rel, active_count = self._search_dir(
                    x, x_tilde, kappa, dHat, cand, fric, fext, damp, mdbc,
                    ainv_c, self._hs_D
                )
                if self.sc is None or not self.sc.ensure_active_cap(
                    int(active_count[0]), int(active_count[1])
                ):
                    break
                self._build_kernels()  # cap grew; re-trace
            dist_to_opt = float(jnp.abs(dx).max())
            stats.grad_inf.append(float(jnp.abs(g).max()))
            stats.pcg_iters.append(int(pcg_iters))
            if self.sc is not None:
                stats.n_constraints.append(int(self._n_active(x, cand, dHat)))
            if k > 0 and dist_to_opt < self.target_gres and mdbc is None:
                break

            # feasible step: inversion + half-space closed form + mesh ACCD
            alpha = float(self._feasible_step_local(x, dx, self._hs_D))
            # swept-span clamp (reference SpatialHash.hpp:613-618)
            alpha, clamped = self._sweep_clamp(alpha, dx)
            if clamped:
                stats.sweep_clamps += 1
            if self.sc is not None:
                cand_ccd = self._candidates(x, disp=alpha * dx)
                alpha = min(alpha, float(self._ccd_alpha(x, alpha * dx, cand_ccd)) * alpha)
                cand_ls = cand_ccd  # covers every pair reachable within alpha
            else:
                cand_ls = cand
            if alpha <= 0.0:
                raise RuntimeError("feasible step size is 0 (CCD)")

            # backtracking line search (Armijo c1=0, reference lineSearch)
            E0 = self._energy_f(x, x_tilde, kappa, dHat, cand_ls, fric, fext, damp, mdbc, self._hs_D)
            stalled = False
            while True:
                x_new = x + alpha * dx
                E_new = self._energy_f(x_new, x_tilde, kappa, dHat, cand_ls, fric, fext, damp, mdbc, self._hs_D)
                if E_new <= E0:
                    break
                if alpha < 1e-12:
                    # energy noise floor: no step can decrease E (reference's
                    # tiny-step fail-safes, Optimizer.cpp:2067-2149)
                    stalled = True
                    x_new = x
                    E_new = E0
                    break
                alpha *= 0.5
            # intersection safeguard (reference lineSearch :2719-2735)
            if self.sc is not None:
                while True:
                    hit, et_count = self._has_intersection(x_new)
                    if int(et_count) > self.sc.cap_et:
                        self.sc.cap_et = int(int(et_count) * 1.5) + 64
                        self._build_kernels()
                        continue
                    if not bool(hit):
                        break
                    alpha *= 0.5
                    stats.intersection_backtracks += 1
                    x_new = x + alpha * dx
                    if alpha < 1e-14:
                        raise RuntimeError("intersection safeguard failed")
            x = x_new
            stats.alphas.append(alpha)
            stats.energies.append(E_new)
            stats.iters = k + 1

            if mdbc is not None:
                # reference MDBC control (Optimizer.cpp:2176-2203)
                stats.al_iters += 1
                dxt = np.asarray(x)[mdbc["verts_np"]] - np.asarray(mdbc["target"])
                moved = 1.0 - float(np.linalg.norm(dxt)) / mdbc_denom
                if moved > 1.0 - 1e-3 or k >= 100:
                    # finished (or physically obstructed: the remaining gap
                    # carries into the next step's scripted displacement)
                    break
                rho = float(mdbc["rho"])
                if moved < last_move and rho < 1e8:
                    mdbc["rho"] = jnp.asarray(rho * 2.0, self.dtype)
                elif dist_to_opt < self.cn_mbc:
                    if moved < 0.99 and rho < 1e8:
                        mdbc["rho"] = jnp.asarray(rho * 2.0, self.dtype)
                    else:
                        mdbc["lam"] = mdbc["lam"] - rho * mdbc["sqrtm"][:, None] * jnp.asarray(dxt, self.dtype)
                last_move = moved

            if stalled:
                break

            if p.adaptive_kappa:
                kappa_prev = kappa
                kappa, close_d2 = self._post_line_search(x, kappa, dHat, close_d2, cand_ls)
                if kappa > kappa_prev:
                    stats.kappa_doublings += 1

            if verbose:
                print(
                    f"  newton {k}: |dx|={dist_to_opt:.3e} alpha={alpha:.3g} "
                    f"E={E_new:.6e} pcg={pcg_iters}"
                )
        return x

    def _swap_dbc_mask(self, mask):
        """Rebind every kernel to a different Dirichlet mask (the analog of
        the reference's global projectDBC flag flip, Mesh.hpp:135-144)."""
        import dataclasses

        self.mesh = dataclasses.replace(self.mesh, dbc_mask=jnp.asarray(mask))
        self._dbc_sv = self.mesh.dbc_mask[self.mesh.surf_verts]
        if self.sc is not None:
            # rebind (not plain assignment) keeps the invariant that the
            # static big-prim classification is redone whenever the
            # pipeline's mesh is replaced; geometry arrays are unchanged
            # here so the reclassification is cheap and identical
            self.sc.rebind_mesh(self.mesh)
        self._build_kernels()

    def _solve_mdbc_al(self, x, state, mdbc_targets, kappa, dHat, fric, stats,
                       verbose, fext, damp):
        """Moving-DBC augmented-Lagrangian episode: free ALL Dirichlet
        vertices, pull them to their scripted targets with
        -sqrt(m) lam.(x-t) + rho/2 m |x-t|^2, run the IP sub-solve with the
        reference's rho/lambda schedule, then restore projection (reference
        switches m_projectDBC inside solveSub_IP, Optimizer.cpp:2168-2203;
        the caller's subsequent projected sub-solve plays the role of the
        reference's post-flip iterations)."""
        verts, target, denom = mdbc_targets
        m = jnp.asarray(np.asarray(self.mesh.mass)[verts], self.dtype)
        mdbc = dict(
            verts=jnp.asarray(verts),
            verts_np=verts,
            target=target,
            lam=jnp.zeros((len(verts), 3), self.dtype),
            m=m,
            sqrtm=jnp.sqrt(m),
            rho=jnp.asarray(1.0e6, self.dtype),
        )
        orig_mask = np.asarray(self.mesh.dbc_mask)
        # x_tilde with DBC rows at x_prev (reference computeXTilta keeps
        # V_prev for DBC vertices regardless of projection mode)
        x_tilde = jnp.where(
            jnp.asarray(orig_mask)[:, None], state.x_prev, self.compute_x_tilde(state)
        )
        self._swap_dbc_mask(np.zeros_like(orig_mask))
        try:
            x = self._solve_sub_ip(
                x, x_tilde, kappa, dHat, fric, stats, verbose, fext, damp,
                mdbc=mdbc, mdbc_denom=denom,
            )
        finally:
            self._swap_dbc_mask(orig_mask)
        return x

    def _post_line_search(self, x, kappa, dHat, close_d2, cand):
        """Double kappa when previously-close constraints got closer
        (reference postLineSearch, Optimizer.cpp:2356-2446)."""
        d2_now = self._all_dist2(x, cand)
        if close_d2 is not None and close_d2.shape == d2_now.shape:
            close_mask = close_d2 < self.dTol
            if np.any(close_mask & (d2_now <= close_d2)):
                kappa = self.upper_bound_kappa(kappa * 2.0, dHat)
        return kappa, d2_now

    def _all_dist2(self, x, cand):
        """Concatenated squared distances of all tracked constraints
        (jitted; this runs once per Newton iteration for adaptive kappa)."""
        parts = []
        x_sv = x[self._sv]
        # the reference builds its close-constraint set only from non-DBC
        # codim-3 vertices (CollisionObject.h computeConstraintSet:
        # !isDBCVertex && vICoDim==3; codim verts are DBC here): a pinned
        # vertex resting within dTol of a plane must not ratchet kappa
        dbc_sv = np.asarray(self._dbc_sv)
        for i, hs in enumerate(self.halfspaces):
            D_i = None if self._hs_D is None else self._hs_D[i]
            d2 = np.asarray(hs.dist2(x_sv, D=D_i))
            parts.append(np.where(dbc_sv, np.inf, d2))
        if self.sc is not None and cand is not None:
            dpt, dee = self._cand_dists(x, cand)
            parts.extend([np.asarray(dpt), np.asarray(dee)])
        return np.concatenate(parts) if parts else np.zeros(0)
