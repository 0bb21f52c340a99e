"""Projected-Newton interior-point time stepper.

The TPU-native replacement for the reference's Optimizer<3>
(reference: src/TimeStepper/Optimizer.hpp/.cpp): backward-Euler incremental
potential minimization with barrier contact, adaptive kappa, feasible-step
filtering (element inversion + CCD), backtracking line search, and lagged
friction — organized as jitted fixed-shape kernels driven by a thin host
loop (the Newton iteration count and homotopy schedule are data-dependent;
everything inside an iteration runs on device).

Objective per step (BE; reference computeEnergyVal, Optimizer.cpp:3198-3404):

    E(x) = 1/2 ||x - xTilde||^2_M            (inertia)
         + h^2 Psi(x)                        (elasticity)
         - h^2 sum m_v f_NBC . x_v           (Neumann BC work)
         + kappa * sum_k dup_k b(d_k, dHat)  (contact barrier)
         + sum_k mu lam_k f0(|u_k|)          (lagged friction)

with xTilde = x_prev + h v + h^2 g (reference computeXTilta,
Optimizer.cpp:1235-1278). Newton direction solves (M + h^2 H_Psi + kappa H_b
+ H_f) p = -grad with SPD-projected blocks via matrix-free PCG.

Adaptive kappa follows the reference exactly (suggestKappa/initKappa/
upperBoundKappa Optimizer.cpp:2215-2313, doubling in postLineSearch
:2356-2446). Convergence: ||p||_inf < targetGRes = sqrt(1e-8 * bboxDiag^2 *
h^2) (updateTargetGRes, Optimizer.cpp:2941-2945).
"""

from dataclasses import dataclass, field, replace
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ipc_tpu.energy import elasticity as EL
from ipc_tpu.ops.barrier import barrier_hess
from ipc_tpu.solver.pcg import apply_block_precond, block_jacobi_inverse, pcg

_HI = jax.lax.Precision.HIGHEST

__all__ = ["SimParams", "SimState", "IPCStepper"]


@dataclass(frozen=True)
class SimParams:
    """Static solve parameters (host floats; defaults = reference defaults).

    All `*_rel` quantities are relative to the rest bounding-box diagonal
    (reference Config/Optimizer defaults: dt 0.025 (Config.hpp:97), dHat
    1e-3 rel (Optimizer.cpp:274-282), epsv 1e-3 rel/s (:292-304), Newton
    tol 1e-2 rel (README; relGL2Tol = tol^2 = 1e-4... default 1e-8 in code
    for tol=1e-4? Optimizer.cpp:97 sets 1e-8, i.e. p_relTol=1e-4), dTol
    1e-9 rel (:102), kappaMinMultiplier 1e11 (Config.hpp:139)."""

    dt: float = 0.025
    gravity: tuple = (0.0, -9.80665, 0.0)
    model: str = "NH"
    dhat_rel: float = 1e-3  # sqrt units; dHat = (dhat_rel^2) * bboxDiag2
    epsv_rel: float = 1e-3  # per second
    rel_gl2_tol: float = 1e-8
    dtol_rel: float = 1e-9
    kappa: float = 0.0  # 0 -> suggest + adaptive
    kappa_min_mult: float = 1e11
    adaptive_kappa: bool = True
    fric_iter_amt: int = 1
    max_newton: int = 10000
    pcg_tol: float = 1e-3
    pcg_maxiter: int = 1000
    ccd_slackness_a: float = 0.9  # analytic COs (reference solveSub_IP :1885)
    ccd_slackness_m: float = 0.8  # mesh CCD
    time_integration: str = "BE"
    nm_beta: float = 0.25
    nm_gamma: float = 0.5


@dataclass(frozen=True)
class SimState:
    """Dynamic simulation state (pytree)."""

    x: Any  # (V,3) current positions
    x_prev: Any  # (V,3) positions at last committed step
    v: Any  # (V,3) velocities
    a: Any  # (V,3) accelerations (Newmark)
    t: float = 0.0
    step: int = 0


jax.tree_util.register_dataclass(
    SimState, data_fields=["x", "x_prev", "v", "a"], meta_fields=["t", "step"]
)


@dataclass
class StepStats:
    iters: int = 0
    alphas: list = field(default_factory=list)
    energies: list = field(default_factory=list)
    grad_inf: list = field(default_factory=list)
    n_constraints: list = field(default_factory=list)
    kappa: float = 0.0
    pcg_iters: list = field(default_factory=list)


class IPCStepper:
    """Host orchestrator owning jitted device kernels for one scene.

    Collision objects: `halfspaces` is a list of contact.halfspace.HalfSpace;
    self-/mesh-mesh contact plugs in via `self_contact` (added by the
    contact pipeline module).
    """

    def __init__(self, mesh, meta, params: SimParams, halfspaces=(), self_contact=None,
                 script=None, nbc=None):
        self.mesh = mesh
        self.meta = meta
        self.p = params
        self.halfspaces = list(halfspaces)
        self.self_contact = self_contact
        self.script = script
        self.nbc = nbc

        self.dtype = mesh.x_rest.dtype
        self.dt = params.dt
        self.dtSq = params.dt * params.dt
        self.bbox_diag2 = meta.bbox_diag2
        self.dHat = (params.dhat_rel**2) * self.bbox_diag2
        self.dTol = (params.dtol_rel**2) * self.bbox_diag2
        self.target_gres = np.sqrt(params.rel_gl2_tol * self.bbox_diag2 * self.dtSq)
        self.epsv_h = params.epsv_rel * np.sqrt(self.bbox_diag2) * params.dt
        self.fric_dhat = self.epsv_h**2  # eps2 band for f0 smoothing
        self.avg_node_mass = meta.avg_node_mass
        self.gravity = np.asarray(params.gravity)

        self._sv = mesh.surf_verts
        self._dbc_sv = mesh.dbc_mask[mesh.surf_verts]

        self._build_kernels()

    # ------------------------------------------------------------------
    # kappa schedule (reference Optimizer.cpp:2215-2313)
    # ------------------------------------------------------------------

    def suggest_kappa(self, dHat):
        H_b = float(barrier_hess(jnp.asarray(1e-16 * self.bbox_diag2, jnp.float64),
                                 jnp.asarray(dHat, jnp.float64)))
        return self.p.kappa_min_mult * self.avg_node_mass / (4e-16 * self.bbox_diag2 * H_b)

    def upper_bound_kappa(self, kappa, dHat):
        return min(kappa, 100.0 * self.suggest_kappa(dHat))

    def init_kappa(self, x, x_tilde, kappa, dHat, fric):
        """Balance the contact-barrier gradient against the rest of the
        objective on constrained DOFs (reference initKappa)."""
        masks = self._contact_masks(x, dHat)
        n_active = sum(int(m.sum()) for m in masks)
        if n_active == 0:
            return kappa
        g_E = self._grad_no_contact(x, x_tilde, fric)
        g_c = self._grad_contact_unit(x, dHat, masks)
        free = ~np.asarray(self.mesh.dbc_mask)
        g_E = np.asarray(g_E)[free]
        g_c = np.asarray(g_c)[free]
        denom = float((g_c * g_c).sum())
        if denom <= 0.0:
            return kappa
        min_kappa = -float((g_c * g_E).sum()) / denom
        if min_kappa > 0.0:
            kappa = min_kappa
        kappa = max(kappa, self.suggest_kappa(dHat))
        return self.upper_bound_kappa(kappa, dHat)

    # ------------------------------------------------------------------
    # jitted kernels
    # ------------------------------------------------------------------

    def _build_kernels(self):
        mesh = self.mesh
        p = self.p
        dtSq = self.dtSq
        model = p.model
        sv = self._sv

        def contact_masks(x, dHat):
            x_sv = x[sv]
            return tuple(hs.active_mask(x_sv, dHat) for hs in self.halfspaces)

        def energy(x, x_tilde, kappa, dHat, masks, fric):
            E = dtSq * EL.elasticity_energy(x, mesh, model)
            dx = x - x_tilde
            E = E + 0.5 * jnp.sum(mesh.mass[:, None] * dx * dx)
            x_sv = x[sv]
            for hs, m in zip(self.halfspaces, masks):
                E = E + hs.energy(x_sv, m, kappa, dHat)
            for hs, fr in zip(self.halfspaces, fric):
                if hs.params.friction > 0.0 and fr is not None:
                    E = E + hs.friction_energy(x_sv, fr["xt"], fr["lam"], fr["eps2"])
            return E

        def grad(x, x_tilde, kappa, dHat, masks, fric):
            g = dtSq * EL.elasticity_gradient(x, mesh, model)
            g = g + mesh.mass[:, None] * (x - x_tilde)
            x_sv = x[sv]
            g_sv = jnp.zeros_like(x_sv)
            for hs, m in zip(self.halfspaces, masks):
                g_sv = g_sv + hs.grad_sv(x_sv, m, kappa, dHat)
            for hs, fr in zip(self.halfspaces, fric):
                if hs.params.friction > 0.0 and fr is not None:
                    g_sv = g_sv + hs.friction_grad_sv(x_sv, fr["xt"], fr["lam"], fr["eps2"])
            g = g.at[sv].add(g_sv)
            # DBC projection: zero rows (projected-Newton on free DOFs)
            return jnp.where(mesh.dbc_mask[:, None], 0.0, g)

        def search_dir(x, x_tilde, kappa, dHat, masks, fric):
            """Assemble SPD blocks, run block-Jacobi PCG on -grad."""
            g = grad(x, x_tilde, kappa, dHat, masks, fric)
            Hel = dtSq * EL.elasticity_hessian_blocks(x, mesh, model, True)  # (T,12,12)
            x_sv = x[sv]
            Hsv = jnp.zeros((sv.shape[0], 3, 3), x.dtype)
            for hs, m in zip(self.halfspaces, masks):
                Hsv = Hsv + hs.hess_blocks_sv(x_sv, m, kappa, dHat)
            for hs, fr in zip(self.halfspaces, fric):
                if hs.params.friction > 0.0 and fr is not None:
                    Hsv = Hsv + hs.friction_hess_blocks_sv(
                        x_sv, fr["xt"], fr["lam"], fr["eps2"]
                    )

            dbc = mesh.dbc_mask
            tets = mesh.tets

            def operator(v):
                v = jnp.where(dbc[:, None], 0.0, v)
                out = mesh.mass[:, None] * v
                v4 = v[tets].reshape(-1, 12)
                hv = jnp.einsum("tij,tj->ti", Hel, v4, precision=_HI)
                out = out.at[tets.reshape(-1)].add(hv.reshape(-1, 4, 3).reshape(-1, 3))
                out = out.at[sv].add(
                    jnp.einsum("vij,vj->vi", Hsv, v[sv], precision=_HI)
                )
                return jnp.where(dbc[:, None], v, out)

            # block-Jacobi: mass + per-tet diagonal 3x3 blocks + CO blocks
            diag = jnp.zeros((x.shape[0], 3, 3), x.dtype)
            diag = diag + mesh.mass[:, None, None] * jnp.eye(3, dtype=x.dtype)[None]
            Hel4 = Hel.reshape(-1, 4, 3, 4, 3)
            for c in range(4):
                diag = diag.at[tets[:, c]].add(Hel4[:, c, :, c, :])
            diag = diag.at[sv].add(Hsv)
            eye = jnp.eye(3, dtype=x.dtype)[None]
            diag = jnp.where(dbc[:, None, None], eye, diag)
            inv_diag = block_jacobi_inverse(diag)

            def precond(r):
                return apply_block_precond(inv_diag, r)

            rhs = -g
            dx, iters, rel = pcg(operator, rhs, precond, tol=p.pcg_tol, maxiter=p.pcg_maxiter)
            return dx, g, iters, rel

        def feasible_step(x, dx, slackness_a):
            alpha = jnp.asarray(1.0, x.dtype)
            t_inv = EL.filter_step_size(x, dx, mesh, model)
            alpha = jnp.minimum(alpha, t_inv)
            x_sv = x[sv]
            p_sv = dx[sv]
            for hs in self.halfspaces:
                alpha = jnp.minimum(
                    alpha, hs.largest_feasible_step(x_sv, p_sv, self._dbc_sv, slackness_a)
                )
            return alpha

        def capture_friction(x, kappa, dHat):
            x_sv = x[sv]
            out = []
            for hs in self.halfspaces:
                if hs.params.friction > 0.0:
                    m = hs.active_mask(x_sv, dHat)
                    lam = hs.friction_lambda(x_sv, m, kappa, dHat)
                    out.append(dict(lam=lam, mask=m))
                else:
                    out.append(None)
            return out

        self._contact_masks = jax.jit(contact_masks)
        self._energy = jax.jit(energy)
        self._grad = jax.jit(grad)
        self._search_dir = jax.jit(search_dir)
        self._feasible_step = jax.jit(feasible_step, static_argnames=())
        self._capture_friction = jax.jit(capture_friction)

        def grad_no_contact(x, x_tilde, fric):
            g = dtSq * EL.elasticity_gradient(x, mesh, model)
            g = g + mesh.mass[:, None] * (x - x_tilde)
            x_sv = x[sv]
            g_sv = jnp.zeros_like(x_sv)
            for hs, fr in zip(self.halfspaces, fric):
                if hs.params.friction > 0.0 and fr is not None:
                    g_sv = g_sv + hs.friction_grad_sv(x_sv, fr["xt"], fr["lam"], fr["eps2"])
            return g.at[sv].add(g_sv)

        def grad_contact_unit(x, dHat, masks):
            """Contact gradient with kappa = 1 (for initKappa balancing)."""
            x_sv = x[sv]
            g_sv = jnp.zeros_like(x_sv)
            for hs, m in zip(self.halfspaces, masks):
                g_sv = g_sv + hs.grad_sv(x_sv, m, 1.0, dHat)
            g = jnp.zeros_like(x)
            return g.at[sv].add(g_sv)

        self._grad_no_contact = jax.jit(grad_no_contact)
        self._grad_contact_unit = jax.jit(grad_contact_unit)

    # ------------------------------------------------------------------
    # time stepping
    # ------------------------------------------------------------------

    def compute_x_tilde(self, state: SimState):
        g = jnp.asarray(self.gravity, self.dtype)
        xt = state.x_prev + self.dt * state.v + self.dtSq * g[None, :]
        return jnp.where(self.mesh.dbc_mask[:, None], state.x_prev, xt)

    def initial_state(self, x0=None, v0=None):
        x = jnp.asarray(x0 if x0 is not None else self.mesh.x_rest, self.dtype)
        v = jnp.asarray(v0, self.dtype) if v0 is not None else jnp.zeros_like(x)
        return SimState(x=x, x_prev=x, v=v, a=jnp.zeros_like(x))

    def _fric_pack(self, captured, x_prev):
        """Bind captured lambdas to the previous-step anchor positions."""
        out = []
        xt_sv = x_prev[self._sv]
        for fr in captured:
            if fr is None:
                out.append(None)
            else:
                out.append(dict(lam=fr["lam"], xt=xt_sv, eps2=jnp.asarray(self.fric_dhat, self.dtype)))
        return out

    def step(self, state: SimState, verbose=False):
        """Advance one time step (reference Optimizer::solve + fullyImplicit_IP,
        Optimizer.cpp:509-602, 1517-1819)."""
        p = self.p
        stats = StepStats()
        x_tilde = self.compute_x_tilde(state)

        x = state.x
        dHat = self.dHat

        solve_fric = any(hs.params.friction > 0.0 for hs in self.halfspaces)

        # kappa init (reference fullyImplicit_IP :1536-1550)
        kappa = p.kappa
        if kappa > 0.0:
            kappa = self.upper_bound_kappa(kappa, dHat)
        else:
            kappa = self.suggest_kappa(dHat)
        no_fric = [None] * len(self.halfspaces)
        if p.adaptive_kappa:
            kappa = self.init_kappa(x, x_tilde, kappa, dHat, no_fric)

        # lagged friction capture at step start
        fric = no_fric
        if solve_fric:
            fric = self._fric_pack(self._capture_friction(x, kappa, dHat), state.x_prev)

        fric_iter = 0
        while True:
            x = self._solve_sub_ip(x, x_tilde, kappa, dHat, fric, stats, verbose)
            fric_iter += 1
            if not solve_fric:
                break
            if p.fric_iter_amt > 0 and fric_iter >= p.fric_iter_amt + 0:
                # re-capture once more? reference recaptures then checks
                # convergence; with fricIterAmt=1 it stops after 1 loop.
                break
            fric = self._fric_pack(self._capture_friction(x, kappa, dHat), state.x_prev)

        stats.kappa = kappa

        # velocity update (BE; reference Optimizer::solve :570-596)
        v_new = (x - state.x_prev) / self.dt
        v_new = jnp.where(self.mesh.dbc_mask[:, None], 0.0, v_new)
        new_state = SimState(
            x=x,
            x_prev=x,
            v=v_new,
            a=state.a,
            t=state.t + self.dt,
            step=state.step + 1,
        )
        return new_state, stats

    def _solve_sub_ip(self, x, x_tilde, kappa, dHat, fric, stats, verbose):
        """Newton loop (reference solveSub_IP, Optimizer.cpp:1821-2213)."""
        p = self.p
        close_set = None  # (masks, d2 values) for adaptive kappa
        for k in range(p.max_newton):
            masks = self._contact_masks(x, dHat)
            dx, g, pcg_iters, pcg_rel = self._search_dir(x, x_tilde, kappa, dHat, masks, fric)
            dist_to_opt = float(jnp.abs(dx).max())
            stats.grad_inf.append(float(jnp.abs(g).max()))
            stats.pcg_iters.append(int(pcg_iters))
            stats.n_constraints.append(sum(int(m.sum()) for m in masks))
            if k > 0 and dist_to_opt < self.target_gres:
                break

            alpha = float(self._feasible_step(x, dx, p.ccd_slackness_a))
            if alpha <= 0.0:
                raise RuntimeError("feasible step size is 0 (CCD)")

            # backtracking line search (Armijo c1=0: monotone decrease,
            # reference lineSearch, Optimizer.cpp:2661-2916)
            E0 = float(self._energy(x, x_tilde, kappa, dHat, masks, fric))
            while True:
                x_new = x + alpha * dx
                masks_new = self._contact_masks(x_new, dHat)
                E_new = float(self._energy(x_new, x_tilde, kappa, dHat, masks_new, fric))
                if E_new <= E0 or alpha < 1e-12:
                    break
                alpha *= 0.5
            x = x_new
            stats.alphas.append(alpha)
            stats.energies.append(E_new)
            stats.iters = k + 1

            # adaptive kappa (reference postLineSearch :2356-2446)
            if p.adaptive_kappa:
                kappa, close_set = self._post_line_search(x, kappa, dHat, close_set)

            if verbose:
                print(
                    f"  newton {k}: |dx|={dist_to_opt:.3e} alpha={alpha:.3g} "
                    f"E={E_new:.6e} pcg={pcg_iters}"
                )
        return x

    def _post_line_search(self, x, kappa, dHat, close_set):
        """Double kappa when previously-close constraints got closer; track
        constraints with d < dTol (reference postLineSearch)."""
        x_sv = np.asarray(x[self._sv])
        d2_all = []
        for hs in self.halfspaces:
            d2_all.append(np.asarray(hs.dist2(jnp.asarray(x_sv))))
        if close_set is not None:
            update = False
            for d2, (prev_mask, prev_val) in zip(d2_all, close_set):
                if prev_mask.any() and np.any(d2[prev_mask] <= prev_val[prev_mask]):
                    update = True
                    break
            if update:
                kappa = self.upper_bound_kappa(kappa * 2.0, dHat)
        new_close = []
        for d2 in d2_all:
            m = d2 < self.dTol
            new_close.append((m, d2))
        return kappa, new_close
