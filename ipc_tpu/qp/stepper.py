"""QP/SQP constraint-solver time stepper — the comparison path.

Mirrors the reference's `constraintSolver QP | SQP` modes (reference:
fullyImplicit, Optimizer.cpp:1340-1515; solveQP :725-864; updateActiveSet_QP
:1294-1321; computeQPResidual with Fischer-Burmeister :866-922): per step,

  1. active set: CCD from the step-start positions through the proposed
     iterate collects colliding pairs + their toi (persistent across the
     step's iterations, like the reference's MMActiveSet accumulation)
  2. constraints: type-specific c / grad-c linearized at the iterate
     (qp/constraints.py), rows  grad_c . dx >= -c + offset
  3. QP: min 1/2 dx^T (M + h^2 H_el) dx + g^T dx  s.t. rows — solved by the
     matrix-free ADMM solver (qp/admm.py, the OSQP replacement)
  4. iterate until the KKT gradient and the Fischer-Burmeister
     complementarity residual drop below tolerance

No barrier, no friction, no intersection guarantee — these are the
documented properties of the comparison methods the IPC paper evaluates
against; the IP path (timestepper.py) is the production solver.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ipc_tpu.contact.ccd import accd_ee, accd_pt
from ipc_tpu.energy import elasticity as EL
from ipc_tpu.qp.admm import admm_qp
from ipc_tpu.qp.constraints import constraint_c_grad
from ipc_tpu.solver.pcg import apply_block_precond, block_jacobi_inverse
from ipc_tpu.timestepper import IPCStepper, SimState, StepStats

_HI = jax.lax.Precision.HIGHEST

__all__ = ["QPStepper"]


class QPStepper(IPCStepper):
    """Host orchestrator for the QP/SQP comparison modes.

    mode: "QP" (objective Hessian frozen at the step start, reference
    solveWithQP) or "SQP" (re-linearized every iteration).
    """

    def __init__(self, mesh, meta, params, halfspaces=(), self_contact=None,
                 script=None, nbc=None, mode="SQP", constraint_type="volume",
                 constraint_offset=0.0, max_outer=50, cap_active=None):
        super().__init__(mesh, meta, params, halfspaces=halfspaces,
                         self_contact=self_contact, script=script, nbc=nbc)
        self.mode = mode.upper()
        self.constraint_type = constraint_type.lower()
        self.constraint_offset = constraint_offset
        self.max_outer = max_outer
        self.cap_active = cap_active or 4096
        self.fb_tol = 1e-4 * np.sqrt(self.bbox_diag2)
        self._build_qp_kernels()

    def _build_qp_kernels(self):
        mesh = self.mesh
        dtSq = self.w_el
        model = self.p.model
        dbc = mesh.dbc_mask
        from ipc_tpu.ops.scatter import make_gather_sum

        gsum_tet = make_gather_sum(
            np.asarray(mesh.tets).reshape(-1), int(mesh.x_rest.shape[0])
        )

        def qp_energy(x, x_tilde):
            E = dtSq * EL.elasticity_energy(x, mesh, model)
            dx = x - x_tilde
            return E + 0.5 * jnp.sum(mesh.mass[:, None] * dx * dx)

        def qp_grad(x, x_tilde):
            g = dtSq * EL.elasticity_gradient(x, mesh, model, vert_sum=gsum_tet)
            g = g + mesh.mass[:, None] * (x - x_tilde)
            return jnp.where(dbc[:, None], 0.0, g)

        def qp_hess_blocks(x):
            return dtSq * EL.elasticity_hessian_blocks(x, mesh, model, True)

        def make_apply(Hel):
            tets = mesh.tets

            def P_apply(v):
                v = jnp.where(dbc[:, None], 0.0, v)
                out = mesh.mass[:, None] * v
                v4 = v[tets].reshape(-1, 12)
                hv = jnp.einsum("cij,cj->ci", Hel, v4, precision=_HI)
                out = out + gsum_tet(hv.reshape(-1, 3))
                out = jnp.where(dbc[:, None], 0.0, out)
                return jnp.where(dbc[:, None], v, out)

            return P_apply

        def qp_diag(Hel):
            dix = jnp.asarray(
                [c * 39 + i * 12 + j
                 for c in range(4) for i in range(3) for j in range(3)],
                jnp.int32,
            )
            d4 = jnp.take(Hel.reshape(Hel.shape[0], 144), dix, axis=1).reshape(
                -1, 4, 3, 3
            )
            diag = mesh.mass[:, None, None] * jnp.eye(3, dtype=self.dtype)[None]
            diag = diag + gsum_tet(d4.reshape(-1, 3, 3))
            eye = jnp.eye(3, dtype=self.dtype)[None]
            diag = jnp.where(dbc[:, None, None], eye, diag)
            return block_jacobi_inverse(diag)

        self._qp_energy = jax.jit(qp_energy)
        self._qp_grad = jax.jit(qp_grad)
        self._qp_hess_blocks = jax.jit(qp_hess_blocks)
        self._qp_make_apply = make_apply
        self._qp_diag = jax.jit(qp_diag)

        cap = self.cap_active

        def eval_constraints(x_prev, x, vids, is_ee, toi, valid):
            """(c (cap,), grad rows (cap,4,3)) with DBC columns zeroed."""
            def one(v4, e, t):
                return constraint_c_grad(
                    self.constraint_type, x_prev[v4], x[v4], e, t
                )

            c, g = jax.vmap(one)(vids, is_ee, toi)
            g = jnp.where(dbc[vids][:, :, None], 0.0, g)
            c = jnp.where(valid, c, 1e28)
            g = jnp.where(valid[:, None, None], g, 0.0)
            return c, g

        self._qp_constraints = jax.jit(eval_constraints)

        def pair_tois(x_from, disp, pt_vids, ee_vids):
            t_pt = jax.vmap(accd_pt, in_axes=(0, 0, None, None))(
                x_from[pt_vids], disp[pt_vids], 0.1, 64
            )
            t_ee = jax.vmap(accd_ee, in_axes=(0, 0, None, None))(
                x_from[ee_vids], disp[ee_vids], 0.1, 64
            )
            return t_pt, t_ee

        self._qp_pair_tois = jax.jit(pair_tois)

    # -- active set (host-persistent per step) ------------------------------

    def _update_active_set(self, aset, x_start, x_target):
        """CCD from x_start through x_target (reference updateActiveSet_QP):
        colliding candidate pairs join `aset` (dict key -> (vids, is_ee,
        toi)); half-space constraints activate for surface vertices whose
        target position is within the offset band or below the plane
        (reference HalfSpace::filterSearchDir_QP / updateConstraints_QP).
        Returns True when new constraints were added."""
        added = False
        sv = np.asarray(self._sv)
        for hsi, hs in enumerate(self.halfspaces):
            gap = np.asarray(hs.signed_dist(jnp.asarray(x_target)[self._sv]))
            band = self.constraint_offset + 1e-3 * float(np.sqrt(self.bbox_diag2))
            for si in np.nonzero(gap < band)[0]:
                key = ("hs", hsi, int(sv[si]))
                if key not in aset:
                    n = np.asarray(hs._n, float)
                    aset[key] = ("hs", int(sv[si]), n, float(hs._D))
                    added = True
        if self.sc is None:
            return added
        disp = x_target - x_start
        cand = self.sc.build_candidates(x_start, disp, float(np.sqrt(self.dHat)),
                                        with_et=False)
        t_pt, t_ee = self._qp_pair_tois(
            x_start, disp, cand.pt_vids, cand.ee_vids
        )
        t_pt = np.asarray(t_pt)
        t_ee = np.asarray(t_ee)
        pt_vids = np.asarray(cand.pt_vids)
        ee_vids = np.asarray(cand.ee_vids)
        pt_valid = np.asarray(cand.pt_valid)
        ee_valid = np.asarray(cand.ee_valid)
        for vids, t, valid, is_ee in (
            (pt_vids, t_pt, pt_valid, False),
            (ee_vids, t_ee, ee_valid, True),
        ):
            hit = valid & (t < 1.0 - 1e-9)
            for i in np.nonzero(hit)[0]:
                key = (is_ee,) + tuple(int(v) for v in vids[i])
                if key not in aset:
                    aset[key] = (vids[i].copy(), is_ee, float(t[i]))
                    added = True
                else:  # refresh toi for Verschoor-family contact points
                    v, e, _ = aset[key]
                    aset[key] = (v, e, float(t[i]))
        return added

    def _aset_arrays(self, aset):
        """Pad the active set into fixed-cap device arrays. Half-space
        entries come back separately as precomputed linear rows (their
        gradient is the constant plane normal on one vertex)."""
        pairs = [v for v in aset.values() if not isinstance(v[0], str)]
        hs_entries = [v for v in aset.values() if isinstance(v[0], str)]
        cap = self.cap_active
        if len(pairs) > cap:
            self.cap_active = cap = int(len(pairs) * 1.5) + 64
        vids = np.zeros((cap, 4), np.int32)
        is_ee = np.zeros((cap,), bool)
        toi = np.ones((cap,), np.float64)
        valid = np.zeros((cap,), bool)
        for i, (v, e, t) in enumerate(pairs):
            vids[i] = v
            is_ee[i] = e
            toi[i] = t
            valid[i] = True
        hs_cap = max(64, len(hs_entries))
        hvids = np.zeros((hs_cap, 4), np.int32)
        hrows = np.zeros((hs_cap, 4, 3))
        hD = np.zeros((hs_cap,))
        hvalid = np.zeros((hs_cap,), bool)
        for i, (_, v, n, D) in enumerate(hs_entries):
            hvids[i, 0] = v
            hrows[i, 0] = n
            hD[i] = D
            hvalid[i] = True
        return (
            jnp.asarray(vids),
            jnp.asarray(is_ee),
            jnp.asarray(toi, self.dtype),
            jnp.asarray(valid),
        ), (
            jnp.asarray(hvids),
            jnp.asarray(hrows, self.dtype),
            jnp.asarray(hD, self.dtype),
            jnp.asarray(hvalid),
        )

    # -- one time step ------------------------------------------------------

    def step(self, state: SimState, verbose=False):
        p = self.p
        stats = StepStats()
        x_start = state.x
        x_tilde = self.compute_x_tilde(state)
        x = state.x

        aset = {}
        Hel = self._qp_hess_blocks(x)  # QP mode freezes this; SQP refreshes
        P_apply = self._qp_make_apply(Hel)
        inv_diag = self._qp_diag(Hel)
        precond = lambda r: apply_block_precond(inv_diag, r)

        sqn_g = np.inf
        fb_norm = 0.0
        for it in range(self.max_outer):
            g = self._qp_grad(x, x_tilde)
            if self.mode == "SQP" and it > 0:
                Hel = self._qp_hess_blocks(x)
                P_apply = self._qp_make_apply(Hel)
                inv_diag = self._qp_diag(Hel)
                precond = lambda r: apply_block_precond(inv_diag, r)

            (vids, is_ee, toi, valid), (hvids, hrows, hD, hvalid) = (
                self._aset_arrays(aset)
            )
            c, rows = self._qp_constraints(x_start, x, vids, is_ee, toi, valid)
            # half-space rows: c = n . x_v + D (linear, constant gradient)
            hc = jnp.einsum("kj,kj->k", hrows[:, 0], x[hvids[:, 0]]) + hD
            hc = jnp.where(hvalid, hc, 1e28)
            hrows_m = jnp.where(
                self.mesh.dbc_mask[hvids][:, :, None], 0.0, hrows
            )
            hrows_m = jnp.where(hvalid[:, None, None], hrows_m, 0.0)
            all_rows = jnp.concatenate([rows, hrows_m])
            all_vids = jnp.concatenate([vids, hvids])
            all_valid = jnp.concatenate([valid, hvalid])
            all_c = jnp.concatenate([c, hc])
            l = jnp.where(all_valid, -all_c + self.constraint_offset, 0.0)
            dx, lam, admm_iters = admm_qp(
                P_apply, g, all_rows, all_vids, all_valid, l, precond=precond,
                rho=float(self.avg_node_mass), iters=200,
                eps_abs=1e-7 * float(np.sqrt(self.bbox_diag2)),
            )
            dx = jnp.where(self.mesh.dbc_mask[:, None], 0.0, dx)
            x = x + dx

            # residuals at the new iterate (reference computeQPResidual)
            g_new = self._qp_grad(x, x_tilde)
            ATlam = jnp.zeros_like(g_new).at[all_vids.reshape(-1)].add(
                (all_rows * lam[:, None, None]).reshape(-1, 3)
            )
            grad_kkt = jnp.where(
                self.mesh.dbc_mask[:, None], 0.0, g_new - ATlam
            )
            sqn_g = float(jnp.sum(grad_kkt * grad_kkt))
            c_new, _ = self._qp_constraints(x_start, x, vids, is_ee, toi, valid)
            hc_new = jnp.einsum("kj,kj->k", hrows[:, 0], x[hvids[:, 0]]) + hD
            all_c_new = jnp.concatenate([
                jnp.where(valid, c_new, 0.0), jnp.where(hvalid, hc_new, 0.0)
            ])
            lam_np = np.where(np.asarray(all_valid), np.asarray(lam), 0.0)
            c_np = np.asarray(all_c_new)
            fb = lam_np + c_np - np.sqrt(lam_np**2 + c_np**2)
            fb_norm = float(np.linalg.norm(fb))

            added = self._update_active_set(aset, np.asarray(x_start), np.asarray(x))

            stats.iters = it + 1
            stats.grad_inf.append(float(jnp.abs(grad_kkt).max()))
            stats.n_constraints.append(len(aset))
            stats.pcg_iters.append(int(admm_iters))
            if verbose:
                print(f"  qp {it}: |KKT|^2={sqn_g:.3e} fb={fb_norm:.3e} "
                      f"K={len(aset)} admm={int(admm_iters)}")
            if (not added) and sqn_g <= self.target_gres**2 and (
                self.mode == "QP" or fb_norm <= self.fb_tol
            ):
                break

        v_new = (x - state.x_prev) / self.dt
        a_new = (v_new - state.v) / self.dt
        return (
            SimState(x=x, x_prev=x, v=v_new, a=a_new,
                     t=state.t + self.dt, step=state.step + 1),
            stats,
        )
