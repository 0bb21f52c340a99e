"""Analytic half-space (ground/wall) collision object.

TPU-native equivalent of the reference's HalfSpace<3>
(reference: src/CollisionObject/HalfSpace.hpp/.cpp, base interface
src/CollisionObject/CollisionObject.h:28-473):

* the contact "constraint value" is the SQUARED signed distance
  d = (n.x + D)^2 (HalfSpace.cpp:106-111), fed to the same barrier as mesh
  contacts;
* barrier gradient per active vertex: kappa * g_b(d) * 2 dist * n;
* barrier Hessian per active vertex: kappa * (4 H_b d + 2 g_b) n n^T, only
  added when the scalar is positive — the half-space SPD projection
  (HalfSpace.cpp:180-240);
* largest feasible step per surface vertex moving toward the plane:
  alpha <= slackness * (-dist / (n.p)) (HalfSpace.cpp:242-271);
* lagged friction on the plane's tangent basis (HalfSpace.cpp:272-415).

MOVING planes (the reference's ACO scripts; CollisionObject.h:32 carries
velocitydt, HalfSpace::move clamps the per-step plane displacement against
the surface vertices, HalfSpace.cpp:389-415): the plane offset D is a
per-step value, so every barrier method takes an optional traced `D`
override (static scenes keep the baked constant — same trace), and the
friction terms take an optional `veldt` (the plane's displacement this
step) subtracted from the relative displacement exactly like
`VDiff -= Base::velocitydt` (HalfSpace.cpp:286,314,348). The per-step
clamped move itself (`move_bound`) is a host-side O(Sv) numpy reduction —
it runs once per step outside the jitted solve.

The active set is a fixed-shape boolean mask over surface vertices — no
dynamic lists.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ipc_tpu.ops.barrier import barrier, barrier_grad, barrier_hess
from ipc_tpu.ops.friction import f0_sf, f1_sf_over_x

__all__ = ["HalfSpaceParams", "HalfSpace"]


@dataclass(frozen=True)
class HalfSpaceParams:
    """Static plane parameters (host floats / tuples; not traced)."""

    origin: tuple = (0.0, 0.0, 0.0)
    normal: tuple = (0.0, 1.0, 0.0)
    friction: float = 0.0

    @property
    def D(self):
        import numpy as np

        n = np.asarray(self.normal, dtype=float)
        n = n / np.linalg.norm(n)
        return -float(n @ np.asarray(self.origin, dtype=float))

    @property
    def unit_normal(self):
        import numpy as np

        n = np.asarray(self.normal, dtype=float)
        return tuple(n / np.linalg.norm(n))

    def tangent_basis(self):
        """A fixed orthonormal basis of the plane (host-side)."""
        import numpy as np

        n = np.asarray(self.unit_normal)
        a = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        t0 = np.cross(n, a)
        t0 /= np.linalg.norm(t0)
        t1 = np.cross(n, t0)
        return np.stack([t0, t1], axis=1)  # (3,2)


class HalfSpace:
    """Stateless device functions bound to one plane's parameters."""

    def __init__(self, params: HalfSpaceParams):
        self.params = params
        import numpy as np

        self._n = np.asarray(params.unit_normal)
        self._D = params.D
        self._basis = params.tangent_basis()

    # -- geometry ----------------------------------------------------------

    def D_of_origin(self, origin):
        """Plane offset D for a (possibly traced) origin: D = -n.origin."""
        return -(jnp.asarray(origin) @ jnp.asarray(self._n, jnp.asarray(origin).dtype))

    def signed_dist(self, x_sv, D=None):
        """(Sv,) signed distances of surface-vertex positions (Sv,3).

        `D` (traced scalar) overrides the static plane offset for moving
        planes; None keeps the baked constant."""
        n = jnp.asarray(self._n, x_sv.dtype)
        Dv = jnp.asarray(self._D if D is None else D, x_sv.dtype)
        return x_sv @ n + Dv

    def dist2(self, x_sv, D=None):
        d = self.signed_dist(x_sv, D)
        return d * d

    def active_mask(self, x_sv, dHat, D=None):
        """Active set: surface vertices with d^2 < dHat (reference
        CollisionObject::computeConstraintSet)."""
        return self.dist2(x_sv, D) < dHat

    # -- barrier energy / derivatives -------------------------------------

    def energy(self, x_sv, kappa, dHat, D=None):
        d2 = self.dist2(x_sv, D)
        return kappa * barrier(d2, dHat).sum()

    def grad_sv(self, x_sv, kappa, dHat, D=None):
        """(Sv,3) gradient w.r.t. the surface-vertex positions (barrier_grad
        is exactly zero beyond dHat, so no explicit active mask is needed)."""
        n = jnp.asarray(self._n, x_sv.dtype)
        dist = self.signed_dist(x_sv, D)
        d2 = dist * dist
        g_b = barrier_grad(d2, dHat)
        coef = kappa * g_b * 2.0 * dist
        return coef[:, None] * n[None, :]

    def hess_blocks_sv(self, x_sv, kappa, dHat, D=None):
        """(Sv,3,3) SPD per-vertex Hessian blocks (zero where inactive)."""
        n = jnp.asarray(self._n, x_sv.dtype)
        dist = self.signed_dist(x_sv, D)
        d2 = dist * dist
        g_b = barrier_grad(d2, dHat)
        H_b = barrier_hess(d2, dHat)
        param = 4.0 * H_b * d2 + 2.0 * g_b
        param = jnp.where(param > 0.0, kappa * param, 0.0)
        nnT = jnp.outer(n, n)
        return param[:, None, None] * nnT[None, :, :]

    # -- feasible step -----------------------------------------------------

    def largest_feasible_step(self, x_sv, p_sv, dbc_sv, slackness=0.9, D=None):
        """min over surface verts of slackness * (-dist / (n.p)) for verts
        moving toward the plane; DBC verts skipped (HalfSpace.cpp:242-271)."""
        n = jnp.asarray(self._n, x_sv.dtype)
        coef = p_sv @ n
        dist = self.signed_dist(x_sv, D)
        moving_in = (coef < 0.0) & (~dbc_sv)
        alpha = jnp.where(
            moving_in, -dist / jnp.where(moving_in, coef, -1.0) * slackness, jnp.inf
        )
        return alpha.min()

    # -- scripted plane motion (host-side, once per step) -------------------

    def move_bound(self, x_sv_np, deltaX, D=None, slackness=0.5):
        """Clamped fraction of a plane displacement `deltaX` so the plane
        never jumps past a surface vertex (reference HalfSpace::move,
        HalfSpace.cpp:389-415: stepSize = min(1, slackness * dist / (n.dX))
        over vertices the plane approaches). Pure-numpy host reduction; the
        caller updates its origin by the returned fraction * deltaX. `D` is
        the plane's CURRENT offset (defaults to the static one)."""
        import numpy as np

        n = self._n
        coef = float(n @ np.asarray(deltaX, float))
        if coef <= 0.0:  # plane moving away from (or along) its halfspace
            return 1.0
        dist = np.asarray(x_sv_np, float) @ n + (self._D if D is None else float(D))
        return float(min(1.0, slackness * dist.min() / coef))

    def move_bound_t(self, x_sv, deltaX, D, slackness=0.5):
        """Traced move_bound for the fully-jitted step's ACO plane motion
        (same math; deltaX and D are traced)."""
        n = jnp.asarray(self._n, x_sv.dtype)
        coef = n @ deltaX
        dist = x_sv @ n + D
        s = jnp.minimum(1.0, slackness * dist.min() / jnp.where(coef > 0.0, coef, 1.0))
        return jnp.where(coef <= 0.0, 1.0, s)

    # -- lagged friction ---------------------------------------------------

    def friction_lambda(self, x_sv, mask, kappa, dHat, D=None):
        """Lagged multipliers lambda = -kappa * 2 sqrt(d2) * g_b(d2) >= 0
        captured at the previous outer iterate (Optimizer.cpp:1552-1605)."""
        d2 = self.dist2(x_sv, D)
        lam = -kappa * 2.0 * jnp.sqrt(jnp.maximum(d2, 0.0)) * barrier_grad(d2, dHat)
        return jnp.where(mask, lam, 0.0)

    def friction_energy(self, x_sv, xt_sv, lam, eps2, veldt=None):
        """mu * sum lam_k f0(|tangential rel dx|), smooth band eps2 = fricDHat
        (HalfSpace.cpp:272-330 + FrictionUtils f0). `veldt` is the plane's
        own displacement this step (moving planes drag contacts with them:
        VDiff -= velocitydt, HalfSpace.cpp:286)."""
        mu = self.params.friction
        if mu == 0.0:
            return jnp.asarray(0.0, x_sv.dtype)
        B = jnp.asarray(self._basis, x_sv.dtype)
        eps = jnp.sqrt(eps2)
        dxr = x_sv - xt_sv
        if veldt is not None:
            dxr = dxr - jnp.asarray(veldt, x_sv.dtype)[None, :]
        u = dxr @ B  # (Sv,2) tangential displacement
        u2 = jnp.sum(u * u, axis=1)
        f0 = jnp.where(u2 > eps2, jnp.sqrt(jnp.maximum(u2, eps2)), f0_sf(u2, eps))
        return mu * jnp.sum(lam * f0)

    def friction_grad_sv(self, x_sv, xt_sv, lam, eps2, veldt=None):
        mu = self.params.friction
        if mu == 0.0:
            return jnp.zeros_like(x_sv)
        B = jnp.asarray(self._basis, x_sv.dtype)
        eps = jnp.sqrt(eps2)
        dxr = x_sv - xt_sv
        if veldt is not None:
            dxr = dxr - jnp.asarray(veldt, x_sv.dtype)[None, :]
        u = dxr @ B
        u2 = jnp.sum(u * u, axis=1)
        slip = u2 > eps2
        scale = jnp.where(
            slip,
            1.0 / jnp.sqrt(jnp.maximum(u2, eps2)),
            f1_sf_over_x(u2, eps),
        )
        force_t = (mu * lam * scale)[:, None] * u  # (Sv,2)
        return force_t @ B.T

    def friction_hess_blocks_sv(self, x_sv, xt_sv, lam, eps2, project=True,
                                veldt=None):
        """(Sv,3,3) analytic friction Hessian blocks.

        In the tangent plane: H_t = a I + c u u^T with
          stick (|u| <= eps): a = f1/|u| = (2 eps - |u|)/eps^2,
                              c = (f2 - a)/|u|^2  -> 0 as u -> 0
          slip  (|u| >  eps): a = 1/|u|, c = -a/|u|^2 (Hessian of |u|)
        Both branches are PSD by construction (eigenvalues {a + c u2, a}
        >= 0), mirroring the PSD-safe blocks the reference assembles in
        HalfSpace::augmentFrictionHessian (HalfSpace.cpp:331-415). Lifted to
        3x3 via the fixed plane basis: H = B H_t B^T.
        """
        mu = self.params.friction
        if mu == 0.0:
            return jnp.zeros((x_sv.shape[0], 3, 3), x_sv.dtype)
        B = jnp.asarray(self._basis, x_sv.dtype)
        eps = jnp.sqrt(eps2)
        dxr = x_sv - xt_sv
        if veldt is not None:
            dxr = dxr - jnp.asarray(veldt, x_sv.dtype)[None, :]
        u = dxr @ B  # (Sv,2)
        u2 = jnp.sum(u * u, axis=1)
        un = jnp.sqrt(jnp.maximum(u2, 0.0))
        slip = u2 > eps2
        tiny = jnp.asarray(1e-300 if x_sv.dtype == jnp.float64 else 1e-30, x_sv.dtype)
        inv_un = 1.0 / jnp.maximum(un, tiny)
        a = jnp.where(slip, inv_un, (2.0 * eps - un) / eps2)
        f2 = jnp.where(slip, 0.0, 2.0 * (eps - un) / eps2)
        c = jnp.where(u2 > tiny, (f2 - a) / jnp.maximum(u2, tiny), 0.0)
        coef = mu * lam
        I2 = jnp.eye(2, dtype=x_sv.dtype)
        Ht = (coef * a)[:, None, None] * I2[None] + (coef * c)[:, None, None] * (
            u[:, :, None] * u[:, None, :]
        )
        return jnp.einsum("ij,vjk,lk->vil", B, Ht, B, precision=jax.lax.Precision.HIGHEST)
