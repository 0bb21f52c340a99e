"""Self-contact narrow phase + barrier energy over padded candidate tensors.

TPU-native re-design of the reference's SelfCollisionHandler<3>
(reference: src/CollisionObject/SelfCollisionHandler.cpp — constraint set
:2149-2478, barrier assembly augmentIPHessian :418-563, mollified paraEE
terms :2990-3203, lagged friction :2480-2989).

Design differences from the reference, chosen for fixed shapes (documented
because they are *provably equivalent*, not approximations):

1. No dedup / duplication counting. The reference dedupes reduced PP/PE
   constraints across candidates and stores a duplication multiplier
   (SelfCollisionHandler.cpp:2414-2476); the barrier energy is
   dup * b(d). Here every (vert,tri) / (edge,edge) candidate contributes
   its reduced barrier independently — the sum over duplicates equals the
   counted form for energy, gradient, Hessian AND the lagged friction
   (whose lambda the reference also scales by dup, Optimizer.cpp:1586).

2. Classification inside evaluation. The reference recomputes the
   constraint set at every line-search trial (Optimizer.cpp:2766-2805);
   here the *candidate* set is fixed per Newton iteration (built from
   swept+inflated AABBs so it covers every pair that can activate along
   the step) and each energy/gradient/Hessian evaluation re-classifies
   dType and re-reduces internally. Same math, no dynamic shapes.

3. Mollifier without bookkeeping. A nearly-parallel EE candidate keeps its
   original 4 vertices, so e(x) * b(d) differentiates through both factors
   directly — no paraEEeIeJSet index plumbing (cf. reference
   computeConstraintSet's add_e encoding, SelfCollisionHandler.cpp:2310-2320).

Every candidate pair carries its ORIGINAL 4-vertex stencil:
  PT candidate: (p, t0, t1, t2);  EE candidate: (a0, a1, b0, b1).
Reduction to the closest-point stencil is a static (9,4) slot table applied
to the dType code.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ipc_tpu.ops import distance as D
from ipc_tpu.ops.barrier import barrier, barrier_grad
from ipc_tpu.ops.spd import make_psd

_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "PT_SLOTS",
    "EE_SLOTS",
    "pt_reduce",
    "ee_reduce",
    "pt_pair_energy",
    "ee_pair_energy",
    "barrier_energy",
    "barrier_gradient",
    "barrier_hessian_blocks",
    "capture_friction",
    "friction_energy",
    "friction_gradient",
    "friction_hessian_blocks",
]

# slot tables: local indices into the original stencil for each dType code;
# col 3 unused entries repeat slot 0 (harmless: the reduced ctype ignores them)
# PT dtypes 0..6 (reference dType_PT codes)
# NOTE: these tables are deliberately NUMPY constants. Module-level
# jnp arrays shared across independent jit traces get wrapped in
# per-trace tracers by the constant machinery; a while_loop body that
# closes over one can leak that tracer across traces
# (UnexpectedTracerError int32[7], seen when two steppers trace in one
# process). np constants are freshly staged per trace.
PT_SLOTS = np.array(
    [
        [0, 1, 0, 0],  # 0: PP(p, t0)
        [0, 2, 0, 0],  # 1: PP(p, t1)
        [0, 3, 0, 0],  # 2: PP(p, t2)
        [0, 1, 2, 0],  # 3: PE(p, t0, t1)
        [0, 2, 3, 0],  # 4: PE(p, t1, t2)
        [0, 3, 1, 0],  # 5: PE(p, t2, t0)
        [0, 1, 2, 3],  # 6: PT
    ],
    np.int32,
)
PT_CTYPE = np.array([0, 0, 0, 1, 1, 1, 2], np.int32)

# EE dtypes 0..8 (reference dType_EE codes); stencil (a0,a1,b0,b1)
EE_SLOTS = np.array(
    [
        [0, 2, 0, 0],  # 0: PP(a0, b0)
        [0, 3, 0, 0],  # 1: PP(a0, b1)
        [0, 2, 3, 0],  # 2: PE(a0, b0, b1)
        [1, 2, 0, 0],  # 3: PP(a1, b0)
        [1, 3, 0, 0],  # 4: PP(a1, b1)
        [1, 2, 3, 0],  # 5: PE(a1, b0, b1)
        [2, 0, 1, 0],  # 6: PE(b0, a0, a1)
        [3, 0, 1, 0],  # 7: PE(b1, a0, a1)
        [0, 1, 2, 3],  # 8: EE
    ],
    np.int32,
)
EE_CTYPE = np.array([0, 0, 1, 0, 0, 1, 1, 1, 3], np.int32)


def _center(x4):
    """Shift a stencil into its local frame. Distances are translation
    invariant, so this changes nothing in f64 — but in f32 it removes the
    catastrophic cancellation of O(1) world coordinates against O(dHat)
    gaps (the main f32 accuracy risk called out in SURVEY.md §7.3). The
    centroid is detached so gradients are untouched."""
    c = jax.lax.stop_gradient(x4.mean(axis=0))
    return x4 - c[None, :]


def pt_reduce(x4):
    """dType-classify a PT stencil -> (ctype, reduced stencil (4,3))."""
    x4 = _center(x4)
    dt = D.dtype_PT(x4[0], x4[1], x4[2], x4[3])
    return jnp.asarray(PT_CTYPE)[dt], x4[jnp.asarray(PT_SLOTS)[dt]]


def ee_reduce(x4):
    x4 = _center(x4)
    dt = D.dtype_EE(x4[0], x4[1], x4[2], x4[3])
    return jnp.asarray(EE_CTYPE)[dt], x4[jnp.asarray(EE_SLOTS)[dt]]


# ---------------------------------------------------------------------------
# per-candidate barrier energies (smooth a.e.; zero when d >= dHat)
# ---------------------------------------------------------------------------


def pt_pair_energy(x4, dHat):
    ct, xs = pt_reduce(x4)
    return barrier(D.stencil_dist2(ct, xs), dHat)


def ee_pair_energy(x4, eps_x, dHat):
    """EE candidate with mollifier: e(x) * b(d) when nearly parallel
    (reference computeConstraintSet + augmentParaEE*)."""
    ct, xs = ee_reduce(x4)
    b = barrier(D.stencil_dist2(ct, xs), dHat)
    c = D.ee_cross_sq_norm(x4[0], x4[1], x4[2], x4[3])
    r = c / eps_x
    e = jnp.where(c < eps_x, (2.0 - r) * r, 1.0)
    return e * b


def _gather4(x, vids):
    return x[vids]  # (C,4,3); vids are always valid indices (pad rows use 0)


def barrier_energy(x, pt_vids, pt_valid, ee_vids, ee_valid, ee_eps_x, kappa, dHat):
    """kappa * sum of all candidate barriers. vids: (C,4) original stencils."""
    e_pt = jax.vmap(pt_pair_energy, in_axes=(0, None))(_gather4(x, pt_vids), dHat)
    e_ee = jax.vmap(ee_pair_energy, in_axes=(0, 0, None))(
        _gather4(x, ee_vids), ee_eps_x, dHat
    )
    return kappa * (
        jnp.where(pt_valid, e_pt, 0.0).sum() + jnp.where(ee_valid, e_ee, 0.0).sum()
    )


def barrier_gradient(x, pt_vids, pt_valid, ee_vids, ee_valid, ee_eps_x, kappa, dHat):
    """(V,3) gradient via per-candidate autodiff + scatter-add."""
    g_pt = jax.vmap(jax.grad(pt_pair_energy), in_axes=(0, None))(
        _gather4(x, pt_vids), dHat
    )
    g_ee = jax.vmap(jax.grad(ee_pair_energy), in_axes=(0, 0, None))(
        _gather4(x, ee_vids), ee_eps_x, dHat
    )
    g_pt = jnp.where(pt_valid[:, None, None], g_pt, 0.0)
    g_ee = jnp.where(ee_valid[:, None, None], g_ee, 0.0)
    out = jnp.zeros_like(x)
    out = out.at[pt_vids.reshape(-1)].add(kappa * g_pt.reshape(-1, 3))
    out = out.at[ee_vids.reshape(-1)].add(kappa * g_ee.reshape(-1, 3))
    return out


def unified_pair_energy(x4, eps_x, is_ee, dHat):
    """Barrier energy of one stencil evaluated as BOTH a PT and an EE
    candidate, selected by `is_ee` — used on compacted active subsets where
    the pair type is data, not structure. Costs 2x per pair on a ~10x
    smaller set (see active compaction in pipeline.hessian_blocks)."""
    e_pt = pt_pair_energy(x4, dHat)
    e_ee = ee_pair_energy(x4, eps_x, dHat)
    return jnp.where(is_ee, e_ee, e_pt)


def active_dist2(x, pt_vids, ee_vids):
    """Squared reduced distances of all candidates ((Cpt,), (Cee,))."""
    d_pt = jax.vmap(lambda x4: D.stencil_dist2(*pt_reduce(x4)))(x[pt_vids])
    d_ee = jax.vmap(lambda x4: D.stencil_dist2(*ee_reduce(x4)))(x[ee_vids])
    return d_pt, d_ee


def _pair_hess(fn):
    def h(x4, *args):
        f = lambda xf: fn(xf.reshape(4, 3), *args)
        return jax.hessian(f)(x4.reshape(12))

    return h


def barrier_hessian_blocks(
    x, pt_vids, pt_valid, ee_vids, ee_valid, ee_eps_x, kappa, dHat, project=True
):
    """((Cpt,12,12), (Cee,12,12)) SPD-projected per-candidate blocks
    (the reference SPD-projects each 12x12 contact block the same way,
    SelfCollisionHandler.cpp:418-563)."""
    H_pt = jax.vmap(_pair_hess(pt_pair_energy), in_axes=(0, None))(
        _gather4(x, pt_vids), dHat
    )
    H_ee = jax.vmap(_pair_hess(ee_pair_energy), in_axes=(0, 0, None))(
        _gather4(x, ee_vids), ee_eps_x, dHat
    )
    if project:
        H_pt = jax.vmap(make_psd)(H_pt)
        H_ee = jax.vmap(make_psd)(H_ee)
    H_pt = jnp.where(pt_valid[:, None, None], kappa * H_pt, 0.0)
    H_ee = jnp.where(ee_valid[:, None, None], kappa * H_ee, 0.0)
    return H_pt, H_ee


# ---------------------------------------------------------------------------
# lagged friction (reference SelfCollisionHandler.cpp:2480-2989)
# ---------------------------------------------------------------------------


def capture_friction(x, pt_vids, pt_valid, ee_vids, ee_valid, ee_eps_x, kappa, dHat,
                     vert_mu=None, self_mu=1.0):
    """Capture lagged friction state at the outer iterate x.

    Returns a dict of fixed-shape arrays over ALL candidates (PT then EE):
      vids (C,4) reduced-stencil global vertex ids (pad 0)
      ctype (C,), lam (C,) >= 0 (zero for inactive/mollified pairs) with the
      PER-PAIR friction coefficient folded in,
      coords (C,2) closest-point coordinates, basis (C,3,2) tangent bases.
    Mollified (nearly-parallel) EE pairs get lam = 0: the reference excludes
    the paraEE set from friction (fullyImplicit_IP captures lambdas from
    MMActiveSet only, Optimizer.cpp:1580-1605).

    Per-pair mu: a pair touching a kinematic CO vertex uses that CO's
    friction coefficient (reference MeshCO carries its own `friction`),
    otherwise self_mu (reference selfFric). vert_mu is a (V,) array of CO
    coefficients, 0 on deformable vertices.
    """
    from ipc_tpu.ops import friction as FR

    def one_pt(x4, vids4):
        dt = D.dtype_PT(x4[0], x4[1], x4[2], x4[3])
        ct = jnp.asarray(PT_CTYPE)[dt]
        slots = jnp.asarray(PT_SLOTS)[dt]
        xs = x4[slots]
        d2 = D.stencil_dist2(ct, xs)
        lam = -kappa * 2.0 * jnp.sqrt(jnp.maximum(d2, 0.0)) * barrier_grad(d2, dHat)
        return vids4[slots], ct, lam, FR.closest_point_coords(ct, xs), FR.tangent_basis(ct, xs)

    def one_ee(x4, vids4, eps_x):
        dt = D.dtype_EE(x4[0], x4[1], x4[2], x4[3])
        ct = jnp.asarray(EE_CTYPE)[dt]
        slots = jnp.asarray(EE_SLOTS)[dt]
        xs = x4[slots]
        d2 = D.stencil_dist2(ct, xs)
        c = D.ee_cross_sq_norm(x4[0], x4[1], x4[2], x4[3])
        lam = -kappa * 2.0 * jnp.sqrt(jnp.maximum(d2, 0.0)) * barrier_grad(d2, dHat)
        lam = jnp.where(c < eps_x, 0.0, lam)  # mollified pairs: no friction
        return vids4[slots], ct, lam, FR.closest_point_coords(ct, xs), FR.tangent_basis(ct, xs)

    pv, pc, pl, pco, pb = jax.vmap(one_pt)(_gather4(x, pt_vids), pt_vids)
    ev, ec, el, eco, eb = jax.vmap(one_ee)(_gather4(x, ee_vids), ee_vids, ee_eps_x)
    vids = jnp.concatenate([pv, ev])
    lam = jnp.concatenate(
        [jnp.where(pt_valid, pl, 0.0), jnp.where(ee_valid, el, 0.0)]
    )
    if vert_mu is not None:
        co_mu = vert_mu[vids].max(axis=1)
        mu_pair = jnp.where(co_mu > 0.0, co_mu, self_mu)
    else:
        mu_pair = self_mu
    return dict(
        vids=vids,
        ctype=jnp.concatenate([pc, ec]),
        lam=lam * mu_pair,
        coords=jnp.concatenate([pco, eco]),
        basis=jnp.concatenate([pb, eb]),
    )


def _fric_u(fr, x, x_anchor):
    """(C,2) tangential relative displacement per captured pair."""
    from ipc_tpu.ops.friction import rel_dx_weights

    dx = x[fr["vids"]] - x_anchor[fr["vids"]]  # (C,4,3)
    w = jax.vmap(rel_dx_weights)(fr["ctype"], fr["coords"])  # (C,4)
    rel = jnp.einsum("ci,cij->cj", w, dx, precision=_HI)  # (C,3)
    u = jnp.einsum("cj,cjk->ck", rel, fr["basis"], precision=_HI)  # (C,2)
    return u, w


def friction_energy(fr, x, x_anchor, eps2, mu):
    """mu * sum lam_k f0(|u_k|) (reference computeFrictionEnergy,
    SelfCollisionHandler.cpp:2530-2599)."""
    from ipc_tpu.ops.friction import f0_sf

    u, _ = _fric_u(fr, x, x_anchor)
    u2 = jnp.sum(u * u, axis=1)
    eps = jnp.sqrt(eps2)
    f0 = jnp.where(u2 > eps2, jnp.sqrt(jnp.maximum(u2, eps2)), f0_sf(u2, eps))
    return mu * jnp.sum(fr["lam"] * f0)


def friction_gradient(fr, x, x_anchor, eps2, mu, n_verts):
    from ipc_tpu.ops.friction import f1_sf_over_x

    u, w = _fric_u(fr, x, x_anchor)
    u2 = jnp.sum(u * u, axis=1)
    eps = jnp.sqrt(eps2)
    tiny = jnp.asarray(1e-300 if x.dtype == jnp.float64 else 1e-30, x.dtype)
    scale = jnp.where(
        u2 > eps2,
        1.0 / jnp.sqrt(jnp.maximum(u2, tiny)),
        f1_sf_over_x(u2, eps),
    )
    ft = (mu * fr["lam"] * scale)[:, None] * u  # (C,2) tangential force
    f3 = jnp.einsum("cjk,ck->cj", fr["basis"], ft, precision=_HI)  # (C,3)
    g4 = w[:, :, None] * f3[:, None, :]  # (C,4,3)
    out = jnp.zeros((n_verts, 3), x.dtype)
    return out.at[fr["vids"].reshape(-1)].add(g4.reshape(-1, 3))


def friction_hessian_blocks(fr, x, x_anchor, eps2, mu):
    """(C,12,12) PSD friction blocks: kron(w w^T, B H_t B^T) with the same
    branch-guarded tangent Hessian as the half-space CO."""
    u, w = _fric_u(fr, x, x_anchor)
    u2 = jnp.sum(u * u, axis=1)
    eps = jnp.sqrt(eps2)
    un = jnp.sqrt(jnp.maximum(u2, 0.0))
    slip = u2 > eps2
    tiny = jnp.asarray(1e-300 if x.dtype == jnp.float64 else 1e-30, x.dtype)
    inv_un = 1.0 / jnp.maximum(un, tiny)
    a = jnp.where(slip, inv_un, (2.0 * eps - un) / (eps * eps))
    f2 = jnp.where(slip, 0.0, 2.0 * (eps - un) / (eps * eps))
    c = jnp.where(u2 > tiny, (f2 - a) / jnp.maximum(u2, tiny), 0.0)
    coef = mu * fr["lam"]
    I2 = jnp.eye(2, dtype=x.dtype)
    Ht = (coef * a)[:, None, None] * I2[None] + (coef * c)[:, None, None] * (
        u[:, :, None] * u[:, None, :]
    )
    H3 = jnp.einsum("cjk,ckl,cml->cjm", fr["basis"], Ht, fr["basis"], precision=_HI)
    ww = w[:, :, None] * w[:, None, :]  # (C,4,4)
    H = jnp.einsum("cmn,cjk->cmjnk", ww, H3, precision=_HI).reshape(-1, 12, 12)
    return H
