"""Stretch-invariant elasticity: Neo-Hookean and Fixed-Corotational.

TPU-first re-design of the reference's Energy framework (reference:
src/Energy/Energy.hpp:26-138, computeGradientByPK src/Energy/Energy.cpp:
245-289, computeHessianByPK :292-331, compute_dP_div_dF :448-563;
NeoHookeanEnergy.cpp:55-153; FixedCoRotEnergy.cpp:62-160): per-tet
deformation gradients, flip-corrected SVDs, sigma-space energy derivatives,
and the analytic dP/dF eigensystem with per-block SPD projection — all as
batched array programs instead of TBB loops + CSR scatter.

Key algebra (identical to the reference's construction):
  F = D(x) @ rest_inv,  F = U diag(sigma) V^T   (flip-corrected SVD)
  P = U diag(dE/dsigma) V^T                      (PK1 stress)
  dP/dF = K M K^T with K = kron(U, V) and M the 9x9 block matrix holding
     A  = d2E/dsigma2 (SPD-projected 3x3) at the diagonal slots (0,4,8)
     B_ij = [[l+r, l-r], [l-r, l+r]] 2x2 twist/flip blocks (SPD-projected)
       for (i,j) in {(0,1),(1,2),(2,0)}, with l = BLeftCoef_ij and
       r = (dE/dsigma_i + dE/dsigma_j) / (2 max(sigma_i+sigma_j, 1e-6))
  grad_x  = vol * W @ P^T           (W = 4x3 chain-rule weights from rest_inv)
  hess_x  = vol * einsum(W, W, reshape(dP/dF))   (12x12 per tet)

The per-tet 12x12 Hessian blocks are the currency of the whole solver: the
matrix-free PCG consumes them directly (no global sparse matrix exists).
"""

import jax
import jax.numpy as jnp

from ipc_tpu.ops.spd import make_psd2
from ipc_tpu.ops.svd3 import eigh3_jacobi, svd3_jacobi
from ipc_tpu.ops.step_bound import injective_step_bound

_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "deformation_gradient",
    "elem_weights",
    "elasticity_energy",
    "elasticity_gradient",
    "elasticity_hessian_blocks",
    "filter_step_size",
    "MODELS",
]


def deformation_gradient(x4, rest_inv):
    """F (3,3) of one tet: x4 is (4,3) vertex positions."""
    D = jnp.stack([x4[1] - x4[0], x4[2] - x4[0], x4[3] - x4[0]], axis=1)
    return jnp.matmul(D, rest_inv, precision=_HI)


def elem_weights(rest_inv):
    """Chain-rule weight matrix W (4,3): grad_x = vol * W @ P^T.

    Row m holds dF[c, j]/dx_m[c] = W[m, j] (the same linear map the
    reference applies via IglUtils::dF_div_dx_mult, IglUtils.hpp:338-436).
    """
    return jnp.concatenate([-rest_inv.sum(axis=0, keepdims=True), rest_inv], axis=0)


# ---------------------------------------------------------------------------
# sigma-space model functions (single element; sigma is the (3,) flip-SVD
# spectrum). Each model provides E, dE/dsigma, d2E/dsigma2, BLeftCoef.
# ---------------------------------------------------------------------------


def _nh_E(s, mu, lam):
    """Neo-Hookean Psi = mu/2(|s|^2-3) - (mu - lam/2 log J) log J
    (reference NeoHookeanEnergy.cpp:55-69)."""
    J = s[0] * s[1] * s[2]
    logJ = jnp.log(J)
    return 0.5 * mu * (jnp.dot(s, s) - 3.0) - (mu - 0.5 * lam * logJ) * logJ


def _nh_dE(s, mu, lam):
    logJ = jnp.log(s[0] * s[1] * s[2])
    return mu * (s - 1.0 / s) + lam * logJ / s


def _nh_d2E(s, mu, lam):
    logJ = jnp.log(s[0] * s[1] * s[2])
    inv2 = 1.0 / (s * s)
    diag = mu * (1.0 + inv2) - lam * inv2 * (logJ - 1.0)
    off01 = lam / (s[0] * s[1])
    off12 = lam / (s[1] * s[2])
    off20 = lam / (s[2] * s[0])
    return jnp.array(
        [
            [diag[0], off01, off20],
            [off01, diag[1], off12],
            [off20, off12, diag[2]],
        ],
        s.dtype,
    )


def _nh_bleft(s, mu, lam):
    """Left coefficients of the 2x2 twist/flip blocks for pairs
    (0,1),(1,2),(2,0) (reference NeoHookeanEnergy.cpp:116-136)."""
    mid = mu - lam * jnp.log(s[0] * s[1] * s[2])
    return 0.5 * jnp.array(
        [
            mu + mid / (s[0] * s[1]),
            mu + mid / (s[1] * s[2]),
            mu + mid / (s[2] * s[0]),
        ],
        s.dtype,
    )


def _fcr_E(s, mu, lam):
    """Fixed-corotational Psi = mu|s-1|^2 + lam/2 (J-1)^2
    (reference FixedCoRotEnergy.cpp:62-69)."""
    Jm1 = s[0] * s[1] * s[2] - 1.0
    return mu * jnp.dot(s - 1.0, s - 1.0) + 0.5 * lam * Jm1 * Jm1


def _fcr_dE(s, mu, lam):
    Jm1lam = lam * (s[0] * s[1] * s[2] - 1.0)
    prod_no = jnp.array([s[1] * s[2], s[2] * s[0], s[0] * s[1]], s.dtype)
    return 2.0 * mu * (s - 1.0) + prod_no * Jm1lam


def _fcr_d2E(s, mu, lam):
    J = s[0] * s[1] * s[2]
    prod_no = jnp.array([s[1] * s[2], s[2] * s[0], s[0] * s[1]], s.dtype)
    diag = 2.0 * mu + lam * prod_no * prod_no
    off = lambda i, j, k: lam * (s[k] * (J - 1.0) + prod_no[i] * prod_no[j])
    return jnp.array(
        [
            [diag[0], off(0, 1, 2), off(0, 2, 1)],
            [off(0, 1, 2), diag[1], off(1, 2, 0)],
            [off(0, 2, 1), off(1, 2, 0), diag[2]],
        ],
        s.dtype,
    )


def _fcr_bleft(s, mu, lam):
    Jm1 = s[0] * s[1] * s[2] - 1.0
    return jnp.array(
        [
            mu - 0.5 * lam * s[2] * Jm1,
            mu - 0.5 * lam * s[0] * Jm1,
            mu - 0.5 * lam * s[1] * Jm1,
        ],
        s.dtype,
    )


def _cof(F):
    """Cofactor matrix (J * F^-T) via cross products of columns."""
    c0 = jnp.cross(F[:, 1], F[:, 2])
    c1 = jnp.cross(F[:, 2], F[:, 0])
    c2 = jnp.cross(F[:, 0], F[:, 1])
    return jnp.stack([c0, c1, c2], axis=1)


def _nh_E_F(F, mu, lam):
    """NH energy straight from the invariants |F|_F^2 = |sigma|^2 and
    J = det F — no SVD. Exactly _nh_E(sigma) for J > 0, which the NH
    inversion guard maintains (reference NeoHookeanEnergy.cpp:138-153
    uses the same F-space closed forms)."""
    J = jnp.linalg.det(F)
    logJ = jnp.log(jnp.maximum(J, 1e-30))
    return 0.5 * mu * (jnp.sum(F * F) - 3.0) - (mu - 0.5 * lam * logJ) * logJ


def _nh_P_F(F, mu, lam):
    """NH PK1 stress P = mu F + (lam logJ - mu) F^-T, F^-T = cof(F)/J."""
    cof = _cof(F)
    J = jnp.sum(F[:, 0] * cof[:, 0])
    logJ = jnp.log(jnp.maximum(J, 1e-30))
    FinvT = cof / jnp.where(J != 0.0, J, 1.0)
    return mu * F + (lam * logJ - mu) * FinvT


MODELS = {
    "NH": dict(E=_nh_E, dE=_nh_dE, d2E=_nh_d2E, bleft=_nh_bleft, inv_guard=True,
               E_F=_nh_E_F, P_F=_nh_P_F),
    "FCR": dict(E=_fcr_E, dE=_fcr_dE, d2E=_fcr_d2E, bleft=_fcr_bleft, inv_guard=False),
}


# ---------------------------------------------------------------------------
# per-element energy / gradient / Hessian
# ---------------------------------------------------------------------------


def _elem_svd(x4, rest_inv, vol):
    """Flip-SVD of the element deformation gradient. Zero-volume padding
    elements (sharding pads, see parallel/sharding.py) get sigma = 1 so the
    log terms of NH stay finite; their vol weight already zeroes every
    contribution, but 0 * log(0) would otherwise produce NaN."""
    F = deformation_gradient(x4, rest_inv)
    U, s, V = svd3_jacobi(F)
    s = jnp.where(vol > 0, s, 1.0)
    return U, s, V


def _spd3(A):
    """3x3 SPD projection via the branch-free Jacobi eigensolver (unsorted:
    clamping is order-invariant, and skipping the sort avoids a slow
    batched dynamic gather when vmapped over tets)."""
    w, Q = eigh3_jacobi(0.5 * (A + A.T), sort=False)
    w = jnp.maximum(w, 0.0)
    return jnp.matmul(Q * w[None, :], Q.T, precision=_HI)


def _dPdF(U, s, V, mu, lam, model, project):
    """9x9 dP/dF in the (i*3+j) row-major vec convention
    (reference Energy::compute_dP_div_dF, Energy.cpp:448-563)."""
    m = MODELS[model]
    dE = m["dE"](s, mu, lam)
    A = m["d2E"](s, mu, lam)
    if project:
        A = _spd3(A)
    bl = m["bleft"](s, mu, lam)

    eps = jnp.asarray(1e-6, s.dtype)
    pairs = [(0, 1), (1, 2), (2, 0)]
    Bs = []
    for cI, (i, j) in enumerate(pairs):
        denom = jnp.maximum(s[i] + s[j], eps)
        r = (dE[i] + dE[j]) / (2.0 * denom)
        l = bl[cI]
        B = jnp.array([[l + r, l - r], [l - r, l + r]], s.dtype)
        if project:
            B = make_psd2(B)
        Bs.append(B)

    # M assembled as one stacked construction (a .at[i,j].set chain vmaps
    # into 16 dynamic-update-slices over the whole tet batch — measured as
    # one of the top per-step costs on the v5e): A at diagonal slots
    # (0,4,8); B01 at vec indices (1,3), B12 at (5,7), B20 at (2,6) with
    # the reference's reversed layout for the (2,0) pair
    z = jnp.zeros((), s.dtype)
    B0, B1, B2 = Bs
    M = jnp.stack([
        jnp.stack([A[0, 0], z, z, z, A[0, 1], z, z, z, A[0, 2]]),
        jnp.stack([z, B0[0, 0], z, B0[0, 1], z, z, z, z, z]),
        jnp.stack([z, z, B2[1, 1], z, z, z, B2[1, 0], z, z]),
        jnp.stack([z, B0[1, 0], z, B0[1, 1], z, z, z, z, z]),
        jnp.stack([A[1, 0], z, z, z, A[1, 1], z, z, z, A[1, 2]]),
        jnp.stack([z, z, z, z, z, B1[0, 0], z, B1[0, 1], z]),
        jnp.stack([z, z, B2[0, 1], z, z, z, B2[0, 0], z, z]),
        jnp.stack([z, z, z, z, z, B1[1, 0], z, B1[1, 1], z]),
        jnp.stack([A[2, 0], z, z, z, A[2, 1], z, z, z, A[2, 2]]),
    ])

    K = jnp.kron(U, V)  # K[(i*3+j),(k*3+l)] = U[i,k] V[j,l]
    return jnp.matmul(jnp.matmul(K, M, precision=_HI), K.T, precision=_HI)


def _elem_hess(x4, rest_inv, vol, mu, lam, model, project):
    U, s, V = _elem_svd(x4, rest_inv, vol)
    dPdF = _dPdF(U, s, V, mu, lam, model, project)
    W = elem_weights(rest_inv)
    T4 = dPdF.reshape(3, 3, 3, 3)  # [i, j, r, s] spatial x Fcol x spatial x Fcol
    H = jnp.einsum("mj,ns,ijrs->minr", W, W, T4, precision=_HI)
    return vol * H.reshape(12, 12)


def _elem_grad(x4, rest_inv, vol, mu, lam, model):
    m = MODELS[model]
    W = elem_weights(rest_inv)
    if "P_F" in m:  # invariant closed form: no SVD (NH)
        F = deformation_gradient(x4, rest_inv)
        F = jnp.where(vol > 0, F, jnp.eye(3, dtype=F.dtype))
        P = m["P_F"](F, mu, lam)
    else:
        U, s, V = _elem_svd(x4, rest_inv, vol)
        dE = m["dE"](s, mu, lam)
        P = jnp.matmul(U * dE[None, :], V.T, precision=_HI)
    return vol * jnp.matmul(W, P.T, precision=_HI)


def _elem_energy(x4, rest_inv, vol, mu, lam, model):
    m = MODELS[model]
    if "E_F" in m:  # invariant closed form: no SVD (NH)
        F = deformation_gradient(x4, rest_inv)
        F = jnp.where(vol > 0, F, jnp.eye(3, dtype=F.dtype))
        return vol * m["E_F"](F, mu, lam)
    _, s, _ = _elem_svd(x4, rest_inv, vol)
    return vol * m["E"](s, mu, lam)


# ---------------------------------------------------------------------------
# batched entry points over the whole mesh
# ---------------------------------------------------------------------------


def _gather(x, tets):
    # Under an active device mesh, pin the gathered per-tet corner tensor
    # to a leading-axis (tet) sharding: the tet index array is baked into
    # the executable as a replicated constant, so without the constraint
    # XLA's partitioner REPLICATES the whole downstream per-tet pipeline —
    # the (T,12,12)/(T,36,4)/(T,9,9) Hessian intermediates dominated the
    # per-partition temp footprint at 96K tets (202 MB/device at n=8,
    # MULTICHIP_SCALE_r4). With the constraint every per-tet intermediate
    # lives T/n per device and the vertex scatter-adds become partial-sum
    # + psum, the scaling-book SpMV recipe.
    from ipc_tpu.parallel.spmd import constrain

    return constrain(x[tets])  # (T,4,3)


def elasticity_energy(x, mesh, model="NH"):
    """Total elasticity energy Psi summed over tets (no h^2 scaling)."""
    e = jax.vmap(_elem_energy, in_axes=(0, 0, 0, 0, 0, None))(
        _gather(x, mesh.tets), mesh.rest_inv, mesh.vol, mesh.mu, mesh.lam, model
    )
    return e.sum()


def elasticity_energy_per_elem(x, mesh, model="NH"):
    return jax.vmap(_elem_energy, in_axes=(0, 0, 0, 0, 0, None))(
        _gather(x, mesh.tets), mesh.rest_inv, mesh.vol, mesh.mu, mesh.lam, model
    )


def elasticity_gradient(x, mesh, model="NH", vert_sum=None):
    """(V,3) gradient of the total elasticity energy.

    vert_sum: optional precomputed static gather-sum over tets.reshape(-1)
    (ops.scatter.make_gather_sum) — much faster than the scatter-add
    fallback on TPU."""
    g = jax.vmap(_elem_grad, in_axes=(0, 0, 0, 0, 0, None))(
        _gather(x, mesh.tets), mesh.rest_inv, mesh.vol, mesh.mu, mesh.lam, model
    )
    if vert_sum is not None:
        return vert_sum(g.reshape(-1, 3))
    out = jnp.zeros_like(x)
    return out.at[mesh.tets.reshape(-1)].add(g.reshape(-1, 3))


def elasticity_hessian_blocks(x, mesh, model="NH", project=True):
    """(T,12,12) SPD-projected per-tet Hessian blocks (no h^2 scaling).

    These blocks are consumed by the matrix-free PCG Hv product and the
    block-Jacobi preconditioner; nothing is ever scattered into a global
    sparse matrix (the reference scatters into block-CSR instead,
    Energy.cpp:292-331 + LinSysSolver.hpp:331-449).
    """
    return jax.vmap(_elem_hess, in_axes=(0, 0, 0, 0, 0, None, None))(
        _gather(x, mesh.tets), mesh.rest_inv, mesh.vol, mesh.mu, mesh.lam, model, project
    )


def filter_step_size(x, p, mesh, model="NH", slackness=0.2):
    """Largest inversion-safe step along p (reference Energy::filterStepSize,
    Energy.cpp:565-582; only models with an inversion guard filter)."""
    if not MODELS[model]["inv_guard"]:
        return jnp.asarray(jnp.inf, x.dtype)
    x4 = _gather(x, mesh.tets)
    p4 = _gather(p, mesh.tets)
    A = jnp.stack([x4[:, 1] - x4[:, 0], x4[:, 2] - x4[:, 0], x4[:, 3] - x4[:, 0]], axis=2)
    Bm = jnp.stack([p4[:, 1] - p4[:, 0], p4[:, 2] - p4[:, 0], p4[:, 3] - p4[:, 0]], axis=2)
    t = jax.vmap(lambda a, b: injective_step_bound(a, b, slackness))(A, Bm)
    return t.min()
