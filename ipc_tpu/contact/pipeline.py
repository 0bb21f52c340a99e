"""Self-contact pipeline: broad phase -> candidates -> barrier/friction/CCD.

The integration layer binding contact.broadphase / contact.selfcollision /
contact.ccd / contact.intersection into the shape the time stepper consumes
— the TPU-native analog of the reference's per-step orchestration of
SpatialHash + SelfCollisionHandler (reference: Optimizer::computeConstraintSets
:2447-2498, solveSub_IP CCD block :1885-2040, lineSearch safeguards
:2709-2811).

Capacity management: candidate tensors have static capacities; every build
returns the true count, and `ensure_caps` grows capacities (x1.5 + headroom)
and lets jit re-trace — the fixed-shape analog of dynamic candidate lists.
"""

from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ipc_tpu.contact import broadphase as BP
from ipc_tpu.contact import selfcollision as SC
from ipc_tpu.contact import spatial_hash as SH
from ipc_tpu.contact.ccd import accd_ee, accd_pt, ti_ee, ti_pt
from ipc_tpu.contact.intersection import any_edge_tri_intersection
from ipc_tpu.ops.distance import eps_x_ee

__all__ = ["Candidates", "SelfContact"]


@dataclass(frozen=True)
class Candidates:
    """Fixed-shape candidate tensors for one Newton iteration (pytree).

    Also carries the swept edge-triangle pairs for the line-search
    intersection failsafe, so ONE fused broad phase per Newton iteration
    serves the barrier, the CCD, and the intersection predicate."""

    pt_vids: Any  # (Cpt,4) int32 stencils (p,t0,t1,t2), pads -> 0
    pt_valid: Any  # (Cpt,) bool
    ee_vids: Any  # (Cee,4) int32 stencils (a0,a1,b0,b1)
    ee_valid: Any  # (Cee,) bool
    ee_eps_x: Any  # (Cee,) mollifier thresholds (rest-shape)
    et_pairs: Any  # (Cet,2) int32 (surf edge idx, surf tri idx), pads -1
    et_valid: Any  # (Cet,) bool
    pt_count: Any  # true counts (int32) for overflow detection
    ee_count: Any
    et_count: Any
    bucket_overflow: Any  # max grid-bucket occupancy (grid broadphase only)


jax.tree_util.register_dataclass(
    Candidates,
    data_fields=[
        "pt_vids",
        "pt_valid",
        "ee_vids",
        "ee_valid",
        "ee_eps_x",
        "et_pairs",
        "et_valid",
        "pt_count",
        "ee_count",
        "et_count",
        "bucket_overflow",
    ],
    meta_fields=[],
)


@dataclass(frozen=True)
class ActiveSet:
    """Compacted subset of candidates that can contribute a nonzero barrier
    term (pytree). The C2-clamped barrier and ALL its derivatives vanish
    identically at d >= dHat, so energy/gradient/Hessian evaluated on this
    subset equal the full-candidate evaluation exactly (absent cap
    overflow, which cnt_* reports for the growth protocol)."""

    vids_p: Any  # (Cap,4) compacted PT stencils; invalid rows -> 0
    ok_p: Any  # (Cap,) bool
    vids_e: Any  # (Cae,4) compacted EE stencils
    ok_e: Any  # (Cae,) bool
    eps_e: Any  # (Cae,) mollifier thresholds of the compacted EE rows
    cnt_pt: Any  # true counts (int32) for overflow detection
    cnt_ee: Any


jax.tree_util.register_dataclass(
    ActiveSet,
    data_fields=["vids_p", "ok_p", "vids_e", "ok_e", "eps_e", "cnt_pt", "cnt_ee"],
    meta_fields=[],
)


class SelfContact:
    """Per-scene self-contact handler with capacity management."""

    # above this many primitives per side, the dense O(Na*Nb) overlap mask
    # is replaced by the sort-based spatial hash — measured on the v5e the
    # grid already wins 2x at ~1.5K primitives
    DENSE_LIMIT = 512

    def __init__(self, mesh, meta, friction=0.0, cap_pt=None, cap_ee=None, cap_et=None,
                 vert_mu=None, broadphase=None, grid_K=8, ccd_method="accd"):
        self.mesh = mesh
        self.meta = meta
        self.friction = friction
        # "accd" (additive, default — reference's CTCD role) or "ti"
        # (Tight-Inclusion-style interval bisection, the provably-
        # conservative option; reference CCDMethod config keyword)
        self.ccd_method = ccd_method
        # (V,) per-vertex CO friction coefficients (0 on deformable verts);
        # pairs touching a CO vertex use the CO's mu instead of selfFric
        self.vert_mu = vert_mu
        nS = int(mesh.surf_tris.shape[0])
        nE = int(mesh.surf_edges.shape[0])
        nV = int(mesh.surf_verts.shape[0])
        if broadphase is None:
            broadphase = "grid" if max(nS, nE, nV) > self.DENSE_LIMIT else "dense"
        self.broadphase = broadphase
        self.grid_K = grid_K
        # generous initial caps; grown on overflow
        self.cap_pt = int(cap_pt or max(64, 8 * nV))
        self.cap_ee = int(cap_ee or max(64, 8 * nE))
        self.cap_et = int(cap_et or max(64, 8 * nE))
        # active (d < dHat) pairs are typically ~10-20% of candidates; the
        # gradient and the Hessian (with its per-pair 12x12 eigendecompo-
        # sition) are computed only on this compacted subset, SPLIT BY TYPE
        # so each pair runs its own (PT or EE) autodiff instead of both.
        # Initial caps are tight (they grow on overflow) because the
        # eigh/autodiff cost scales with the CAP, not the count; EE actives
        # are rarer still (only near-parallel packings hold many).
        self.cap_act_pt = max(256, self.cap_pt // 16)
        self.cap_act_ee = max(256, self.cap_ee // 32)
        # lagged friction pairs (lam > 0 at capture) are compacted the same
        # way: the friction Hv scatter runs EVERY PCG iteration, so its row
        # count — not the candidate cap — sets the inner-loop cost
        self.cap_fric = self.cap_act_pt + self.cap_act_ee
        self._eps_x_table = None  # filled lazily per ee candidate build
        # static oversized-primitive classification (rest shape): kinematic
        # planes/containers whose extent would inflate the shared grid cell
        # are swept densely instead (SH.dense_pairs; the 1_squeezeOut
        # grid_K=80492 / 120 GB failure)
        self.big = self._classify_big(mesh) if self.broadphase == "grid" else None

    BIG_FACTOR = 8.0  # prim counts as oversized past this x median extent
    BIG_MAX = 512  # dense-sweep budget; only the largest qualify

    def rebind_mesh(self, mesh):
        """Point the pipeline at a reshaped mesh (e.g. shard_mesh_data's
        padded arrays) — the static big-prim classification must be redone
        against the new primitive rows."""
        self.mesh = mesh
        self.big = self._classify_big(mesh) if self.broadphase == "grid" else None

    def _classify_big(self, mesh):
        import numpy as np

        xr = np.asarray(mesh.x_rest)
        dbc = np.asarray(mesh.dbc_mask)

        def extents(prims):
            P = xr[np.maximum(prims, 0)]  # (N,k,3); sentinel rows degenerate
            return (P.max(axis=1) - P.min(axis=1)).max(axis=1)

        out = {}
        any_big = False
        for name, prims in (("tri", np.asarray(mesh.surf_tris)),
                            ("edge", np.asarray(mesh.surf_edges))):
            ids = mask = None
            if prims.shape[0]:
                ext = extents(prims)
                # threshold against the DEFORMABLE (non-DBC) extent
                # distribution: oversized kinematic prims must not inflate
                # the median they are classified against (a scene where
                # obstacle prims outnumber deformable ones would otherwise
                # classify nothing)
                free = ~dbc[np.maximum(prims, 0)].all(axis=1)
                ref_ext = ext[free] if free.any() else ext
                thr = self.BIG_FACTOR * max(float(np.median(ref_ext)), 1e-30)
                sel = np.nonzero(ext > thr)[0]
                if sel.size > self.BIG_MAX:
                    import warnings

                    dropped = sel.size - self.BIG_MAX
                    warnings.warn(
                        f"big-prim dense sweep: {name} truncated to the "
                        f"largest {self.BIG_MAX} of {sel.size} qualifying "
                        f"prims ({dropped} oversized prims stay in the "
                        f"hash grid and may still inflate the shared cell)"
                    )
                    sel = sel[np.argsort(ext[sel])[-self.BIG_MAX:]]
                if sel.size:
                    any_big = True
                    m = np.zeros(prims.shape[0], bool)
                    m[sel] = True
                    ids = jnp.asarray(np.sort(sel).astype(np.int32))
                    mask = jnp.asarray(m)
            out[name + "_ids"] = ids
            out[name + "_mask"] = mask
        return out if any_big else None

    # -- candidate construction -------------------------------------------

    def _comoving(self, disp):
        """Subtract the mean surface-vertex displacement (see
        build_candidates docstring: any common translation preserves the
        pairwise sweep, and only relative motion should size the boxes)."""
        if disp is None:
            return None
        return disp - jnp.mean(disp[self.mesh.surf_verts], axis=0)

    def build_candidates(self, x, disp=None, gap=None, with_et=True):
        """ONE fused broad phase + stencil assembly: PT and EE barrier/CCD
        candidates plus the swept edge-triangle pairs for the intersection
        failsafe, sharing the AABB computation and the triangle grid.
        gap defaults to sqrt(dHat) set by the caller; disp sweeps the AABBs
        for CCD-covering candidate sets.

        The sweep runs in the CO-MOVING frame: pairwise min distance along
        synchronized motion x_i + t*d_i vs x_j + t*d_j is invariant under
        subtracting ANY common vector m from every displacement, so boxes
        swept by (d_i - mean) still cover every reachable pair while only
        growing with motion RELATIVE to the mean. Without this, uniform
        free-fall (12_matOnBoard) inflates every swept AABB by |v dt|,
        the shared cell grows with it, and the falling sheets collapse
        into a few buckets (grid_K regrew to 28790 / 10.8 GB of tables).
        Analytic half-space contacts never use this grid, so absolute
        motion is not lost."""
        mesh = self.mesh
        disp = self._comoving(disp)
        if self.broadphase == "grid":
            from ipc_tpu.parallel import spmd

            dev_mesh = spmd.active_mesh()
            if dev_mesh is not None and self.big is not None \
                    and not getattr(self, "_warned_spmd_fallback", False):
                import warnings

                self._warned_spmd_fallback = True
                warnings.warn(
                    "SPMD broad phase: scene has oversized prims (dense "
                    "big sweep); falling back to the replicated broad "
                    "phase — per-device transient memory is NOT reduced"
                )
            if dev_mesh is not None and self.big is None:
                # sharded broad phase: build + query transients live 1/n
                # per device (fused_candidates_spmd docstring). Scenes with
                # oversized prims take the replicated path below for now
                # (the dense big sweep is not yet expressed under shard_map)
                fused = SH.fused_candidates_spmd(
                    dev_mesh, spmd.active_axis(), x,
                    mesh.surf_verts, mesh.surf_edges, mesh.surf_tris,
                    mesh.dbc_mask, self.cap_pt, self.cap_ee, self.cap_et,
                    disp, gap, K=self.grid_K, with_et=with_et,
                )
            else:
                fused = SH.fused_candidates(
                    x, mesh.surf_verts, mesh.surf_edges, mesh.surf_tris,
                    mesh.dbc_mask, self.cap_pt, self.cap_ee, self.cap_et,
                    disp, gap, K=self.grid_K, with_et=with_et, big=self.big,
                )
            pt_pairs, pt_count = fused["pt"]
            ee_pairs, ee_count = fused["ee"]
            et_pairs, et_count = fused["et"]
            bucket_overflow = fused["overflow"]
        else:
            pt_pairs, pt_count = BP.pt_candidates(
                x, mesh.surf_verts, mesh.surf_tris, mesh.dbc_mask, self.cap_pt, disp, gap
            )
            ee_pairs, ee_count = BP.ee_candidates(
                x, mesh.surf_edges, mesh.dbc_mask, self.cap_ee, disp, gap
            )
            if with_et:
                et_pairs, et_count = BP.et_candidates(
                    x, mesh.surf_edges, mesh.surf_tris, self.cap_et, disp, gap,
                    mesh.dbc_mask,
                )
            else:
                et_pairs = jnp.full((self.cap_et, 2), -1, jnp.int32)
                et_count = jnp.asarray(0, jnp.int32)
            bucket_overflow = jnp.asarray(0, jnp.int32)
        pt_valid = pt_pairs[:, 0] >= 0
        ee_valid = ee_pairs[:, 0] >= 0
        svI = jnp.maximum(pt_pairs[:, 0], 0)
        sfI = jnp.maximum(pt_pairs[:, 1], 0)
        pt_vids = jnp.concatenate(
            [mesh.surf_verts[svI][:, None], mesh.surf_tris[sfI]], axis=1
        )
        eI = jnp.maximum(ee_pairs[:, 0], 0)
        eJ = jnp.maximum(ee_pairs[:, 1], 0)
        ee_vids = jnp.concatenate([mesh.surf_edges[eI], mesh.surf_edges[eJ]], axis=1)
        xr = mesh.x_rest
        ee_eps_x = jax.vmap(eps_x_ee)(
            xr[ee_vids[:, 0]], xr[ee_vids[:, 1]], xr[ee_vids[:, 2]], xr[ee_vids[:, 3]]
        )
        from ipc_tpu.parallel.spmd import constrain

        # under an active SPMD context the candidate tensors are pinned to
        # the leading-axis sharding (1/n rows per device); no-op otherwise
        return Candidates(
            pt_vids=constrain(pt_vids),
            pt_valid=constrain(pt_valid),
            ee_vids=constrain(ee_vids),
            ee_valid=constrain(ee_valid),
            ee_eps_x=constrain(ee_eps_x),
            et_pairs=constrain(et_pairs),
            et_valid=constrain(et_pairs[:, 0] >= 0),
            pt_count=pt_count,
            ee_count=ee_count,
            et_count=et_count,
            bucket_overflow=bucket_overflow,
        )

    def ensure_active_cap(self, active_pt, active_ee):
        grew = False
        if int(active_pt) > self.cap_act_pt:
            self.cap_act_pt = int(int(active_pt) * 1.5) + 64
            grew = True
        if int(active_ee) > self.cap_act_ee:
            self.cap_act_ee = int(int(active_ee) * 1.5) + 64
            grew = True
        return grew

    def ensure_fric_cap(self, fric_count):
        if int(fric_count) > self.cap_fric:
            self.cap_fric = int(int(fric_count) * 1.5) + 64
            return True
        return False

    def ensure_caps(self, cand: Candidates):
        """Host-side overflow check; returns True if caps grew (re-trace)."""
        grew = False
        pt_count = int(cand.pt_count)
        ee_count = int(cand.ee_count)
        if pt_count > self.cap_pt:
            self.cap_pt = int(pt_count * 1.5) + 64
            grew = True
        if ee_count > self.cap_ee:
            self.cap_ee = int(ee_count * 1.5) + 64
            grew = True
        et_count = int(cand.et_count)
        if et_count > self.cap_et:
            self.cap_et = int(et_count * 1.5) + 64
            grew = True
        if self.broadphase == "grid":
            ov = int(cand.bucket_overflow)
            if ov > self.grid_K:
                # bucket saturation silently drops candidates: grow K
                self.grid_K = int(ov * 1.5) + 8
                grew = True
        return grew

    # -- active-set compaction ---------------------------------------------

    def active_set(self, x, cand: Candidates, dHat, disp=None, cap_scale=1):
        """Compact candidates to the pairs that can contribute a nonzero
        barrier term: d^2 < dHat at x, or — when `disp` is given — at ANY
        point of the segment [x, x+disp] (per-pair conservative travel
        bound: the reduced distance of a stencil can shrink by at most the
        sum of the two primitives' largest vertex displacements). The
        disp form makes one compaction serve every line-search trial.

        cap_scale statically scales the compaction capacity (the line-
        search superset is bigger than the point active set)."""
        disp = self._comoving(disp)  # travel bound is on RELATIVE approach
        d_pt, d_ee = SC.active_dist2(x, cand.pt_vids, cand.ee_vids)
        if disp is None:
            act_pt = cand.pt_valid & (d_pt < dHat)
            act_ee = cand.ee_valid & (d_ee < dHat)
        else:
            dn = jnp.sqrt(jnp.sum(disp * disp, axis=1))  # (V,)
            tp = dn[cand.pt_vids]  # (Cpt,4)
            travel_pt = tp[:, 0] + tp[:, 1:].max(axis=1)
            te = dn[cand.ee_vids]
            travel_ee = te[:, :2].max(axis=1) + te[:, 2:].max(axis=1)
            lim_pt = jnp.sqrt(dHat) + travel_pt
            lim_ee = jnp.sqrt(dHat) + travel_ee
            act_pt = cand.pt_valid & (d_pt < lim_pt * lim_pt)
            act_ee = cand.ee_valid & (d_ee < lim_ee * lim_ee)
        cap_p = self.cap_act_pt * cap_scale
        cap_e = self.cap_act_ee * cap_scale
        cnt_pt = act_pt.sum(dtype=jnp.int32)
        cnt_ee = act_ee.sum(dtype=jnp.int32)
        (sp,) = jnp.nonzero(act_pt, size=cap_p, fill_value=-1)
        ok_p = sp >= 0
        vids_p = jnp.where(ok_p[:, None], cand.pt_vids[jnp.maximum(sp, 0)], 0)
        (se,) = jnp.nonzero(act_ee, size=cap_e, fill_value=-1)
        ok_e = se >= 0
        ie = jnp.maximum(se, 0)
        vids_e = jnp.where(ok_e[:, None], cand.ee_vids[ie], 0)
        from ipc_tpu.parallel.spmd import constrain

        # under SPMD, pin the compacted rows to the leading-axis sharding:
        # without this the per-pair Hessian + 12x12 eigendecomposition of
        # the active set runs REPLICATED on every device (global static
        # caps; seen as the dominant residual transient after the ring
        # broad phase + sharded coarse assembly)
        return ActiveSet(
            vids_p=constrain(vids_p), ok_p=constrain(ok_p),
            vids_e=constrain(vids_e), ok_e=constrain(ok_e),
            eps_e=constrain(cand.ee_eps_x[ie]), cnt_pt=cnt_pt, cnt_ee=cnt_ee,
        )

    def energy_active(self, x, act: ActiveSet, kappa, dHat, df=False):
        """Barrier energy on a compacted active set (== full-candidate
        energy; see ActiveSet). Pad rows evaluate stencil x[0,0,0,0] whose
        reduced distance is 0 -> masked out before the sum.

        df=True returns a compensated double-float (hi, lo) pair
        (ops/compensated.py) instead of a plain scalar."""
        e_pt = jax.vmap(SC.pt_pair_energy, in_axes=(0, None))(x[act.vids_p], dHat)
        e_ee = jax.vmap(SC.ee_pair_energy, in_axes=(0, 0, None))(
            x[act.vids_e], act.eps_e, dHat
        )
        e_pt = jnp.where(act.ok_p, e_pt, 0.0)
        e_ee = jnp.where(act.ok_e, e_ee, 0.0)
        if df:
            from ipc_tpu.ops.compensated import df_add, df_scale, df_sum

            return df_scale(df_add(df_sum(e_pt), df_sum(e_ee)), kappa)
        return kappa * (e_pt.sum() + e_ee.sum())

    def energy_df(self, x, cand: Candidates, kappa, dHat):
        """Full-candidate barrier energy as a compensated (hi, lo) pair —
        the host line search's f32 resolution fix (same per-pair terms as
        `energy`; only the reduction differs)."""
        from ipc_tpu.ops.compensated import df_add, df_scale, df_sum

        e_pt = jax.vmap(SC.pt_pair_energy, in_axes=(0, None))(x[cand.pt_vids], dHat)
        e_ee = jax.vmap(SC.ee_pair_energy, in_axes=(0, 0, None))(
            x[cand.ee_vids], cand.ee_eps_x, dHat
        )
        e_pt = jnp.where(cand.pt_valid, e_pt, 0.0)
        e_ee = jnp.where(cand.ee_valid, e_ee, 0.0)
        return df_scale(df_add(df_sum(e_pt), df_sum(e_ee)), kappa)

    def gradient_active(self, x, act: ActiveSet, kappa, dHat):
        """(V,3) barrier gradient on a compacted active set."""
        g_pt = jax.vmap(jax.grad(SC.pt_pair_energy), in_axes=(0, None))(
            x[act.vids_p], dHat
        )
        g_ee = jax.vmap(jax.grad(SC.ee_pair_energy), in_axes=(0, 0, None))(
            x[act.vids_e], act.eps_e, dHat
        )
        g_pt = jnp.where(act.ok_p[:, None, None], g_pt, 0.0)
        g_ee = jnp.where(act.ok_e[:, None, None], g_ee, 0.0)
        out = jnp.zeros_like(x)
        out = out.at[act.vids_p.reshape(-1)].add(kappa * g_pt.reshape(-1, 3))
        out = out.at[act.vids_e.reshape(-1)].add(kappa * g_ee.reshape(-1, 3))
        return out

    def hessian_blocks_from_active(self, x, act: ActiveSet, kappa, dHat,
                                   project=True):
        """SPD 12x12 blocks of a compacted active set.

        Returns (vids (Ca,4), H (Ca,12,12), (cnt_pt, cnt_ee))."""
        H_p = jax.vmap(SC._pair_hess(SC.pt_pair_energy), in_axes=(0, None))(
            x[act.vids_p], dHat
        )
        H_e = jax.vmap(SC._pair_hess(SC.ee_pair_energy), in_axes=(0, 0, None))(
            x[act.vids_e], act.eps_e, dHat
        )
        H = jnp.concatenate([H_p, H_e])
        if project:
            H = jax.vmap(SC.make_psd)(H)
        ok = jnp.concatenate([act.ok_p, act.ok_e])
        vids = jnp.concatenate([act.vids_p, act.vids_e])
        H = jnp.where(ok[:, None, None], kappa * H, 0.0)
        return vids, H, (act.cnt_pt, act.cnt_ee)

    # -- energy/derivatives (thin wrappers over selfcollision) -------------

    def energy(self, x, cand: Candidates, kappa, dHat):
        return SC.barrier_energy(
            x, cand.pt_vids, cand.pt_valid, cand.ee_vids, cand.ee_valid,
            cand.ee_eps_x, kappa, dHat,
        )

    def gradient(self, x, cand: Candidates, kappa, dHat):
        return SC.barrier_gradient(
            x, cand.pt_vids, cand.pt_valid, cand.ee_vids, cand.ee_valid,
            cand.ee_eps_x, kappa, dHat,
        )

    def hessian_blocks(self, x, cand: Candidates, kappa, dHat, project=True):
        return SC.barrier_hessian_blocks(
            x, cand.pt_vids, cand.pt_valid, cand.ee_vids, cand.ee_valid,
            cand.ee_eps_x, kappa, dHat, project,
        )

    def hessian_blocks_active(self, x, cand: Candidates, kappa, dHat, project=True):
        """SPD barrier Hessian blocks on the COMPACTED active subset.

        Returns (vids (Ca,4), H (Ca,12,12), (active_pt, active_ee) counts).
        Inactive candidates have exactly-zero blocks (the barrier vanishes
        at d >= dHat), so compacting to d < dHat pairs before the per-pair
        12x12 Hessian + eigendecomposition changes nothing and cuts the
        dominant contact-assembly cost ~5-10x. PT and EE actives compact
        into separate lists so each runs only its own autodiff Hessian."""
        act = self.active_set(x, cand, dHat)
        return self.hessian_blocks_from_active(x, act, kappa, dHat, project)

    def capture_friction(self, x, cand: Candidates, kappa, dHat):
        """Lagged friction state COMPACTED to the active (lam > 0) pairs.

        The full candidate set is 5-20x larger than the contact set; since
        lam is captured once per outer iterate and lam = 0 pairs contribute
        exactly nothing to the friction energy/gradient/Hessian, compacting
        here shrinks the per-PCG-iteration friction scatter and the
        line-search friction energy by the same factor. `count` reports the
        true active total for cap growth (ensure_fric_cap)."""
        fr = SC.capture_friction(
            x, cand.pt_vids, cand.pt_valid, cand.ee_vids, cand.ee_valid,
            cand.ee_eps_x, kappa, dHat,
            vert_mu=self.vert_mu, self_mu=self.friction,
        )
        act = fr["lam"] > 0.0
        cnt = act.sum(dtype=jnp.int32)
        (sel,) = jnp.nonzero(act, size=self.cap_fric, fill_value=-1)
        ok = sel >= 0
        i = jnp.maximum(sel, 0)
        return dict(
            vids=jnp.where(ok[:, None], fr["vids"][i], 0),
            ctype=fr["ctype"][i],
            lam=jnp.where(ok, fr["lam"][i], 0.0),
            coords=fr["coords"][i],
            basis=fr["basis"][i],
            count=cnt,
        )

    def n_active(self, x, cand: Candidates, dHat):
        """Number of candidates currently inside dHat (collision-pair stats,
        reference outputCollStats Optimizer.cpp:3070-3087)."""
        from ipc_tpu.ops import distance as D

        def d_pt(x4):
            ct, xs = SC.pt_reduce(x4)
            return D.stencil_dist2(ct, xs)

        def d_ee(x4):
            ct, xs = SC.ee_reduce(x4)
            return D.stencil_dist2(ct, xs)

        dpt = jax.vmap(d_pt)(x[cand.pt_vids])
        dee = jax.vmap(d_ee)(x[cand.ee_vids])
        return (
            jnp.sum(cand.pt_valid & (dpt < dHat)) + jnp.sum(cand.ee_valid & (dee < dHat))
        ).astype(jnp.int32)

    # -- CCD ----------------------------------------------------------------

    def ccd_alpha(self, x, dx, cand: Candidates, gap_frac=0.2, max_iter=64):
        """Min conservative CCD step over candidate stencils (candidates
        must have been built with the sweep covering dx). Method per
        self.ccd_method: ACCD (default) or Tight-Inclusion interval
        bisection with minimum separation gap_frac * d0 (the reference's
        eta policy, SelfCollisionHandler.cpp:1020-1060)."""
        if self.ccd_method == "ti":
            # hybrid conservative bound: BOTH ACCD and the interval method
            # are provably conservative, so their per-pair MAX is also
            # conservative and strictly tighter than either. This replaces
            # the reference TI path's no_zero_toi / ms-retry / 0.8x hack
            # chain (SelfCollisionHandler.cpp:1447-1471): the t-only
            # interval test is loose for tilted resting contacts (it has no
            # (u,v) subdivision), and the ACCD bound floors exactly those
            # cases.
            from ipc_tpu.ops.distance import edge_edge_dist2, point_triangle_dist2

            def one_pt(x4, p4):
                d0 = jnp.sqrt(jnp.maximum(
                    point_triangle_dist2(x4[0], x4[1], x4[2], x4[3]), 0.0))
                t_i = ti_pt(x4, p4, 1.0, gap_frac * d0, max_iter)
                return jnp.maximum(t_i, accd_pt(x4, p4, gap_frac, max_iter))

            def one_ee(x4, p4):
                d0 = jnp.sqrt(jnp.maximum(
                    edge_edge_dist2(x4[0], x4[1], x4[2], x4[3]), 0.0))
                t_i = ti_ee(x4, p4, 1.0, gap_frac * d0, max_iter)
                return jnp.maximum(t_i, accd_ee(x4, p4, gap_frac, max_iter))

            a_pt = jax.vmap(one_pt)(x[cand.pt_vids], dx[cand.pt_vids])
            a_ee = jax.vmap(one_ee)(x[cand.ee_vids], dx[cand.ee_vids])
            a = jnp.minimum(
                jnp.where(cand.pt_valid, a_pt, jnp.inf).min(),
                jnp.where(cand.ee_valid, a_ee, jnp.inf).min(),
            )
            return jnp.minimum(a, 1.0)
        a_pt = jax.vmap(accd_pt, in_axes=(0, 0, None, None))(
            x[cand.pt_vids], dx[cand.pt_vids], gap_frac, max_iter
        )
        a_ee = jax.vmap(accd_ee, in_axes=(0, 0, None, None))(
            x[cand.ee_vids], dx[cand.ee_vids], gap_frac, max_iter
        )
        a = jnp.minimum(
            jnp.where(cand.pt_valid, a_pt, jnp.inf).min(),
            jnp.where(cand.ee_valid, a_ee, jnp.inf).min(),
        )
        return jnp.minimum(a, 1.0)

    # -- intersection failsafe ---------------------------------------------

    def et_pairs(self, x, disp=None):
        """Swept edge-triangle candidate pairs for the intersection
        failsafe: built once per Newton iteration, the per-trial predicate
        is then O(pairs) (vs a full broad phase per line-search trial)."""
        mesh = self.mesh
        disp = self._comoving(disp)
        if self.broadphase == "grid":
            pairs, count, _ = SH.et_candidates(
                x, mesh.surf_edges, mesh.surf_tris, self.cap_et, disp=disp,
                dbc_mask=mesh.dbc_mask, K=self.grid_K, big=self.big,
            )
        else:
            pairs, count = BP.et_candidates(
                x, mesh.surf_edges, mesh.surf_tris, self.cap_et, disp=disp,
                dbc_mask=mesh.dbc_mask,
            )
        return pairs, pairs[:, 0] >= 0, count

    def intersects_pairs(self, x, pairs, valid):
        return any_edge_tri_intersection(
            x, self.mesh.surf_edges, self.mesh.surf_tris, pairs, valid
        )

    def has_intersection(self, x):
        mesh = self.mesh
        if self.broadphase == "grid":
            pairs, count, _ = SH.et_candidates(
                x, mesh.surf_edges, mesh.surf_tris, self.cap_et,
                dbc_mask=mesh.dbc_mask, K=self.grid_K, big=self.big,
            )
        else:
            pairs, count = BP.et_candidates(
                x, mesh.surf_edges, mesh.surf_tris, self.cap_et, dbc_mask=mesh.dbc_mask
            )
        valid = pairs[:, 0] >= 0
        hit = any_edge_tri_intersection(
            x, mesh.surf_edges, mesh.surf_tris, pairs, valid
        )
        return hit, count
