"""Relative-motion reachability filter (broadphase.reach_mask /
spatial_hash._query_block motion columns): under a coherent sweep — the
scripted-twist failure mode where every primitive travels far but neighbors
travel TOGETHER — the emitted candidate count must collapse to near-pair
scale, while still covering every pair that actually comes within `gap`
anywhere along the sweep (conservativeness, checked by brute force)."""

import numpy as np
import jax.numpy as jnp

from ipc_tpu.contact import broadphase as BP
from ipc_tpu.contact import spatial_hash as SH
from ipc_tpu.mesh import build_mesh
from ipc_tpu.models.primitives import mat
from ipc_tpu.ops.distance import edge_edge_dist2, point_triangle_dist2


def _twist_scene(n=10, angle=0.35):
    """Flat mat + a rigid rotation sweep about the x axis (coherent: the
    relative motion of nearby primitives is tiny, absolute travel large)."""
    V, T = mat(n)
    mesh, meta = build_mesh(V, T)
    x = np.asarray(mesh.x_rest)
    c = x.mean(axis=0)
    r = x - c
    ca, sa = np.cos(angle), np.sin(angle)
    rot = r.copy()
    rot[:, 1] = ca * r[:, 1] - sa * r[:, 2]
    rot[:, 2] = sa * r[:, 1] + ca * r[:, 2]
    disp = (c + rot) - x
    return mesh, jnp.asarray(x), jnp.asarray(disp)


def _pairs(arr):
    p = np.asarray(arr)
    return {tuple(r) for r in p[p[:, 0] >= 0]}


def test_coherent_sweep_counts_collapse():
    mesh, x, disp = _twist_scene()
    gap = 0.02
    caps = dict(cap_pt=200000, cap_ee=400000, cap_et=400000)
    out = SH.fused_candidates(
        x, mesh.surf_verts, mesh.surf_edges, mesh.surf_tris, mesh.dbc_mask,
        disp=disp, gap=gap, K=256, **caps
    )
    # swept-AABB overlap scale (what the filter replaces): count overlaps
    # of the swept+inflated boxes directly
    eb = BP.edge_aabbs(x, mesh.surf_edges, disp, gap)
    lo, hi = eb[:, 0], eb[:, 1]
    sep = jnp.any(
        (lo[:, None, :] > hi[None, :, :]) | (lo[None, :, :] > hi[:, None, :]),
        axis=2,
    )
    ne = eb.shape[0]
    upper = np.triu(np.ones((ne, ne), bool), 1)
    swept_overlaps = int(np.asarray(~sep & upper).sum())
    ee_count = int(out["ee"][1])
    # ~3.1x on this 10x10 test mat; the win scales with mesh density
    # (relative neighbor motion ~ angle * spacing while swept-AABB reach is
    # ~ absolute travel): mat100x100's twist collapses ~100x
    assert ee_count * 2 < swept_overlaps, (ee_count, swept_overlaps)


def test_filtered_set_covers_sweep():
    """Brute force: every EE/PT pair whose distance drops below gap at any
    sampled point of the sweep must be in the emitted candidate set."""
    mesh, x, disp = _twist_scene(n=6, angle=0.3)
    gap = 0.05
    caps = dict(cap_pt=200000, cap_ee=400000, cap_et=400000)
    out = SH.fused_candidates(
        x, mesh.surf_verts, mesh.surf_edges, mesh.surf_tris, mesh.dbc_mask,
        disp=disp, gap=gap, K=256, **caps
    )
    got_ee = _pairs(out["ee"][0])
    got_pt = _pairs(out["pt"][0])
    se = np.asarray(mesh.surf_edges)
    st = np.asarray(mesh.surf_tris)
    sv = np.asarray(mesh.surf_verts)
    nE, nS, nV = len(se), len(st), len(sv)

    # enumerate admissible index pairs once (numpy), batch-evaluate
    # distances per tau with ONE vmapped call per family
    ei, ej = np.triu_indices(nE, 1)
    adj = (se[ei][:, :, None] == se[ej][:, None, :]).any(axis=(1, 2))
    ei, ej = ei[~adj], ej[~adj]
    vi, ti = np.meshgrid(np.arange(nV), np.arange(nS), indexing="ij")
    vi, ti = vi.ravel(), ti.ravel()
    in_tri = (sv[vi][:, None] == st[ti]).any(axis=1)
    vi, ti = vi[~in_tri], ti[~in_tri]

    import jax

    d_ee = jax.jit(
        jax.vmap(lambda a, b: edge_edge_dist2(a[0], a[1], b[0], b[1]))
    )
    d_pt = jax.jit(
        jax.vmap(lambda p, t: point_triangle_dist2(p, t[0], t[1], t[2]))
    )
    for tau in np.linspace(0.0, 1.0, 7):
        xt = x + tau * disp
        dee = np.asarray(d_ee(xt[se[ei]], xt[se[ej]]))
        for k in np.nonzero(dee < gap * gap)[0]:
            assert (int(ei[k]), int(ej[k])) in got_ee, (tau, ei[k], ej[k])
        dpt = np.asarray(d_pt(xt[sv[vi]], xt[st[ti]]))
        for k in np.nonzero(dpt < gap * gap)[0]:
            assert (int(vi[k]), int(ti[k])) in got_pt, (tau, vi[k], ti[k])
