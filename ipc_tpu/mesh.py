"""Tet mesh + embedded surface state as fixed-shape arrays.

The TPU-native replacement for the reference's Mesh<3> object
(reference: src/Mesh.hpp:58-171, computeFeatures src/Mesh.cpp:415-560,
computeMassMatrix src/Mesh.cpp:136): instead of an object with incremental
methods, the mesh is one frozen pytree of arrays built once on the host
(numpy) and then shipped to the device. Everything the solver touches per
step is an array; host-only metadata (component ranges, script specs) lives
beside it in `MeshMeta`.

Conventions
-----------
* Tet (i0,i1,i2,i3) with edge matrix D = [x1-x0 | x2-x0 | x3-x0] (columns),
  rest volume = det(D_rest)/6 > 0 (tets are reoriented on ingest to be
  positive), deformation gradient F = D @ rest_inv with
  rest_inv = D_rest^{-1}  (the analog of the reference's restTriInv,
  Mesh.cpp:415-470).
* Lumped mass: barycentric (vol/4 to each corner) x density, matching
  libigl MASSMATRIX_TYPE_BARYCENTRIC for tets (Mesh.cpp:136-160).
* Surface = boundary faces of the tet mesh, outward oriented
  (reference computeFeatures builds SF the same way); SFEdges are unique
  undirected surface edges; SVI the unique surface vertex ids.
"""

from dataclasses import dataclass, field
from typing import Any

import numpy as np

__all__ = [
    "MeshData",
    "MeshMeta",
    "build_mesh",
    "lame_params",
    "merge_meshes",
    "append_kinematic_surface",
]


@dataclass(frozen=True)
class MeshData:
    """Device-side mesh arrays (a pytree via jax.tree_util registration)."""

    x_rest: Any  # (V,3)
    tets: Any  # (T,4) int32
    rest_inv: Any  # (T,3,3)
    vol: Any  # (T,)
    mass: Any  # (V,) lumped, includes density
    mu: Any  # (T,) first Lame parameter (shear)
    lam: Any  # (T,) second Lame parameter
    surf_tris: Any  # (S,3) int32, outward oriented
    surf_edges: Any  # (E,2) int32, undirected unique
    surf_verts: Any  # (Sv,) int32
    dbc_mask: Any  # (V,) bool — Dirichlet-constrained vertices
    vert_comp: Any  # (V,) int32 — component id per vertex (for sysE/M/L logs)

    # --- derived scalars kept as host floats (static under jit) ---
    # set by build_mesh; not traced.

    def __post_init__(self):
        pass


try:
    import jax

    jax.tree_util.register_dataclass(
        MeshData,
        data_fields=[
            "x_rest",
            "tets",
            "rest_inv",
            "vol",
            "mass",
            "mu",
            "lam",
            "surf_tris",
            "surf_edges",
            "surf_verts",
            "dbc_mask",
            "vert_comp",
        ],
        meta_fields=[],
    )
except Exception:  # pragma: no cover
    pass


@dataclass
class MeshMeta:
    """Host-side metadata that never enters jit."""

    n_verts: int = 0
    n_tets: int = 0
    bbox: np.ndarray = None  # (2,3) min/max of rest positions
    bbox_diag2: float = 0.0
    avg_edge_len: float = 0.0
    avg_node_mass: float = 0.0
    comp_ranges: list = field(default_factory=list)  # [(v_start, v_end)] per component
    dbc_is_zero: np.ndarray = None  # per-vertex bool: DBC with zero motion


def lame_params(ym, pr):
    """Young's modulus + Poisson ratio -> (mu, lambda) (reference Mesh.hpp
    setLameParam semantics; defaults YM=1e5, PR=0.4, Config.hpp:93)."""
    mu = ym / (2.0 * (1.0 + pr))
    lam = ym * pr / ((1.0 + pr) * (1.0 - 2.0 * pr))
    return mu, lam


_FACES = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], dtype=np.int64)


def _boundary_faces(tets):
    """Outward-oriented boundary faces of a positively-oriented tet mesh."""
    faces = tets[:, _FACES].reshape(-1, 3)  # (4T,3)
    key = np.sort(faces, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    return faces[counts[inv] == 1]


def _reorient_positive(V, T):
    D = np.stack(
        [V[T[:, 1]] - V[T[:, 0]], V[T[:, 2]] - V[T[:, 0]], V[T[:, 3]] - V[T[:, 0]]],
        axis=2,
    )
    neg = np.linalg.det(D) < 0
    T = T.copy()
    T[neg, 2], T[neg, 3] = T[neg, 3], T[neg, 2].copy()
    return T


def build_mesh(
    V,
    T,
    density=1000.0,
    ym=1e5,
    pr=0.4,
    dbc_mask=None,
    vert_comp=None,
    comp_ranges=None,
    dtype=np.float64,
):
    """Build MeshData + MeshMeta from raw vertices/tets (host, numpy).

    Parameters mirror the reference scene defaults (density 1000, YM 1e5,
    PR 0.4 — src/Config.hpp:90-93). `ym`/`pr` may be scalars or per-tet
    arrays (per-component material overrides are resolved by the caller).
    """
    import jax.numpy as jnp

    V = np.asarray(V, dtype=np.float64)
    T = _reorient_positive(V, np.asarray(T, dtype=np.int64))
    # sort tets by min vertex id: semantics-free (all per-tet quantities
    # permute together) but gives the vertex-window locality the pallas Hv
    # kernel's block planner needs (ops/pallas_hv.py)
    T = T[np.argsort(T.min(axis=1), kind="stable")]
    nV, nT = len(V), len(T)

    D = np.stack(
        [V[T[:, 1]] - V[T[:, 0]], V[T[:, 2]] - V[T[:, 0]], V[T[:, 3]] - V[T[:, 0]]],
        axis=2,
    )
    det = np.linalg.det(D)
    if np.any(det <= 0):
        raise ValueError("degenerate or inverted rest tets")
    rest_inv = np.linalg.inv(D)
    vol = det / 6.0

    density = np.broadcast_to(np.asarray(density, dtype=np.float64), (nT,))
    mass = np.zeros(nV)
    np.add.at(mass, T.reshape(-1), np.repeat(vol * density / 4.0, 4))

    mu, lam = lame_params(np.broadcast_to(np.asarray(ym, dtype=np.float64), (nT,)),
                          np.broadcast_to(np.asarray(pr, dtype=np.float64), (nT,)))

    SF = _boundary_faces(T)
    se = np.concatenate([SF[:, [0, 1]], SF[:, [1, 2]], SF[:, [2, 0]]], axis=0)
    se = np.unique(np.sort(se, axis=1), axis=0)
    SV = np.unique(SF.reshape(-1))

    if dbc_mask is None:
        dbc_mask = np.zeros(nV, dtype=bool)
    if vert_comp is None:
        vert_comp = np.zeros(nV, dtype=np.int32)

    # host metadata
    bbox = np.stack([V.min(axis=0), V.max(axis=0)])
    meta = MeshMeta(
        n_verts=nV,
        n_tets=nT,
        bbox=bbox,
        bbox_diag2=float(np.sum((bbox[1] - bbox[0]) ** 2)),
        avg_edge_len=float(np.mean(np.linalg.norm(V[se[:, 0]] - V[se[:, 1]], axis=1)))
        if len(se)
        else 0.0,
        avg_node_mass=float(mass.sum() / nV),
        comp_ranges=comp_ranges or [(0, nV)],
        dbc_is_zero=np.ones(nV, dtype=bool),
    )

    data = MeshData(
        x_rest=jnp.asarray(V, dtype),
        tets=jnp.asarray(T, np.int32),
        rest_inv=jnp.asarray(rest_inv, dtype),
        vol=jnp.asarray(vol, dtype),
        mass=jnp.asarray(mass, dtype),
        mu=jnp.asarray(mu, dtype),
        lam=jnp.asarray(lam, dtype),
        surf_tris=jnp.asarray(SF, np.int32),
        surf_edges=jnp.asarray(se, np.int32),
        surf_verts=jnp.asarray(SV, np.int32),
        dbc_mask=jnp.asarray(dbc_mask),
        vert_comp=jnp.asarray(vert_comp, np.int32),
    )
    return data, meta


def append_kinematic_surface(mesh, meta, V_co, tris=None, edges=None, dtype=None):
    """Append a kinematic collision object's surface to the scene mesh.

    The TPU-native MeshCO<3> (reference src/CollisionObject/MeshCO.*): the
    obstacle's vertices join the global vertex array as tet-less,
    Dirichlet-constrained surface geometry, so the ONE self-contact pipeline
    handles deformable-vs-CO contacts (the reference instead duplicates the
    entire contact API per CO, MeshCO.cpp:407-2700). CO verts get the scene's
    average node mass (their rows are identity-projected anyway), and
    CO-vs-CO pairs are excluded by the existing all-DBC candidate filter
    (SelfCollisionHandler.cpp:2184-2189 analog).

    Returns (new MeshData, new MeshMeta, (v_start, v_end) of the CO verts).
    """
    import jax.numpy as jnp

    dtype = dtype or mesh.x_rest.dtype
    V_co = np.asarray(V_co, dtype=np.float64)
    n_old = int(mesh.x_rest.shape[0])
    n_co = len(V_co)

    tris = np.zeros((0, 3), np.int64) if tris is None else np.asarray(tris, np.int64)
    if edges is None:
        e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0)
        edges = np.unique(np.sort(e, axis=1), axis=0) if len(e) else np.zeros((0, 2), np.int64)
    else:
        edges = np.asarray(edges, np.int64)
    sv_co = (
        np.unique(np.concatenate([tris.reshape(-1), edges.reshape(-1)]))
        if (len(tris) or len(edges))
        else np.arange(n_co)
    )

    x_rest = jnp.concatenate([mesh.x_rest, jnp.asarray(V_co, dtype)])
    mass = jnp.concatenate(
        [mesh.mass, jnp.full((n_co,), meta.avg_node_mass, dtype)]
    )
    surf_tris = jnp.concatenate(
        [mesh.surf_tris, jnp.asarray(tris + n_old, np.int32)]
    )
    surf_edges = jnp.concatenate(
        [mesh.surf_edges, jnp.asarray(edges + n_old, np.int32)]
    )
    surf_verts = jnp.concatenate(
        [mesh.surf_verts, jnp.asarray(sv_co + n_old, np.int32)]
    )
    dbc_mask = jnp.concatenate([mesh.dbc_mask, jnp.ones((n_co,), bool)])
    comp_id = int(np.asarray(mesh.vert_comp).max()) + 1 if n_old else 0
    vert_comp = jnp.concatenate(
        [mesh.vert_comp, jnp.full((n_co,), comp_id, np.int32)]
    )

    new_mesh = MeshData(
        x_rest=x_rest,
        tets=mesh.tets,
        rest_inv=mesh.rest_inv,
        vol=mesh.vol,
        mass=mass,
        mu=mesh.mu,
        lam=mesh.lam,
        surf_tris=surf_tris,
        surf_edges=surf_edges,
        surf_verts=surf_verts,
        dbc_mask=dbc_mask,
        vert_comp=vert_comp,
    )
    new_meta = MeshMeta(
        n_verts=n_old + n_co,
        n_tets=meta.n_tets,
        bbox=np.stack(
            [
                np.minimum(meta.bbox[0], V_co.min(axis=0)),
                np.maximum(meta.bbox[1], V_co.max(axis=0)),
            ]
        )
        if n_co
        else meta.bbox,
        bbox_diag2=meta.bbox_diag2,  # reference uses the DEFORMABLE mat-space
        # bbox for dHat/kappa scaling (Optimizer.cpp:101 matSpaceBBoxSize2)
        avg_edge_len=meta.avg_edge_len,
        avg_node_mass=meta.avg_node_mass,
        comp_ranges=meta.comp_ranges + [(n_old, n_old + n_co)],
        dbc_is_zero=meta.dbc_is_zero,
    )
    return new_mesh, new_meta, (n_old, n_old + n_co)


def merge_meshes(parts):
    """Concatenate (V, T, density, ym, pr) shape tuples into one scene mesh.

    Returns (V, T, per-tet ym, per-tet pr, per-tet density is folded into
    mass by build_mesh via per-part density -> we return per-vertex density
    weights instead). Used by the scene assembler (the analog of the
    reference's main.cpp:878-1183 shape loop).
    """
    Vs, Ts, comp = [], [], []
    off = 0
    ranges = []
    for i, (V, T) in enumerate(parts):
        Vs.append(V)
        Ts.append(np.asarray(T) + off)
        comp.append(np.full(len(V), i, dtype=np.int32))
        ranges.append((off, off + len(V)))
        off += len(V)
    return (
        np.concatenate(Vs, axis=0),
        np.concatenate(Ts, axis=0),
        np.concatenate(comp),
        ranges,
    )
