"""Sharding plans: scale the solver across chips over ICI.

The reference's only parallelism is shared-memory TBB loops
(reference: SURVEY.md §2.3; e.g. Energy.cpp:253-331, SpatialHash.hpp:68-148)
— there is no distributed backend to port. The TPU-native scaling story is
SPMD over a `jax.sharding.Mesh` (SURVEY §2.3(b)):

  * FULL-STEP sharding along one "elem" axis: per-tet arrays, SURFACE
    primitive lists (tris/edges/verts), candidate tensors, AND the
    per-vertex state (x, v, a, mass, dbc) are all sharded along their
    leading axis. Vertices are padded with inert "sentinel" rows (zero
    mass, DBC-held, parked 4 bbox-diagonals outside the scene) so every
    axis divides evenly and padded surface primitives never produce
    contact candidates.
  * XLA's SPMD partitioner inserts the collectives: gathers of sharded
    vertex state become all-gathers, scatter-sum assembly becomes
    psum/reduce-scatter, and the PCG dot products become single-scalar
    psums — the all-gather SpMV pattern that rides ICI. The
    `parallel.spmd.constrain` hooks pin the PCG vectors / gradient /
    Newton iterate shardings so the partitioner keeps state distributed
    (see spmd.py).

Memory: every persistent per-vertex, per-element, per-surface, and
per-candidate array stores 1/n per device (verified by the driver's
`dryrun_multichip`, which reports per-device shard bytes).
"""

from dataclasses import replace as _dc_replace

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ipc_tpu.mesh import MeshData

__all__ = [
    "make_mesh",
    "shard_mesh_data",
    "shard_state",
    "replicate",
    "shard_report",
]


def make_mesh(n_devices=None, axis="elem", devices=None):
    """A 1-D device mesh over the first n devices."""
    devs = devices if devices is not None else jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devs), (axis,))


def _pad_rows(arr, rem, fill):
    import jax.numpy as jnp

    if rem == 0:
        return arr
    pad = jnp.broadcast_to(
        jnp.asarray(fill, arr.dtype), (rem,) + arr.shape[1:]
    )
    return jnp.concatenate([arr, pad], axis=0)


def shard_mesh_data(mesh_data: MeshData, device_mesh: Mesh, axis="elem"):
    """Shard ALL leading-axis mesh arrays over the device axis.

    Padding semantics (everything padded is mathematically inert):
      * vertices: >=1 sentinel vertex at bbox_max + 4*diag, mass 0,
        DBC-held, component 0. Far enough that no padded surface
        primitive ever enters a broad-phase candidate set; near enough
        that grid cell coordinates stay inside the packed 16-bit range.
      * tets: all four corners = the sentinel vertex, rest_inv 0, vol 0
        -> F = 0, zero energy/gradient/Hessian, +inf feasible step.
      * surface tris/edges/verts: all indices = the sentinel vertex ->
        degenerate far-away geometry, excluded from candidates by AABB
        and flagged all-DBC.
    """
    import jax.numpy as jnp

    n = device_mesh.shape[axis]
    elem = NamedSharding(device_mesh, P(axis))
    elem2 = NamedSharding(device_mesh, P(axis, None))
    repl = NamedSharding(device_mesh, P())

    V0 = int(mesh_data.x_rest.shape[0])
    # always at least one sentinel vertex, total a multiple of n
    padV = ((-(V0 + 1)) % n) + 1
    sent_idx = V0

    xr = np.asarray(mesh_data.x_rest)
    bmin, bmax = xr.min(axis=0), xr.max(axis=0)
    diag = float(np.linalg.norm(bmax - bmin))
    sentinel = bmax + 4.0 * max(diag, 1.0)

    x_rest = _pad_rows(mesh_data.x_rest, padV, sentinel)
    mass = _pad_rows(mesh_data.mass, padV, 0.0)
    dbc = _pad_rows(mesh_data.dbc_mask, padV, True)
    comp = _pad_rows(mesh_data.vert_comp, padV, 0)

    def pad_elem(a, rem, fill):
        return _pad_rows(a, rem, fill)

    T0 = int(mesh_data.tets.shape[0])
    padT = (-T0) % n
    tets = pad_elem(mesh_data.tets, padT, np.full(4, sent_idx, np.int32))
    rest_inv = pad_elem(mesh_data.rest_inv, padT, np.zeros((3, 3)))
    vol = pad_elem(mesh_data.vol, padT, 0.0)
    mu = pad_elem(mesh_data.mu, padT, 0.0)
    lam = pad_elem(mesh_data.lam, padT, 0.0)

    S0 = int(mesh_data.surf_tris.shape[0])
    surf_tris = pad_elem(
        mesh_data.surf_tris, (-S0) % n, np.full(3, sent_idx, np.int32)
    )
    E0 = int(mesh_data.surf_edges.shape[0])
    surf_edges = pad_elem(
        mesh_data.surf_edges, (-E0) % n, np.full(2, sent_idx, np.int32)
    )
    Sv0 = int(mesh_data.surf_verts.shape[0])
    surf_verts = pad_elem(mesh_data.surf_verts, (-Sv0) % n, sent_idx)

    def put(a, sh):
        return jax.device_put(a, sh)

    out = MeshData(
        x_rest=put(x_rest, elem2),
        tets=put(tets, elem2),
        rest_inv=put(rest_inv, elem2),
        vol=put(vol, elem),
        mass=put(mass, elem),
        mu=put(mu, elem),
        lam=put(lam, elem),
        surf_tris=put(surf_tris, elem2),
        surf_edges=put(surf_edges, elem2),
        surf_verts=put(surf_verts, elem),
        dbc_mask=put(dbc, elem),
        vert_comp=put(comp, elem),
    )
    return out


def shard_state(state, device_mesh: Mesh, mesh_data: MeshData, axis="elem"):
    """Shard a SimState to match a `shard_mesh_data`-padded mesh: vertex
    arrays padded (positions to the sentinel, velocities zero) and
    leading-axis sharded; scalars replicated."""
    import jax.numpy as jnp

    Vp = int(mesh_data.x_rest.shape[0])
    elem2 = NamedSharding(device_mesh, P(axis, None))
    repl = NamedSharding(device_mesh, P())

    sent_rows = mesh_data.x_rest[-1]  # any sentinel row

    def pad_vec(a, fill_sent):
        if a is None:
            return None
        rem = Vp - int(a.shape[0])
        if rem > 0:
            fill = sent_rows if fill_sent else jnp.zeros(3, a.dtype)
            a = _pad_rows(a, rem, fill)
        return jax.device_put(a, elem2)

    def pad_scalar(a):
        return jax.device_put(jnp.asarray(a), repl)

    return _dc_replace(
        state,
        x=pad_vec(state.x, True),
        x_prev=pad_vec(state.x_prev, True),
        v=pad_vec(state.v, False),
        a=pad_vec(state.a, False),
        t=pad_scalar(state.t),
        step=pad_scalar(state.step),
        dx_el=pad_vec(state.dx_el, False),
    )


def replicate(tree, device_mesh: Mesh):
    repl = NamedSharding(device_mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), tree)


def shard_report(mesh_data: MeshData, state=None):
    """Per-device shard sizes of the big arrays (bytes) — evidence that
    persistent state is distributed, printed by dryrun_multichip."""
    rows = []

    def rec(name, a):
        if a is None:
            return
        try:
            shard = a.addressable_shards[0]
            rows.append((name, a.nbytes, shard.data.nbytes))
        except Exception:
            rows.append((name, getattr(a, "nbytes", -1), -1))

    for k in ("x_rest", "tets", "rest_inv", "mass", "surf_tris", "surf_edges",
              "surf_verts", "dbc_mask"):
        rec(f"mesh.{k}", getattr(mesh_data, k))
    if state is not None:
        for k in ("x", "x_prev", "v", "a"):
            rec(f"state.{k}", getattr(state, k))
    return rows
