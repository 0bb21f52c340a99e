"""Sharding plans: scale the solver across chips over ICI.

The reference's only parallelism is shared-memory TBB loops
(reference: SURVEY.md §2.3; e.g. Energy.cpp:253-331, SpatialHash.hpp:68-148)
— there is no distributed backend to port. The TPU-native scaling story is
SPMD over a `jax.sharding.Mesh`:

  * element-parallel ("elem" axis): tets, per-tet feature arrays, and
    contact-candidate tensors are sharded along their leading axis;
    vertex-state arrays (x, v, mass, ...) stay replicated. Every gather
    x[tets] is then local; every scatter-add back to vertices becomes a
    partial sum that XLA finishes with one psum over the axis — exactly
    the segment-sum-over-ICI design SURVEY.md §2.3 calls for. The PCG
    operator does one psum per iteration; ACCD/line-search reductions are
    single-scalar psums.

This module only *places* data; the solver code is sharding-oblivious —
XLA's SPMD partitioner propagates the placements through jit. For scenes
beyond replicated-vertex capacity, the next axis is vertex sharding with
halo exchange (future work; the mesh builder already exposes component
ranges to make contiguous partitions cheap).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ipc_tpu.mesh import MeshData

__all__ = ["make_mesh", "shard_mesh_data", "replicate"]


def make_mesh(n_devices=None, axis="elem", devices=None):
    """A 1-D device mesh over the first n devices."""
    devs = devices if devices is not None else jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devs), (axis,))


def _pad_to(arr, mult):
    """Pad a leading axis to a multiple of `mult` (padding rows reference
    vertex 0 with zero volume/mass weight, so they are inert)."""
    import jax.numpy as jnp

    n = arr.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return arr
    pad = jnp.zeros((rem,) + arr.shape[1:], arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


def shard_mesh_data(mesh_data: MeshData, device_mesh: Mesh, axis="elem"):
    """Place per-element arrays sharded along the device axis, vertex arrays
    replicated. Tet counts are padded to a multiple of the axis size with
    zero-volume dummy tets (vertex 0 stencils — mathematically inert)."""
    n = device_mesh.shape[axis]
    elem = NamedSharding(device_mesh, P(axis))
    repl = NamedSharding(device_mesh, P())

    def put(a, sh):
        return jax.device_put(a, sh)

    # Zero-padded dummy tets are inert: rest_inv 0 -> F = 0 (flip-SVD is
    # degenerate-safe), vol 0 -> zero energy/grad/Hess, and the injective
    # step bound returns +inf for the all-zero cubic. Surface primitives are
    # NOT padded/sharded (a dummy triangle would pollute broad-phase
    # candidates); contact tensors stay replicated — elasticity carries the
    # FLOPs at scale.
    tets = _pad_to(mesh_data.tets, n)
    rest_inv = _pad_to(mesh_data.rest_inv, n)
    vol = _pad_to(mesh_data.vol, n)
    mu = _pad_to(mesh_data.mu, n)
    lam = _pad_to(mesh_data.lam, n)

    return MeshData(
        x_rest=put(mesh_data.x_rest, repl),
        tets=put(tets, elem),
        rest_inv=put(rest_inv, elem),
        vol=put(vol, elem),
        mass=put(mesh_data.mass, repl),
        mu=put(mu, elem),
        lam=put(lam, elem),
        surf_tris=put(mesh_data.surf_tris, repl),
        surf_edges=put(mesh_data.surf_edges, repl),
        surf_verts=put(mesh_data.surf_verts, repl),
        dbc_mask=put(mesh_data.dbc_mask, repl),
        vert_comp=put(mesh_data.vert_comp, repl),
    )


def replicate(tree, device_mesh: Mesh):
    repl = NamedSharding(device_mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), tree)
