"""Sharded broad phase (spatial_hash.fused_candidates_spmd) parity: the
candidate PAIR SETS emitted on an 8-device mesh must equal the single-chip
fused broad phase exactly — same canonical-cell acceptance, same DBC and
topology exclusions, just partitioned build/query transients.

Runs on the conftest's 8 virtual CPU devices.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipc_tpu.contact import spatial_hash as SH  # noqa: E402
from ipc_tpu.mesh import build_mesh  # noqa: E402
from ipc_tpu.models.primitives import box_grid  # noqa: E402
from ipc_tpu.parallel.sharding import make_mesh, shard_mesh_data  # noqa: E402

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _pair_set(pairs):
    p = np.asarray(pairs)
    return {tuple(r) for r in p[p[:, 0] >= 0]}


def _scene():
    """Two interleaved boxes with some DBC verts — enough surface prims
    that every family (PT/EE/ET) has real candidates."""
    from ipc_tpu.mesh import merge_meshes

    V1, T1 = box_grid(3, 3, 3)
    V2, T2 = box_grid(3, 3, 3)
    V2 = V2 + np.array([0.55, 0.1, 0.07])  # overlapping AABBs, no contact
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
    # pin a corner: exercises the all-DBC pair exclusion
    dbc = np.asarray(mesh.dbc_mask).copy()
    dbc[: len(V1) // 4] = True
    import dataclasses

    mesh = dataclasses.replace(mesh, dbc_mask=jnp.asarray(dbc))
    return mesh, meta


@pytest.mark.slow
def test_spmd_fused_matches_single_chip():
    mesh, meta = _scene()
    dm = make_mesh(8)
    smesh = shard_mesh_data(mesh, dm)

    x = smesh.x_rest  # padded/sharded positions
    gap = 0.05
    caps = dict(cap_pt=4096, cap_ee=8192, cap_et=8192)

    # exact set comparison requires an overflow-free K on BOTH sides: a
    # single-chip build that drops registrations at K would make correct
    # sharded pairs (merged capacity n*K) look like false positives
    K = 64
    ref = SH.fused_candidates(
        x, smesh.surf_verts, smesh.surf_edges, smesh.surf_tris,
        smesh.dbc_mask, gap=gap, K=K, **caps
    )
    assert int(ref["overflow"]) <= K, "raise K: single-chip build overflowed"
    out = SH.fused_candidates_spmd(
        dm, "elem", x, smesh.surf_verts, smesh.surf_edges, smesh.surf_tris,
        smesh.dbc_mask, gap=gap, K=K, **caps
    )
    for fam in ("pt", "ee", "et"):
        rp, rc = ref[fam]
        sp, sc = out[fam]
        assert _pair_set(sp) == _pair_set(rp), fam
        # psum'd true count matches (no imbalance inflation at these sizes
        # means the max-based channel cannot exceed the true count by more
        # than the shard rounding)
        assert int(sc) >= int(rc), fam
        assert len(_pair_set(sp)) == min(int(rc), len(_pair_set(rp)))


@pytest.mark.slow
def test_spmd_fused_swept():
    """Swept (disp != 0) candidates also match — the CCD covering set."""
    mesh, meta = _scene()
    dm = make_mesh(8)
    smesh = shard_mesh_data(mesh, dm)
    x = smesh.x_rest
    rng = np.random.default_rng(3)
    disp = jnp.asarray(
        rng.uniform(-0.08, 0.08, x.shape), x.dtype
    ) * (~smesh.dbc_mask)[:, None]

    caps = dict(cap_pt=8192, cap_ee=16384, cap_et=16384)
    K = 192  # swept boxes crowd buckets: measured occupancy 131 here
    ref = SH.fused_candidates(
        x, smesh.surf_verts, smesh.surf_edges, smesh.surf_tris,
        smesh.dbc_mask, disp=disp, gap=0.03, K=K, **caps
    )
    assert int(ref["overflow"]) <= K, "raise K: single-chip build overflowed"
    out = SH.fused_candidates_spmd(
        dm, "elem", x, smesh.surf_verts, smesh.surf_edges, smesh.surf_tris,
        smesh.dbc_mask, disp=disp, gap=0.03, K=K, **caps
    )
    for fam in ("pt", "ee", "et"):
        assert _pair_set(out[fam][0]) == _pair_set(ref[fam][0]), fam
