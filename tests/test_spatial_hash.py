"""Spatial-hash broad phase: exact parity with the dense O(N^2) reference
path, and end-to-end equivalence through the solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipc_tpu.contact import broadphase as BP
from ipc_tpu.contact import spatial_hash as SH
from ipc_tpu.mesh import build_mesh, merge_meshes
from ipc_tpu.models.primitives import cube, mat


def _pairset(pairs):
    p = np.asarray(pairs)
    return set(map(tuple, p[p[:, 0] >= 0]))


def _scene():
    V1, T1 = mat(5)
    V2, T2 = mat(5)
    V2 = V2 + np.array([0.013, 0.21, 0.017])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    return build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)


@pytest.mark.parametrize("gap", [0.0, 0.02, 0.05])
def test_pt_parity(gap):
    # realistic gaps: sqrt(dHat) is ~1e-3 of the scene diagonal; huge gaps
    # degenerate the grid to a few cells (bucket overflow -> K growth path)
    mesh, meta = _scene()
    x = mesh.x_rest
    cap = 400000
    dense, nd = BP.pt_candidates(x, mesh.surf_verts, mesh.surf_tris, mesh.dbc_mask, cap, None, gap)
    grid, ng, ov = SH.pt_candidates(x, mesh.surf_verts, mesh.surf_tris, mesh.dbc_mask, cap, None, gap, K=256)
    assert int(ov) <= 256, "bucket overflow in test"
    assert _pairset(dense) == _pairset(grid)
    assert int(nd) == int(ng)


@pytest.mark.parametrize("gap", [0.0, 0.05])
def test_ee_parity(gap):
    mesh, meta = _scene()
    x = mesh.x_rest
    cap = 600000
    dense, nd = BP.ee_candidates(x, mesh.surf_edges, mesh.dbc_mask, cap, None, gap)
    grid, ng, ov = SH.ee_candidates(x, mesh.surf_edges, mesh.dbc_mask, cap, None, gap, K=256)
    assert int(ov) <= 256
    assert _pairset(dense) == _pairset(grid)


def test_et_parity_with_sweep():
    mesh, meta = _scene()
    x = mesh.x_rest
    rng = np.random.default_rng(0)
    disp = jnp.asarray(rng.uniform(-0.05, 0.05, x.shape))
    cap = 600000
    dense, nd = BP.et_candidates(x, mesh.surf_edges, mesh.surf_tris, cap, disp, 0.01, mesh.dbc_mask)
    grid, ng, ov = SH.et_candidates(x, mesh.surf_edges, mesh.surf_tris, cap, disp, 0.01, mesh.dbc_mask, K=256)
    assert int(ov) <= 256
    assert _pairset(dense) == _pairset(grid)


def test_chunked_query_matches_single_shot():
    """The query-axis-tiled path (what reference-scale scenes hit) must
    return exactly the same pair SET and count as the single-shot path."""
    mesh, meta = _scene()
    x = mesh.x_rest
    cap = 400000
    gap = 0.03
    K = 64
    vb = BP.vert_aabbs(x, mesh.surf_verts, None, gap)
    tb = BP.tri_aabbs(x, mesh.surf_tris, None, gap)
    geom = SH.grid_geometry(vb, tb)
    grid = SH.build_grid(tb, SH._default_H(tb.shape[0]), K, geom=geom,
                         extra=SH._tri_extra(mesh.surf_tris, mesh.dbc_mask))
    vfn = SH._pt_valid(mesh.surf_verts, mesh.dbc_mask)
    one, n_one, ov_one = SH.query_pairs(grid, vb, vfn, cap)
    # tiny tile budget forces many tiles (QB = 256 floor)
    tiled, n_tiled, ov_tiled = SH.query_pairs(grid, vb, vfn, cap, tile_elems=1)
    assert int(n_one) == int(n_tiled)
    assert _pairset(one) == _pairset(tiled)
    assert int(ov_one) == int(ov_tiled)


@pytest.mark.slow
def test_grid_solver_equivalence():
    """A contact-rich scene stepped with dense vs grid broad phase must
    produce identical trajectories (the candidate SETS are identical; the
    energy is a sum over them, so order differences cannot matter beyond
    float association — compare loosely)."""
    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.contact.pipeline import SelfContact
    from ipc_tpu.timestepper import IPCStepper, SimParams

    V1, T1 = cube(1)
    V1 = V1 + np.array([0.0, 0.002, 0.0])
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.0, 1.1, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    xs = {}
    for bp in ("dense", "grid"):
        mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
        hs = HalfSpace(HalfSpaceParams(friction=0.1))
        sc = SelfContact(mesh, meta, friction=0.1, broadphase=bp)
        st = IPCStepper(mesh, meta, SimParams(), halfspaces=[hs], self_contact=sc)
        state = st.initial_state()
        for _ in range(12):
            state, _ = st.step(state)
        xs[bp] = np.asarray(state.x)
    np.testing.assert_allclose(xs["dense"], xs["grid"], atol=1e-8)
