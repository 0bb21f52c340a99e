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


# ---------------------------------------------------------------------------
# oversized-primitive (dense big-prim) path
# ---------------------------------------------------------------------------


def _eeset(pairs):
    p = np.asarray(pairs)
    return set(frozenset(r) for r in p[p[:, 0] >= 0])


def _big_arrays():
    """The mat scene plus a giant kinematic quad just beneath it (the
    1_squeezeOut plane.obj failure class: obstacle extent >> deformable
    edge length inflates the shared grid cell until one bucket holds most
    primitives)."""
    mesh, meta = _scene()
    x = np.asarray(mesh.x_rest)
    n0 = x.shape[0]
    lo, hi = x.min(0), x.max(0)
    c = (lo + hi) / 2
    span = 50.0 * float((hi - lo).max())
    y = float(lo[1]) - 0.005
    quad = np.array(
        [
            [c[0] - span, y, c[2] - span],
            [c[0] + span, y, c[2] - span],
            [c[0] + span, y, c[2] + span],
            [c[0] - span, y, c[2] + span],
        ]
    )
    xx = np.vstack([x, quad])
    qt = np.array([[n0, n0 + 1, n0 + 2], [n0, n0 + 2, n0 + 3]])
    qe = np.array(
        [[n0, n0 + 1], [n0 + 1, n0 + 2], [n0 + 2, n0 + 3],
         [n0 + 3, n0], [n0, n0 + 2]]
    )
    sv = np.concatenate([np.asarray(mesh.surf_verts), np.arange(n0, n0 + 4)])
    st = np.vstack([np.asarray(mesh.surf_tris), qt])
    se = np.vstack([np.asarray(mesh.surf_edges), qe])
    dbc = np.zeros(n0 + 4, bool)
    dbc[n0:] = True
    nS, nE = st.shape[0], se.shape[0]
    big = dict(
        tri_ids=jnp.asarray(np.arange(nS - 2, nS, dtype=np.int32)),
        tri_mask=jnp.asarray(np.arange(nS) >= nS - 2),
        edge_ids=jnp.asarray(np.arange(nE - 5, nE, dtype=np.int32)),
        edge_mask=jnp.asarray(np.arange(nE) >= nE - 5),
    )
    return (
        jnp.asarray(xx), jnp.asarray(sv), jnp.asarray(se), jnp.asarray(st),
        jnp.asarray(dbc), big,
    )


@pytest.mark.parametrize("disp_seed", [None, 1])
def test_big_prim_dense_parity(disp_seed):
    """fused_candidates with the big-prim dense path == the dense O(N^2)
    oracle on the SAME combined arrays, and the grid's bucket occupancy
    stays small (the fix's whole point)."""
    x, sv, se, st, dbc, big = _big_arrays()
    disp = None
    if disp_seed is not None:
        rng = np.random.default_rng(disp_seed)
        disp = jnp.asarray(rng.uniform(-0.03, 0.03, x.shape))
    gap = 0.03
    cap = 400000
    fused = SH.fused_candidates(
        x, sv, se, st, dbc, cap, cap, cap, disp, gap, K=256, big=big
    )
    d_pt, n_pt = BP.pt_candidates(x, sv, st, dbc, cap, disp, gap)
    d_ee, n_ee = BP.ee_candidates(x, se, dbc, cap, disp, gap)
    d_et, n_et = BP.et_candidates(x, se, st, cap, disp, gap, dbc)
    assert _pairset(fused["pt"][0]) == _pairset(d_pt)
    assert int(fused["pt"][1]) == int(n_pt)
    assert _eeset(fused["ee"][0]) == _eeset(d_ee)
    assert int(fused["ee"][1]) == int(n_ee)
    assert _pairset(fused["et"][0]) == _pairset(d_et)
    assert int(fused["et"][1]) == int(n_et)
    # the quad must actually produce contact candidates for this test to
    # mean anything, and excluding it must keep the buckets shallow
    assert int(n_pt) > 0 and int(n_et) > 0
    assert int(fused["overflow"]) <= 256


def test_big_prim_et_candidates_parity():
    x, sv, se, st, dbc, big = _big_arrays()
    cap = 400000
    rng = np.random.default_rng(3)
    disp = jnp.asarray(rng.uniform(-0.02, 0.02, x.shape))
    d_et, n_et = BP.et_candidates(x, se, st, cap, disp, 0.02, dbc)
    # K=256 as in the other parity tests: at K=64 the per-query-row slot
    # cap overflows on this dense scene (production detects that via the
    # overflow channel and regrows; parity tests want the lossless regime)
    g_et, ng, ov = SH.et_candidates(x, se, st, cap, disp, 0.02, dbc, K=256,
                                    big=big)
    assert _pairset(g_et) == _pairset(d_et)
    assert int(ng) == int(n_et)
    assert int(ov) <= 256


def test_classify_big():
    """SelfContact's static classification: None on uniform scenes, the
    obstacle prims on mixed ones (positive selection exercised against
    the quad-augmented arrays, ids/mask consistency included)."""
    from types import SimpleNamespace

    from ipc_tpu.contact.pipeline import SelfContact

    mesh, meta = _scene()
    sc = SelfContact(mesh, meta, broadphase="grid")
    assert sc.big is None

    # mixed scene: the giant kinematic quad's prims — and only those —
    # must classify as big, regardless of how many there are relative to
    # the deformable population (the median is taken deformable-only)
    x, sv, se, st, dbc, expect = _big_arrays()
    aug = SimpleNamespace(
        x_rest=x, surf_verts=sv, surf_edges=se, surf_tris=st, dbc_mask=dbc
    )
    big = SelfContact._classify_big(sc, aug)
    assert big is not None
    assert np.array_equal(np.asarray(big["tri_ids"]),
                          np.asarray(expect["tri_ids"]))
    assert np.array_equal(np.asarray(big["edge_ids"]),
                          np.asarray(expect["edge_ids"]))
    for kind in ("tri", "edge"):
        ids = np.asarray(big[kind + "_ids"])
        mask = np.asarray(big[kind + "_mask"])
        assert mask.sum() == ids.size and mask[ids].all()


# ---------------------------------------------------------------------------
# co-moving-frame sweep (common translation invariance)
# ---------------------------------------------------------------------------


def test_comoving_sweep_invariance():
    """SelfContact candidates are unchanged when a common translation is
    added to the sweep displacement (pairwise swept proximity only depends
    on relative motion), and a pure rigid fall produces the same candidate
    set as no sweep at all — the 12_matOnBoard grid blow-up class."""
    from ipc_tpu.contact.pipeline import SelfContact

    mesh, meta = _scene()
    sc = SelfContact(mesh, meta, broadphase="grid")
    x = mesh.x_rest
    rng = np.random.default_rng(7)
    disp = jnp.asarray(rng.uniform(-0.02, 0.02, x.shape))
    shift = jnp.asarray([13.0, -4.0, 9.0])

    def key(cand):
        pt = np.asarray(cand.pt_vids)[np.asarray(cand.pt_valid)]
        ee = np.asarray(cand.ee_vids)[np.asarray(cand.ee_valid)]
        return (
            set(map(tuple, pt)),
            set(map(tuple, ee)),
            _pairset(cand.et_pairs[np.asarray(cand.et_valid)]),
        )

    gap = 0.02
    a = key(sc.build_candidates(x, disp, gap))
    b = key(sc.build_candidates(x, disp + shift[None, :], gap))
    assert a == b
    # rigid fall == static build
    fall = jnp.broadcast_to(jnp.asarray([0.0, -50.0, 0.0]), x.shape)
    c = key(sc.build_candidates(x, fall, gap))
    d = key(sc.build_candidates(x, jnp.zeros_like(x), gap))
    assert c == d


def test_nonfinite_boxes_register_nowhere():
    """A NaN-poisoned iterate must not collapse the grid: non-finite boxes
    contribute neither to the cell size nor to any bucket, and non-finite
    query rows emit nothing — so the failure surfaces downstream as
    "non-finite state", not as a fake capacity blow-up (the matOnBoard
    FAIL-record class)."""
    from ipc_tpu.contact.pipeline import SelfContact

    mesh, meta = _scene()
    sc = SelfContact(mesh, meta, broadphase="grid")
    x = mesh.x_rest
    # finite build as reference
    cand0 = sc.build_candidates(x, jnp.zeros_like(x), 0.02)
    assert int(cand0.bucket_overflow) < 80
    # poison ONE vertex -> its prims' boxes go NaN
    xb = jnp.asarray(np.asarray(x))
    xb = xb.at[0].set(jnp.nan)
    cand = sc.build_candidates(xb, jnp.zeros_like(x), 0.02)
    # the grid must not collapse into one bucket
    assert int(cand.bucket_overflow) <= int(cand0.bucket_overflow) + 2
    # fully-NaN sweep: every box non-finite -> empty candidate set
    nan_disp = jnp.full_like(x, jnp.nan)
    cand2 = sc.build_candidates(x, nan_disp, 0.02)
    assert int(cand2.pt_count) == 0 and int(cand2.ee_count) == 0
    assert int(cand2.bucket_overflow) == 0
