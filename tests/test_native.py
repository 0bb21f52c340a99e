"""Native C++ runtime tests: parity with the pure-Python paths."""

import numpy as np
import pytest

from ipc_tpu import native
from ipc_tpu.io_mesh import read_msh, write_msh
from ipc_tpu.mesh import _boundary_faces
from ipc_tpu.models.primitives import cube, mat

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_parse_msh_matches_python(tmp_path):
    V, T = cube(2)
    p = str(tmp_path / "m.msh")
    write_msh(p, V, T)
    Vn, Tn = native.parse_msh(p)
    Vp, Tp = read_msh(p)
    np.testing.assert_allclose(Vn, Vp)
    np.testing.assert_array_equal(Tn, Tp)


def test_boundary_faces_matches_python():
    V, T = cube(3)
    Fp = _boundary_faces(np.asarray(T, np.int64))
    Fn = native.boundary_faces(T)
    # same face set (orientation preserved), order may differ
    key = lambda F: set(map(tuple, np.sort(F, axis=1)))
    assert key(Fn) == key(Fp)
    assert len(Fn) == len(Fp)
    # orientation: each native face must appear exactly in the python set
    assert set(map(tuple, Fn)) == set(map(tuple, Fp))


def test_grid_candidates_finds_close_pairs():
    rng = np.random.default_rng(0)
    # two point clouds: A points, B triangles from a mat
    V, T = mat(6)
    X = np.asarray(V)
    F = _boundary_faces(np.asarray(T, np.int64)).astype(np.int32)
    pts = np.arange(len(X), dtype=np.int32)[:, None]
    gap = 0.05
    pairs, total = native.grid_candidates(X, pts, F, cell_size=0.2, gap=gap, cap=200000)
    assert total == len(pairs)
    # brute-force reference: inflated point AABB vs inflated tri AABB
    lo = X[F].min(axis=1) - gap
    hi = X[F].max(axis=1) + gap
    expect = set()
    for i in range(len(X)):
        pmin, pmax = X[i] - gap, X[i] + gap
        overlap = np.all(pmin[None, :] <= hi, axis=1) & np.all(lo <= pmax[None, :], axis=1)
        for j in np.nonzero(overlap)[0]:
            if i in F[j]:
                continue
            expect.add((i, int(j)))
    got = set(map(tuple, np.asarray(pairs, dtype=int)))
    assert got == expect


def test_grid_candidates_ee_upper_only():
    V, T = cube(2)
    X = np.asarray(V)
    from ipc_tpu.mesh import build_mesh

    mesh, _ = build_mesh(V, T)
    E = np.asarray(mesh.surf_edges, np.int32)
    pairs, total = native.grid_candidates(
        X, E, E, cell_size=0.5, gap=0.01, upper_only=True, cap=100000
    )
    assert total == len(pairs)
    assert np.all(pairs[:, 0] < pairs[:, 1])
    # no shared-vertex pairs
    for a, b in pairs[:200]:
        assert len(set(E[a]) & set(E[b])) == 0
