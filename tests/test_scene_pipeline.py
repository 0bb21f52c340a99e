"""Scene pipeline tests: config DSL parsing, scene assembly, MeshCO,
scripted DBC motion (twist), checkpoint/restart, and the CLI-level run."""

import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ipc_tpu.config import load_config
from ipc_tpu.io_mesh import write_msh, write_obj, read_msh
from ipc_tpu.mesh import append_kinematic_surface, build_mesh
from ipc_tpu.models.primitives import cube, mat
from ipc_tpu.contact.pipeline import SelfContact
from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.scripting import build_script
from ipc_tpu.timestepper import IPCStepper, SimParams
from ipc_tpu.sim import Simulation
from ipc_tpu.utils.observability import load_status, save_status

pytestmark = pytest.mark.slow  # minutes-long e2e solver runs


def _write_cube_msh(tmp_path):
    V, T = cube(1)
    p = os.path.join(tmp_path, "cube.msh")
    write_msh(p, V, T)
    return p


class TestConfig:
    def test_parse_tutorial_style(self, tmp_path):
        cube_path = _write_cube_msh(str(tmp_path))
        scene = tmp_path / "scene.txt"
        scene.write_text(
            f"""energy FCR
time 2 0.01
density 800
stiffness 2e5 0.35
shapes input 2
{cube_path} 0 3 0  0 0 0  1 1 1
{cube_path} 0 1 0  0 45 0  2 1 1  material 500 1e6 0.3  initVel 0 -1 0 0 0 0

selfFric 0.15
ground 0.1 0
dHat 5e-3
fricIterAmt 4
"""
        )
        cfg = load_config(str(scene))
        assert cfg.energy == "FCR"
        assert cfg.dt == 0.01 and cfg.duration == 2
        assert cfg.rho == 800 and cfg.ym == 2e5 and cfg.pr == 0.35
        assert len(cfg.shapes) == 2
        s2 = cfg.shapes[1]
        assert s2.material == (500, 1e6, 0.3)
        np.testing.assert_allclose(s2.scale, [2, 1, 1])
        np.testing.assert_allclose(s2.init_lvel, [0, -1, 0])
        # 45 deg rotation about y
        np.testing.assert_allclose(s2.rotate[0, 0], math.cos(math.radians(45)))
        assert cfg.self_fric == 0.15
        assert len(cfg.halfspaces) == 1 and cfg.halfspaces[0].friction == 0.1
        assert cfg.dhat == 5e-3
        assert cfg.fric_iter_amt == 4

    def test_parse_dbc_nbc(self, tmp_path):
        cube_path = _write_cube_msh(str(tmp_path))
        scene = tmp_path / "scene.txt"
        scene.write_text(
            f"""shapes input 1
{cube_path} 0 0 0  0 0 0  1 1 1  DBC 0 0 0 1 0.1 1  0 0 0  0 0 0  NBC 0 0.9 0 1 1 1  0 10 0 0.5 1.5
"""
        )
        cfg = load_config(str(scene))
        s = cfg.shapes[0]
        assert len(s.dbc) == 1 and len(s.nbc) == 1
        np.testing.assert_allclose(s.dbc[0].bbox_max, [1, 0.1, 1])
        np.testing.assert_allclose(s.nbc[0].force, [0, 10, 0])
        assert s.nbc[0].time_range == (0.5, 1.5)

    def test_simulation_from_config_runs(self, tmp_path):
        cube_path = _write_cube_msh(str(tmp_path))
        scene = tmp_path / "scene.txt"
        scene.write_text(
            f"""time 1 0.025
shapes input 1
{cube_path} 0 0.5 0  0 0 0  1 1 1

ground 0.1 0
"""
        )
        cfg = load_config(str(scene))
        sim = Simulation(cfg)
        out = str(tmp_path / "out")
        state = sim.run(out, n_steps=5, save_every=5)
        assert int(state.step) == 5
        assert os.path.exists(os.path.join(out, "iterStats.txt"))
        assert os.path.exists(os.path.join(out, "status5.npz"))
        assert float(state.x[:, 1].min()) > 0.0


class TestSizeNormalization:
    def test_size_and_rotate_cover_codim_shapes(self, tmp_path):
        """`size` / rotateModel must transform the WHOLE scene — volumetric
        AND codimensional (obj) shapes — with the extent computed over both
        (reference appends codim shapes into V before the rotate/size block,
        main.cpp:948-1014 then :1116-1146)."""
        from ipc_tpu.sim import assemble

        cube_path = _write_cube_msh(str(tmp_path))
        V, T = cube(1)
        from ipc_tpu.mesh import _boundary_faces

        obj_path = os.path.join(str(tmp_path), "plate.obj")
        write_obj(obj_path, V, _boundary_faces(np.asarray(T, np.int64)))
        scene = tmp_path / "scene.txt"
        scene.write_text(
            f"""energy FCR
size 10
rotateModel 0 0 1 90
time 1 0.01
density 1000
stiffness 1e5 0.3
script null
shapes input 2
{cube_path} 0 0 0  0 0 0  1 1 1
{obj_path} 4 0 0  0 0 0  1 1 1
"""
        )
        cfg = load_config(str(scene))
        mesh, meta, script = assemble(cfg, dtype=np.float64)
        x = np.asarray(mesh.x_rest)
        ext = x.max(axis=0) - x.min(axis=0)
        # full-scene max extent normalized to `size`, min corner at origin
        np.testing.assert_allclose(ext.max(), 10.0, rtol=1e-12)
        np.testing.assert_allclose(x.min(axis=0), 0.0, atol=1e-12)
        # pre-transform the codim plate sits 4 units +x of the cube; after a
        # 90° z-rotation that offset points +y; scale = 10/5 (full extent 5
        # along x: cube [0,1] + plate [4,5]) so the plate center must sit
        # 8 units ABOVE the cube center in y and match in x
        nvol = 8  # cube verts
        c_vol = x[:nvol].mean(axis=0)
        c_codim = x[nvol:].mean(axis=0)
        np.testing.assert_allclose(c_codim[1] - c_vol[1], 8.0, atol=1e-9)
        np.testing.assert_allclose(c_codim[0], c_vol[0], atol=1e-9)


class TestMeshCO:
    def test_cube_rests_on_kinematic_plate(self, tmp_path):
        # deformable cube dropped onto a kinematic triangulated plate
        V, T = cube(1)
        V = V + np.array([0.1, 0.3, 0.1])
        mesh, meta = build_mesh(V, T)
        # plate: 2x2 quad grid of triangles at y=0, bigger than the cube
        gx, gz = np.meshgrid(np.linspace(-1, 2, 4), np.linspace(-1, 2, 4))
        Vp = np.stack([gx.ravel(), np.zeros(16), gz.ravel()], axis=1)
        tris = []
        for i in range(3):
            for j in range(3):
                a = i * 4 + j
                tris += [[a, a + 1, a + 4], [a + 1, a + 5, a + 4]]
        mesh, meta, rng = append_kinematic_surface(mesh, meta, Vp, np.array(tris))
        vert_mu = jnp.zeros(meta.n_verts).at[rng[0] : rng[1]].set(0.2)
        sc = SelfContact(mesh, meta, friction=0.0, vert_mu=vert_mu)
        st = IPCStepper(mesh, meta, SimParams(), halfspaces=[], self_contact=sc)
        state = st.initial_state()
        for i in range(25):
            state, stats = st.step(state)
            ymin_cube = float(state.x[: len(V), 1].min())
            assert ymin_cube > 0.0, f"penetrated plate at step {i}"
        # resting on the plate inside the barrier band
        assert ymin_cube < np.sqrt(st.dHat) * 2
        # plate didn't move
        np.testing.assert_allclose(
            np.asarray(state.x[rng[0] : rng[1]]), Vp, atol=1e-12
        )


class TestScriptedMotion:
    def test_twist_handles_rotate(self):
        V, T = mat(4, size=1.0)
        mesh0, meta0 = build_mesh(V, T)
        surface_mask = np.zeros(len(V), bool)
        surface_mask[np.asarray(mesh0.surf_verts)] = True
        script = build_script("twist", V, surface_mask, [(0, len(V))], handle_ratio=0.11)
        assert script.has_motion()
        dbc = script.dbc_mask()
        assert dbc.any()
        mesh, meta = build_mesh(V, T, dbc_mask=dbc)
        st = IPCStepper(mesh, meta, SimParams(gravity=(0, 0, 0)), script=script)
        state = st.initial_state()
        x0 = np.asarray(state.x)
        for _ in range(4):
            state, stats = st.step(state)
        x = np.asarray(state.x)
        # handle verts rotated about the x-axis: their yz moved, x unchanged
        hv = script.handles[0].verts
        assert np.abs(x[hv][:, 1:] - x0[hv][:, 1:]).max() > 1e-3
        np.testing.assert_allclose(x[hv][:, 0], x0[hv][:, 0], atol=1e-12)
        # free interior followed (deformed)
        free = ~dbc
        assert np.abs(x[free] - x0[free]).max() > 1e-4

    def test_dbc_time_range_gates_motion(self):
        V, T = cube(1)
        mesh0, meta0 = build_mesh(V, T)
        surface_mask = np.ones(len(V), bool)
        from ipc_tpu.config import ShapeSpec, DBCSpec

        spec = ShapeSpec(path="", dbc=[DBCSpec(
            np.zeros(3), np.ones(3), np.array([1.0, 0, 0]), np.zeros(3),
            (0.0, 0.05),  # active for only the first two 0.025 steps
        )])
        script = build_script("null", V, surface_mask, [(0, len(V))], shape_specs=[spec])
        mesh, meta = build_mesh(V, T, dbc_mask=script.dbc_mask())
        st = IPCStepper(mesh, meta, SimParams(gravity=(0, 0, 0)), script=script)
        state = st.initial_state()
        for _ in range(4):
            state, _ = st.step(state)
        x = np.asarray(state.x)
        # moved only during [0, 0.05): 2 steps * 0.025 * 1.0 = 0.05
        np.testing.assert_allclose(x[:, 0] - np.asarray(V)[:, 0], 0.05, atol=1e-9)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        V, T = cube(1)
        V = V + np.array([0.0, 0.5, 0.0])
        mesh, meta = build_mesh(V, T)
        hs = HalfSpace(HalfSpaceParams(friction=0.1))
        st = IPCStepper(mesh, meta, SimParams(), halfspaces=[hs])
        state = st.initial_state()
        for _ in range(8):
            state, _ = st.step(state)
        p = str(tmp_path / "status.npz")
        save_status(p, state, 8)
        restored = load_status(p, st)
        np.testing.assert_allclose(np.asarray(restored.x), np.asarray(state.x))
        np.testing.assert_allclose(np.asarray(restored.v), np.asarray(state.v))
        assert int(restored.step) == 8
        # continue stepping from the restore
        s1, _ = st.step(state)
        s2, _ = st.step(restored)
        np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=1e-12)


class TestIO:
    def test_msh_roundtrip(self, tmp_path):
        V, T = cube(2)
        p = str(tmp_path / "m.msh")
        write_msh(p, V, T)
        V2, T2 = read_msh(p)
        np.testing.assert_allclose(V2, V)
        np.testing.assert_array_equal(T2, T)
