"""Headless renderer + GIF writer (the reference's viewer/GIF.hpp role)."""

import os

import numpy as np

from ipc_tpu.utils.render import RunRecorder, render_frame, write_gif


def test_render_frame_and_gif(tmp_path):
    from ipc_tpu.mesh import build_mesh
    from ipc_tpu.models.primitives import cube

    V, T = cube(2)
    mesh, meta = build_mesh(V, T)
    tris = np.asarray(mesh.surf_tris)
    img = render_frame(V, tris, size=128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # the cube must actually appear (not a blank frame)
    assert (img != 255).any()

    rec = RunRecorder(V, tris, size=96)
    for k in range(3):
        rec.add(V + np.array([0.0, -0.05 * k, 0.0]))
    out = tmp_path / "anim.gif"
    rec.save(str(out))
    assert out.exists() and out.stat().st_size > 500


def test_cli_gif(tmp_path):
    import textwrap

    from ipc_tpu.sim import run_scene

    scene = tmp_path / "s.txt"
    scene.write_text(textwrap.dedent("""
        shapes input 1
        /root/reference/input/tetMeshes/cube.msh 0 0.5 0  0 0 0  1 1 1
        time 0.1 0.025
        density 1000
        stiffness 1e5 0.4
        halfSpace  0 0 0  0 1 0  0  0
        constraintSolver interiorPoint
    """))
    run_scene(str(scene), out_dir=str(tmp_path / "out"), n_steps=2, gif=True)
    assert (tmp_path / "out" / "anim.gif").exists()
