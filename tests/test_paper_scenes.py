"""Reference scene scripts run unmodified: tutorial + paper examples
(the reference's example-suite-as-integration-tests pattern, SURVEY §4.5)."""

import os

import numpy as np
import pytest

REF = "/root/reference/input"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference input suite not mounted"
    ),
    pytest.mark.slow,  # minutes-long e2e solver runs
]


def _run(scene, n_steps):
    from ipc_tpu.config import load_config
    from ipc_tpu.sim import Simulation

    cfg = load_config(scene)
    sim = Simulation(cfg)
    state = sim.initial_state()
    for _ in range(n_steps):
        state, stats = sim.stepper.step(state)
    return sim, state


def test_2cubes_fall_tutorial():
    sim, state = _run(f"{REF}/tutorialExamples/2cubesFall.txt", 6)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert x[:, 1].min() > 0.0  # ground at y=0
    # falling under gravity
    assert x[:, 1].min() < 1.0


def test_cube_stack_paper():
    sim, state = _run(f"{REF}/paperExamples/10_cubeStack.txt", 5)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert x[:, 1].min() > 0.5  # halfSpace at y=0.5
    hit, _ = sim.stepper._has_intersection(state.x)
    assert not bool(hit)


def test_roller_scene_dco():
    """Codimensional kinematic shapes + DCO script: rollers rotate, the
    deformable sphere falls, nothing intersects."""
    sim, state = _run("scenes/rollerTest.txt", 3)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    r0 = sim.script.handles[0].verts
    x0 = np.asarray(sim.mesh.x_rest)
    assert np.abs(x[r0] - x0[r0]).max() > 0.02  # rollers moved rigidly
    hit, _ = sim.stepper._has_intersection(state.x)
    assert not bool(hit)


def test_mat20_twist_scene():
    sim, state = _run("scenes/matTwist20.txt", 4)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # twisting: out-of-plane deflection grows
    assert np.abs(x[:, 2]).max() > 0.03


def test_drag_script_shift_excludes_meshco():
    """drag*/x0_transform scripts lift result.V by half the bbox diagonal but
    must NOT move meshCO kinematic geometry (reference AnimScripter
    AST_DRAGRIGHT shifts mesh.V only, AnimScripter.cpp:809-826; MeshCO::V is
    a separate object). Regression: spikePlaneCO's plane was shifted along
    with the spike, producing a false initial-intersection abort."""
    from ipc_tpu.config import load_config
    from ipc_tpu.sim import Simulation

    cfg = load_config(f"{REF}/paperExamples/11_erleben/spikePlaneCO.txt")
    sim = Simulation(cfg)
    state = sim.initial_state()
    x = np.asarray(state.x)
    s0, s1 = sim.mesh_co_ranges[0]
    # the plane.obj meshCO sits exactly where the scene placed it: y = 0.54
    np.testing.assert_allclose(x[s0:s1, 1], 0.54, atol=1e-12)
    # the spike was lifted by half its bbox diagonal (above the plane)
    assert x[:s0, 1].min() > 0.54
    # and the start state passes the reference's initial feasibility check
    sim._check_initial_feasibility(state)
