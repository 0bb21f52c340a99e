"""Device-side script state: turning rules, ACO moving planes, and the
moving-DBC augmented Lagrangian all run INSIDE the fully-jitted step
(SimState.aux carries the AnimScripter state the host path keeps in
Python; reference AnimScripter.cpp:1556-1890 turning/ACO, Optimizer.cpp:
2168-2203 MDBC AL)."""

import numpy as np
import pytest

from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.jit_step import initial_device_aux, make_jit_step
from ipc_tpu.mesh import build_mesh
from ipc_tpu.models.primitives import cube
from ipc_tpu.scripting import DBCGroup, Script, TurningRule
from ipc_tpu.timestepper import IPCStepper, SimParams


def _aux_state(st):
    import dataclasses

    state = st.initial_state()
    return dataclasses.replace(state, aux=initial_device_aux(st))


def _turning_scene():
    """Free-floating cube, top face DBC moving down with a flip_band rule:
    velocity reverses when the watched vertex leaves [y0-0.1, y0+10]."""
    V, T = cube(1)
    top = np.where(V[:, 1] > 0.999)[0]
    tp = int(top[0])
    script = Script(
        n_verts=len(V),
        dbc_groups=[DBCGroup(verts=top, linear_vel=np.array([0.0, -1.0, 0.0]))],
        turning=[
            TurningRule(vert=tp, axis=1, lo=V[tp, 1] - 0.1, hi=V[tp, 1] + 10.0,
                        action="flip_band", group_ids=(0,))
        ],
    )
    mesh, meta = build_mesh(V, T, dbc_mask=script.dbc_mask())
    return IPCStepper(
        mesh, meta, SimParams(gravity=(0, 0, 0)), script=script
    ), script, tp


def test_jit_turning_matches_host():
    """The traced turning rule flips the group velocity at the same steps
    the host's stateful rule does (DBC trajectories identical)."""
    st, script, tp = _turning_scene()
    # host path (mutates script state in Python)
    sh = st.initial_state()
    for _ in range(8):
        sh, _ = st.step(sh)
    xh = np.asarray(sh.x)

    # fresh scene (the host run consumed the TurningRule.active flags)
    st2, script2, _ = _turning_scene()
    step = make_jit_step(st2, donate=False)
    sj = _aux_state(st2)
    for _ in range(8):
        sj, jstats = step(sj)
    xj = np.asarray(sj.x)
    # DBC rows follow the identical scripted trajectory incl. the flip;
    # with dt=0.025 and the 0.1 band the flip fires at the step-5 rule
    # evaluation (y = 0.9 <= lo), after which the face climbs back
    dbc = script.dbc_mask()
    np.testing.assert_allclose(xj[dbc], xh[dbc], atol=1e-8)
    # free vertices agree within the Newton tolerance ball (the two paths
    # use different warm starts, same convergence criterion)
    np.testing.assert_allclose(xj, xh, atol=5e-3)
    # the rule actually fired: without it 8 steps at -1*0.025 would leave
    # the watched vertex at y0 - 0.2; with the flip at step 5 it returns
    # to y0 (4 down, flip, 4 up)
    y0 = 1.0
    np.testing.assert_allclose(xj[tp, 1], y0, atol=1e-8)


@pytest.mark.slow
def test_jit_aco_squash_matches_host():
    """ACO moving planes: traced plane origins/velocities advance exactly
    like the host's _step_aco (same CCD-clamped moves, same flips)."""
    V, T = cube(1)
    script = Script(
        n_verts=len(V),
        aco_kind="squash",
        aco_vel=np.array([[1.0, 0, 0], [-1.0, 0, 0]]),
    )
    planes = [
        HalfSpaceParams(origin=(-0.3, 0.0, 0.0), normal=(1.0, 0.0, 0.0)),
        HalfSpaceParams(origin=(1.3, 0.0, 0.0), normal=(-1.0, 0.0, 0.0)),
    ]

    def fresh():
        mesh, meta = build_mesh(V, T)
        return IPCStepper(
            mesh, meta, SimParams(gravity=(0, 0, 0)),
            halfspaces=[HalfSpace(p) for p in planes],
            script=Script(
                n_verts=len(V), aco_kind="squash",
                aco_vel=np.array([[1.0, 0, 0], [-1.0, 0, 0]]),
            ),
        )

    st_h = fresh()
    assert st_h.hs_moving
    sh = st_h.initial_state()
    for _ in range(6):
        sh, _ = st_h.step(sh)
    xh = np.asarray(sh.x)
    orig_h = np.asarray(st_h.hs_origin)

    st_j = fresh()
    step = make_jit_step(st_j, donate=False)
    sj = _aux_state(st_j)
    for _ in range(6):
        sj, jstats = step(sj)
    xj = np.asarray(sj.x)
    orig_j = np.asarray(sj.aux["hs_origin"])
    # plane trajectories identical (pure scripted kinematics, both clamped
    # against the same surface vertices)
    np.testing.assert_allclose(orig_j, orig_h, atol=1e-6)
    # the planes moved toward each other
    assert orig_j[0, 0] > -0.3 + 0.1 and orig_j[1, 0] < 1.3 - 0.1
    # deformable response agrees to solver tolerance
    np.testing.assert_allclose(xj, xh, atol=5e-3)
    assert np.isfinite(xj).all()


@pytest.mark.slow
def test_jit_al_blocked_press():
    """The device AL episode: a scripted press blocked by contact completes
    its motion through the in-carry augmented Lagrangian (mirror of the
    host test in test_mdbc_al.py)."""
    from tests.test_mdbc_al import _press_scene

    st, script, n1 = _press_scene()
    step = make_jit_step(st, donate=False)
    state = _aux_state(st)
    y_press0 = float(np.asarray(state.x)[n1:, 1].min())
    al_total = 0
    for _ in range(3):
        state, jstats = step(state)
        al_total += int(jstats.al_iters)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # the AL actually ran (CCD-clamped move cannot complete into the gap)
    assert al_total > 0
    # the press moved down substantially more than the CCD-clamped gap
    y_press = x[n1:, 1].min()
    assert y_press < y_press0 - 0.02, (y_press, y_press0)
    # the soft cube is squeezed
    assert x[:n1, 1].max() < 1.006
    # invariants: no intersection, no ground penetration
    hit, _ = st._has_intersection(state.x)
    assert not bool(hit)
    assert x[:, 1].min() > 0.0
