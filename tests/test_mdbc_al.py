"""Moving-DBC augmented Lagrangian: a scripted press blocked by contact
switches to the penalty solve and squeezes through without intersecting
(reference m_projectDBC/rho_DBC machinery, Optimizer.cpp:2168-2203 +
AnimScripter.cpp:2284-2360)."""

import pytest
import numpy as np
import jax.numpy as jnp

from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.contact.pipeline import SelfContact
from ipc_tpu.mesh import build_mesh, merge_meshes
from ipc_tpu.models.primitives import cube
from ipc_tpu.scripting import DBCGroup, Script
from ipc_tpu.timestepper import IPCStepper, SimParams


def _press_scene(mdbc_al=True):
    """Free soft cube on the ground; a fully-DBC cube just above it scripted
    to move down 0.05/step into a 0.004 gap -> CCD clamps the scripted move,
    completion < 1, AL must take over."""
    V1, T1 = cube(1)  # free cube [0,1]^3
    V1 = V1 + np.array([0.0, 0.002, 0.0])
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.0, 1.006, 0.0])  # 4mm gap
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    n1 = len(V1)
    press = np.arange(n1, len(V))
    script = Script(
        n_verts=len(V),
        dbc_groups=[DBCGroup(verts=press, linear_vel=np.array([0.0, -2.0, 0.0]))],
    )
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges,
                            dbc_mask=script.dbc_mask())
    hs = HalfSpace(HalfSpaceParams(friction=0.0))
    sc = SelfContact(mesh, meta, friction=0.0)
    st = IPCStepper(
        mesh, meta, SimParams(mdbc_al=mdbc_al), halfspaces=[hs],
        self_contact=sc, script=script,
    )
    return st, script, n1


@pytest.mark.slow
def test_blocked_press_triggers_al_and_squeezes():
    st, script, n1 = _press_scene()
    state = st.initial_state()
    y_press0 = float(np.asarray(state.x)[n1:, 1].min())
    for _ in range(3):
        state, stats = st.step(state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # the press moved down substantially more than the CCD-clamped gap
    y_press = x[n1:, 1].min()
    assert y_press < y_press0 - 0.02, (y_press, y_press0)
    # the soft cube is squeezed (its top pushed below the press bottom start)
    assert x[:n1, 1].max() < 1.006
    # invariants: no intersection, no ground penetration
    hit, _ = st._has_intersection(state.x)
    assert not bool(hit)
    assert x[:, 1].min() > 0.0
    # projection mode restored after the AL episode
    assert bool(np.asarray(st.mesh.dbc_mask).any())


def test_free_motion_skips_al():
    """With nothing in the way the scripted move completes and the AL path
    never triggers (dbc mask unchanged, single sub-solve)."""
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.0, 2.0, 0.0])
    press = np.arange(len(V2))
    script = Script(
        n_verts=len(V2),
        dbc_groups=[DBCGroup(verts=press, linear_vel=np.array([0.0, -0.5, 0.0]))],
    )
    mesh, meta = build_mesh(V2, T2, dbc_mask=script.dbc_mask())
    st = IPCStepper(mesh, meta, SimParams(), script=script)
    state = st.initial_state()
    for _ in range(2):
        state, _ = st.step(state)
    x = np.asarray(state.x)
    np.testing.assert_allclose(
        x[:, 1], np.asarray(V2)[:, 1] + 2 * 0.025 * -0.5, atol=1e-10
    )
