"""End-to-end slice test: stiff cube drop onto the ground plane — the
analog of the reference's tutorialExamples/2cubesFall smoke scenes
(reduced to one cube per BASELINE.md), checking the IPC invariants:
never any interpenetration, settles inside the barrier band, comes to rest.
"""

import numpy as np
import jax.numpy as jnp

from ipc_tpu.models.primitives import cube
from ipc_tpu.mesh import build_mesh
from ipc_tpu.timestepper import IPCStepper, SimParams
from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams


def test_cube_drop_on_ground():
    V, T = cube(1)
    V = V + np.array([0.0, 0.5, 0.0])
    mesh, meta = build_mesh(V, T)
    hs = HalfSpace(HalfSpaceParams(origin=(0, 0, 0), normal=(0, 1, 0), friction=0.1))
    stepper = IPCStepper(mesh, meta, SimParams(), halfspaces=[hs])
    state = stepper.initial_state()

    ymin_hist = []
    for _ in range(60):
        state, stats = stepper.step(state)
        ymin = float(state.x[:, 1].min())
        ymin_hist.append(ymin)
        # hard IPC invariant: never on/through the plane
        assert ymin > 0.0, f"penetration: ymin={ymin}"

    # settled: inside the barrier band; elastic ringing still decays, so
    # only bound the residual velocity loosely
    dhat_lin = np.sqrt(stepper.dHat)
    assert ymin_hist[-1] < dhat_lin, (ymin_hist[-1], dhat_lin)
    v = np.asarray(state.v)
    assert np.abs(v).max() < 0.5, np.abs(v).max()
    # and it actually fell first
    assert min(ymin_hist) < 0.45


def test_cube_freefall_matches_analytic():
    """Without contact the BE integrator must track the closed-form
    backward-Euler free-fall trajectory exactly (no elasticity excited)."""
    V, T = cube(1)
    V = V + np.array([0.0, 10.0, 0.0])
    mesh, meta = build_mesh(V, T)
    p = SimParams()
    stepper = IPCStepper(mesh, meta, p, halfspaces=[])
    state = stepper.initial_state()
    g = -9.80665
    h = p.dt
    y_c, v_c = 10.0, 0.0
    for _ in range(20):
        state, _ = stepper.step(state)
        # BE: v_{n+1} = v_n + h g ; y_{n+1} = y_n + h v_{n+1}
        v_c = v_c + h * g
        y_c = y_c + h * v_c
    # per-step solve error is bounded by the Newton tolerance (reference
    # practical tol 1e-2 rel) and the inexact-Newton PCG tolerance (1e-2
    # relative); allow their 20-step accumulation
    y_sim = float(state.x[:, 1].min())
    np.testing.assert_allclose(y_sim, y_c, atol=30 * stepper.target_gres)
    np.testing.assert_allclose(float(state.v[0, 1]), v_c, atol=20 * 0.01 * 9.81 * p.dt)


def test_dbc_holds_vertices():
    """DBC-constrained vertices must not move at all."""
    V, T = cube(1)
    V = V + np.array([0.0, 1.0, 0.0])
    dbc = np.zeros(len(V), dtype=bool)
    top = V[:, 1] > 1.9
    dbc[top] = True
    mesh, meta = build_mesh(V, T, dbc_mask=dbc)
    stepper = IPCStepper(mesh, meta, SimParams(), halfspaces=[])
    state = stepper.initial_state()
    x0 = np.asarray(state.x)
    for _ in range(10):
        state, _ = stepper.step(state)
    x = np.asarray(state.x)
    np.testing.assert_allclose(x[top], x0[top], atol=1e-14)
    # free verts sag under gravity
    assert x[~top][:, 1].min() < x0[~top][:, 1].min() - 1e-4


def test_warm_start_modes_agree():
    """All initX warm-start modes (reference Optimizer.cpp:924-1233,
    including mode 5 Jacobi) must land on the same solution — warm starts
    change the Newton starting point, not the optimum."""
    import numpy as np
    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.mesh import build_mesh
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.timestepper import IPCStepper, SimParams

    V, T = cube(2)
    V = V + np.array([0.0, 0.3, 0.0])
    xs = {}
    for ws in (0, 1, 3, 5):
        mesh, meta = build_mesh(V, T)
        st = IPCStepper(mesh, meta, SimParams(warm_start=ws),
                        halfspaces=[HalfSpace(HalfSpaceParams())])
        state = st.initial_state()
        for _ in range(4):
            state, _ = st.step(state)
        xs[ws] = np.asarray(state.x)
        assert np.isfinite(xs[ws]).all()
    # warm starts change the Newton starting point, so iterates agree only
    # up to the inexact-Newton convergence tolerance (targetGRes)
    for ws in (1, 3, 5):
        err = np.abs(xs[ws] - xs[0]).max()
        assert err < 2e-3, (ws, err)


def test_dense_direct_solver_matches_pcg():
    """linsys=dense (the CHOLMOD/EigenLibSolver-role exact solve) must give
    the same trajectory as the matrix-free PCG within solver tolerance."""
    import numpy as np
    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.mesh import build_mesh
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.timestepper import IPCStepper, SimParams

    V, T = cube(2)
    V = V + np.array([0.0, 0.2, 0.0])
    xs = {}
    for linsys in ("pcg", "dense"):
        mesh, meta = build_mesh(V, T)
        st = IPCStepper(mesh, meta, SimParams(linsys=linsys),
                        halfspaces=[HalfSpace(HalfSpaceParams(friction=0.2))])
        state = st.initial_state()
        for _ in range(5):
            state, _ = st.step(state)
        xs[linsys] = np.asarray(state.x)
        assert np.isfinite(xs[linsys]).all()
    err = np.abs(xs["dense"] - xs["pcg"]).max()
    assert err < 2e-3, err
