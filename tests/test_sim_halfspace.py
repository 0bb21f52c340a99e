"""End-to-end slice test: stiff cube drop onto the ground plane — the
analog of the reference's tutorialExamples/2cubesFall smoke scenes
(reduced to one cube per BASELINE.md), checking the IPC invariants:
never any interpenetration, settles inside the barrier band, comes to rest.
"""

import pytest
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


def _two_plane_stepper(kind="squash", fric=0.0, sep=0.6):
    """Soft cube centered at the origin between two x-facing analytic
    planes at +-sep, driven by an ACO script (reference AST_ACOSQUASH
    family, AnimScripter.cpp:1832-1890)."""
    from ipc_tpu.scripting import Script

    V, T = cube(2)
    V = V - 0.5
    mesh, meta = build_mesh(V, T, ym=5e4)
    hs0 = HalfSpace(HalfSpaceParams(origin=(-sep, 0, 0), normal=(1, 0, 0), friction=fric))
    hs1 = HalfSpace(HalfSpaceParams(origin=(sep, 0, 0), normal=(-1, 0, 0), friction=fric))
    script = Script(
        n_verts=len(V), aco_kind=kind,
        aco_vel=np.array([[1.0, 0, 0], [-1.0, 0, 0]]),
    )
    st = IPCStepper(
        mesh, meta, SimParams(gravity=(0, 0, 0)),
        halfspaces=[hs0, hs1], script=script,
    )
    return st


def test_aco_squash_moving_planes():
    """Moving analytic planes (ACOSquash): both planes advance, the clamped
    move never crosses a surface vertex, and the barrier squashes the cube."""
    st = _two_plane_stepper()
    assert st.hs_moving
    state = st.initial_state()
    sv = np.asarray(st._sv)
    for _ in range(10):
        state, _ = st.step(state)
        x_sv = np.asarray(state.x)[sv]
        for i, hs in enumerate(st.halfspaces):
            D = -(hs._n @ st.hs_origin[i])
            d = x_sv @ hs._n + D
            assert d.min() > 0.0, (i, d.min())
    # planes moved inward (4+ unclamped steps of 0.025)
    assert st.hs_origin[0][0] > -0.6 + 0.08, st.hs_origin[0]
    assert st.hs_origin[1][0] < 0.6 - 0.08, st.hs_origin[1]
    # the barrier started compressing the cube
    x = np.asarray(state.x)
    assert x[:, 0].max() - x[:, 0].min() < 1.0 - 1e-5


def test_aco_velocity_flip_and_shear():
    """ACO velocity state machine: squash flips both x velocities below the
    0.1 separation; squashshear switches plane 1 to +y below 0.8 separation
    and records velocitydt so friction sees the plane motion."""
    st = _two_plane_stepper()
    st.hs_origin[0] = np.array([-0.04, 0, 0.0])
    st.hs_origin[1] = np.array([0.04, 0, 0.0])
    probe = np.zeros((1, 3))
    st._step_aco(probe)
    assert st.script.aco_vel[0][0] == -1.0
    assert st.script.aco_vel[1][0] == 1.0
    assert not np.any(st.hs_veldt)  # squash leaves velocitydt zero

    st2 = _two_plane_stepper("squashshear", fric=0.5)
    st2.hs_origin[0] = np.array([-0.3, 0, 0.0])
    st2.hs_origin[1] = np.array([0.3, 0, 0.0])
    st2._step_aco(probe)
    assert np.all(st2.script.aco_vel[0] == 0.0)
    np.testing.assert_allclose(st2.script.aco_vel[1], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(st2.hs_veldt[1], [0.0, st2.dt, 0.0])
    # the captured friction state carries the plane displacement
    import jax.numpy as jnp

    x = jnp.asarray(np.asarray(st2.mesh.x_rest))
    fric = st2._capture_friction(x, x, st2.suggest_kappa(st2.dHat), st2.dHat, None)
    assert fric["hs_veldt"][0] is None
    assert fric["hs_veldt"][1] is not None


def test_moving_plane_friction_drags():
    """A plane sliding tangentially under a resting block drags it along
    through the lagged friction (velocitydt in the relative displacement,
    reference HalfSpace.cpp:286)."""
    import jax.numpy as jnp

    V, T = cube(1)
    V = V + np.array([0.0, 0.002, 0.0])  # resting just above the plane
    mesh, meta = build_mesh(V, T)
    hs = HalfSpace(HalfSpaceParams(origin=(0, 0, 0), normal=(0, 1, 0), friction=0.8))
    st = IPCStepper(mesh, meta, SimParams(), halfspaces=[hs])
    x = jnp.asarray(np.asarray(mesh.x_rest))
    kappa = st.suggest_kappa(st.dHat)
    fric = st._capture_friction(x, x, kappa, st.dHat, None)
    lam = fric["hs"][0]
    assert float(jnp.max(lam)) >= 0.0
    # make the bottom vertices active regardless of dHat band
    m = hs.active_mask(x[st._sv], st.dHat)
    if not bool(jnp.any(m)):
        # shift into the band
        V2 = np.asarray(mesh.x_rest).copy()
        V2[:, 1] -= 0.0019
        x = jnp.asarray(V2)
        fric = st._capture_friction(x, x, kappa, st.dHat, None)
    veldt = jnp.asarray([0.05, 0.0, 0.0])
    g_static = hs.friction_grad_sv(x[st._sv], x[st._sv], fric["hs"][0], fric["eps2"])
    g_moving = hs.friction_grad_sv(
        x[st._sv], x[st._sv], fric["hs"][0], fric["eps2"], veldt=veldt
    )
    # zero relative slip -> zero force; plane sliding +x -> force pulls +x
    assert float(jnp.abs(g_static).max()) == 0.0
    if float(jnp.max(fric["hs"][0])) > 0.0:
        assert float(g_moving[:, 0].min()) < 0.0  # gradient of E points -x force...
    # energy decreases when the block follows the plane
    E_stay = hs.friction_energy(x[st._sv], x[st._sv], fric["hs"][0], fric["eps2"], veldt=veldt)
    E_follow = hs.friction_energy(
        x[st._sv] + veldt[None, :], x[st._sv], fric["hs"][0], fric["eps2"], veldt=veldt
    )
    assert float(E_follow) <= float(E_stay) + 1e-12


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


@pytest.mark.slow
def test_sparse_direct_solver_matches_dense():
    """linsys=sparse (SuperLU host callback, the CHOLMOD-role solver at
    medium scale) is an EXACT solve like dense — trajectories must agree to
    factorization roundoff, and both stay finite with self-contact on."""
    import numpy as np
    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.contact.pipeline import SelfContact
    from ipc_tpu.mesh import build_mesh, merge_meshes
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.timestepper import IPCStepper, SimParams

    V1, T1 = cube(2)
    V1 = V1 + np.array([0.0, 0.002, 0.0])
    V2, T2 = cube(2)
    V2 = V2 + np.array([0.0, 1.15, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    xs = {}
    for linsys in ("dense", "sparse"):
        mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
        st = IPCStepper(
            mesh, meta, SimParams(linsys=linsys),
            halfspaces=[HalfSpace(HalfSpaceParams(friction=0.2))],
            self_contact=SelfContact(mesh, meta, friction=0.1),
        )
        state = st.initial_state()
        for _ in range(4):
            state, _ = st.step(state)
        xs[linsys] = np.asarray(state.x)
        assert np.isfinite(xs[linsys]).all()
    err = np.abs(xs["sparse"] - xs["dense"]).max()
    assert err < 1e-6, err


def test_unbounded_fric_iter_terminates():
    """fricIterAmt <= 0 (masonryArch's `fricIter -1`) must terminate via
    the refreshed-tangent convergence probe (reference Optimizer.cpp:
    1717-1740: recapture lambda/tangent at the converged iterate, stop when
    the refreshed Newton direction is below targetGRes) — without it the
    outer friction loop spins forever (BATTERY_r3 masonryArch TIMEOUT)."""
    V, T = cube(1)
    V = V + np.array([0.0, 0.02, 0.0])  # just above the plane: contact
    # (and with it friction) is active from the very first step
    mesh, meta = build_mesh(V, T)
    hs = HalfSpace(HalfSpaceParams(origin=(0, 0, 0), normal=(0, 1, 0), friction=0.4))
    p = SimParams(fric_iter_amt=-1)
    stepper = IPCStepper(mesh, meta, p, halfspaces=[hs])
    state = stepper.initial_state()
    # push sideways so friction is genuinely active while it settles
    import dataclasses
    state = dataclasses.replace(
        state, v=state.v + jnp.asarray([1.0, 0.0, 0.0], state.v.dtype)
    )
    for _ in range(10):
        state, stats = stepper.step(state)
        assert float(state.x[:, 1].min()) > 0.0
    # sliding decelerates under mu=0.4: friction actually did work
    assert float(np.mean(np.asarray(state.v)[:, 0])) < 0.7
