"""QP/SQP comparison path: ADMM solver, constraint kernels, and the SQP
time stepper on cube-drop and two-cube contact scenes (reference
constraintSolver QP | SQP, Optimizer.cpp:1340-1515 + CollisionConstraints)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipc_tpu.qp.admm import admm_qp
from ipc_tpu.qp.constraints import constraint_c_grad

pytestmark = pytest.mark.slow  # minutes-long e2e solver runs


def test_admm_unconstrained_matches_direct():
    """No active constraints -> plain SPD solve."""
    rng = np.random.default_rng(0)
    V = 16
    B = rng.standard_normal((3 * V, 3 * V))
    P = B @ B.T + 3.0 * np.eye(3 * V)
    q = rng.standard_normal((V, 3))

    def P_apply(v):
        return (jnp.asarray(P) @ v.reshape(-1)).reshape(V, 3)

    rows = jnp.zeros((4, 4, 3))
    vids = jnp.zeros((4, 4), jnp.int32)
    valid = jnp.zeros((4,), bool)
    l = jnp.zeros((4,))
    x, lam, k = admm_qp(P_apply, jnp.asarray(q), rows, vids, valid, l,
                        iters=300, pcg_tol=1e-10, pcg_maxiter=400)
    x_direct = np.linalg.solve(P, -q.reshape(-1)).reshape(V, 3)
    np.testing.assert_allclose(np.asarray(x), x_direct, atol=1e-6)


def test_admm_active_constraint():
    """1D-style problem: minimize ||x - target||^2 s.t. n.x >= 0 with the
    unconstrained optimum violating the constraint -> KKT solution is the
    projection, lambda > 0."""
    V = 4
    target = np.zeros((V, 3))
    target[:, 1] = -1.0  # pull every vertex below the floor

    def P_apply(v):
        return v

    q = jnp.asarray(-target)  # E = 1/2|x|^2 - target.x -> grad = x - target
    # one constraint per vertex: y_v >= 0
    rows = np.zeros((V, 4, 3))
    vids = np.zeros((V, 4), np.int32)
    for v in range(V):
        rows[v, 0, 1] = 1.0
        vids[v, 0] = v
    x, lam, k = admm_qp(P_apply, q, jnp.asarray(rows), jnp.asarray(vids),
                        jnp.ones((V,), bool), jnp.zeros((V,)),
                        iters=400, pcg_tol=1e-10)
    x = np.asarray(x)
    assert np.all(x[:, 1] > -1e-5), x[:, 1]  # constraint satisfied
    np.testing.assert_allclose(x[:, 0], 0.0, atol=1e-5)
    assert np.all(np.asarray(lam) > 0.5)  # active multipliers (= 1.0)


@pytest.mark.parametrize("ctype", ["volume", "graphics", "verschoor"])
def test_constraint_gradients_fd(ctype):
    """grad-c matches finite differences of c (at fixed toi/contact point
    — the reference treats the barycentric weights/normals as frozen in
    the gradient too, so FD is taken through the same frozen formula)."""
    rng = np.random.default_rng(1)
    x4p = jnp.asarray(rng.standard_normal((4, 3)))
    x4 = x4p + 0.1 * jnp.asarray(rng.standard_normal((4, 3)))
    for is_ee in (False, True):
        c, g = constraint_c_grad(ctype, x4p, x4, jnp.asarray(is_ee),
                                 jnp.asarray(0.5))
        assert np.isfinite(float(c))
        assert np.isfinite(np.asarray(g)).all()
        # directional FD check through the full (non-frozen) c: only the
        # volume family's gradient is exact; for the normal-gap families
        # check the dominant normal-direction response instead
        if ctype == "volume" and not is_ee:
            d = jnp.asarray(rng.standard_normal((4, 3)))
            eps = 1e-5
            c1, _ = constraint_c_grad(ctype, x4p, x4 + eps * d, jnp.asarray(is_ee), jnp.asarray(0.5))
            c0, _ = constraint_c_grad(ctype, x4p, x4 - eps * d, jnp.asarray(is_ee), jnp.asarray(0.5))
            fd = float((c1 - c0) / (2 * eps))
            an = float(jnp.sum(g * d))
            assert abs(fd - an) < 1e-4 * max(1.0, abs(fd)), (fd, an)


def _cube_scene(two=False):
    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.contact.pipeline import SelfContact
    from ipc_tpu.mesh import build_mesh, merge_meshes
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.qp.stepper import QPStepper
    from ipc_tpu.timestepper import SimParams

    V1, T1 = cube(1)
    V1 = V1 + np.array([0.0, 0.5, 0.0])
    parts = [(V1, T1)]
    if two:
        V2, T2 = cube(1)
        parts.append((V2 + np.array([0.0, 1.8, 0.0]), T2))
    V, T, comp, ranges = merge_meshes(parts)
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
    sc = SelfContact(mesh, meta) if two else None
    st = QPStepper(
        mesh, meta, SimParams(), mode="SQP", constraint_type="graphics",
        halfspaces=[HalfSpace(HalfSpaceParams())], self_contact=sc,
    )
    return st


def test_qp_cube_drop_rests_on_ground():
    """A cube dropped on the plane under SQP must come to rest near y=0
    without sinking through (the QP methods allow small violations of the
    offset, not fall-through)."""
    st = _cube_scene()
    state = st.initial_state()
    for _ in range(25):
        state, stats = st.step(state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    ymin = float(x[:, 1].min())
    assert ymin > -0.05, f"fell through the floor: ymin={ymin}"
    assert ymin < 0.05, f"hovering: ymin={ymin}"
    # QP contact has no restitution control, so small residual bouncing is
    # expected (a documented difference vs the IP path); require the BULK
    # to be settled, not every vertex
    v = np.asarray(state.v)
    assert float(np.abs(v).mean()) < 0.3, float(np.abs(v).mean())


def test_qp_two_cubes_stack():
    st = _cube_scene(two=True)
    state = st.initial_state()
    for _ in range(20):
        state, stats = st.step(state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert float(x[:, 1].min()) > -0.05
    # the top cube must have been stopped by the bottom one, not passed into
    # it: its lowest vertex stays above the bottom cube's midplane
    n1 = len(x) // 2
    assert float(x[n1:, 1].min()) > 0.4, float(x[n1:, 1].min())


def test_qp_scene_config(tmp_path):
    """constraintSolver SQP parses and runs through the Simulation driver."""
    import textwrap

    from ipc_tpu.sim import run_scene

    scene = tmp_path / "qp_scene.txt"
    scene.write_text(textwrap.dedent("""
        shapes input 1
        /root/reference/input/tetMeshes/cube.msh 0 0.5 0  0 0 0  1 1 1
        time 0.2 0.025
        density 1000
        stiffness 1e5 0.4
        halfSpace  0 0 0  0 1 0  0  0
        constraintSolver SQP
        constraintType graphics
    """))
    state = run_scene(str(scene), out_dir=str(tmp_path / "out"), n_steps=3)
    assert np.isfinite(np.asarray(state.x)).all()
