"""Fully-jitted step vs host-path parity, across integrators and damping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.contact.pipeline import SelfContact
from ipc_tpu.jit_step import make_jit_step
from ipc_tpu.mesh import build_mesh, merge_meshes
from ipc_tpu.models.primitives import cube
from ipc_tpu.timestepper import IPCStepper, SimParams

pytestmark = pytest.mark.slow  # minutes-long e2e solver runs


def _scene(params):
    V1, T1 = cube(1)
    V1 = V1 + np.array([0.0, 0.002, 0.0])
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.0, 1.15, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
    hs = HalfSpace(HalfSpaceParams(friction=0.1))
    sc = SelfContact(mesh, meta, friction=0.1)
    return IPCStepper(mesh, meta, params, halfspaces=[hs], self_contact=sc)


@pytest.mark.parametrize(
    "params",
    [SimParams(time_integration="NM")],
    ids=["NM"],
)
def test_jit_matches_host(params):
    # one full-compile parity case (NM, the path benches don't cover); each
    # case costs ~6 min of XLA compiles on CPU, so BE/damping parity is
    # covered by cheaper behavioral tests + the benches
    st = _scene(params)
    step = make_jit_step(st, donate=False)
    sj = st.initial_state()
    sh = st.initial_state()
    for _ in range(6):
        sj, jstats = step(sj)
    for _ in range(6):
        sh, _ = st.step(sh)
    xj, xh = np.asarray(sj.x), np.asarray(sh.x)
    assert np.isfinite(xj).all()
    # The two paths differ by documented design choices (jit warm start,
    # merged line-search/intersection backtracking, no kappa doubling), so a
    # bouncing-contact trajectory diverges at the chaos rate; compare
    # qualitatively: invariants hold and configurations agree loosely.
    assert xj[:, 1].min() > 0 and xh[:, 1].min() > 0
    np.testing.assert_allclose(xj, xh, atol=0.08)
    hit, _ = st._has_intersection(sj.x)
    assert not bool(hit)


def test_scripted_twist_jit_matches_host():
    """Scripted DBC motion (twist handles) runs inside the jitted step:
    handle trajectories match the host path exactly (same rigid motion),
    free vertices agree to solver tolerance."""
    from ipc_tpu.models.primitives import mat
    from ipc_tpu.scripting import build_script

    V, T = mat(4, size=1.0)
    mesh0, meta0 = build_mesh(V, T)
    surface_mask = np.zeros(len(V), bool)
    surface_mask[np.asarray(mesh0.surf_verts)] = True
    script = build_script("twist", V, surface_mask, [(0, len(V))], handle_ratio=0.11)
    xs = {}
    for path in ("host", "jit"):
        mesh, meta = build_mesh(V, T, dbc_mask=script.dbc_mask())
        sc = SelfContact(mesh, meta, friction=0.0)
        st = IPCStepper(
            mesh, meta, SimParams(gravity=(0, 0, 0)), self_contact=sc, script=script
        )
        state = st.initial_state()
        if path == "jit":
            step = make_jit_step(st, donate=False)
            for _ in range(4):
                state, jstats = step(state)
            assert float(jstats.script_scale) == 1.0
        else:
            for _ in range(4):
                state, _ = st.step(state)
        xs[path] = np.asarray(state.x)
    dbc = script.dbc_mask()
    np.testing.assert_allclose(xs["jit"][dbc], xs["host"][dbc], atol=1e-6)
    np.testing.assert_allclose(xs["jit"], xs["host"], atol=5e-3)
    # the handles actually rotated
    hv = script.handles[0].verts
    assert np.abs(xs["jit"][hv][:, 1:] - np.asarray(V)[hv][:, 1:]).max() > 1e-3


def test_nbc_force_jit_matches_host():
    """Time-gated NBC force fields evaluate on device: the jit path matches
    the host path pulling a free cube sideways."""
    from ipc_tpu.scripting import NBCGroup, Script

    V1, T1 = cube(1)
    V1 = V1 + np.array([0.0, 0.5, 0.0])
    mesh, meta = build_mesh(V1, T1)
    n = len(V1)
    top = np.where(np.asarray(V1)[:, 1] > 0.9 + 0.5 - 1e-6)[0]
    script = Script(
        n_verts=n,
        nbc_groups=[NBCGroup(verts=top, force=np.array([4.0, 9.80665, 0.0]))],
    )
    xs = {}
    for path in ("host", "jit"):
        m, mt = build_mesh(V1, T1)
        st = IPCStepper(m, mt, SimParams(), script=script)
        state = st.initial_state()
        if path == "jit":
            step = make_jit_step(st, donate=False)
            for _ in range(3):
                state, _ = step(state)
        else:
            for _ in range(3):
                state, _ = st.step(state)
        xs[path] = np.asarray(state.x)
    # both paths converge within the Newton tolerance ball (target_gres
    # ~4e-4 on this scene); the warm starts differ so the iterates do too
    np.testing.assert_allclose(xs["jit"], xs["host"], atol=5e-4)
    # the force did push the cube in +x
    assert (xs["jit"][:, 0].mean()) > np.asarray(V1)[:, 0].mean() + 1e-4


def test_damping_gradient_consistent():
    """The damping term's gradient must be the FD derivative of its energy
    through the jitted kernels. (Realistic dampingStiff is TINY — the only
    reference scene using it sets 4e-16, 19_golfBall.txt; large values make
    the damping matrix dominate the Hessian and are out of scope.)"""
    import jax.numpy as jnp

    st = _scene(SimParams(damping_stiff=1e-4))
    s = st.initial_state()
    s, _ = st.step(s)  # get a moving state
    x = s.x
    xt = st.compute_x_tilde(s)
    kappa = st.suggest_kappa(st.dHat)
    cand = st._candidates(x)
    damp = dict(blocks=st._damping_blocks(s.x_prev), x_ref=s.x_prev)
    rng = np.random.default_rng(0)
    x0 = np.asarray(x) + rng.uniform(-1e-3, 1e-3, x.shape)
    g = np.asarray(st._grad(jnp.asarray(x0), xt, kappa, st.dHat, cand, None, None, damp))
    eps = 1e-7
    for vi in rng.choice(len(x0), 4, replace=False):
        if bool(np.asarray(st.mesh.dbc_mask)[vi]):
            continue
        for c in range(3):
            xp, xm = x0.copy(), x0.copy()
            xp[vi, c] += eps
            xm[vi, c] -= eps
            fd = (
                st._energy_f(jnp.asarray(xp), xt, kappa, st.dHat, cand, None, None, damp)
                - st._energy_f(jnp.asarray(xm), xt, kappa, st.dHat, cand, None, None, damp)
            ) / (2 * eps)
            np.testing.assert_allclose(g[vi, c], fd, rtol=2e-3, atol=1e-6 * max(1, abs(fd)))
