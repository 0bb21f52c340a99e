"""CCD methods: ACCD vs Tight-Inclusion interval bisection.

Both must be conservative (never step past first contact) and not absurdly
over-conservative. Ground truth: dense time sampling of the true distance
along the trajectory (reference validates its CCD stack the same way via
Diagnostic probe modes 17/18/25)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ipc_tpu.contact.ccd import accd_ee, accd_pt, ti_ee, ti_pt
from ipc_tpu.ops.distance import edge_edge_dist2, point_triangle_dist2


import jax


def _true_first_contact(x4, p4, dist2_fn, eps=None, n=4000):
    """Smallest sampled t where distance <= eps (1.0 if none). eps defaults
    to the per-sample motion bound so sampled trajectories can't skip over
    the contact."""
    if eps is None:
        eps = 2.0 * float(np.abs(p4).max()) / n + 1e-6
    ts = np.linspace(0.0, 1.0, n)
    ys = jnp.asarray(x4)[None] + jnp.asarray(ts)[:, None, None] * jnp.asarray(p4)[None]
    d2 = jax.vmap(lambda y: dist2_fn(y[0], y[1], y[2], y[3]))(ys)
    d = np.sqrt(np.maximum(np.asarray(d2), 0.0))
    hits = np.nonzero(d <= eps)[0]
    return float(ts[hits[0]]) if len(hits) else 1.0


CASES_PT = [
    # head-on: point falls through triangle center
    (np.array([[0.0, 1.0, 0.0], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]], float),
     np.array([[0.0, -2.0, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]], float)),
    # grazing: point passes near the edge
    (np.array([[1.2, 1.0, 0.0], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]], float),
     np.array([[0.0, -2.0, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]], float)),
    # triangle moves up into the point
    (np.array([[0.0, 0.5, 0.2], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]], float),
     np.array([[0, 0, 0], [0.0, 1.0, 0.0], [0, 1, 0], [0, 1, 0]], float)),
    # no contact: parallel motion
    (np.array([[0.0, 1.0, 0.0], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]], float),
     np.array([[1.0, 0.0, 0.0], [1, 0, 0], [1, 0, 0], [1, 0, 0]], float)),
]

CASES_EE = [
    # crossing edges
    (np.array([[-1, 1.0, 0], [1, 1.0, 0], [0, 0, -1], [0, 0, 1]], float),
     np.array([[0, -2.0, 0], [0, -2.0, 0], [0, 0, 0], [0, 0, 0]], float)),
    # near-parallel approach
    (np.array([[-1, 0.5, 0], [1, 0.5, 0.01], [-1, 0, 0], [1, 0, 0]], float),
     np.array([[0, -1.0, 0], [0, -1.0, 0], [0, 0, 0], [0, 0, 0]], float)),
    # separating
    (np.array([[-1, 0.5, 0], [1, 0.5, 0], [0, 0, -1], [0, 0, 1]], float),
     np.array([[0, 1.0, 0], [0, 1.0, 0], [0, 0, 0], [0, 0, 0]], float)),
]


@pytest.mark.parametrize("case", range(len(CASES_PT)))
@pytest.mark.parametrize("method", ["accd", "ti"])
def test_pt_conservative(case, method):
    x4, p4 = CASES_PT[case]
    t_true = _true_first_contact(x4, p4, point_triangle_dist2)
    xj, pj = jnp.asarray(x4), jnp.asarray(p4)
    if method == "accd":
        t = float(accd_pt(xj, pj, 0.2, 128))
    else:
        t = float(ti_pt(xj, pj, 1.0, 0.0, 48))
    assert t <= t_true + 2e-3, f"stepped past contact: {t} > {t_true}"
    if t_true >= 1.0:
        assert t > 0.5, f"absurdly conservative on contact-free case: {t}"
    elif t_true > 1e-3:
        assert t > 0.05 * t_true, f"absurdly conservative: {t} vs {t_true}"


@pytest.mark.parametrize("case", range(len(CASES_EE)))
@pytest.mark.parametrize("method", ["accd", "ti"])
def test_ee_conservative(case, method):
    x4, p4 = CASES_EE[case]
    t_true = _true_first_contact(x4, p4, edge_edge_dist2)
    xj, pj = jnp.asarray(x4), jnp.asarray(p4)
    if method == "accd":
        t = float(accd_ee(xj, pj, 0.2, 128))
    else:
        t = float(ti_ee(xj, pj, 1.0, 0.0, 48))
    assert t <= t_true + 2e-3
    if t_true >= 1.0:
        assert t > 0.5
    elif t_true > 1e-3:
        assert t > 0.05 * t_true


def test_ti_minimum_separation():
    """ms > 0 must stop strictly before distance reaches ms."""
    x4, p4 = CASES_PT[0]
    xj, pj = jnp.asarray(x4), jnp.asarray(p4)
    t = float(ti_pt(xj, pj, 1.0, 0.05, 48))
    y = x4 + t * p4
    d = float(np.sqrt(max(point_triangle_dist2(*map(jnp.asarray, y)), 0.0)))
    assert d >= 0.05 - 1e-4


def test_ti_random_fuzz_vs_sampling():
    rng = np.random.default_rng(3)
    for _ in range(30):
        x4 = rng.uniform(-1, 1, (4, 3))
        p4 = rng.uniform(-1.5, 1.5, (4, 3))
        t_true = _true_first_contact(x4, p4, point_triangle_dist2, n=2000)
        t = float(ti_pt(jnp.asarray(x4), jnp.asarray(p4), 1.0, 0.0, 48))
        assert t <= t_true + 5e-3


@pytest.mark.slow
def test_solver_runs_with_ti(tmp_path):
    """End-to-end: a contact step with CCDMethod=ti stays intersection-free
    and close to the ACCD trajectory."""
    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.contact.pipeline import SelfContact
    from ipc_tpu.mesh import build_mesh, merge_meshes
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.timestepper import IPCStepper, SimParams

    V1, T1 = cube(1)
    V1 = V1 + np.array([0.0, 0.002, 0.0])
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.0, 1.05, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    xs = {}
    for method in ("accd", "ti"):
        mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
        sc = SelfContact(mesh, meta, friction=0.0, ccd_method=method)
        st = IPCStepper(mesh, meta, SimParams(),
                        halfspaces=[HalfSpace(HalfSpaceParams())],
                        self_contact=sc)
        state = st.initial_state()
        for _ in range(6):
            state, _ = st.step(state)
        x = np.asarray(state.x)
        assert np.isfinite(x).all()
        hit, _ = st.sc.has_intersection(state.x)
        assert not bool(hit)
        xs[method] = x
    # both conservative CCDs must land on essentially the same trajectory
    err = np.abs(xs["accd"] - xs["ti"]).max()
    assert err < 5e-3, err
