"""Restart + determinism parity (SURVEY §7.1 design win; reference status
files Optimizer.cpp:2964-3068).

The reference's parallel contact assembly is hash-order nondeterministic
(SelfCollisionHandler.cpp:2176 comment); this framework's steps are pure
jitted functions of the state, so a run must be bitwise reproducible and a
save/restart must continue bitwise-identically:

  run 2N steps            ==  run N steps; save; fresh Simulation-equivalent
                              stepper; load; run N more
"""

import numpy as np
import pytest

from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.contact.pipeline import SelfContact
from ipc_tpu.mesh import build_mesh, merge_meshes
from ipc_tpu.models.primitives import cube
from ipc_tpu.timestepper import IPCStepper, SimParams
from ipc_tpu.utils.observability import (
    load_status,
    load_status_text,
    save_status,
    save_status_text,
)

pytestmark = pytest.mark.slow  # several full Newton solves + compiles


def _build_stepper():
    # contact-rich: two cubes dropping onto a friction ground, near enough
    # to collide with each other within a few steps
    V1, T1 = cube(1)
    V1 = V1 + np.array([0.0, 0.005, 0.0])
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.12, 1.1, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
    hs = HalfSpace(HalfSpaceParams(friction=0.2))
    sc = SelfContact(mesh, meta, friction=0.1)
    return IPCStepper(
        mesh, meta, SimParams(dt=0.02, warm_start=0),
        halfspaces=[hs], self_contact=sc,
    )


def _run(stepper, state, n):
    for _ in range(n):
        state, _ = stepper.step(state)
    return state


def test_restart_bitwise_determinism(tmp_path):
    N = 3
    st_a = _build_stepper()
    ref = _run(st_a, st_a.initial_state(), 2 * N)

    st_b = _build_stepper()
    mid = _run(st_b, st_b.initial_state(), N)
    ckpt = tmp_path / "status.npz"
    save_status(str(ckpt), mid, N, st_b)

    # a FRESH stepper (new process analog: rebuilt kernels, recomputed caps)
    st_c = _build_stepper()
    resumed = load_status(str(ckpt), st_c)
    assert int(resumed.step) == N
    out = _run(st_c, resumed, N)

    # bitwise: same jitted programs, same operands, same reduction order
    assert np.asarray(out.x).tobytes() == np.asarray(ref.x).tobytes()
    assert np.asarray(out.v).tobytes() == np.asarray(ref.v).tobytes()
    assert np.asarray(out.a).tobytes() == np.asarray(ref.a).tobytes()
    assert abs(float(out.t) - float(ref.t)) < 1e-12


def test_text_status_roundtrip(tmp_path):
    """Reference-format text status files preserve full f64 precision."""
    st = _build_stepper()
    state = _run(st, st.initial_state(), 1)
    path = tmp_path / "status1"
    save_status_text(str(path), state, 1)
    back = load_status_text(str(path), st)
    np.testing.assert_array_equal(np.asarray(back.x), np.asarray(state.x))
    np.testing.assert_array_equal(np.asarray(back.v), np.asarray(state.v))
    np.testing.assert_array_equal(np.asarray(back.a), np.asarray(state.a))
    assert int(back.step) == 1
