"""Compensated (double-float) accumulation: unit + integration checks.

The f32 production dtype loses the barrier term (~1e-7 of
inertia+elasticity) inside a plain f32 energy sum; ops/compensated.py
restores ~48 effective mantissa bits (see its module docstring and
SURVEY §7.3.6). Reference parity: the f64 reference needs no such
machinery — the acceptance bar here is that the f32 stepper's energy
agrees with the f64 oracle far beyond single-precision resolution.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from ipc_tpu.ops.compensated import (
    df_add,
    df_leq,
    df_scale,
    df_sum,
    df_to_float,
    two_sum,
)


def _f32(a):
    return jnp.asarray(a, jnp.float32)


def test_two_sum_exact():
    a = _f32(1.0)
    b = _f32(1e-8)  # vanishes in plain f32 addition
    s, e = two_sum(a, b)
    assert float(s) == 1.0
    # the error term recovers the lost addend exactly
    assert float(e) == np.float32(1e-8)


def test_df_sum_vs_f64():
    rng = np.random.default_rng(0)
    # adversarial mix: large inertia-like terms + tiny barrier-like terms
    big = rng.uniform(1.0, 2.0, 4096)
    tiny = rng.uniform(1e-9, 1e-8, 4096)
    x = np.concatenate([big, tiny]).astype(np.float32)
    rng.shuffle(x)
    exact = float(np.sum(x.astype(np.float64)))
    plain = float(jnp.sum(_f32(x)))
    hi, lo = df_sum(_f32(x))
    comp = float(hi) + float(lo)
    assert abs(comp - exact) / abs(exact) < 1e-12
    # and it genuinely beats the plain f32 reduction
    assert abs(comp - exact) < abs(plain - exact)


def test_df_sum_padded_zeros_and_empty():
    hi, lo = df_sum(_f32(np.zeros(0)))
    assert float(hi) == 0.0 and float(lo) == 0.0
    x = np.array([3.0, -3.0, 1e-7], np.float32)
    hi, lo = df_sum(_f32(x))
    assert abs(float(hi) + float(lo) - 1e-7) < 1e-14


def test_df_leq_resolves_sub_ulp_differences():
    # two energies equal in f32 hi but differing in the compensation term
    base = df_sum(_f32(np.full(64, 1.0)))
    eps = df_add(base, (_f32(1e-6), _f32(0.0)))
    assert float(base[0]) == float(eps[0])  # plain f32 cannot see it...
    assert bool(df_leq(base, eps)) and not bool(df_leq(eps, base))


def test_df_add_scale_roundtrip():
    a = df_sum(_f32(np.array([1.0, 1e-7])))
    b = df_scale(a, _f32(2.0))
    # the pair carries the sub-ulp part; collapse in f64 to read it out
    assert abs(float(b[0]) + float(b[1]) - 2.0 * (1.0 + 1e-7)) < 1e-12
    # df_to_float is the single-f32 view (rounds once, by design)
    assert abs(float(df_to_float(b)) - 2.0) < 1e-6


def _drop_stepper(dtype):
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
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges, dtype=dtype)
    return IPCStepper(
        mesh,
        meta,
        SimParams(),
        halfspaces=[HalfSpace(HalfSpaceParams(friction=0.1))],
        self_contact=SelfContact(mesh, meta, friction=0.1),
    )


@pytest.mark.slow
def test_f32_host_energy_matches_f64_oracle():
    """The f32 stepper's compensated objective agrees with the f64 oracle
    at the SAME state to ~f32-rounding of the INPUTS (each term rounds its
    operands once), far tighter than a plain f32 global reduction."""
    st64 = _drop_stepper(np.float64)
    st32 = _drop_stepper(np.float32)
    assert st32._energy_df and not st64._energy_df

    s = st64.initial_state()
    for _ in range(2):  # reach a contact-rich state
        s, _ = st64.step(s)
    x64 = np.asarray(s.x, np.float64)
    xt64 = np.asarray(s.x, np.float64) + 1e-3  # arbitrary inertia target
    kappa, dHat = st64.suggest_kappa(st64.dHat), st64.dHat

    c64 = st64._candidates(jnp.asarray(x64))
    E64 = st64._energy_f(jnp.asarray(x64), jnp.asarray(xt64), kappa, dHat, c64, None)

    x32, xt32 = x64.astype(np.float32), xt64.astype(np.float32)
    c32 = st32._candidates(jnp.asarray(x32))
    E32 = st32._energy_f(jnp.asarray(x32), jnp.asarray(xt32), kappa, st32.dHat, c32, None)

    rel = abs(E32 - E64) / max(1.0, abs(E64))
    assert rel < 3e-6, rel  # input-rounding floor; plain f32 sums sit ~1e-5+
