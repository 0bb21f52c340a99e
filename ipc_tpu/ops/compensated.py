"""Compensated (double-float) accumulation for f32 TPU runs.

The reference runs f64 everywhere; the TPU production dtype is f32, whose
~24-bit mantissa makes the line-search energy comparisons noise-limited:
the barrier term is ~1e-7 of the inertia+elasticity energy in a typical
contact step, so `E_try <= E0` in plain f32 cannot see it, and the solver
stalls or accepts sideways steps earlier than the f64 oracle
(SURVEY §7.3.6; measured drift benchmarks/precision.py).

This module implements error-free transformations (Knuth two-sum, Dekker
splitting) and a pairwise double-float (hi, lo) reduction: every energy
term is summed to ~48 effective mantissa bits while staying entirely in
f32 TPU vector ops — no emulated f64 anywhere. The per-step extra cost is
O(N) adds in log-depth, negligible next to the Hessian/PCG work.

All functions are shape-polymorphic, jit-safe, and valid on padded rows
(zeros are exact in double-float). XLA does not reassociate IEEE float
adds by default, which the error-free transforms rely on.
"""

import jax.numpy as jnp

__all__ = [
    "two_sum",
    "quick_two_sum",
    "df_sum",
    "df_add",
    "df_neg",
    "df_leq",
    "df_to_float",
]


def two_sum(a, b):
    """Knuth's error-free addition: a + b = s + err exactly (IEEE RN)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Dekker's fast two-sum; requires |a| >= |b| (holds after two_sum)."""
    s = a + b
    err = b - (s - a)
    return s, err


def df_sum(x):
    """Pairwise double-float sum of a 1-D array -> (hi, lo) scalars.

    Log-depth tree of two-sums with error propagation: each level halves
    the array, carrying a compensation term per lane. Error bound is the
    double-float ulp (~2^-48 relative) vs f32's 2^-24 for the same tree.
    """
    x = x.reshape(-1)
    n = x.shape[0]
    # pad to a power of two with exact zeros
    p = 1 if n == 0 else 1 << max(0, (n - 1).bit_length())
    hi = jnp.zeros((p,), x.dtype).at[:n].set(x)
    lo = jnp.zeros((p,), x.dtype)
    while p > 1:
        p //= 2
        s, e = two_sum(hi[:p], hi[p:])
        e = e + (lo[:p] + lo[p:])
        hi, lo = quick_two_sum(s, e)
    return hi[0], lo[0]


def df_add(a, b):
    """(hi, lo) + (hi, lo) -> normalized (hi, lo)."""
    a_hi, a_lo = a
    b_hi, b_lo = b
    s, e = two_sum(a_hi, b_hi)
    e = e + (a_lo + b_lo)
    return quick_two_sum(s, e)


def df_neg(a):
    return (-a[0], -a[1])


def df_scale(a, k):
    """Scale (hi, lo) by a plain scalar k. Componentwise products each
    round once (no two-prod), so the result keeps ~47 of the 48 bits —
    plenty for the energy-comparison use; renormalized for df_leq."""
    return quick_two_sum(a[0] * k, a[1] * k)


def df_leq(a, b):
    """a <= b on normalized (hi, lo) pairs."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def df_to_float(a, dtype=None):
    """Collapse (hi, lo) to a single float (the rounding the pair avoided);
    use only at the output boundary (stats/logging)."""
    v = a[0] + a[1]
    return v if dtype is None else v.astype(dtype)
