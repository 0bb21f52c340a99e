"""Clamped log-barrier functions b(d, dHat) on SQUARED distances.

Semantics follow the reference IPC barrier (reference:
src/Utils/BarrierFunctions.hpp:10-131, selected by BARRIER_FUNC_TYPE=2 in
src/Utils/Types.hpp:26): `d` is the squared unsigned distance of a contact
pair and `dHat` the squared activation threshold. Outside the barrier
(d >= dHat) all values are exactly 0 — callers rely on that for masking
inactive pairs rather than branching.

The default C2 barrier is
    b(d)  = -(d - dHat)^2 * log(d / dHat)            for 0 < d < dHat
    b'(d) = -2 (d - dHat) log(d / dHat) - (d - dHat)^2 / d
    b''(d)= -2 log(d / dHat) - 4 (d - dHat) / d + (d - dHat)^2 / d^2

All functions are elementwise and safe to vmap / broadcast. `d` is clamped
away from 0 internally only to keep log/1-over-d finite on masked lanes;
active lanes are assumed to carry d > 0 (the solver's CCD guarantees this).
"""

import jax.numpy as jnp

__all__ = ["barrier", "barrier_grad", "barrier_hess"]


def _safe_d(d, dHat):
    # Keep masked / padded lanes finite; never changes values where 0<d<dHat
    # matters because we multiply by the (d < dHat) mask afterwards.
    tiny = jnp.asarray(1e-300 if d.dtype == jnp.float64 else 1e-30, d.dtype)
    return jnp.where(d > 0, d, tiny)


def barrier(d, dHat, order: int = 2):
    """b(d, dHat); zero for d >= dHat or d <= 0. d, dHat are squared dists."""
    d = jnp.asarray(d)
    active = (d < dHat) & (d > 0)
    ds = _safe_d(d, dHat)
    t = ds - dHat
    logr = jnp.log(ds / dHat)
    if order == 0:
        b = -logr
    elif order == 1:
        b = t * logr
    elif order == 2:
        b = -t * t * logr
    else:
        raise ValueError(f"unsupported barrier order {order}")
    return jnp.where(active, b, 0.0)


def barrier_grad(d, dHat, order: int = 2):
    """db/dd; zero outside the active range."""
    d = jnp.asarray(d)
    active = (d < dHat) & (d > 0)
    ds = _safe_d(d, dHat)
    t = ds - dHat
    logr = jnp.log(ds / dHat)
    if order == 0:
        g = -1.0 / ds
    elif order == 1:
        g = logr + t / ds
    elif order == 2:
        g = -2.0 * t * logr - t * t / ds
    else:
        raise ValueError(f"unsupported barrier order {order}")
    return jnp.where(active, g, 0.0)


def barrier_hess(d, dHat, order: int = 2):
    """d2b/dd2; zero outside the active range."""
    d = jnp.asarray(d)
    active = (d < dHat) & (d > 0)
    ds = _safe_d(d, dHat)
    t = ds - dHat
    logr = jnp.log(ds / dHat)
    if order == 0:
        h = 1.0 / (ds * ds)
    elif order == 1:
        h = 2.0 / ds - t / (ds * ds)
    elif order == 2:
        h = -2.0 * logr - 4.0 * t / ds + t * t / (ds * ds)
    else:
        raise ValueError(f"unsupported barrier order {order}")
    return jnp.where(active, h, 0.0)
