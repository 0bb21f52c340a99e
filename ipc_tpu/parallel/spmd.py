"""SPMD sharding context: opt-in `with_sharding_constraint` hooks.

The solver code is written sharding-oblivious (pure array programs); when
a device mesh is activated, the few load-bearing intermediates — PCG
vectors, assembled gradients, Newton iterates — are pinned to a leading-
axis sharding so XLA's SPMD partitioner keeps them distributed instead of
replicating after the first unconstrained reduction. Everything else
(collective insertion for gathers/scatter-sums, psum for dot products) is
left to the partitioner — the idiomatic JAX division of labor.

With no active context every hook is an identity, so the single-chip path
pays nothing.
"""

from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["activate", "deactivate", "constrain", "active_mesh", "active_axis"]

_CTX = {"mesh": None, "axis": None}


def activate(device_mesh, axis="elem"):
    """Enable leading-axis sharding constraints on solver intermediates."""
    _CTX["mesh"] = device_mesh
    _CTX["axis"] = axis


def deactivate():
    _CTX["mesh"] = None
    _CTX["axis"] = None


def active_mesh():
    return _CTX["mesh"]


def active_axis():
    return _CTX["axis"]


def constrain(arr):
    """Pin `arr` (or None) to a leading-axis sharding over the active mesh."""
    if arr is None or _CTX["mesh"] is None:
        return arr
    import jax

    spec = P(_CTX["axis"], *([None] * (arr.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        arr, NamedSharding(_CTX["mesh"], spec)
    )
