"""Adversarial CCD corpus: randomized fuzz + structured stress cases.

The reference validates its CCD stack interactively (Diagnostic probe modes
17/18/25, reference Diagnostic.cpp:100-166) and cross-checks inexact CCD
against rational CCD at compile time (Types.hpp:37-38). Neither is available
here, so this corpus plays that role mechanically:

  * hundreds of seeded random PT/EE trajectories across 5 orders of
    magnitude of scale, biased toward actual impacts (aimed at random
    barycentric targets), grazing near-misses, near-parallel edges, and
    degenerate stencils;
  * CONSERVATIVENESS oracle: dense f64 time-sampling of the true distance
    along [0, alpha_returned] — the safe step must never pass through or
    touch contact (the same ground truth the handcrafted test_ccd.py cases
    use, scaled up and vectorized);
  * USEFULNESS floors on structured cases where an over-conservative bound
    would break the solver: separating motion, no motion, impacts at known
    t*, and the tilted-resting-contact tangential slide that the t-only
    interval bisection is documented to be loose on (pipeline.py ccd_alpha
    hybrid: max(ACCD, TI) floors those cases).

Everything runs as jitted vmaps over stacked case tensors — one trace per
(method, kind), not per case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipc_tpu.contact.ccd import accd_ee, accd_pt, ti_ee, ti_pt
from ipc_tpu.ops.distance import edge_edge_dist2, point_triangle_dist2

N_RANDOM = 160  # per family
N_SAMPLE = 1024  # dense ground-truth samples along [0, alpha]


def _dist2_pt(y):
    return point_triangle_dist2(y[0], y[1], y[2], y[3])


def _dist2_ee(y):
    return edge_edge_dist2(y[0], y[1], y[2], y[3])


@jax.jit
def _min_d2_batch_pt(X, P, alphas):
    """(N,) min squared PT distance over dense t-samples in [0, alpha_i]."""
    ts = jnp.linspace(0.0, 1.0, N_SAMPLE)

    def one(x4, p4, a):
        ys = x4[None] + (ts * a)[:, None, None] * p4[None]
        return jax.vmap(_dist2_pt)(ys).min()

    return jax.vmap(one)(X, P, alphas)


@jax.jit
def _min_d2_batch_ee(X, P, alphas):
    ts = jnp.linspace(0.0, 1.0, N_SAMPLE)

    def one(x4, p4, a):
        ys = x4[None] + (ts * a)[:, None, None] * p4[None]
        return jax.vmap(_dist2_ee)(ys).min()

    return jax.vmap(one)(X, P, alphas)


def _hybrid_pt(x4, p4):
    """The production 'ti' combination (pipeline.py ccd_alpha): per-pair max
    of the two conservative bounds, ms = gap_frac * d0."""
    d0 = jnp.sqrt(jnp.maximum(_dist2_pt(x4), 0.0))
    return jnp.maximum(ti_pt(x4, p4, 1.0, 0.2 * d0), accd_pt(x4, p4))


def _hybrid_ee(x4, p4):
    d0 = jnp.sqrt(jnp.maximum(_dist2_ee(x4), 0.0))
    return jnp.maximum(ti_ee(x4, p4, 1.0, 0.2 * d0), accd_ee(x4, p4))


_BATCHED = {
    ("pt", "accd"): jax.jit(jax.vmap(lambda x, p: accd_pt(x, p))),
    ("pt", "ti"): jax.jit(jax.vmap(lambda x, p: ti_pt(x, p))),
    ("pt", "hybrid"): jax.jit(jax.vmap(_hybrid_pt)),
    ("ee", "accd"): jax.jit(jax.vmap(lambda x, p: accd_ee(x, p))),
    ("ee", "ti"): jax.jit(jax.vmap(lambda x, p: ti_ee(x, p))),
    ("ee", "hybrid"): jax.jit(jax.vmap(_hybrid_ee)),
}


# ---------------------------------------------------------------------------
# corpus generators (seeded, deterministic)
# ---------------------------------------------------------------------------


def _random_pt_cases(rng, n):
    """Aimed impacts, grazers, and wild random motion at mixed scales."""
    X, P = [], []
    for i in range(n):
        scale = 10.0 ** rng.uniform(-3, 2)
        tri = rng.normal(0, 1, (3, 3)) * scale
        while np.linalg.norm(np.cross(tri[1] - tri[0], tri[2] - tri[0])) < 1e-8 * scale**2:
            tri = rng.normal(0, 1, (3, 3)) * scale
        nrm = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        nrm /= np.linalg.norm(nrm)
        b = rng.dirichlet([1.0, 1.0, 1.0])
        target = b @ tri
        h = 10.0 ** rng.uniform(-3, 0) * scale
        p0 = target + h * nrm
        kind = i % 3
        if kind == 0:  # aimed impact, overshoot
            disp_p = (target - p0) * rng.uniform(1.2, 3.0)
            disp_t = rng.normal(0, 0.05 * scale, (3, 3))
        elif kind == 1:  # grazing: aim just outside a corner
            out = target + (tri[i % 3] - target) * rng.uniform(1.01, 1.3)
            disp_p = (out - p0) * rng.uniform(1.0, 2.0)
            disp_t = rng.normal(0, 0.02 * scale, (3, 3))
        else:  # wild: everything moves
            disp_p = rng.normal(0, scale, 3)
            disp_t = rng.normal(0, scale, (3, 3))
        X.append(np.vstack([p0, tri]))
        P.append(np.vstack([disp_p, disp_t]))
    return np.stack(X), np.stack(P)


def _random_ee_cases(rng, n):
    X, P = [], []
    for i in range(n):
        scale = 10.0 ** rng.uniform(-3, 2)
        a0, a1 = rng.normal(0, 1, (2, 3)) * scale
        b0, b1 = rng.normal(0, 1, (2, 3)) * scale
        kind = i % 3
        if kind == 0:  # aimed crossing: move edge b toward edge a midpoint
            mid_a = 0.5 * (a0 + a1)
            mid_b = 0.5 * (b0 + b1)
            d = (mid_a - mid_b) * rng.uniform(1.2, 3.0)
            p4 = np.vstack([np.zeros((2, 3)), np.tile(d, (2, 1))])
        elif kind == 1:  # near-parallel approach
            b0 = a0 + np.array([0, 1, 0]) * 0.3 * scale + rng.normal(0, 1e-4 * scale, 3)
            b1 = a1 + np.array([0, 1, 0]) * 0.3 * scale + rng.normal(0, 1e-4 * scale, 3)
            d = np.array([0, -1.0, 0]) * scale
            p4 = np.vstack([np.zeros((2, 3)), np.tile(d, (2, 1))])
        else:  # wild
            p4 = rng.normal(0, scale, (4, 3))
        X.append(np.vstack([a0, a1, b0, b1]))
        P.append(p4)
    return np.stack(X), np.stack(P)


def _degenerate_cases():
    """Stencils the kernels must survive (finite, conservative), even when
    geometrically degenerate. The production candidate set can contain all
    of these transiently (padded rows use stencil x[0,0,0,0])."""
    z = np.zeros((4, 3))
    return {
        "pt": [
            (z.copy(), z.copy()),  # all-coincident, no motion
            (z.copy(), np.array([[1.0, 0, 0]] * 4)),  # coincident, rigid motion
            # zero-area triangle under the falling point
            (np.array([[0, 1.0, 0], [-1, 0, 0], [0, 0, 0], [1, 0, 0]]),
             np.array([[0, -2.0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])),
            # point exactly in the triangle plane, moving away
            (np.array([[0, 0.0, 0.2], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]]),
             np.array([[0, 1.0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])),
        ],
        "ee": [
            (z.copy(), z.copy()),
            # zero-length edge b falling on edge a
            (np.array([[-1, 0, 0], [1, 0, 0], [0, 1.0, 0], [0, 1.0, 0]]),
             np.array([[0, 0, 0], [0, 0, 0], [0, -2.0, 0], [0, -2.0, 0]])),
            # exactly parallel overlapping edges closing
            (np.array([[-1, 0, 0], [1, 0, 0], [-1, 0.5, 0], [1, 0.5, 0]]),
             np.array([[0, 0, 0], [0, 0, 0], [0, -1.0, 0], [0, -1.0, 0]])),
            # collinear edges approaching end-to-end
            (np.array([[-2, 0, 0], [-1, 0, 0], [1, 0, 0], [2, 0, 0]]),
             np.array([[1.5, 0, 0], [1.5, 0, 0], [0, 0, 0], [0, 0, 0]])),
        ],
    }


# ---------------------------------------------------------------------------
# conservativeness fuzz (all methods, both kinds)
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["pt", "ee"])
@pytest.mark.parametrize("method", ["accd", "ti", "hybrid"])
def test_fuzz_conservative(kind, method):
    rng = np.random.default_rng(20260817)
    X, P = (_random_pt_cases if kind == "pt" else _random_ee_cases)(rng, N_RANDOM)
    X = jnp.asarray(X)
    P = jnp.asarray(P)
    alphas = np.asarray(_BATCHED[(kind, method)](X, P))
    assert np.isfinite(alphas).all()
    assert ((alphas >= 0.0) & (alphas <= 1.0)).all()
    min_d2 = np.asarray(
        (_min_d2_batch_pt if kind == "pt" else _min_d2_batch_ee)(
            X, P, jnp.asarray(alphas)
        )
    )
    # each method's own guarantee along [0, alpha]:
    #   raw TI (ms=0): distance >= its floating-point inclusion error bound
    #     err = 24 eps m^2 (ccd.py _ti) -> d2 >= err^2 (near-grazing aimed
    #     trajectories legitimately approach this floor);
    #   ACCD / hybrid: a 0.2*d0-scale gap is preserved — far above err, so
    #     a fixed scale-relative floor suffices.
    m = np.maximum(
        1.0,
        np.maximum(
            np.abs(np.asarray(X)).max(axis=(1, 2)),
            np.abs(np.asarray(X) + np.asarray(P)).max(axis=(1, 2)),
        ),
    )
    if method == "ti":
        floor = 0.5 * (24.0 * np.finfo(np.float64).eps * m * m) ** 2
    else:
        floor = 1e-24 * m * m
    ok = (alphas <= 0.0) | (min_d2 > floor)
    bad = np.nonzero(~ok)[0]
    assert len(bad) == 0, (method, kind, bad[:5], alphas[bad[:5]], min_d2[bad[:5]])


@pytest.mark.parametrize("kind", ["pt", "ee"])
def test_degenerate_stencils(kind):
    cases = _degenerate_cases()[kind]
    X = jnp.asarray(np.stack([c[0] for c in cases]))
    P = jnp.asarray(np.stack([c[1] for c in cases]))
    d2_fn = _dist2_pt if kind == "pt" else _dist2_ee
    d2_0 = np.asarray(jax.vmap(d2_fn)(X))
    for method in ("accd", "ti", "hybrid"):
        alphas = np.asarray(_BATCHED[(kind, method)](X, P))
        assert np.isfinite(alphas).all(), (method, alphas)
        assert ((alphas >= 0.0) & (alphas <= 1.0)).all(), (method, alphas)
        min_d2 = np.asarray(
            (_min_d2_batch_pt if kind == "pt" else _min_d2_batch_ee)(
                X, P, jnp.asarray(alphas)
            )
        )
        # already-touching stencils have d2 == 0 at t = 0; only separated
        # starts must stay separated within the returned step
        sep = (d2_0 > 0.0) & (alphas > 0.0)
        assert (min_d2[sep] > 0.0).all(), (method, alphas, min_d2)


# ---------------------------------------------------------------------------
# usefulness floors (structured cases where a tiny alpha breaks the solver)
# ---------------------------------------------------------------------------


def _one(kind, method, x4, p4):
    return float(
        _BATCHED[(kind, method)](
            jnp.asarray(x4)[None], jnp.asarray(p4)[None]
        )[0]
    )


def test_separating_motion_full_step():
    """Moving apart: every method must allow (nearly) the full step."""
    x4 = np.array([[0.0, 0.5, 0.1], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]])
    p4 = np.array([[0.0, 2.0, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])
    for method in ("accd", "ti", "hybrid"):
        assert _one("pt", method, x4, p4) >= 0.99, method


def test_no_motion_full_step():
    x4 = np.array([[0.0, 0.5, 0.1], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]])
    p4 = np.zeros((4, 3))
    for method in ("accd", "ti", "hybrid"):
        assert _one("pt", method, x4, p4) == 1.0, method


@pytest.mark.parametrize("t_star", [0.25, 0.5, 0.9])
def test_known_impact_time_not_overclamped(t_star):
    """Head-on impact at a known t*: the hybrid must use a decent fraction
    of the pre-impact window (ACCD converges to t* leaving the 0.2 d0 gap)."""
    x4 = np.array([[0.0, 1.0, 0.0], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]])
    p4 = np.array([[0.0, -1.0 / t_star, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])
    a = _one("pt", "hybrid", x4, p4)
    assert a <= t_star  # conservative
    assert a >= 0.5 * t_star, a  # useful


@pytest.mark.parametrize("tilt_deg", [0.0, 15.0, 40.0])
def test_tilted_resting_slide_not_overclamped(tilt_deg):
    """Tangential slide at distance d0 over a (tilted) triangle: the true
    toi is infinite, but the t-only interval bisection is loose here
    (documented in pipeline.py); the production hybrid bound must keep a
    useful fraction of the step. This is the adversarial case behind the
    reference's no_zero_toi hacks."""
    th = np.radians(tilt_deg)
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]
    )
    tri = np.array([[-1, 0, -1], [1, 0, -1], [0, 0, 1.5]]) @ R.T
    nrm = np.cross(tri[1] - tri[0], tri[2] - tri[0])
    nrm /= np.linalg.norm(nrm)
    d0 = 1e-3
    p0 = np.array([0.0, 0.0, 0.1]) @ R.T + d0 * nrm
    slide = (tri[1] - tri[0]) / np.linalg.norm(tri[1] - tri[0])
    x4 = np.vstack([p0, tri])
    p4 = np.vstack([slide * 0.5, np.zeros((3, 3))])  # big tangential motion
    a = _one("pt", "hybrid", x4, p4)
    min_d2 = np.asarray(
        _min_d2_batch_pt(
            jnp.asarray(x4)[None], jnp.asarray(p4)[None], jnp.asarray([a])
        )
    )[0]
    assert min_d2 > 0.0
    assert a >= 0.5, (tilt_deg, a)  # TI sees separation along the normal


def test_gap_preserved_matches_accd_policy():
    """ACCD stops leaving ~gap_frac * d0 of clearance (the reference's
    distance-slackness eta = (1-s) d policy, SelfCollisionHandler.cpp:
    1020-1060): at the returned step the true distance is within a small
    factor of 0.2 * d0 for a head-on impact."""
    x4 = np.array([[0.0, 1.0, 0.0], [-1, 0, -1], [1, 0, -1], [0, 0, 1.5]])
    p4 = np.array([[0.0, -2.0, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])
    a = _one("pt", "accd", x4, p4)
    min_d2 = np.asarray(
        _min_d2_batch_pt(
            jnp.asarray(x4)[None], jnp.asarray(p4)[None], jnp.asarray([a])
        )
    )[0]
    d_end = np.sqrt(min_d2)
    d0 = np.sqrt(float(_dist2_pt(jnp.asarray(x4))))
    assert 0.05 * d0 <= d_end <= 0.5 * d0, (a, d_end, d0)
