"""L0 kernel tests: the checker pattern of the reference's Diagnostic modes
11/14/15/16 (sigma-space and distance-kernel derivative checks, dType
fuzzing) re-expressed as FD-vs-autodiff and cross-implementation checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipc_tpu.ops import barrier as B
from ipc_tpu.ops import distance as D
from ipc_tpu.ops import friction as FR
from ipc_tpu.ops.spd import make_psd, make_psd2
from ipc_tpu.ops.step_bound import injective_step_bound, smallest_positive_root_cubic
from ipc_tpu.ops.svd3 import svd3_flip, svd3_jacobi


def fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        g[idx] = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
        it.iternext()
    return g


# ---------------------------------------------------------------------------
# barrier
# ---------------------------------------------------------------------------


class TestBarrier:
    def test_values_match_closed_form(self):
        dHat = 1e-3
        d = jnp.array([1e-5, 1e-4, 5e-4, 9.9e-4])
        b = B.barrier(d, dHat)
        expected = -((d - dHat) ** 2) * jnp.log(d / dHat)
        np.testing.assert_allclose(b, expected, rtol=1e-12)

    def test_zero_outside(self):
        dHat = 1e-3
        assert B.barrier(jnp.array(2e-3), dHat) == 0.0
        assert B.barrier_grad(jnp.array(1e-3), dHat) == 0.0
        assert B.barrier_hess(jnp.array(0.0), dHat) == 0.0

    @pytest.mark.parametrize("order", [0, 1, 2])
    def test_grad_hess_fd(self, order):
        dHat = 1e-2
        for d0 in [1e-4, 1e-3, 5e-3]:
            g_fd = fd_grad(lambda d: B.barrier(d, dHat, order), np.array(d0), eps=1e-9)
            g = B.barrier_grad(jnp.array(d0), dHat, order)
            np.testing.assert_allclose(g, g_fd, rtol=1e-4)
            h_fd = fd_grad(lambda d: B.barrier_grad(d, dHat, order), np.array(d0), eps=1e-9)
            h = B.barrier_hess(jnp.array(d0), dHat, order)
            np.testing.assert_allclose(h, h_fd, rtol=1e-4)

    def test_c2_smooth_at_dhat(self):
        # C2 barrier: b, b', b'' all -> 0 as d -> dHat^-
        dHat = 1e-3
        d = jnp.array(dHat * (1 - 1e-8))
        assert abs(B.barrier(d, dHat)) < 1e-18
        assert abs(B.barrier_grad(d, dHat)) < 1e-9
        assert abs(B.barrier_hess(d, dHat)) < 1e-4


# ---------------------------------------------------------------------------
# distances + classifiers
# ---------------------------------------------------------------------------


def _rand_stencils(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-scale, scale, size=(n, 4, 3))


class TestDistance:
    def test_pp(self):
        a = jnp.array([0.0, 0.0, 0.0])
        b = jnp.array([1.0, 2.0, 2.0])
        np.testing.assert_allclose(D.d_PP(a, b), 9.0)

    def test_pe_analytic(self):
        p = jnp.array([0.0, 1.0, 0.0])
        np.testing.assert_allclose(
            D.d_PE(p, jnp.array([-1.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0])), 1.0
        )

    def test_pt_analytic(self):
        p = jnp.array([0.1, 0.7, 0.2])
        np.testing.assert_allclose(
            D.d_PT(
                p,
                jnp.zeros(3),
                jnp.array([1.0, 0.0, 0.0]),
                jnp.array([0.0, 0.0, 1.0]),
            ),
            0.49,
        )

    def test_ee_analytic(self):
        d = D.d_EE(
            jnp.array([-1.0, 0.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 0.5, -1.0]),
            jnp.array([0.0, 0.5, 1.0]),
        )
        np.testing.assert_allclose(d, 0.25)

    def test_point_triangle_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        n = 60
        u, v = np.meshgrid(np.linspace(0, 1, n + 1), np.linspace(0, 1, n + 1))
        keep = (u + v) <= 1.0
        u, v = u[keep][:, None, None], v[keep][:, None, None]
        X = rng.uniform(-1, 1, size=(200, 4, 3))
        d = np.asarray(
            jax.jit(jax.vmap(lambda x: D.point_triangle_dist2(x[0], x[1], x[2], x[3])))(
                jnp.asarray(X)
            )
        )
        pts = X[None, :, 1] + u * (X[None, :, 2] - X[None, :, 1]) + v * (
            X[None, :, 3] - X[None, :, 1]
        )  # (G,200,3)
        best = np.min(np.sum((X[None, :, 0] - pts) ** 2, axis=2), axis=0)
        assert np.all(d <= best + 1e-9)
        assert np.all(d >= best - 2e-3)  # grid resolution slack

    def test_edge_edge_vs_bruteforce(self):
        rng = np.random.default_rng(4)
        n = 80
        s, t = np.meshgrid(np.linspace(0, 1, n + 1), np.linspace(0, 1, n + 1))
        s, t = s.reshape(-1, 1, 1), t.reshape(-1, 1, 1)
        X = rng.uniform(-1, 1, size=(200, 4, 3))
        d = np.asarray(
            jax.jit(jax.vmap(lambda x: D.edge_edge_dist2(x[0], x[1], x[2], x[3])))(
                jnp.asarray(X)
            )
        )
        pa = X[None, :, 0] + s * (X[None, :, 1] - X[None, :, 0])
        pb = X[None, :, 2] + t * (X[None, :, 3] - X[None, :, 2])
        best = np.min(np.sum((pa - pb) ** 2, axis=2), axis=0)
        assert np.all(d <= best + 1e-9)
        assert np.all(d >= best - 2e-3)

    def test_stencil_grad_fd(self):
        rng = np.random.default_rng(5)
        for ct in range(4):
            x = rng.uniform(-1, 1, size=(4, 3))
            f = lambda x: D.stencil_dist2(ct, x)
            g = D.stencil_dist2_grad(ct, jnp.asarray(x))
            g_fd = fd_grad(f, x)
            np.testing.assert_allclose(g, g_fd, rtol=1e-5, atol=1e-7)

    def test_stencil_hess_symmetric(self):
        x = jnp.asarray(_rand_stencils(1, 7)[0])
        for ct in range(4):
            H = D.stencil_dist2_hess(ct, x)
            np.testing.assert_allclose(H, H.T, atol=1e-12)

    def test_dtype_pt_consistency(self):
        # the region-aware distance must equal the min over all 7 candidates
        rng = np.random.default_rng(8)
        X = jnp.asarray(rng.uniform(-1, 1, size=(300, 4, 3)))

        @jax.jit
        @jax.vmap
        def check(x):
            d = D.point_triangle_dist2(x[0], x[1], x[2], x[3])
            cands = jnp.stack(
                [
                    D.d_PP(x[0], x[1]),
                    D.d_PP(x[0], x[2]),
                    D.d_PP(x[0], x[3]),
                    D.point_edge_dist2(x[0], x[1], x[2]),
                    D.point_edge_dist2(x[0], x[2], x[3]),
                    D.point_edge_dist2(x[0], x[3], x[1]),
                ]
            )
            return d, cands.min()

        d, best = check(X)
        assert np.all(np.asarray(d) <= np.asarray(best) + 1e-12)

    def test_dtype_ee_consistency(self):
        rng = np.random.default_rng(9)
        X = jnp.asarray(rng.uniform(-1, 1, size=(300, 4, 3)))

        @jax.jit
        @jax.vmap
        def check(x):
            d = D.edge_edge_dist2(x[0], x[1], x[2], x[3])
            cands = jnp.stack(
                [
                    D.point_edge_dist2(x[0], x[2], x[3]),
                    D.point_edge_dist2(x[1], x[2], x[3]),
                    D.point_edge_dist2(x[2], x[0], x[1]),
                    D.point_edge_dist2(x[3], x[0], x[1]),
                ]
            )
            return d, cands.min()

        d, best = check(X)
        assert np.all(np.asarray(d) <= np.asarray(best) + 1e-12)

    def test_mollifier(self):
        x = jnp.asarray(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.01]]
        )
        eps_x = D.eps_x_ee(x[0], x[1], x[2], x[3])
        e = D.mollifier_ee(x, eps_x)
        assert 0.0 < float(e) < 1.0  # nearly parallel -> mollified
        # orthogonal edges -> 1
        x2 = jnp.asarray(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5]]
        )
        assert float(D.mollifier_ee(x2, D.eps_x_ee(x2[0], x2[1], x2[2], x2[3]))) == 1.0

    def test_mollifier_grad_fd(self):
        x = _rand_stencils(1, 11, 0.5)[0]
        x[1] = x[0] + np.array([1.0, 0.01, 0.0])
        x[3] = x[2] + np.array([1.0, 0.0, 0.01])
        eps_x = float(D.eps_x_ee(*[jnp.asarray(v) for v in x]))
        f = lambda x: D.mollifier_ee(x, eps_x)
        g = jax.grad(f)(jnp.asarray(x))
        g_fd = fd_grad(f, x)
        np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-8)


# ---------------------------------------------------------------------------
# SVD + SPD
# ---------------------------------------------------------------------------


class TestSVD:
    def _check(self, F, U, s, V):
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-8)
        np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-8)
        np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-8)
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-8)
        np.testing.assert_allclose(U @ np.diag(s) @ V.T, F, atol=1e-7)
        assert s[0] >= s[1] >= abs(s[2]) - 1e-9

    @pytest.mark.parametrize("impl", [svd3_flip, svd3_jacobi])
    def test_random(self, impl):
        rng = np.random.default_rng(12)
        F = rng.normal(size=(100, 3, 3))
        U, s, V = jax.jit(jax.vmap(impl))(jnp.asarray(F))
        U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
        for i in range(100):
            self._check(F[i], U[i], s[i], V[i])
            assert (s[i, 2] < 0) == (np.linalg.det(F[i]) < 0)

    @pytest.mark.parametrize("impl", [svd3_flip, svd3_jacobi])
    def test_degenerate(self, impl):
        cases = [
            np.zeros((3, 3)),
            np.eye(3),
            -np.eye(3),
            np.diag([1.0, 1.0, 0.0]),
            np.diag([1e-12, 1e-14, 0.0]),
            np.outer([1.0, 2.0, 3.0], [1.0, 0.0, 0.0]),
        ]
        for F in cases:
            U, s, V = impl(jnp.asarray(F))
            U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
            assert np.all(np.isfinite(U)) and np.all(np.isfinite(V))
            np.testing.assert_allclose(U @ np.diag(s) @ V.T, F, atol=1e-7)
            np.testing.assert_allclose(abs(np.linalg.det(U)), 1.0, atol=1e-7)

    def test_jacobi_matches_lapack_sigmas(self):
        rng = np.random.default_rng(13)
        F = rng.normal(size=(64, 3, 3))
        _, s1, _ = jax.vmap(svd3_flip)(jnp.asarray(F))
        _, s2, _ = jax.vmap(svd3_jacobi)(jnp.asarray(F))
        np.testing.assert_allclose(s1, s2, rtol=1e-8, atol=1e-10)


class TestSPD:
    def test_make_psd(self):
        rng = np.random.default_rng(14)
        for n in [2, 3, 12]:
            A = rng.normal(size=(n, n))
            A = A + A.T
            P = np.asarray(make_psd(jnp.asarray(A)))
            w = np.linalg.eigvalsh(P)
            assert w.min() >= -1e-10
            # projection is identity on already-PSD matrices
            P2 = np.asarray(make_psd(jnp.asarray(P)))
            np.testing.assert_allclose(P2, P, atol=1e-9)

    def test_make_psd2_matches_general(self):
        rng = np.random.default_rng(15)
        for _ in range(50):
            A = rng.normal(size=(2, 2))
            A = A + A.T
            np.testing.assert_allclose(
                make_psd2(jnp.asarray(A)), make_psd(jnp.asarray(A)), atol=1e-9
            )


# ---------------------------------------------------------------------------
# inversion-free step bound
# ---------------------------------------------------------------------------


class TestStepBound:
    def test_cubic_roots(self):
        # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6
        r = smallest_positive_root_cubic(
            jnp.array(1.0), jnp.array(-6.0), jnp.array(11.0), jnp.array(-6.0)
        )
        np.testing.assert_allclose(r, 1.0, rtol=1e-8)
        # no positive roots
        r = smallest_positive_root_cubic(
            jnp.array(1.0), jnp.array(6.0), jnp.array(11.0), jnp.array(6.0)
        )
        assert float(r) > 1e29
        # quadratic degeneration: (x-2)(x+5)
        r = smallest_positive_root_cubic(
            jnp.array(0.0), jnp.array(1.0), jnp.array(3.0), jnp.array(-10.0)
        )
        np.testing.assert_allclose(r, 2.0, rtol=1e-8)
        # linear
        r = smallest_positive_root_cubic(
            jnp.array(0.0), jnp.array(0.0), jnp.array(2.0), jnp.array(-8.0)
        )
        np.testing.assert_allclose(r, 4.0, rtol=1e-8)

    def test_step_bound_blocks_inversion(self):
        rng = np.random.default_rng(16)
        As = rng.normal(size=(100, 3, 3))
        flip = np.linalg.det(As) < 0
        As[flip, :, 0] *= -1
        Bs = rng.normal(size=(100, 3, 3))
        ts = np.asarray(
            jax.jit(jax.vmap(injective_step_bound))(jnp.asarray(As), jnp.asarray(Bs))
        )
        for i in range(100):
            A, Bm, t = As[i], Bs[i], float(ts[i])
            detA = np.linalg.det(A)
            if t < 1e29:
                # at the bound the det equals slackness * detA
                np.testing.assert_allclose(
                    np.linalg.det(A + t * Bm), 0.2 * detA, rtol=1e-5, atol=1e-9
                )
                # slightly before the bound the det is above the slack line
                assert np.linalg.det(A + 0.99 * t * Bm) > 0.2 * detA - 1e-9
            else:
                for tt in [0.5, 1.0, 10.0, 1000.0]:
                    assert np.linalg.det(A + tt * Bm) > 0.2 * detA - 1e-9


# ---------------------------------------------------------------------------
# friction kernels
# ---------------------------------------------------------------------------


class TestFriction:
    @pytest.mark.parametrize("order", [0, 1, 2])
    def test_f1_is_derivative_of_f0(self, order):
        eps = 1e-3
        for x in [1e-5, 1e-4, 5e-4, 9e-4]:
            f0 = lambda y: FR.f0_sf(y * y, eps, order)
            d_fd = fd_grad(f0, np.array(x), eps=1e-9)
            f1 = float(FR.f1_sf_over_x(jnp.array(x * x), eps, order)) * x
            np.testing.assert_allclose(f1, d_fd, rtol=1e-3)

    def test_f0_c1_continuity_at_eps(self):
        eps = 1e-3
        f0_in = float(FR.f0_sf(jnp.array(eps * eps), eps, 1))
        np.testing.assert_allclose(f0_in, eps, rtol=1e-12)  # matches |x| branch
        f1_in = float(FR.f1_sf_over_x(jnp.array(eps * eps), eps, 1)) * eps
        np.testing.assert_allclose(f1_in, 1.0, rtol=1e-12)  # matches d|x|

    def test_tangent_bases_orthonormal(self):
        rng = np.random.default_rng(17)
        for ct in range(4):
            x = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)))
            Bm = np.asarray(FR.tangent_basis(ct, x))
            np.testing.assert_allclose(Bm.T @ Bm, np.eye(2), atol=1e-9)

    def test_rel_dx_matches_reference_formulas(self):
        rng = np.random.default_rng(18)
        dx = rng.uniform(-1, 1, size=(4, 3))
        # PT
        b1, b2 = 0.3, 0.4
        w = FR.rel_dx(2, jnp.array([b1, b2]), jnp.asarray(dx))
        expect = dx[0] - (dx[1] + b1 * (dx[2] - dx[1]) + b2 * (dx[3] - dx[1]))
        np.testing.assert_allclose(w, expect, atol=1e-12)
        # EE
        g1, g2 = 0.2, 0.7
        w = FR.rel_dx(3, jnp.array([g1, g2]), jnp.asarray(dx))
        expect = dx[0] + g1 * (dx[1] - dx[0]) - (dx[2] + g2 * (dx[3] - dx[2]))
        np.testing.assert_allclose(w, expect, atol=1e-12)

    def test_closest_point_is_critical_point(self):
        # the closest-point coords must minimize the distance parametrization
        rng = np.random.default_rng(19)
        x = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)))
        beta = FR.closest_point_coords(2, x)

        def dist_pt(b):
            pt = x[1] + b[0] * (x[2] - x[1]) + b[1] * (x[3] - x[1])
            return jnp.sum((x[0] - pt) ** 2)

        g = jax.grad(dist_pt)(beta)
        np.testing.assert_allclose(g, 0.0, atol=1e-9)
        gamma = FR.closest_point_coords(3, x)

        def dist_ee(g_):
            pa = x[0] + g_[0] * (x[1] - x[0])
            pb = x[2] + g_[1] * (x[3] - x[2])
            return jnp.sum((pa - pb) ** 2)

        g = jax.grad(dist_ee)(gamma)
        np.testing.assert_allclose(g, 0.0, atol=1e-9)


class TestNearParallelEEF32:
    """Regression: near-parallel f32 edge pairs must never classify as
    interior EE (dtype-aware deflection threshold, ops/distance.py
    dtype_EE). Structured-grid scenes hold edge pairs parallel to ~1e-5
    rad; the interior-EE formula is cancellation noise there in f32 —
    12_matOnBoard's first jitted step saw d^2 ~ 0 for pairs 0.7 grid
    spacings apart, activated the barrier on them, and NaN'd its
    gradient (which then NaN'd the swept broad phase into a one-bucket
    19188-prim collapse misdiagnosed as a capacity failure)."""

    def _pair(self):
        # two collinear-ish edges of length h, offset 0.7h sideways,
        # tilted by 1e-5 rad, coordinates O(0.3) like the scene
        h = 0.0128
        base = np.array([0.3, 0.8, 0.25], np.float32)
        a0 = base
        a1 = base + np.array([h, 0, 0], np.float32)
        off = np.array([0.35 * h, 0.7 * h, 0], np.float32)
        tilt = np.array([0, 1e-5 * h, 0], np.float32)
        b0 = base + off
        b1 = base + off + np.array([h, 0, 0], np.float32) + tilt
        return map(jnp.asarray, (a0, a1, b0, b1))

    def test_not_interior_ee(self):
        from ipc_tpu.ops import distance as D

        a0, a1, b0, b1 = self._pair()
        dt = int(D.dtype_EE(a0, a1, b0, b1))
        assert dt != 8

    def test_distance_accurate_under_jit(self):
        from ipc_tpu.ops import distance as D

        a0, a1, b0, b1 = self._pair()
        d_eager = float(D.edge_edge_dist2(a0, a1, b0, b1))
        d_jit = float(jax.jit(D.edge_edge_dist2)(a0, a1, b0, b1))
        # true separation ~ |off| (sideways); both paths must agree and
        # neither may collapse toward zero
        true = float(np.sum(np.asarray([0.35 * 0.0128, 0.7 * 0.0128, 0]) ** 2))
        assert d_jit > 0.25 * true
        np.testing.assert_allclose(d_jit, d_eager, rtol=1e-3)

    def test_pair_energy_grad_finite_under_jit(self):
        from ipc_tpu.contact import selfcollision as SC

        a0, a1, b0, b1 = self._pair()
        x4 = jnp.stack([a0, a1, b0, b1])
        eps_x = jnp.float32(1e-3 * (0.0128**2) ** 2)
        # dHat ABOVE the garbage-zero distance but below the true one
        dHat = jnp.float32(1.25e-6)
        g = jax.jit(jax.grad(SC.ee_pair_energy))(x4, eps_x, dHat)
        assert bool(jnp.isfinite(g).all())
        # barrier must be inactive at the true distance
        e = float(jax.jit(SC.ee_pair_energy)(x4, eps_x, dHat))
        assert e == 0.0
