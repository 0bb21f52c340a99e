"""L2 elasticity tests: sigma-space derivative checks (reference Diagnostic
mode 11 / Energy::unitTest_*), analytic-vs-FD gradient/Hessian on random
tets, SPD projection, and invariance properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipc_tpu.energy import elasticity as EL
from ipc_tpu.mesh import build_mesh, lame_params


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


MU, LAM = lame_params(1e5, 0.4)

# jitted element kernels (eager dispatch dominates FD-loop runtime otherwise)
E_EL = jax.jit(EL._elem_energy, static_argnums=(5,))
G_EL = jax.jit(EL._elem_grad, static_argnums=(5,))
H_EL = jax.jit(EL._elem_hess, static_argnums=(5, 6))


def _rand_tet(rng, scale=0.3):
    """A non-degenerate, non-inverted tet near rest + a deformed copy."""
    base = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    rest = base + rng.uniform(-0.1, 0.1, size=(4, 3))
    x = rest + rng.uniform(-scale, scale, size=(4, 3))
    D = np.stack([rest[1] - rest[0], rest[2] - rest[0], rest[3] - rest[0]], axis=1)
    Dx = np.stack([x[1] - x[0], x[2] - x[0], x[3] - x[0]], axis=1)
    if np.linalg.det(D) < 0 or np.linalg.det(Dx) < 0:
        return _rand_tet(rng, scale)
    return rest, x, np.linalg.inv(D), abs(np.linalg.det(D)) / 6.0


@pytest.mark.parametrize("model", ["NH", "FCR"])
class TestSigmaSpace:
    def test_dE_matches_fd(self, model):
        m = EL.MODELS[model]
        E_j = jax.jit(m["E"])
        dE_j = jax.jit(m["dE"])
        rng = np.random.default_rng(0)
        for _ in range(8):
            s = rng.uniform(0.3, 2.0, size=3)
            g = dE_j(jnp.asarray(s), MU, LAM)
            g_fd = fd_grad(lambda s: E_j(s, MU, LAM), s, eps=1e-7)
            np.testing.assert_allclose(g, g_fd, rtol=1e-5)

    def test_d2E_matches_fd(self, model):
        m = EL.MODELS[model]
        dE_j = jax.jit(m["dE"])
        d2E_j = jax.jit(m["d2E"])
        rng = np.random.default_rng(1)
        for _ in range(8):
            s = rng.uniform(0.3, 2.0, size=3)
            H = d2E_j(jnp.asarray(s), MU, LAM)
            H_fd = np.stack(
                [fd_grad(lambda s: dE_j(s, MU, LAM)[i], s, eps=1e-7) for i in range(3)]
            )
            np.testing.assert_allclose(H, H_fd, rtol=1e-4, atol=1e-3)

    def test_zero_at_rest(self, model):
        m = EL.MODELS[model]
        s = jnp.ones(3)
        np.testing.assert_allclose(m["E"](s, MU, LAM), 0.0, atol=1e-12)
        np.testing.assert_allclose(m["dE"](s, MU, LAM), 0.0, atol=1e-9)


@pytest.mark.parametrize("model", ["NH", "FCR"])
class TestElement:
    def test_grad_matches_fd(self, model):
        rng = np.random.default_rng(2)
        for _ in range(10):
            rest, x, Binv, vol = _rand_tet(rng)
            f = lambda x4: E_EL(x4, jnp.asarray(Binv), vol, MU, LAM, model)
            g = G_EL(jnp.asarray(x), jnp.asarray(Binv), vol, MU, LAM, model)
            g_fd = fd_grad(f, x, eps=1e-6)
            np.testing.assert_allclose(g, g_fd, rtol=2e-4, atol=1e-4 * max(1, abs(g_fd).max()))

    def test_unprojected_hess_matches_fd(self, model):
        rng = np.random.default_rng(3)
        for _ in range(5):
            rest, x, Binv, vol = _rand_tet(rng)
            H = H_EL(jnp.asarray(x), jnp.asarray(Binv), vol, MU, LAM, model, False)
            g = lambda x4flat: G_EL(
                x4flat.reshape(4, 3), jnp.asarray(Binv), vol, MU, LAM, model
            ).reshape(12)
            H_fd = np.stack([fd_grad(lambda xf: g(xf)[i], x.reshape(12), eps=1e-6) for i in range(12)])
            scale = max(1.0, abs(H_fd).max())
            np.testing.assert_allclose(H, H_fd, atol=3e-4 * scale)

    def test_projected_hess_is_psd(self, model):
        rng = np.random.default_rng(4)
        for _ in range(10):
            rest, x, Binv, vol = _rand_tet(rng, scale=0.8)
            H = np.asarray(
                H_EL(jnp.asarray(x), jnp.asarray(Binv), vol, MU, LAM, model, True)
            )
            w = np.linalg.eigvalsh(0.5 * (H + H.T))
            assert w.min() >= -1e-7 * max(1.0, abs(w).max())

    def test_rotation_invariance(self, model):
        rng = np.random.default_rng(5)
        rest, x, Binv, vol = _rand_tet(rng)
        # random rotation applied to deformed state leaves energy unchanged
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        e0 = E_EL(jnp.asarray(x), jnp.asarray(Binv), vol, MU, LAM, model)
        e1 = E_EL(jnp.asarray(x @ Q.T), jnp.asarray(Binv), vol, MU, LAM, model)
        np.testing.assert_allclose(e0, e1, rtol=1e-8)

    def test_rest_state_zero(self, model):
        rng = np.random.default_rng(6)
        rest, _, Binv, vol = _rand_tet(rng)
        e = E_EL(jnp.asarray(rest), jnp.asarray(Binv), vol, MU, LAM, model)
        np.testing.assert_allclose(e, 0.0, atol=1e-9)
        g = G_EL(jnp.asarray(rest), jnp.asarray(Binv), vol, MU, LAM, model)
        np.testing.assert_allclose(g, 0.0, atol=1e-6)


class TestNHClosedFormP:
    def test_pk1_matches_closed_form(self):
        """P = U diag(dE/dsigma) V^T == mu (F - F^-T) + lam log(J) F^-T
        (reference NeoHookeanEnergy::compute_dE_div_dF :138-153)."""
        rng = np.random.default_rng(7)
        for _ in range(20):
            F = np.eye(3) + rng.uniform(-0.3, 0.3, size=(3, 3))
            if np.linalg.det(F) <= 0.05:
                continue
            from ipc_tpu.ops.svd3 import svd3_jacobi

            U, s, V = svd3_jacobi(jnp.asarray(F))
            dE = EL.MODELS["NH"]["dE"](s, MU, LAM)
            P = np.asarray(U) @ np.diag(np.asarray(dE)) @ np.asarray(V).T
            FinvT = np.linalg.inv(F).T
            J = np.linalg.det(F)
            P_ref = MU * (F - FinvT) + LAM * np.log(J) * FinvT
            np.testing.assert_allclose(P, P_ref, rtol=1e-6, atol=1e-8)


class TestMeshLevel:
    def test_two_tet_mesh_gradient(self):
        V = np.array(
            [
                [0.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [1.0, 1.0, 1.0],
            ]
        )
        T = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
        mesh, meta = build_mesh(V, T)
        rng = np.random.default_rng(8)
        x = V + rng.uniform(-0.05, 0.05, size=V.shape)
        g = EL.elasticity_gradient(jnp.asarray(x), mesh, "NH")
        g_fd = fd_grad(lambda xv: EL.elasticity_energy(xv, mesh, "NH"), x, eps=1e-6)
        np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-3)

    def test_filter_step_size(self):
        V = np.array(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        T = np.array([[0, 1, 2, 3]])
        mesh, meta = build_mesh(V, T)
        # push vertex 3 through the base plane: inverts at t such that
        # z3 + t*(-2) scaled... direction -2 in z from z=1 -> inverts at 0.5
        p = np.zeros_like(V)
        p[3, 2] = -2.0
        t = float(EL.filter_step_size(jnp.asarray(V), jnp.asarray(p), mesh, "NH"))
        # slackness 0.2: det drops to 0.2*det0 at t = 0.8*0.5
        np.testing.assert_allclose(t, 0.4, rtol=1e-6)
        # FCR does not filter
        t2 = float(EL.filter_step_size(jnp.asarray(V), jnp.asarray(p), mesh, "FCR"))
        assert t2 == np.inf

    def test_mass_matches_volume(self):
        V = np.array(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        T = np.array([[0, 1, 2, 3]])
        mesh, meta = build_mesh(V, T, density=2000.0)
        np.testing.assert_allclose(float(mesh.mass.sum()), 2000.0 / 6.0, rtol=1e-12)
