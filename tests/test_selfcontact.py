"""Self-contact pipeline tests: barrier energy/gradient FD checks over
candidate tensors, ACCD conservativeness, intersection predicate, and the
two-cube / crossed-rod end-to-end scenes (the reference's 2cubesFall
tutorial + an EE-dominated configuration)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ipc_tpu.models.primitives import cube, rod
from ipc_tpu.mesh import build_mesh, merge_meshes
from ipc_tpu.timestepper import IPCStepper, SimParams
from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.contact.pipeline import SelfContact
from ipc_tpu.contact import selfcollision as SC
from ipc_tpu.contact.ccd import accd_pt, accd_ee
from ipc_tpu.contact.intersection import segment_triangle_intersects
from ipc_tpu.ops import distance as D

pytestmark = pytest.mark.slow  # minutes-long e2e solver runs


def _two_cube_scene(gap=0.004):
    V1, T1 = cube(1)
    V2, T2 = cube(1)
    V2 = V2 + np.array([0.0, 1.0 + gap, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    return build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)


class TestBarrierOverCandidates:
    def test_gradient_matches_fd(self):
        mesh, meta = _two_cube_scene(gap=0.004)
        sc = SelfContact(mesh, meta)
        dHat = 1e-4  # activates the near pairs
        x0 = np.asarray(mesh.x_rest)
        rng = np.random.default_rng(0)
        x0 = x0 + rng.uniform(-1e-3, 1e-3, x0.shape)
        cand = sc.build_candidates(jnp.asarray(x0), jnp.zeros_like(mesh.x_rest), np.sqrt(dHat) * 2)
        assert int(cand.pt_count) > 0

        f = lambda x: sc.energy(x, cand, 1.0, dHat)
        g = sc.gradient(jnp.asarray(x0), cand, 1.0, dHat)
        # FD on a few random vertices
        eps = 1e-7
        for vi in rng.choice(len(x0), 6, replace=False):
            for c in range(3):
                xp = x0.copy()
                xp[vi, c] += eps
                xm = x0.copy()
                xm[vi, c] -= eps
                fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
                np.testing.assert_allclose(
                    float(g[vi, c]), fd, rtol=5e-4, atol=1e-6 * max(1.0, abs(fd))
                )

    def test_hessian_blocks_psd(self):
        mesh, meta = _two_cube_scene(gap=0.004)
        sc = SelfContact(mesh, meta)
        dHat = 1e-4
        x = jnp.asarray(mesh.x_rest)
        cand = sc.build_candidates(x, jnp.zeros_like(x), np.sqrt(dHat) * 2)
        H_pt, H_ee = sc.hessian_blocks(x, cand, 1.0, dHat, True)
        for H in [np.asarray(H_pt), np.asarray(H_ee)]:
            if len(H) == 0:
                continue
            w = np.linalg.eigvalsh(0.5 * (H + np.transpose(H, (0, 2, 1))))
            assert w.min() > -1e-8 * max(1.0, abs(w).max())

    def test_mollifier_activates_for_parallel_edges(self):
        # two nearly-parallel close edges -> ee_pair_energy < plain barrier
        from ipc_tpu.ops.barrier import barrier

        x4 = jnp.asarray(
            [
                [0.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [0.005, 0.002, 0.0],
                [1.005, 0.002, 1e-5],
            ]
        )
        eps_x = D.eps_x_ee(x4[0], x4[1], x4[2], x4[3])
        e_moll = SC.ee_pair_energy(x4, eps_x, 1e-4)
        ct, xs = SC.ee_reduce(x4)
        b = barrier(D.stencil_dist2(ct, xs), 1e-4)
        assert float(e_moll) < float(b)
        assert float(e_moll) > 0.0


class TestActiveCompaction:
    def test_active_subset_operator_exact(self):
        """The compacted active-pair Hessian must act identically to the
        full-candidate Hessian (inactive blocks are exactly zero)."""
        mesh, meta = _two_cube_scene(gap=0.004)
        sc = SelfContact(mesh, meta)
        dHat = 1e-4
        rng = np.random.default_rng(1)
        x = jnp.asarray(np.asarray(mesh.x_rest) + rng.uniform(-5e-4, 5e-4, (meta.n_verts, 3)))
        cand = sc.build_candidates(x, jnp.zeros_like(x), np.sqrt(dHat) * 2)
        H_pt, H_ee = sc.hessian_blocks(x, cand, 2.0, dHat, True)
        vids_a, H_a, (cnt_pt, cnt_ee) = sc.hessian_blocks_active(x, cand, 2.0, dHat, True)
        assert 0 < int(cnt_pt) <= sc.cap_act_pt
        assert 0 < int(cnt_ee) <= sc.cap_act_ee
        v = jnp.asarray(rng.normal(size=x.shape))

        def apply(vids, H):
            out = jnp.zeros_like(v)
            v4 = v[vids].reshape(-1, 12)
            hv = jnp.einsum("cij,cj->ci", H, v4)
            return out.at[vids.reshape(-1)].add(hv.reshape(-1, 3))

        full = apply(cand.pt_vids, H_pt) + apply(cand.ee_vids, H_ee)
        act = apply(vids_a, H_a)
        np.testing.assert_allclose(np.asarray(act), np.asarray(full), atol=1e-10)


class TestACCD:
    def test_pt_head_on(self):
        x4 = jnp.asarray(
            [[0.25, 1.0, 0.25], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )
        p4 = jnp.asarray([[0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        t = float(accd_pt(x4, p4, 0.2, 64))
        # impact at t=0.5; conservative: t < 0.5, but close
        assert 0.3 < t < 0.5
        # verify no penetration at returned t
        d = float(D.point_triangle_dist2(*(x4 + t * p4)))
        assert d > 0

    def test_ee_head_on(self):
        x4 = jnp.asarray(
            [[-1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]
        )
        p4 = jnp.asarray(
            [[0.0, -2.0, 0.0], [0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
        )
        t = float(accd_ee(x4, p4, 0.2, 64))
        assert 0.3 < t < 0.5
        d = float(D.edge_edge_dist2(*(x4 + t * p4)))
        assert d > 0

    def test_no_collision_returns_one(self):
        x4 = jnp.asarray(
            [[0.0, 5.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )
        p4 = jnp.asarray([[1.0, 1.0, 0.0]] * 4)  # rigid translation
        assert float(accd_pt(x4, p4, 0.2, 64)) == 1.0
        p4 = jnp.zeros((4, 3))
        assert float(accd_pt(x4, p4, 0.2, 64)) == 1.0

    def test_grazing_motion(self):
        # moving parallel to the triangle plane above it: full step allowed
        x4 = jnp.asarray(
            [[0.25, 0.5, 0.25], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )
        p4 = jnp.asarray([[5.0, 0.0, 0.0], [0, 0, 0], [0, 0, 0], [0, 0, 0]])
        t = float(accd_pt(x4, p4, 0.2, 64))
        assert t == 1.0


class TestIntersection:
    def test_segment_through_triangle(self):
        a, b, c = jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0])
        p, q = jnp.asarray([0.2, 1.0, 0.2]), jnp.asarray([0.2, -1.0, 0.2])
        assert bool(segment_triangle_intersects(p, q, a, b, c))
        # miss: outside the triangle
        p2, q2 = jnp.asarray([2.0, 1.0, 2.0]), jnp.asarray([2.0, -1.0, 2.0])
        assert not bool(segment_triangle_intersects(p2, q2, a, b, c))
        # same side: no crossing
        p3, q3 = jnp.asarray([0.2, 1.0, 0.2]), jnp.asarray([0.3, 0.5, 0.3])
        assert not bool(segment_triangle_intersects(p3, q3, a, b, c))


class TestScenes:
    def test_two_cubes_fall(self):
        """Upper cube falls onto lower onto ground; no penetration ever."""
        V1, T1 = cube(1)
        V2, T2 = cube(1)
        V1 = V1 + np.array([0.0, 0.002, 0.0])  # lower: just above the ground
        V2 = V2 + np.array([0.0, 1.2, 0.0])  # upper: 0.2 above the lower top
        V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
        mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges)
        hs = HalfSpace(HalfSpaceParams(friction=0.1))
        sc = SelfContact(mesh, meta, friction=0.1)
        st = IPCStepper(mesh, meta, SimParams(), halfspaces=[hs], self_contact=sc)
        state = st.initial_state()
        saw_contact = False
        for i in range(24):
            state, stats = st.step(state)
            assert float(state.x[:, 1].min()) > 0.0
            hit, _ = st._has_intersection(state.x)
            assert not bool(hit), f"intersection at step {i}"
            if stats.n_constraints and stats.n_constraints[-1] > 0:
                saw_contact = True
        assert saw_contact

    def test_crossed_rods_ee(self):
        """A rod dropped across another -> EE contacts must hold it up."""
        V1, T1 = rod(3, length=1.0, width=0.12)  # along x
        V1 = V1 + np.array([0.0, 0.0, 0.44])  # center its z-extent at 0.5
        V2, T2 = rod(3, length=1.0, width=0.12)
        # rotate rod2 to run along z, center it above rod1's midpoint so the
        # crossing is at rod2's middle (stable support)
        R = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
        V2 = V2 @ R.T
        V2 = V2 + np.array([0.5, 0.4, 0.5]) - (V2.min(0) + V2.max(0)) / 2
        V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
        n1 = len(V1)
        dbc = np.zeros(len(V), dtype=bool)
        # pin rod1 ends so it can't translate away
        xr = V[:n1, 0]
        dbc[:n1] = (xr < 0.05) | (xr > 0.95)
        # stiff rods (1e7) so the dropped rod doesn't drape around the support
        mesh, meta = build_mesh(
            V, T, ym=1e7, dbc_mask=dbc, vert_comp=comp, comp_ranges=ranges
        )
        sc = SelfContact(mesh, meta, friction=0.1)
        st = IPCStepper(mesh, meta, SimParams(), halfspaces=[], self_contact=sc)
        state = st.initial_state()
        for i in range(20):
            state, stats = st.step(state)
            hit, _ = st._has_intersection(state.x)
            assert not bool(hit), f"intersection at step {i}"
        # rod2 must be held up by rod1 at the crossing: its vertices above
        # rod1's span must stay above rod1's top region
        x = np.asarray(state.x)
        x2 = x[n1:]
        over = (x2[:, 2] > 0.25) & (x2[:, 2] < 0.75)  # nodes adjacent to the crossing
        assert over.any()
        assert x2[over, 1].min() > 0.08, x2[over, 1].min()


class TestOrientFilterScales:
    """Regression for the position-aware orientation noise filter
    (contact/intersection.py _orient_sign): the old difference-relative
    bound zeroed genuine orientation signs of near-miss pairs (thin-
    feature meshes), making the intersection failsafe report a phantom
    hit at every line-search scale — dolphinFunnel's scripted drag was
    backtracked to zero every step for three rounds."""

    def _tri(self, s, base):
        a = jnp.asarray([base, base, base], jnp.float32)
        b = jnp.asarray([base + s, base, base], jnp.float32)
        c = jnp.asarray([base, base, base + s], jnp.float32)
        return a, b, c

    def test_near_miss_is_not_intersecting(self):
        # segment crossing the triangle's PLANE but passing OUTSIDE the
        # triangle by ~1% of the edge length: a real orientation sign,
        # far above f32 rounding, must NOT be filtered to zero
        s = 0.02
        a, b, c = self._tri(s, 0.3)
        p = jnp.asarray([0.3 - 0.01 * s, 0.3 + 0.5 * s, 0.3 + 0.4 * s])
        q = jnp.asarray([0.3 - 0.01 * s, 0.3 - 0.5 * s, 0.3 + 0.4 * s])
        assert not bool(segment_triangle_intersects(p, q, a, b, c))

    def test_true_crossing_detected(self):
        s = 0.02
        a, b, c = self._tri(s, 0.3)
        p = jnp.asarray([0.3 + 0.2 * s, 0.3 + 0.5 * s, 0.3 + 0.2 * s])
        q = jnp.asarray([0.3 + 0.2 * s, 0.3 - 0.5 * s, 0.3 + 0.2 * s])
        assert bool(segment_triangle_intersects(p, q, a, b, c))

    def test_coplanar_sheet_at_large_scale_stays_clean(self):
        # flat-sheet self pairs at coordinate scale 20 (mat scenes at
        # size 20): roundoff-perturbed coplanar configurations must keep
        # classifying as degenerate (no random-sign phantom hits)
        import numpy as np

        base = np.float32(20.0)
        pts = []
        for i in range(4):
            for j in range(4):
                p = np.array([base + 0.2 * i, base, base + 0.2 * j],
                             np.float32)
                p = (p * np.float32(1.0000001)).astype(np.float32)
                pts.append(p)
        pts = np.stack(pts)
        for ei in range(len(pts) - 1):
            for t0 in range(len(pts) - 3):
                assert not bool(segment_triangle_intersects(
                    jnp.asarray(pts[ei]), jnp.asarray(pts[ei + 1]),
                    jnp.asarray(pts[t0]), jnp.asarray(pts[t0 + 1]),
                    jnp.asarray(pts[t0 + 2])))
