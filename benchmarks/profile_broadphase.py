"""Micro-profile of the fused broad phase on the real TPU: grid builds vs
typed queries vs the nonzero compactions, to target the dominant cost.

Usage: python benchmarks/profile_broadphase.py [n_cells] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ipc_tpu.contact import broadphase as BP
    from ipc_tpu.contact import spatial_hash as SH

    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    st = ge._build_scene(n_cells=n_cells, dtype=np.float32)
    mesh, sc = st.mesh, st.sc
    x = st.initial_state().x
    gap = float(np.sqrt(st.dHat))
    sv, se, stri = mesh.surf_verts, mesh.surf_edges, mesh.surf_tris
    dbc = mesh.dbc_mask
    K = sc.grid_K
    nS, nE = stri.shape[0], se.shape[0]
    print(f"nV={sv.shape[0]} nE={nE} nS={nS} K={K} "
          f"H_tri={SH._default_H(nS)} H_edge={SH._default_H(nE)}")

    vb = jax.jit(lambda x: BP.vert_aabbs(x, sv, None, gap))(x)
    eb = jax.jit(lambda x: BP.edge_aabbs(x, se, None, gap))(x)
    tb = jax.jit(lambda x: BP.tri_aabbs(x, stri, None, gap))(x)

    def rec(name, sec):
        print(f"{name:26s} {sec * 1e3:9.2f} ms")

    rec("aabbs(all3)", timeit(jax.jit(
        lambda x: (BP.vert_aabbs(x, sv, None, gap),
                   BP.edge_aabbs(x, se, None, gap),
                   BP.tri_aabbs(x, stri, None, gap))), reps, x))
    build_t = jax.jit(lambda tb: SH.build_grid(tb, SH._default_H(nS), K).table)
    rec("build_grid(tri)", timeit(build_t, reps, tb))
    build_e = jax.jit(lambda eb: SH.build_grid(eb, SH._default_H(nE), K).table)
    rec("build_grid(edge)", timeit(build_e, reps, eb))

    tgrid = SH.build_grid(tb, SH._default_H(nS), K)
    egrid = SH.build_grid(eb, SH._default_H(nE), K)

    q_pt = jax.jit(lambda vb, tb: SH.query_pairs(
        tgrid, vb, tb, SH._pt_valid(sv, stri, dbc), sc.cap_pt))
    rec("query_pt", timeit(q_pt, reps, vb, tb))
    q_ee = jax.jit(lambda eb: SH.query_pairs(
        egrid, eb, eb, SH._ee_valid(se, dbc), sc.cap_ee))
    rec("query_ee", timeit(q_ee, reps, eb))
    q_et = jax.jit(lambda eb, tb: SH.query_pairs(
        tgrid, eb, tb, SH._et_valid(se, stri, dbc), sc.cap_et))
    rec("query_et", timeit(q_et, reps, eb, tb))

    # stencil assembly cost on top (what pipeline.build_candidates adds)
    full = jax.jit(lambda x: sc.build_candidates(x, jnp.zeros_like(x), gap))
    rec("full_build_candidates", timeit(full, reps, x))


if __name__ == "__main__":
    main()
