"""Mesh processing CLI — generation, conversion, surface extraction.

The analog of the reference's MeshProcessing sub-project
(reference: src/Projects/MeshProcessing/MeshProcessing.cpp — tetgen
tetrahedralization mode 3 :72, .tet -> .msh mode 19 :106, surface
extraction -> .obj mode 20 :131). Tetgen itself is an external binary the
environment does not ship; structured tetrahedralization of primitive
shapes (box/mat/rod grids) is provided instead, plus the converters:

    python -m ipc_tpu.meshproc gen box 8 8 8 out.msh [--size 1 1 1]
    python -m ipc_tpu.meshproc surf in.msh out.obj      (mode 20)
    python -m ipc_tpu.meshproc info in.msh              (mode 26 stats)
    python -m ipc_tpu.meshproc nodele2msh prefix out.msh
"""

import sys

import numpy as np


def cmd_gen(args):
    from ipc_tpu.io_mesh import write_msh
    from ipc_tpu.models import primitives as P

    kind = args[0]
    if kind == "box":
        nx, ny, nz = int(args[1]), int(args[2]), int(args[3])
        out = args[4]
        size = (1.0, 1.0, 1.0)
        if "--size" in args:
            i = args.index("--size")
            size = tuple(float(v) for v in args[i + 1 : i + 4])
        V, T = P.box_grid(nx, ny, nz, size)
    elif kind == "mat":
        n, out = int(args[1]), args[2]
        V, T = P.mat(n)
    elif kind == "rod":
        n, out = int(args[1]), args[2]
        V, T = P.rod(n)
    else:
        raise SystemExit(f"unknown shape {kind}")
    write_msh(out, V, T)
    print(f"wrote {out}: {len(V)} verts, {len(T)} tets")


def cmd_surf(args):
    from ipc_tpu.io_mesh import read_msh, write_obj
    from ipc_tpu.mesh import _boundary_faces

    V, T = read_msh(args[0])
    F = _boundary_faces(np.asarray(T, np.int64))
    used = np.unique(F.reshape(-1))
    remap = -np.ones(len(V), np.int64)
    remap[used] = np.arange(len(used))
    write_obj(args[1], V[used], remap[F])
    print(f"wrote {args[1]}: {len(used)} verts, {len(F)} faces")


def cmd_info(args):
    from ipc_tpu.io_mesh import read_msh
    from ipc_tpu.mesh import build_mesh

    V, T = read_msh(args[0])
    mesh, meta = build_mesh(V, T)
    print(f"verts {meta.n_verts}  tets {meta.n_tets}")
    print(f"surface tris {mesh.surf_tris.shape[0]}  edges {mesh.surf_edges.shape[0]}"
          f"  verts {mesh.surf_verts.shape[0]}")
    print(f"bbox {meta.bbox[0]} .. {meta.bbox[1]}")
    print(f"avg edge len {meta.avg_edge_len:.6g}  total volume "
          f"{float(np.asarray(mesh.vol).sum()):.6g}")


def cmd_nodele2msh(args):
    from ipc_tpu.io_mesh import read_node_ele, write_msh

    V, T = read_node_ele(args[0])
    write_msh(args[1], V, T)
    print(f"wrote {args[1]}: {len(V)} verts, {len(T)} tets")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    # host-side tool: never touch (or wait on) the accelerator
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if not argv:
        print(__doc__)
        return 0
    cmds = dict(gen=cmd_gen, surf=cmd_surf, info=cmd_info, nodele2msh=cmd_nodele2msh)
    fn = cmds.get(argv[0])
    if fn is None:
        print(f"unknown command {argv[0]}; commands: {', '.join(cmds)}")
        return 2
    fn(argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
