"""Per-buffer memory breakdown of the compiled (optionally SPMD-sharded)
jitted step — identifies WHICH transients stay replicated under a device
mesh (the round-4 finding: per-partition temp bytes shrank only 1.06x at
8 devices, so something dominant was not sharded).

Compiles the bench scene's step with an XLA dump enabled, locates the
jit_step module's buffer-assignment file, and prints the top allocations
with the defining HLO instruction of their largest value (the op name
usually identifies the source line).

Usage: python tools/mem_breakdown.py [--cells 12] [--devices 8] [--top 25]
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=12)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dump", default="/tmp/mem_breakdown_dump")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(args.dump, ignore_errors=True)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags
        + f" --xla_force_host_platform_device_count={args.devices}"
        + f" --xla_dump_to={args.dump} --xla_dump_hlo_as_text"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import __graft_entry__ as ge
    from ipc_tpu.jit_step import make_jit_step
    from ipc_tpu.parallel import spmd
    from ipc_tpu.parallel.sharding import make_mesh, shard_mesh_data

    stepper = ge._build_scene(n_cells=args.cells, dtype=np.float32)
    if args.devices > 1:
        device_mesh = make_mesh(args.devices)
        stepper.mesh = shard_mesh_data(stepper.mesh, device_mesh)
        stepper._sv = stepper.mesh.surf_verts
        stepper._dbc_sv = stepper.mesh.dbc_mask[stepper.mesh.surf_verts]
        if stepper.sc is not None:
            stepper.sc.rebind_mesh(stepper.mesh)
        spmd.activate(device_mesh)
        stepper._build_kernels()
    step = make_jit_step(stepper, donate=False)
    state = stepper.initial_state()
    compiled = step.lower(state).compile()
    ma = compiled.memory_analysis()
    print(f"devices={args.devices} tets={int(stepper.mesh.tets.shape[0])} "
          f"temp={ma.temp_size_in_bytes/1e6:.1f}MB "
          f"arg={ma.argument_size_in_bytes/1e6:.1f}MB "
          f"out={ma.output_size_in_bytes/1e6:.1f}MB", flush=True)

    cands = sorted(
        glob.glob(os.path.join(args.dump, "*buffer-assignment.txt")),
        key=os.path.getsize,
    )
    if not cands:
        print("no buffer-assignment dump found")
        return
    path = cands[-1]  # the step module is by far the largest
    print(f"parsing {os.path.basename(path)}")
    txt = open(path).read().split("Used values:")[0]
    # the CPU backend pools temps into ONE preallocated-temp allocation;
    # rank the VALUES (live buffers) across all allocations instead
    vals = []
    for name, size, shape in re.findall(
        r" value: <\d+ ([^ ]+) @\d+> \(size=(\d+),offset=\d+\): (\S+)", txt
    ):
        vals.append((int(size), name, shape))
    vals.sort(key=lambda v: -v[0])
    total = sum(v[0] for v in vals)
    print(f"{len(vals)} values, {total/1e6:.1f} MB summed (liveness overlaps)")
    for size, name, shape in vals[: args.top]:
        print(f"{size/1e6:9.2f} MB  {name[:50]:50s}  {shape[:70]}")


if __name__ == "__main__":
    main()
