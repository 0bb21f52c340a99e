"""Multi-chip sharding evidence at scale (SURVEY §2.3(b), §7.2.10).

Runs the SAME global scene (two discretized boxes + ground + self-contact,
>=50K tets) with the full jitted IPC step sharded over 1 and over N virtual
host devices, and records for each:

  * per-device bytes of every persistent array (measured off the sharded
    buffers, `sharding.shard_report`),
  * the compiled per-partition program's memory footprint
    (`compiled.memory_analysis()`: argument + output + temp bytes). Under
    XLA SPMD every device runs the same per-partition module, so these ARE
    per-device numbers — the direct evidence that a scene whose replicated
    form cannot fit one chip's HBM runs when sharded,
  * wall time of a post-compile step. NOTE on timing: the N virtual
    "devices" of this benchmark are slices of ONE physical CPU core, so
    step time cannot improve with N here — time is reported for honesty,
    while the memory columns are the weak-scaling claim this machine can
    actually evidence. On real ICI-connected chips the collectives this
    exact program emits (all-gather of vertex state, psum of assembly)
    are the scaling-book SpMV recipe.

Writes MULTICHIP_SCALE JSON to --out (default /tmp/multichip_scale.json).

Usage: python benchmarks/multichip_scaling.py [--cells 20] [--devices 1 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=20,
                    help="box_grid cells per box (20 -> 96K tets total)")
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--out", default="/tmp/multichip_scale.json")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    n_max = max(args.devices)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_max}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_dryrun_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import numpy as np

    import __graft_entry__ as ge
    from ipc_tpu.jit_step import make_jit_step
    from ipc_tpu.parallel import spmd
    from ipc_tpu.parallel.sharding import make_mesh, shard_mesh_data, shard_report

    records = []
    for n_dev in args.devices:
        stepper = ge._build_scene(n_cells=args.cells, dtype=np.float32)
        device_mesh = make_mesh(n_dev)
        stepper.mesh = shard_mesh_data(stepper.mesh, device_mesh)
        stepper._sv = stepper.mesh.surf_verts
        stepper._dbc_sv = stepper.mesh.dbc_mask[stepper.mesh.surf_verts]
        if stepper.sc is not None:
            stepper.sc.rebind_mesh(stepper.mesh)
        spmd.activate(device_mesh)
        try:
            stepper._build_kernels()
            step = make_jit_step(stepper, donate=False)
            state = stepper.initial_state()
            t0 = time.perf_counter()
            compiled = step.lower(state).compile()
            compile_s = time.perf_counter() - t0
            mem = {}
            try:
                ma = compiled.memory_analysis()
                mem = {
                    "argument_bytes": int(ma.argument_size_in_bytes),
                    "output_bytes": int(ma.output_size_in_bytes),
                    "temp_bytes": int(ma.temp_size_in_bytes),
                    "generated_code_bytes": int(ma.generated_code_size_in_bytes),
                }
            except Exception as e:  # per-backend availability
                mem = {"error": str(e)}
            state, stats = compiled(state)
            jax.block_until_ready(state.x)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, stats = compiled(state)
            jax.block_until_ready(state.x)
            step_s = (time.perf_counter() - t0) / args.steps
        finally:
            spmd.deactivate()
        assert np.isfinite(np.asarray(state.x)).all()
        persist = shard_report(stepper.mesh, state)
        per_dev_persist = sum(r[2] for r in persist if r[2] > 0)
        total_persist = sum(r[1] for r in persist if r[1] > 0)
        rec = {
            "n_devices": n_dev,
            "tets": int(stepper.mesh.tets.shape[0]),
            "verts": int(stepper.mesh.x_rest.shape[0]),
            "persistent_bytes_total": total_persist,
            "persistent_bytes_per_device": per_dev_persist,
            "compiled_per_partition": mem,
            "compile_s": round(compile_s, 1),
            "sec_per_step": round(step_s, 3),
            "newton_iters": int(stats.newton_iters),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if len(records) >= 2:
        a, b = records[0], records[-1]
        ratio = a["persistent_bytes_per_device"] / max(
            1, b["persistent_bytes_per_device"]
        )
        temp_a = a["compiled_per_partition"].get("temp_bytes")
        temp_b = b["compiled_per_partition"].get("temp_bytes")
        summary = {
            "persist_per_device_reduction": round(ratio, 2),
            "temp_bytes_1dev": temp_a,
            "temp_bytes_ndev": temp_b,
            "temp_reduction": (
                round(temp_a / temp_b, 2) if temp_a and temp_b else None
            ),
        }
        print(json.dumps({"summary": summary}))
        records.append({"summary": summary})
    with open(args.out, "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
