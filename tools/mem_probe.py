"""Compile-only memory probe: lower + compile a scene's jitted step on the
CPU backend (no execution) and print the per-program buffer footprint from
XLA's memory analysis, optionally with the scripted-motion block disabled.

Diagnoses static-buffer blow-ups (e.g. mat100x100_twist's 330 GB
buffer-definition OOM, BATTERY_r3.json) without paying for a run.

Usage: python tools/mem_probe.py <scene.txt> [--no-script]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--no-script", action="store_true",
                    help="strip the scripted-motion block (bisect aid)")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ipc_tpu.config import load_config
    from ipc_tpu.jit_step import make_jit_step
    from ipc_tpu.sim import Simulation

    cfg = load_config(args.scene)
    if args.no_script:
        cfg.script = "null"
    sim = Simulation(cfg, dtype=np.float32)
    step = make_jit_step(sim.stepper, donate=False)
    state = sim.initial_state()
    compiled = step.lower(state).compile()
    ma = compiled.memory_analysis()
    gb = 1024**3
    print(f"scene={os.path.basename(args.scene)} script={cfg.script}")
    print(f"  argument_bytes  {ma.argument_size_in_bytes/gb:10.3f} GiB")
    print(f"  output_bytes    {ma.output_size_in_bytes/gb:10.3f} GiB")
    print(f"  temp_bytes      {ma.temp_size_in_bytes/gb:10.3f} GiB")


if __name__ == "__main__":
    main()
