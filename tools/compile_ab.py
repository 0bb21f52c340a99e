"""A/B XLA:CPU compile-time experiment on a scene's jitted step program.

Scripted-scene step programs compile in 15-30 min on this 1-core host
(BATTERY_r3 armadillo13K: 1187 s for 1 step; mat40x40 r4 repro: killed at
30 min still compiling) — the binding constraint for battery depth. This
tool times lower+compile under different XLA flag sets so the cheapest
safe configuration can be baked into the battery children.

Usage: python tools/compile_ab.py <scene.txt> <variant>
  variant: base | fastbuild | noexp | o1
Each variant is a separate process run (XLA flags are read at backend
init)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": "",
    "noexp": "--xla_llvm_disable_expensive_passes=true",
    "o1": "--xla_backend_optimization_level=1",
    "noexp_o1": (
        "--xla_llvm_disable_expensive_passes=true "
        "--xla_backend_optimization_level=1"
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("variant", choices=sorted(VARIANTS))
    ap.add_argument("--no-script", action="store_true")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (flags + " " + VARIANTS[args.variant]).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # no persistent cache: we are measuring the compile itself
    import numpy as np

    from ipc_tpu.config import load_config
    from ipc_tpu.jit_step import make_jit_step
    from ipc_tpu.sim import Simulation

    cfg = load_config(args.scene)
    if args.no_script:
        cfg.script = "null"
    t0 = time.perf_counter()
    sim = Simulation(cfg, dtype=np.float32)
    step = make_jit_step(sim.stepper, donate=False)
    state = sim.initial_state()
    t1 = time.perf_counter()
    lowered = step.lower(state)
    t2 = time.perf_counter()
    compiled = lowered.compile()
    t3 = time.perf_counter()
    # one executed step: flag variants must still produce a working program
    new_state, stats = step(state)
    jax.block_until_ready(new_state.x)
    t4 = time.perf_counter()
    ok = bool(np.isfinite(np.asarray(new_state.x)).all())
    print(
        f"RESULT variant={args.variant} scene={os.path.basename(args.scene)} "
        f"setup={t1 - t0:.1f}s lower={t2 - t1:.1f}s compile={t3 - t2:.1f}s "
        f"first_step={t4 - t3:.1f}s finite={ok} "
        f"newton={int(stats.newton_iters)}"
    )


if __name__ == "__main__":
    main()
