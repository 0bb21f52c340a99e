"""CLI driver: `python -m ipc_tpu <scene.txt> [options]`.

The offline-mode analog of the reference binary
(reference: main.cpp CLIArgs :728-809, `IPC_bin 100 <scene> --logLevel ...`):
loads a reference-format scene script, runs it, writes artifacts.
"""

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ipc_tpu", description=__doc__)
    ap.add_argument("scene", help="scene script (.txt, reference DSL)")
    ap.add_argument("-o", "--output", default=None, help="output directory")
    ap.add_argument("-n", "--steps", type=int, default=None, help="number of steps "
                    "(default: duration/dt from the scene)")
    ap.add_argument("--platform", default=None, help="jax platform (cpu/tpu)")
    ap.add_argument("--f32", action="store_true", help="run in float32")
    ap.add_argument("--jit-step", action="store_true",
                    help="use the fully-on-device step (production TPU path)")
    ap.add_argument("--save-every", type=int, default=1)
    ap.add_argument("--gif", action="store_true",
                    help="render per-step frames and write anim.gif")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from ipc_tpu.sim import run_scene

    state = run_scene(
        args.scene,
        out_dir=args.output,
        n_steps=args.steps,
        dtype=np.float32 if args.f32 else np.float64,
        save_every=args.save_every,
        use_jit_step=args.jit_step,
        verbose=args.verbose,
        gif=args.gif,
    )
    print(f"done: {int(state.step)} steps, t = {float(state.t):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
