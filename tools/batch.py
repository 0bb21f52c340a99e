"""Batch scene runner — the analog of the reference's batch.py
(reference: /root/reference/batch.py: runs every scene script in a folder,
sweeping thread counts). Threads are replaced by platform/precision sweeps:

    python tools/batch.py input/scenes/ --out output/ --steps 100 \
        [--platform cpu] [--f32] [--jit-step]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("folder")
    ap.add_argument("--out", default="output")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--jit-step", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from ipc_tpu.sim import run_scene

    scenes = sorted(glob.glob(os.path.join(args.folder, "*.txt")))
    results = []
    for scene in scenes:
        name = os.path.splitext(os.path.basename(scene))[0]
        out_dir = os.path.join(args.out, name)
        t0 = time.perf_counter()
        try:
            state = run_scene(
                scene,
                out_dir=out_dir,
                n_steps=args.steps,
                dtype=np.float32 if args.f32 else np.float64,
                use_jit_step=args.jit_step,
            )
            rec = dict(scene=name, ok=True, steps=int(state.step),
                       wall=round(time.perf_counter() - t0, 2))
        except Exception as e:  # keep sweeping on per-scene failure
            rec = dict(scene=name, ok=False, error=str(e)[:200],
                       wall=round(time.perf_counter() - t0, 2))
        print(json.dumps(rec), flush=True)
        results.append(rec)
    n_ok = sum(r["ok"] for r in results)
    print(f"# {n_ok}/{len(results)} scenes ok")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
