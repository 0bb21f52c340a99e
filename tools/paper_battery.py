"""Paper-example battery: run every reference paper scene a few steps and
check the solver invariants (the reference's suite-as-integration-test role,
SURVEY.md §4.5; scenes at /root/reference/input/paperExamples/).

Per scene (host path, f64 on CPU):
  * assemble + initial-feasibility check,
  * run N steps under a wall-clock budget,
  * assert: finite state, no element inversion, no edge-triangle
    intersection (when self-contact is on), every accepted line-search step
    monotone (enforced inside the solver; a blow-up raises).

Writes one line per scene:  name  verts/tets  steps-done  secs  PASS/FAIL/SKIP
and a machine-readable JSON table to --out (default /tmp/paper_battery.json).

Usage: python tools/paper_battery.py [--steps N] [--budget SECS] [--only substr]
"""

import argparse
import glob
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES_DIR = "/root/reference/input/paperExamples"


def run_one(path, n_steps, budget):
    import numpy as np
    import jax.numpy as jnp

    from ipc_tpu.config import load_config
    from ipc_tpu.sim import Simulation

    cfg = load_config(path)
    sim = Simulation(cfg, dtype=np.float64)
    mesh = sim.mesh
    rec = {
        "scene": os.path.basename(path),
        "verts": int(mesh.x_rest.shape[0]),
        "tets": int(mesh.tets.shape[0]),
        "script": cfg.script,
    }
    state = sim.initial_state()
    sim._check_initial_feasibility(state)

    tets = np.asarray(mesh.tets)
    t0 = time.perf_counter()
    done = 0
    doublings = backtracks = newton_total = 0
    for k in range(n_steps):
        state, st_stats = sim.stepper.step(state)  # scripted motion inside
        done += 1
        doublings += getattr(st_stats, "kappa_doublings", 0)
        backtracks += getattr(st_stats, "intersection_backtracks", 0)
        newton_total += getattr(st_stats, "iters", 0)
        if time.perf_counter() - t0 > budget:
            break
    secs = time.perf_counter() - t0

    x = np.asarray(state.x)
    assert np.isfinite(x).all(), "non-finite state"
    if len(tets):
        D = x[tets[:, 1:]] - x[tets[:, :1]]
        assert np.linalg.det(D).min() > 0.0, "inverted element"
    sc = getattr(sim.stepper, "sc", None)
    if sc is not None:
        hit, _ = sc.has_intersection(jnp.asarray(state.x))
        assert not bool(hit), "edge-triangle intersection at final state"
    rec.update(
        steps=done, secs=round(secs, 2), status="PASS",
        newton_iters=newton_total, kappa_doublings=doublings,
        intersection_backtracks=backtracks,
    )
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--budget", type=float, default=240.0, help="per-scene secs")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="/tmp/paper_battery.json")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    scenes = sorted(glob.glob(os.path.join(SCENES_DIR, "*.txt")))
    if args.only:
        scenes = [s for s in scenes if args.only in s]
    results = []
    for path in scenes:
        name = os.path.basename(path)
        try:
            rec = run_one(path, args.steps, args.budget)
        except Exception as e:
            rec = {
                "scene": name,
                "status": "FAIL",
                "error": f"{type(e).__name__}: {e}",
                "trace": traceback.format_exc(limit=6),
            }
        results.append(rec)
        print(
            f"{name:32s} {rec.get('verts', '?'):>7}v {rec.get('tets', '?'):>8}t "
            f"{rec.get('steps', 0):>3} steps {rec.get('secs', 0):>8}s  "
            f"{rec['status']}"
            + (f"  {rec.get('error', '')}" if rec["status"] == "FAIL" else ""),
            flush=True,
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    n_pass = sum(r["status"] == "PASS" for r in results)
    print(f"\n{n_pass}/{len(results)} scenes pass -> {args.out}")


if __name__ == "__main__":
    main()
