"""Precision harness: f32 (production/TPU dtype) vs f64 (oracle) drift.

The reference is f64-everywhere (SURVEY §7.3 flags TPU f32 as the main
accuracy risk). This harness runs the same contact-rich scene in both
precisions on the same platform and reports per-step position divergence
and invariant status, quantifying the f32 strategy (pair-local frames,
pinned matmul precision, tolerance floors).

    python benchmarks/precision.py [--steps 25] [--platform cpu]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(dtype, steps):
    import jax.numpy as jnp

    from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
    from ipc_tpu.contact.pipeline import SelfContact
    from ipc_tpu.mesh import build_mesh, merge_meshes
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.timestepper import IPCStepper, SimParams

    V1, T1 = cube(2)
    V1 = V1 + np.array([0.0, 0.002, 0.0])
    V2, T2 = cube(2)
    V2 = V2 + np.array([0.0, 1.15, 0.0])
    V, T, comp, ranges = merge_meshes([(V1, T1), (V2, T2)])
    mesh, meta = build_mesh(V, T, vert_comp=comp, comp_ranges=ranges, dtype=dtype)
    st = IPCStepper(
        mesh,
        meta,
        SimParams(),
        halfspaces=[HalfSpace(HalfSpaceParams(friction=0.1))],
        self_contact=SelfContact(mesh, meta, friction=0.1),
    )
    s = st.initial_state()
    traj = []
    ok = True
    for _ in range(steps):
        s, _ = st.step(s)
        x = np.asarray(s.x, np.float64)
        traj.append(x)
        ok = ok and np.isfinite(x).all() and x[:, 1].min() > 0
    return np.stack(traj), ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    t64, ok64 = run(np.float64, args.steps)
    t32, ok32 = run(np.float32, args.steps)
    d = np.abs(t64 - t32).max(axis=(1, 2))
    bbox = float(np.linalg.norm(t64[0].max(0) - t64[0].min(0)))
    print(
        json.dumps(
            {
                "metric": "f32_vs_f64_position_drift",
                "steps": args.steps,
                "invariants_f64": bool(ok64),
                "invariants_f32": bool(ok32),
                "max_drift_abs": float(d.max()),
                "max_drift_rel_bbox": float(d.max() / bbox),
                "drift_at_step": [float(v) for v in d[:: max(1, args.steps // 8)]],
            }
        )
    )


if __name__ == "__main__":
    main()
