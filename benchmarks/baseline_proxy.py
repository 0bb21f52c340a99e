"""Measured CPU reference-proxy baseline for bench.py's vs_baseline.

The reference binary (ipc-sim/IPC) cannot be built in this environment
(its CMake deps are fetched over the network at configure time; zero
egress), so the baseline is a documented PROXY with the reference's cost
structure instead of an invented constant:

  * same scene as bench.py (two discretized boxes dropped on a friction
    ground plane, self-contact on),
  * float64 end to end (the reference is f64-only),
  * the host (non-jit-loop) time stepper — per-Newton-iteration candidate
    rebuild + assembly, like the reference's solveSub_IP,
  * a DIRECT factorize-and-solve each Newton iteration
    (solver/direct.py dense Cholesky standing in for CHOLMOD; the
    reference recommends CHOLMOD and calls it "significantly faster than
    the alternative solvers" — README.md Dependencies),
  * running on this machine's CPU (the reference is CPU-only).

The dense Cholesky over-counts CHOLMOD's sparse factorization FLOPs, so
the proxy is biased FAST on small scenes is wrong — dense O(n^3) is
slower than sparse supernodal at these sizes; to avoid flattering the
TPU number, the proxy also reports a "newton_iter_rate" (Newton
iterations/s) and bench.py divides per-step costs honestly (see
BASELINE.md "Proxy derivation" for the bias discussion).

Run: python benchmarks/baseline_proxy.py [n_cells] [n_steps]
Prints one JSON line with steps/s + iters/s; paste the result into
BASELINE.md and bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    import __graft_entry__ as ge

    stepper = ge._build_scene(n_cells=n_cells, dtype=np.float64)
    # direct factorize+solve per Newton iteration — the CHOLMOD role
    import dataclasses

    stepper.p = dataclasses.replace(stepper.p, linsys="dense")
    stepper._build_kernels()

    state = stepper.initial_state()
    # warmup one step (compile)
    state, stats = stepper.step(state)

    total_iters = 0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = stepper.step(state)
        total_iters += stats.iters
    dt = time.perf_counter() - t0

    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    print(
        json.dumps(
            {
                "proxy": "host f64 + dense direct solve (CHOLMOD role), CPU",
                "n_cells": n_cells,
                "tets": int(stepper.mesh.tets.shape[0]),
                "n_steps": n_steps,
                "steps_per_sec": round(n_steps / dt, 5),
                "newton_iters_per_sec": round(total_iters / dt, 4),
                "sec_per_step": round(dt / n_steps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
