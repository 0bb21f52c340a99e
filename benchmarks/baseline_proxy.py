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

Solver variants (3rd arg, default "sparse"):
  * "sparse" — SuperLU sparse-direct factorize+solve per Newton iteration
    (solver/sparse_direct.py): a real C sparse factorization in the same
    role as the reference's CHOLMOD (CHOLMODSolver.cpp:61-100). This is
    the honest CHOLMOD-role denominator for bench.py's vs_baseline.
  * "dense" — dense Cholesky. Dense O(n^3) is SLOWER than sparse
    supernodal factorization at bench scale, so ratios against it are an
    UPPER bound on the true vs-CHOLMOD speedup; kept for continuity with
    the round-1/2 numbers.
  * "pcg" — matrix-free PCG, identical algorithm to the TPU path:
    isolates the hardware+precision speedup with the algorithm held fixed.

Run: python benchmarks/baseline_proxy.py [n_cells] [n_steps] [linsys]
Prints one JSON line with steps/s + iters/s; paste the result into
BASELINE.md and bench.py.

4th arg `max_iters=N` switches to the per-NEWTON-ITERATION measurement
mode for target scale (96K tets, n_cells=20), where a full f64 step on
this 1-core host cannot finish in any practical budget (the round-4
2-hour attempt produced nothing, and capping the Newton loop at N
iterations deadlocks the outer homotopy/friction loops, which require
sub-solve convergence — the round-5 first attempt). Instead the
stepper's _search_dir (constraint assembly + linear solve — the
reference's matrixComputation + factorization + backSolve phases) is
wrapped to TIME each call and abort the run after N of them; each
call's wall time is printed as it lands so a timeout still leaves
evidence. The reported sec_per_newton_iter is the mean of calls 2..N
(call 1 pays the eager-kernel compiles). Line-search energy evaluations
are excluded — on the reference's profile the solve dominates, so this
denominator is conservative (favors the baseline).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    linsys = sys.argv[3] if len(sys.argv) > 3 else "sparse"
    max_iters = 0
    for a in sys.argv[4:]:
        if a.startswith("max_iters="):
            max_iters = int(a.split("=")[1])

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    import __graft_entry__ as ge

    stepper = ge._build_scene(n_cells=n_cells, dtype=np.float64)
    import dataclasses

    stepper.p = dataclasses.replace(stepper.p, linsys=linsys)
    stepper._build_kernels()

    state = stepper.initial_state()

    if max_iters:
        times = []

        class _Done(Exception):
            pass

        def wrap_current():
            inner = stepper._search_dir

            def timed(*a, **kw):
                t0 = time.perf_counter()
                out = inner(*a, **kw)
                jax.block_until_ready(out[0])
                dt_call = time.perf_counter() - t0
                times.append(dt_call)
                print(json.dumps({"search_dir_call": len(times),
                                  "sec": round(dt_call, 2)}), flush=True)
                if len(times) >= max_iters:
                    raise _Done()
                return out

            stepper._search_dir = timed

        # cap growth re-runs _build_kernels, which reassigns _search_dir
        # — re-apply the timing wrapper after every rebuild
        orig_build = stepper._build_kernels

        def build_and_patch():
            orig_build()
            wrap_current()

        stepper._build_kernels = build_and_patch
        wrap_current()
        try:
            stepper.step(state)
        except _Done:
            pass
        hot = times[1:] if len(times) > 1 else times
        spi = sum(hot) / len(hot)
        print(json.dumps({
            "proxy": f"host f64 + {linsys} search_dir per Newton iteration, CPU",
            "linsys": linsys,
            "n_cells": n_cells,
            "tets": int(stepper.mesh.tets.shape[0]),
            "calls_timed": len(times),
            "first_call_sec_incl_compile": round(times[0], 2),
            "sec_per_newton_iter": round(spi, 3),
            "newton_iters_per_sec": round(1.0 / spi, 5),
            "note": "search_dir wall time (assembly + factorize + solve); "
                    "line-search cost excluded -> conservative denominator",
        }), flush=True)
        return

    # warmup one step (compile)
    t0 = time.perf_counter()
    state, stats = stepper.step(state)
    warm_s = time.perf_counter() - t0
    warm_iters = stats.iters
    print(json.dumps({"warmup_sec": round(warm_s, 1),
                      "warmup_iters": warm_iters}), flush=True)

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
                "proxy": f"host f64 + {linsys} solve per Newton iteration, CPU",
                "linsys": linsys,
                "n_cells": n_cells,
                "tets": int(stepper.mesh.tets.shape[0]),
                "n_steps": n_steps,
                "steps_per_sec": round(n_steps / dt, 5),
                "newton_iters_per_sec": round(total_iters / dt, 4),
                "sec_per_step": round(dt / n_steps, 4),
                "sec_per_newton_iter": round(dt / max(total_iters, 1), 4),
                "max_iters_cap": max_iters or None,
            }
        )
    )


if __name__ == "__main__":
    main()
