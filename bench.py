"""Headline benchmark: full IPC time steps per second on the real TPU.

Scene: two discretized boxes dropped onto a friction ground plane with
self-contact (the reference's 2cubesFall family scaled up) — exercises the
whole hot path per step: per-tet elasticity energy/grad/SPD-Hessian,
broad+narrow contact phase, barrier assembly, matrix-free PCG, ACCD, and
the backtracking line search, all inside one jitted step.

Baseline context (BASELINE.md): the reference publishes no absolute
numbers; its per-step cost on comparable ~10K-tet CPU scenes with CHOLMOD
is O(100ms)-O(1s) per Newton solve. vs_baseline is reported against a
nominal 2 timesteps/sec reference-class figure until a measured
reference baseline lands.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    import __graft_entry__ as ge
    from ipc_tpu.jit_step import make_jit_step

    # ~3K tets per box, ~6K total (sized so compile+20 steps fits the
    # driver's bench budget on the tunneled v5e; scaling data: 6K tets ->
    # ~0.5 s/step, compile ~90-160 s)
    stepper = ge._build_scene(n_cells=8, dtype=np.float32)
    step = make_jit_step(stepper, donate=False)
    state = stepper.initial_state()

    # warmup / compile
    state, stats = step(state)
    jax.block_until_ready(state.x)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    iters = int(stats.newton_iters)
    ymin = float(np.asarray(state.x)[:, 1].min())
    assert np.isfinite(np.asarray(state.x)).all(), "non-finite state"
    assert ymin > 0.0, f"ground penetration in bench scene (ymin={ymin})"

    baseline_steps_per_sec = 2.0  # nominal reference-class CPU figure
    print(
        json.dumps(
            {
                "metric": "ipc_timesteps_per_sec_6k_tets",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
