"""Headline benchmark: full IPC time steps per second on the real TPU.

Scene: two discretized boxes dropped onto a friction ground plane with
self-contact (the reference's 2cubesFall family scaled up) — exercises the
whole hot path per step: per-tet elasticity energy/grad/SPD-Hessian,
broad+narrow contact phase, barrier assembly, matrix-free PCG, ACCD, and
the backtracking line search, all inside one jitted step.

vs_baseline is a MEASURED proxy ratio (BASELINE.md "Proxy derivation"):
the reference binary cannot be built here (zero egress), so the baseline
is this repo's own host-path f64 stepper on the same scene on this
machine's CPU — the reference's precision, cost structure (per-iteration
constraint rebuild + assembly) and hardware class. Three direct-solver
proxies were measured on the driver CPU (benchmarks/baseline_proxy.py):

  dense Cholesky per Newton iter:          0.0277 steps/s (2026-08-17)
  SuperLU sparse-direct (CHOLMOD role):    0.0237 steps/s (2026-08-19)
  matrix-free PCG (algorithm-matched):     0.0174 steps/s (2026-08-17)

vs_baseline divides by the FASTEST measured proxy (dense, the most
conservative denominator). At this size (18K DoF) BLAS3 dense Cholesky
beats SuperLU's sparse factorization on this 1-core host, so the sparse
measurement brackets rather than replaces it. Caveat stated plainly: a
real multithreaded supernodal CHOLMOD on a modern desktop CPU would be
faster than every proxy here — the ratio quantifies hardware+precision+
algorithm combined against a single-core f64 direct-solver stepper, not
a chip-vs-chip CHOLMOD comparison.

Also reports achieved FLOPs (XLA cost analysis of the compiled step) and
MFU against the chip's bf16 peak — an upper-bound denominator: IPC's
hot loops are gather/scatter + small-tensor algebra, not dense matmul, so
MFU is structurally low; HBM bandwidth is the binding resource.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

# Measured on the driver machine's CPU, 2026-08-17, via
#   python benchmarks/baseline_proxy.py 8 10        (dense / CHOLMOD role)
#   (PCG variant: same scene, linsys="pcg")         (algorithm-matched)
# Scene: n_cells=8 two-box drop, 6144 tets, f64 host path.
_BASELINES = {
    "dense_f64_cpu_steps_per_sec": 0.02773,  # 36.1 s/step (2026-08-17)
    "sparse_superlu_f64_cpu_steps_per_sec": 0.0237,  # 42.2 s/step (2026-08-19)
    "pcg_f64_cpu_steps_per_sec": 0.01736,  # 57.6 s/step (2026-08-17)
}

# bf16 systolic-array peak per chip (the conservative MFU denominator).
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
}


def _flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax

    import __graft_entry__ as ge
    from ipc_tpu.jit_step import make_jit_step

    # ~3K tets per box, ~6K total (sized so compile+20 steps fits the
    # driver's bench budget on the tunneled v5e)
    stepper = ge._build_scene(n_cells=8, dtype=np.float32)
    step = make_jit_step(stepper, donate=False)
    state = stepper.initial_state()

    lowered = step.lower(state)
    compiled = lowered.compile()
    flops_per_step = _flops_of(compiled)

    # warmup (the lowered/compiled object skips retracing)
    state, stats = compiled(state)
    jax.block_until_ready(state.x)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = compiled(state)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    ymin = float(np.asarray(state.x)[:, 1].min())
    assert np.isfinite(np.asarray(state.x)).all(), "non-finite state"
    assert ymin > 0.0, f"ground penetration in bench scene (ymin={ymin})"

    base = max(_BASELINES.values())
    dev = jax.devices()[0]
    peak = _PEAK_FLOPS.get(getattr(dev, "device_kind", ""), None)
    achieved = flops_per_step * steps_per_sec
    rec = {
        "metric": "ipc_timesteps_per_sec_6k_tets",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / base, 4),
        "baseline": "measured CPU f64 host-path proxy (BASELINE.md), "
        f"{base} steps/s",
        "newton_iters_last_step": int(stats.newton_iters),
        "flops_per_step": flops_per_step,
        "achieved_flops_per_sec": round(achieved, 1),
        "mfu_vs_bf16_peak": (
            round(achieved / peak, 6) if peak and flops_per_step else None
        ),
        "device": getattr(dev, "device_kind", str(dev)),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
