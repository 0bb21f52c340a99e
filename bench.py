"""Headline benchmark: full IPC time steps per second on the real TPU.

Scene: two discretized boxes dropped onto a friction ground plane with
self-contact (the reference's 2cubesFall family scaled up) — exercises the
whole hot path per step: per-tet elasticity energy/grad/SPD-Hessian,
broad+narrow contact phase, barrier assembly, matrix-free PCG, ACCD, and
the backtracking line search, all inside one jitted step. The timed window
starts AFTER 10 settle steps so it measures the contact-rich impact phase,
not free fall (round-3 review: a 1-Newton-iteration near-equilibrium step
flatters steps/s), and the record carries sec-per-Newton-iteration so the
number cannot hide behind iteration count.

vs_baseline is a MEASURED proxy ratio (BASELINE.md "Proxy derivation"):
the reference binary cannot be built here (zero egress), so the baseline
is this repo's own host-path f64 stepper — the reference's precision, cost
structure (per-iteration constraint rebuild + assembly + direct solve) and
hardware class — measured on this machine's CPU:

  dense Cholesky per Newton iter (6K tets):   0.0277 steps/s (2026-08-17)
  SuperLU sparse-direct, CHOLMOD role (6K):   0.0237 steps/s (2026-08-19)
  matrix-free PCG (algorithm-matched, 6K):    0.0174 steps/s (2026-08-17)

vs_baseline divides by the FASTEST proxy (dense, the most conservative
denominator at this size). Caveat stated plainly: a real multithreaded
supernodal CHOLMOD on a modern desktop would beat every proxy here — the
ratio quantifies hardware+precision+algorithm combined against a
single-core f64 direct-solver stepper, not a chip-vs-chip CHOLMOD claim.

**Target-scale restatement (round-3 review #7):** the acceptance target is
per-Newton-solve speedup on ~100K-tet scenes. When the committed
measurement artifacts exist at the repo root, this script also emits
`per_newton_iter_96k`: TPU sec/Newton-iteration at 96K tets
(SCALING_96K.json, measured on the v5e in the impact phase) against the f64
host proxy at the same size (PROXY_96K.json) — both artifacts are produced
by benchmarks/scaling.py and benchmarks/baseline_proxy.py and carry their
own measurement dates.

Bandwidth, not MFU: IPC's hot loops are gathers/scatters + small-tensor
algebra, so bf16-systolic MFU is a meaningless denominator (round-3 review
#6). The record reports XLA's bytes-accessed per step and the achieved
HBM GB/s against the chip's peak (v5e: 819 GB/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

# Measured on the driver machine's CPU via benchmarks/baseline_proxy.py
# (scene: n_cells=8 two-box drop, 6144 tets, f64 host path).
_BASELINES = {
    "dense_f64_cpu_steps_per_sec": 0.02773,  # 36.1 s/step (2026-08-17)
    "sparse_superlu_f64_cpu_steps_per_sec": 0.0237,  # 42.2 s/step (2026-08-19)
    "pcg_f64_cpu_steps_per_sec": 0.01736,  # 57.6 s/step (2026-08-17)
}

# HBM peak bandwidth per chip — the honest utilization denominator for this
# bandwidth-bound workload.
_PEAK_HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,  # v5p
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e
}


def _cost_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (
            float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)),
        )
    except Exception:
        return 0.0, 0.0


def _load_96k():
    """Per-Newton-iteration ratio at target scale from the committed
    measurement artifacts, when both exist."""
    root = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(root, "SCALING_96K.json")) as f:
            tpu = json.load(f)
        with open(os.path.join(root, "PROXY_96K.json")) as f:
            cpu = json.load(f)
        tpu_spi = float(tpu["sec_per_newton_iter"])
        cpu_spi = 1.0 / float(cpu["newton_iters_per_sec"])
        return {
            "tpu_sec_per_newton_iter_96k": tpu_spi,
            "proxy_f64_sec_per_newton_iter_96k": round(cpu_spi, 4),
            "per_newton_iter_speedup_96k": round(cpu_spi / tpu_spi, 1),
            "source": "SCALING_96K.json + PROXY_96K.json (measured artifacts)",
        }
    except Exception:
        return None


def main():
    import jax

    import __graft_entry__ as ge
    from ipc_tpu.jit_step import make_jit_step

    # ~3K tets per box, ~6K total (sized so compile+settle+20 steps fits
    # the driver's bench budget on the tunneled v5e)
    stepper = ge._build_scene(n_cells=8, dtype=np.float32)
    step = make_jit_step(stepper, donate=False)
    state = stepper.initial_state()

    lowered = step.lower(state)
    compiled = lowered.compile()
    flops_per_step, bytes_per_step = _cost_of(compiled)

    # warmup + settle into the impact phase
    state, stats = compiled(state)
    jax.block_until_ready(state.x)
    for _ in range(10):
        state, stats = compiled(state)
    jax.block_until_ready(state.x)

    n_steps = 20
    iters_acc = []  # device scalars, summed after the timed loop (no sync)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = compiled(state)
        iters_acc.append(stats.newton_iters)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    total_iters = int(np.sum([np.asarray(i) for i in iters_acc]))

    steps_per_sec = n_steps / dt
    ymin = float(np.asarray(state.x)[:, 1].min())
    assert np.isfinite(np.asarray(state.x)).all(), "non-finite state"
    assert ymin > 0.0, f"ground penetration in bench scene (ymin={ymin})"

    base = max(_BASELINES.values())
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak_bw = _PEAK_HBM_GBPS.get(kind)
    achieved_gbps = (
        bytes_per_step * steps_per_sec / 1e9 if bytes_per_step else None
    )
    rec = {
        "metric": "ipc_timesteps_per_sec_6k_tets_impact_phase",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / base, 4),
        "baseline": "measured CPU f64 host-path proxy (BASELINE.md), "
        f"{base} steps/s",
        "newton_iters_per_step": round(total_iters / n_steps, 2),
        "sec_per_newton_iter": round(dt / max(total_iters, 1), 5),
        "flops_per_step": flops_per_step,
        "bytes_accessed_per_step": bytes_per_step,
        # XLA cost-model "bytes accessed" counts LOGICAL bytes, not DRAM
        # traffic (fusion keeps many of them in VMEM/registers), so the
        # rate is labeled as such; a utilization claim is made only when
        # it is physically possible (<= 1.0 of peak) and is then a lower-
        # bound-flavored proxy, not a measured DRAM counter
        "logical_gbytes_per_sec_xla_cost_model": (
            round(achieved_gbps, 1) if achieved_gbps else None
        ),
        "hbm_utilization_vs_peak": (
            round(achieved_gbps / peak_bw, 4)
            if achieved_gbps and peak_bw and achieved_gbps / peak_bw <= 1.0
            else None
        ),
        "device": kind,
    }
    target = _load_96k()
    if target:
        rec["per_newton_iter_96k"] = target
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
