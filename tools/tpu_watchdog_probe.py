"""Probe: does the TPU tunnel kill long-running single dispatches?

Round-5 TPU-lane forensics. Every "UNAVAILABLE: TPU worker process
crashed" record this round shares one property: the scene's first
contact-rich step is a SINGLE long dispatch (deep Newton while_loop x
PCG while_loop x line-search trials), while every passing scene's
dispatches are short (the frozen dolphin "passed" at 2 Newton
iterations per step and the SAME program crashed once the freeze was
fixed and real steps ran). The identical programs run fine on the CPU
backend, compile-time memory analysis shows ~0.5 GiB temps (no OOM),
and the crash is data-dependent with a fixed graph — pointing at a
wall-clock watchdog on the worker, not at the program.

Runs a calibrated matmul while_loop at increasing wall targets and
reports which duration kills the worker.

Usage: python tools/tpu_watchdog_probe.py [targets_seconds ...]
"""

import sys
import time

import jax
import jax.numpy as jnp


def make_burn(iters):
    @jax.jit
    def burn(x):
        def body(c):
            i, a = c
            return i + 1, jnp.tanh(a @ a) * 0.999 + 1e-3

        _, out = jax.lax.while_loop(
            lambda c: c[0] < iters, body, (jnp.int32(0), x)
        )
        return out.sum()

    return burn


def main():
    targets = [float(t) for t in sys.argv[1:]] or [5, 30, 60, 120, 300]
    x = jnp.ones((2048, 2048), jnp.float32)
    # calibrate: time 200 iterations
    f = make_burn(200)
    t0 = time.time()
    f(x).block_until_ready()
    t0 = time.time()
    f(x).block_until_ready()
    per_iter = (time.time() - t0) / 200
    print(f"calibration: {per_iter*1e3:.3f} ms/iter", flush=True)
    for tgt in targets:
        iters = max(1, int(tgt / per_iter))
        f = make_burn(iters)
        t0 = time.time()
        try:
            v = float(f(x).block_until_ready())
            print(f"target {tgt:6.0f}s ({iters} iters): OK in "
                  f"{time.time()-t0:.1f}s (val {v:.3g})", flush=True)
        except Exception as e:
            print(f"target {tgt:6.0f}s ({iters} iters): DIED after "
                  f"{time.time()-t0:.1f}s -> {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)
            break


if __name__ == "__main__":
    main()
