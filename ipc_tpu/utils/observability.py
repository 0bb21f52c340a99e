"""Run artifacts: timers, per-iteration stats, conservation logs, checkpoints.

Replaces the reference's observability stack (reference: Timer registries
src/Utils/Timer.hpp:26-197 + activity table main.cpp:1323-1380; iterStats
Optimizer.cpp:1360,1418; sysE/sysM/sysL conservation logs
Optimizer.cpp:3745-3777; saveStatus/restart Optimizer.cpp:2964-3068; RSS
getRSS.hpp). Artifacts keep the same names/roles so downstream tooling and
eyeball-diffing against reference runs carries over.
"""

import json
import os
import resource
import time
from collections import defaultdict

import numpy as np

__all__ = [
    "Timers",
    "RunLogger",
    "save_status",
    "load_status",
    "save_status_text",
    "load_status_text",
    "peak_rss_mb",
]


class Timers:
    """Named cumulative wall-clock activity timers (Timer.hpp analog)."""

    def __init__(self):
        self.acc = defaultdict(float)
        self._start = {}

    def start(self, name):
        self._start[name] = time.perf_counter()

    def stop(self, name):
        if name in self._start:
            self.acc[name] += time.perf_counter() - self._start.pop(name)

    def section(self, name):
        timers = self

        class _Ctx:
            def __enter__(self):
                timers.start(name)

            def __exit__(self, *a):
                timers.stop(name)

        return _Ctx()

    def report(self):
        return dict(sorted(self.acc.items(), key=lambda kv: -kv[1]))


def peak_rss_mb():
    """Peak resident set size in MB (getRSS.hpp analog)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


class RunLogger:
    """Writes iterStats.txt, sysE/sysM/sysL.txt, info.txt into an output dir."""

    def __init__(self, out_dir):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.iter_stats = open(os.path.join(out_dir, "iterStats.txt"), "w")
        self.sysE = open(os.path.join(out_dir, "sysE.txt"), "w")
        self.sysM = open(os.path.join(out_dir, "sysM.txt"), "w")
        self.sysL = open(os.path.join(out_dir, "sysL.txt"), "w")
        self.timers = Timers()
        self.n_steps = 0
        self.total_newton_iters = 0
        self.coll_pairs_max = 0
        self.coll_pairs_sum = 0

    def log_step(self, step_idx, stats):
        """Per-step record: `globalIterNum stepsize #constraints` per Newton
        iteration (iterStats.txt role, Optimizer.cpp:1360)."""
        for k in range(stats.iters):
            alpha = stats.alphas[k] if k < len(stats.alphas) else 1.0
            ncon = stats.n_constraints[k] if k < len(stats.n_constraints) else 0
            ginf = stats.grad_inf[k] if k < len(stats.grad_inf) else 0.0
            self.iter_stats.write(f"{step_idx} {alpha:.6g} {ncon} {ginf:.6g}\n")
        self.iter_stats.flush()
        self.n_steps += 1
        self.total_newton_iters += stats.iters
        if stats.n_constraints:
            self.coll_pairs_max = max(self.coll_pairs_max, max(stats.n_constraints))
            self.coll_pairs_sum += sum(stats.n_constraints)

    def log_system(self, mesh, meta, state, gravity, dt, model="NH"):
        """Per-component energy / linear / angular momentum (sysE/M/L,
        Optimizer.cpp:3745-3777): elastic + kinetic + gravitational."""
        import jax.numpy as jnp

        from ipc_tpu.energy.elasticity import elasticity_energy_per_elem

        x = np.asarray(state.x)
        v = np.asarray(state.v)
        m = np.asarray(mesh.mass)
        comp = np.asarray(mesh.vert_comp)
        g = np.asarray(gravity)
        e_el = np.asarray(elasticity_energy_per_elem(jnp.asarray(state.x), mesh, model))
        tet_comp = comp[np.asarray(mesh.tets)[:, 0]]
        for ci in range(comp.max() + 1):
            sel = comp == ci
            mc = m[sel][:, None]
            E = (
                0.5 * float((mc * v[sel] ** 2).sum())
                - float((m[sel] * (x[sel] @ g)).sum())
                + float(e_el[tet_comp == ci].sum())
            )
            M = (mc * v[sel]).sum(axis=0)
            L = (mc * np.cross(x[sel], v[sel])).sum(axis=0)
            self.sysE.write(f"{E:.10g} ")
            self.sysM.write(f"{M[0]:.10g} {M[1]:.10g} {M[2]:.10g}  ")
            self.sysL.write(f"{L[0]:.10g} {L[1]:.10g} {L[2]:.10g}  ")
        self.sysE.write("\n")
        self.sysM.write("\n")
        self.sysL.write("\n")

    def write_info(self, extra=None):
        """Timing breakdown + memory (info.txt role, main.cpp:439-471)."""
        info = {
            "timers_sec": self.timers.report(),
            "peak_rss_mb": peak_rss_mb(),
            "steps": self.n_steps,
            "avg_newton_iters_per_step": (
                self.total_newton_iters / max(1, self.n_steps)
            ),
            "coll_pairs_max": self.coll_pairs_max,
        }
        if extra:
            info.update(extra)
        with open(os.path.join(self.out_dir, "info.txt"), "w") as f:
            json.dump(info, f, indent=2)

    def write_results_stats(self, wall_time):
        """resultsStats.txt analog (main.cpp:473-485)."""
        with open(os.path.join(self.out_dir, "resultsStats.txt"), "w") as f:
            f.write(f"steps {self.n_steps}\n")
            f.write(
                f"avg_iters_per_step {self.total_newton_iters / max(1, self.n_steps):.3f}\n"
            )
            f.write(f"avg_sec_per_step {wall_time / max(1, self.n_steps):.6f}\n")
            f.write(f"total_sec {wall_time:.3f}\n")

    def close(self):
        for f in (self.iter_stats, self.sysE, self.sysM, self.sysL):
            f.close()


def save_status(path, state, step_idx, stepper=None):
    """Full-precision checkpoint (saveStatus analog, Optimizer.cpp:2964-3014):
    timestep index + positions + velocities (+ acceleration slot). Moving
    analytic planes (ACO scripts) add their origins + velocity table so a
    restart resumes the plane motion mid-flip."""
    extra = {}
    if stepper is not None and getattr(stepper, "hs_moving", False):
        extra["hs_origin"] = np.asarray(stepper.hs_origin, np.float64)
        extra["aco_vel"] = np.asarray(stepper.script.aco_vel, np.float64)
    np.savez_compressed(
        path,
        step=step_idx,
        t=float(state.t),
        x=np.asarray(state.x, dtype=np.float64),
        v=np.asarray(state.v, dtype=np.float64),
        a=np.asarray(state.a, dtype=np.float64),
        **extra,
    )


def save_status_text(path, state, step_idx):
    """Reference-compatible text status file (same section layout as
    Optimizer::saveStatus, Optimizer.cpp:2964-3014): `timestep`, `position`
    (nV x 3), `velocity` (flat 3*nV), `acceleration` (nV x 3), `dx_Elastic`
    (written as zeros; it is a warm-start cache the solver recomputes)."""
    x = np.asarray(state.x, np.float64)
    v = np.asarray(state.v, np.float64)
    a = np.asarray(state.a, np.float64)
    n = len(x)
    with open(path, "w") as f:
        f.write(f"timestep {step_idx}\n\n")
        f.write(f"position {n} 3\n")
        for r in x:
            f.write(f"{r[0]:.19g} {r[1]:.19g} {r[2]:.19g}\n")
        f.write("\n")
        f.write(f"velocity {3 * n}\n")
        for r in v:
            f.write(f"{r[0]:.19g}\n{r[1]:.19g}\n{r[2]:.19g}\n")
        f.write("\n")
        f.write(f"acceleration {n} 3\n")
        for r in a:
            f.write(f"{r[0]:.19g} {r[1]:.19g} {r[2]:.19g}\n")
        f.write("\n")
        f.write(f"dx_Elastic {n} 3\n")
        for _ in range(n):
            f.write("0 0 0\n")


def load_status_text(path, stepper):
    """Read a reference-format status file (Optimizer ctor restart parse,
    Optimizer.cpp:179-243) into a SimState."""
    import jax.numpy as jnp

    from ipc_tpu.timestepper import SimState

    toks = open(path).read().split()
    i = 0

    def expect(word):
        nonlocal i
        while toks[i] != word:
            i += 1
        i += 1

    expect("timestep")
    step = int(toks[i]); i += 1
    expect("position")
    n, c = int(toks[i]), int(toks[i + 1]); i += 2
    x = np.array(toks[i : i + n * c], np.float64).reshape(n, c); i += n * c
    expect("velocity")
    m = int(toks[i]); i += 1
    v = np.array(toks[i : i + m], np.float64).reshape(-1, 3); i += m
    a = np.zeros_like(x)
    try:
        expect("acceleration")
        n2, c2 = int(toks[i]), int(toks[i + 1]); i += 2
        a = np.array(toks[i : i + n2 * c2], np.float64).reshape(n2, c2)
    except IndexError:
        pass
    dtype = stepper.dtype
    xj = jnp.asarray(x, dtype)
    return SimState(
        x=xj, x_prev=xj, v=jnp.asarray(v, dtype), a=jnp.asarray(a, dtype),
        t=step * stepper.dt, step=step,
    )


def load_status(path, stepper):
    """Restart from a checkpoint (Optimizer ctor restart parse analog,
    Optimizer.cpp:179-243): rebuild SimState; xTilde is recomputed."""
    from ipc_tpu.timestepper import SimState
    import jax.numpy as jnp

    z = np.load(path)
    dtype = stepper.dtype
    if "hs_origin" in z and getattr(stepper, "hs_moving", False):
        stepper.hs_origin[:] = z["hs_origin"]
        stepper.script.aco_vel[:] = z["aco_vel"]
        stepper._refresh_hs_D()
    x = jnp.asarray(z["x"], dtype)
    return SimState(
        x=x,
        x_prev=x,
        v=jnp.asarray(z["v"], dtype),
        a=jnp.asarray(z["a"], dtype),
        t=float(z["t"]),
        step=int(z["step"]),
    )
