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
and a machine-readable JSON table to --out (default /tmp/paper_battery.json),
updated incrementally after every scene.

Each scene runs in its own subprocess under a HARD wall-clock timeout
(--budget bounds the whole scene, not just the gap between steps — a single
Newton solve on a 100K-tet f64 CPU scene can run for hours otherwise);
timeouts record status TIMEOUT with whatever per-step progress the child
reported. The sweep covers the top-level paper scenes, the 11_erleben
contact-ordering suite, and two 21_scalability sizes.

Usage: python tools/paper_battery.py [--steps N] [--budget SECS] [--only substr]
       python tools/paper_battery.py --one <scene.txt> --steps N   (child mode)

`--platform tpu --dtype f32` runs the battery in the production TPU config
instead of the CPU-f64 oracle — same scenes, same invariants; use it for the
large scenes (dolphinFunnel, scalability) that a 1-core f64 host can't
finish inside any reasonable budget.
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


class SkipScene(Exception):
    """Scene cannot run in this checkout (e.g. the reference repo does not
    ship the mesh asset); recorded as SKIP, not FAIL."""


def _check_assets(path):
    """The reference checkout omits several large meshes (Armadillo 28K+,
    mat150/225, sphere19K, squishy ball, cylinder.seg); detect up front."""
    import re

    with open(path) as f:
        txt = f.read()
    from ipc_tpu.config import _resolve

    missing = []
    for m in set(re.findall(r"input/\S+\.(?:msh|obj|seg|pts|pt)", txt)):
        r = _resolve(m, path)
        if not os.path.exists(r) and not (
            m.endswith((".seg", ".pt"))
            and os.path.exists(os.path.splitext(r)[0] + ".obj")
        ):
            missing.append(m)
    if missing:
        raise SkipScene(f"missing mesh asset(s) in reference checkout: {sorted(missing)}")


def run_one(path, n_steps, budget, dtype=None, use_jit=False, grid_k=0,
            cap_scale=1.0, sync_every=1, burst=0):
    import numpy as np
    import jax.numpy as jnp

    from ipc_tpu.config import load_config
    from ipc_tpu.sim import Simulation

    _check_assets(path)
    cfg = load_config(path)
    sim = Simulation(cfg, dtype=dtype or np.float64)
    sc = getattr(sim.stepper, "sc", None)
    if sc is not None and (grid_k or cap_scale != 1.0):
        # capacity warm start: contact-dense scenes regrow caps/grid_K at
        # contact onset, and each regrow re-traces the whole step (~2-4 min
        # on this host) — pre-sizing from a previous run's observed needs
        # trades a little memory for most of that compile thrash
        if grid_k:
            sc.grid_K = max(sc.grid_K, int(grid_k))
        if cap_scale != 1.0:
            sc.cap_pt = int(sc.cap_pt * cap_scale)
            sc.cap_ee = int(sc.cap_ee * cap_scale)
            sc.cap_et = int(sc.cap_et * cap_scale)
            sc.cap_act_pt = int(sc.cap_act_pt * cap_scale)
            sc.cap_act_ee = int(sc.cap_act_ee * cap_scale)
            sc.cap_fric = int(sc.cap_fric * cap_scale)
    mesh = sim.mesh
    rec = {
        "scene": os.path.basename(path),
        "verts": int(mesh.x_rest.shape[0]),
        "tets": int(mesh.tets.shape[0]),
        "script": cfg.script,
    }
    state = sim.initial_state()
    sim._check_initial_feasibility(state)

    # the production TPU config steps through the fully-jitted path (one
    # dispatch per step; the host path pays ~2 s per device sync through
    # this environment's TPU tunnel) with the sim loop's capacity
    # regrow-and-redo protocol; host-only scripts fall back
    step_fn = None
    mk_step = None
    if use_jit and not (sim.script is not None and sim.script.host_only()) \
            and type(sim.stepper).__name__ == "IPCStepper":
        import dataclasses

        from ipc_tpu.jit_step import initial_device_aux, make_jit_step

        state = dataclasses.replace(
            state, aux=initial_device_aux(sim.stepper)
        )

        def mk_step():
            if not burst:
                return make_jit_step(sim.stepper, donate=False)
            # bounded-dispatch mode: the axon tunnel kills any single
            # dispatch at ~60 s wall (out_r5/WATCHDOG_PROBE.txt), which is
            # what every contact-rich TPU-lane "worker crashed" record
            # was. Three compiled programs + a host loop keep each
            # dispatch to `burst` Newton iterations.
            begin, run_b, finish, mx = make_jit_step(
                sim.stepper, donate=False, burst=burst
            )

            def step_burst(st):
                phase = ["begin"]
                try:
                    s2, aux_out, ss, pa, carry = begin(st)
                    nb = 0
                    while True:
                        phase[0] = f"burst{nb}"
                        carry = run_b(pa, carry)
                        done = bool(carry["done"])  # host sync per burst
                        nb += 1
                        if done or int(carry["k"]) >= mx:
                            break
                    phase[0] = "finish"
                    return finish(s2, aux_out, ss, pa, carry)
                except Exception as e:
                    # localize which dispatch killed the worker
                    raise type(e)(f"[at {phase[0]}] {e}") from None

            return step_burst

        step_fn = mk_step()
        rec["path"] = "jit-burst" if burst else "jit"
    else:
        rec["path"] = "host"

    # invariant check + per-step progress marker (the parent parses PROG
    # lines to salvage partial evidence from a timed-out child)
    print(f"PROG {json.dumps({k: rec[k] for k in ('verts', 'tets')})}", flush=True)

    tets = np.asarray(mesh.tets)
    t0 = time.perf_counter()
    done = 0
    doublings = backtracks = newton_total = al_total = 0
    sysE, sysM, sysL = [], [], []

    def log_conservation(st):
        """Whole-scene energy / |linear momentum| / |angular momentum|
        (reference sysE/M/L writers, Optimizer.cpp:3745-3777) — the
        conservation trend committed with flagship battery records."""
        from ipc_tpu.energy.elasticity import elasticity_energy_per_elem

        xs = np.asarray(st.x)
        vs = np.asarray(st.v)
        m = np.asarray(mesh.mass)[:, None]
        g = np.asarray(sim.stepper.gravity)
        e_el = float(
            np.asarray(
                elasticity_energy_per_elem(jnp.asarray(st.x), mesh, cfg.energy)
            ).sum()
        )
        E = 0.5 * float((m * vs**2).sum()) - float((m[:, 0] * (xs @ g)).sum()) + e_el
        M = (m * vs).sum(axis=0)
        L = (m * np.cross(xs, vs)).sum(axis=0)
        # 6 SIGNIFICANT digits, not 6 decimals: scene energies span 1e-6..1e6
        # (decimal rounding flattened dolphinFunnel's trend to a constant)
        sysE.append(float(f"{E:.6g}"))
        sysM.append(float(f"{float(np.linalg.norm(M)):.6g}"))
        sysL.append(float(f"{float(np.linalg.norm(L)):.6g}"))
    def emit_prog():
        prog = dict(step=done, secs=round(time.perf_counter() - t0, 1))
        if done % 10 == 0 or done == n_steps or done % max(sync_every, 1) == 0:
            # carry the conservation columns in-band so a hard-killed child
            # still leaves them in the salvaged TIMEOUT record (the 214-step
            # dolphinFunnel run died in finalization with its trend lost)
            prog.update(sysE=sysE, sysM=sysM, sysL=sysL)
        print(f"PROG {json.dumps(prog)}", flush=True)

    if step_fn is not None and (sync_every > 1 or burst):
        # device-sync amortization: through the axon tunnel every host
        # read of a device scalar costs seconds, and the per-step loop
        # reads counts + conservation state each step — the 36K-tet
        # dolphinFunnel ran at ~20 s/step while the chip itself steps in
        # well under a second. Run k steps device-side between syncs; on
        # a (rare) capacity overflow, regrow and REDO the whole block
        # from the last synced state (the same pre-step-redo protocol,
        # block-granular).
        while done < n_steps:
            k = min(max(sync_every, 1), n_steps - done)
            block0 = state
            for _ in range(8):  # regrow attempts for this block
                states, stats = [], []
                s = block0
                for _ in range(k):
                    s, js = step_fn(s)
                    states.append(s)
                    stats.append(js)
                # ONE sync for the whole block: check every step's counts,
                # grow caps from all of them, and redo the block if any grew
                overflow = False
                for js in stats:
                    overflow |= sim.grow_caps(js)
                if not overflow:
                    break
                step_fn = mk_step()
            else:
                raise RuntimeError("capacity regrowth did not converge")
            for s, js in zip(states, stats):
                newton_total += int(js.newton_iters)
                doublings += int(js.kappa_doublings)
                al_total += int(js.al_iters)
                done += 1
                log_conservation(s)
            state = states[-1]
            emit_prog()
            if time.perf_counter() - t0 > budget:
                break
    else:
        for k in range(n_steps):
            if step_fn is not None:
                prev_state = state
                state, jstats = step_fn(state)
                state, jstats, step_fn = sim._regrow_and_redo(
                    prev_state, state, jstats, step_fn
                )
                # blocked scripted motion is completed by the device-side
                # moving-DBC AL inside the same compiled step — no host redo
                newton_total += int(jstats.newton_iters)
                doublings += int(jstats.kappa_doublings)
                al_total += int(jstats.al_iters)
            else:
                state, st_stats = sim.stepper.step(state)  # scripted inside
                doublings += getattr(st_stats, "kappa_doublings", 0)
                backtracks += getattr(st_stats, "intersection_backtracks", 0)
                newton_total += getattr(st_stats, "iters", 0)
                al_total += getattr(st_stats, "al_iters", 0)
            done += 1
            log_conservation(state)
            emit_prog()
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
        intersection_backtracks=backtracks, al_iters=al_total,
        sysE=sysE, sysM=sysM, sysL=sysL,
    )
    return rec


# The contact-solver-breaking scenes the round-1 review called out run
# first, so a budget-truncated sweep still covers what matters most.
_PRIORITY = (
    "dolphinFunnel", "rodsTwist", "squishyBall", "masonryArch",
    "erleben", "scalability", "matTwist", "cubeStack",
)


def _scene_list(only="", skip=""):
    scenes = sorted(glob.glob(os.path.join(SCENES_DIR, "*.txt")))
    scenes += sorted(glob.glob(os.path.join(SCENES_DIR, "11_erleben", "*.txt")))
    # every scalability size; ones whose mesh asset the reference checkout
    # omits are recorded SKIP by _check_assets, keeping the table honest
    scenes += sorted(glob.glob(os.path.join(SCENES_DIR, "21_scalability", "*.txt")))
    if only:
        scenes = [s for s in scenes if only in s]
    for pat in filter(None, skip.split(",")):
        scenes = [s for s in scenes if pat not in s]

    def rank(path):
        for i, key in enumerate(_PRIORITY):
            if key in path:
                return i
        return len(_PRIORITY)

    return sorted(scenes, key=lambda p: (rank(p), p))


def _scene_key(path):
    rel = os.path.relpath(path, SCENES_DIR)
    return rel.replace(os.sep, "/")


def _child(args):
    import numpy as np

    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
        )
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_battery_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    dtype = np.float64 if args.dtype == "f64" else np.float32
    try:
        use_jit = args.platform == "tpu" if args.jit == "auto" else args.jit == "on"
        rec = run_one(args.one, args.steps, args.budget, dtype=dtype,
                      use_jit=use_jit, grid_k=args.grid_k,
                      cap_scale=args.cap_scale, sync_every=args.sync_every,
                      burst=args.burst)
    except SkipScene as e:
        rec = {
            "scene": os.path.basename(args.one),
            "status": "SKIP",
            "reason": str(e),
        }
    except Exception as e:
        rec = {
            "scene": os.path.basename(args.one),
            "status": "FAIL",
            "error": f"{type(e).__name__}: {e}",
            "trace": traceback.format_exc(limit=6),
        }
    print("RESULT " + json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--budget", type=float, default=240.0, help="per-scene secs")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="/tmp/paper_battery.json")
    ap.add_argument("--one", default="", help="(child) run a single scene")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    ap.add_argument(
        "--jit", default="auto", choices=["auto", "on", "off"],
        help="step through the fully-jitted path (one compiled program per "
        "step). auto = on for TPU children; 'on' also covers CPU f32 runs "
        "of mid-size scenes, where one ~2-min CPU compile beats thousands "
        "of host-path dispatches (the axon tunnel's remote compile of the "
        "same program takes 25-35 min regardless of scene size)",
    )
    ap.add_argument(
        "--route", default="",
        choices=["", "auto", "cpu-only", "tpu-only", "cpujit"],
        help="auto: small scenes -> CPU f64 oracle, large -> TPU f32 "
        "production path (the 1-core f64 host cannot finish a 30K-tet "
        "Newton solve inside any practical budget); cpu-only/tpu-only "
        "run just that half of the split; cpujit: large scenes -> the "
        "SAME jitted production program on the CPU backend (2-min "
        "compiles vs the axon tunnel's 25-35 min, uncacheable remote "
        "compile) — the lane for mid-size scenes",
    )
    ap.add_argument("--route-bytes", type=int, default=150_000,
                    help="mesh-bytes threshold for --route")
    ap.add_argument("--resume", action="store_true",
                    help="skip scenes already recorded in --out")
    ap.add_argument("--headroom", type=float, default=600.0,
                    help="hard-kill margin past --budget for assembly, "
                    "compiles, and the final invariant checks (the TPU "
                    "lane's final intersection check compiles its own "
                    "program — give it room)")
    ap.add_argument("--grid-K", dest="grid_k", type=int, default=0,
                    help="pre-size the broad-phase bucket capacity "
                    "(capacity warm start: skips regrow re-traces)")
    ap.add_argument("--cap-scale", dest="cap_scale", type=float, default=1.0,
                    help="scale the initial candidate/active caps")
    ap.add_argument("--sync-every", dest="sync_every", type=int, default=1,
                    help="jit lane: steps per host sync (amortizes the "
                    "axon tunnel's multi-second device-read latency; on a "
                    "capacity overflow the whole block is redone)")
    ap.add_argument("--burst", type=int, default=0,
                    help="jit lane: max Newton iterations per dispatch "
                    "(0 = whole step in one dispatch). The axon tunnel "
                    "kills dispatches at ~60 s wall; contact-rich scenes "
                    "need bounded dispatches on the TPU lane")
    ap.add_argument("--skip", default="",
                    help="comma-separated substrings of scene paths to "
                    "exclude (e.g. scenes already covered by another lane)")
    args = ap.parse_args()
    if args.one:
        _child(args)
        return

    import re
    import subprocess

    def scene_mesh_bytes(path):
        # count every shape INSTANCE (hitCardHouse is 7x the same mat20x20
        # mesh — deduping undercounts the scene 7x and mis-routes it to the
        # 1-core f64 host lane); shapeMatrix N*M*K instances are approximated
        # by the files listed, which is conservative for tiny seg/pt shapes
        with open(path) as f:
            txt = f.read()
        total = 0
        for m in re.findall(r"input/\S+\.(?:msh|obj|seg|pts|pt)", txt):
            p = os.path.join("/root/reference", m)
            if os.path.exists(p):
                total += os.path.getsize(p)
        return total

    results = []
    done = set()
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
        done = {r["scene"] for r in results}
    for path in _scene_list(args.only, args.skip):
        name = _scene_key(path)
        if name in done:
            continue
        platform, dtype = args.platform, args.dtype
        if args.route:
            big = scene_mesh_bytes(path) > args.route_bytes
            if args.route == "cpu-only" and big:
                continue
            if args.route == "tpu-only" and not big:
                continue
            if args.route == "cpujit":
                platform, dtype, jit = ("cpu", "f32", "on") if big else ("cpu", "f64", "off")
            else:
                platform, dtype = ("tpu", "f32") if big else ("cpu", "f64")
                jit = args.jit
        else:
            jit = args.jit
        cmd = [
            sys.executable, os.path.abspath(__file__), "--one", path,
            "--steps", str(args.steps), "--budget", str(args.budget),
            "--platform", platform, "--dtype", dtype, "--jit", jit,
            "--grid-K", str(args.grid_k), "--cap-scale", str(args.cap_scale),
            "--sync-every", str(args.sync_every), "--burst", str(args.burst),
        ]
        rec = None
        try:
            cp = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=args.budget + args.headroom,
            )
            for line in cp.stdout.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[7:])
            if rec is None:
                rec = {
                    "scene": name, "status": "FAIL",
                    "error": f"child rc={cp.returncode}",
                    "stderr": cp.stderr[-2000:],
                }
        except subprocess.TimeoutExpired as e:
            # TimeoutExpired.stdout is raw BYTES even under text=True
            out = e.stdout or b""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            prog = {}
            for line in out.splitlines():
                if line.startswith("PROG "):
                    try:
                        prog.update(json.loads(line[5:]))
                    except json.JSONDecodeError:
                        pass
            rec = {"scene": name, "status": "TIMEOUT", **prog}
        rec["scene"] = name
        rec.setdefault("config", f"{platform}-{dtype}")
        results.append(rec)
        print(
            f"{name:40s} {rec.get('verts', '?'):>7}v {rec.get('tets', '?'):>8}t "
            f"{rec.get('steps', rec.get('step', 0)):>3} steps "
            f"{rec.get('secs', 0):>8}s  {rec['status']}"
            + (f"  {rec.get('error', '')}" if rec["status"] == "FAIL" else ""),
            flush=True,
        )
        # atomic write-rename per record: a concurrent sweep or a killed
        # parent can otherwise clobber the table mid-write (the round-3
        # "reconstructed record" incident, BATTERY_r3.json wedgeCrackCO)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, args.out)
    n_pass = sum(r["status"] == "PASS" for r in results)
    print(f"\n{n_pass}/{len(results)} scenes pass -> {args.out}")


if __name__ == "__main__":
    main()
