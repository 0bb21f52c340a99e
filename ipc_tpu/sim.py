"""Scene assembly + offline simulation driver.

The replacement for the reference's main.cpp scene-assembly loop and offline
progression (reference: main.cpp:864-1205 shape loading/transform/BC
selection, proceedOptimization :136-181, output writers :361-485): build one
merged mesh from the config's shapes, bind boundary conditions and collision
objects, construct the stepper, and run with artifact output.
"""

import os
import time

import numpy as np

from ipc_tpu import io_mesh
from ipc_tpu.config import Config, load_config, save_config
from ipc_tpu.contact.halfspace import HalfSpace, HalfSpaceParams
from ipc_tpu.contact.pipeline import SelfContact
from ipc_tpu.mesh import append_kinematic_surface, build_mesh
from ipc_tpu.scripting import build_script
from ipc_tpu.timestepper import IPCStepper, SimParams
from ipc_tpu.utils.observability import (
    RunLogger,
    load_status,
    load_status_text,
    save_status,
)

__all__ = ["Simulation", "assemble"]


def _load_shape(path):
    """Load a shape in scene order. Returns (kind, V, prim) with kind
    'vol' (tets), 'surf' (triangles) or 'seg' (edges) — codimensional
    shapes are kinematic (reference main.cpp:948-1014 marks obj/seg/pt
    shapes as collision objects with componentCoDim < 3)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".msh":
        return ("vol",) + io_mesh.read_msh(path)
    if ext in (".ele", ".node"):
        return ("vol",) + io_mesh.read_node_ele(os.path.splitext(path)[0])
    if ext == ".obj":
        return ("surf",) + io_mesh.read_obj(path)
    if ext == ".seg":
        if os.path.exists(path):
            return ("seg",) + io_mesh.read_seg(path)
        # reference fallback: missing .seg -> same-stem .obj, edges derived
        # (main.cpp:958-995)
        obj = os.path.splitext(path)[0] + ".obj"
        V, F = io_mesh.read_obj(obj)
        e = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]], axis=0)
        e = np.unique(np.sort(e, axis=1), axis=0)
        return ("seg", V, e)
    if ext == ".pt":
        # codim-0 kinematic point cloud (reference main.cpp:997-1012:
        # readOBJ of the .pt path, else the same-stem .obj, vertices only)
        obj = path if os.path.exists(path) else os.path.splitext(path)[0] + ".obj"
        V, _ = io_mesh.read_obj(obj)
        return ("pts", V, np.zeros((0, 2), np.int64))
    raise ValueError(f"unsupported shape format: {path}")


def assemble(cfg: Config, dtype=np.float64):
    """Config -> (mesh, meta, stepper ingredients). Mirrors the reference's
    assembly order: load shape, select BCs on the UNtransformed shape
    (main.cpp:1045-1070 before the transform at :1074), then transform
    rotate @ (scale * p) + translate and append."""
    from ipc_tpu.mesh import _boundary_faces, append_kinematic_surface

    # pass 1: load + transform every shape in SCENE order (DCO scripts index
    # components by scene position, reference mesh.componentNodeRange)
    entries = []
    for spec in cfg.shapes:
        kind, V0, prim = _load_shape(spec.path)
        V = (spec.rotate @ (V0 * spec.scale[None, :]).T).T + spec.translate[None, :]
        entries.append(dict(kind=kind, V=V, V0=V0, prim=np.asarray(prim), spec=spec))

    # volumetric shapes merge into the deformable mesh (vertex-major first)
    Vs, Ts = [], []
    vol_ranges = []
    vert_comp = []
    tet_ym, tet_pr, tet_rho = [], [], []
    boundary_masks = []
    off = 0
    for ei, e in enumerate(entries):
        if e["kind"] != "vol":
            continue
        V0, T0, spec = e["V0"], e["prim"], e["spec"]
        nV, nT = len(V0), len(T0)
        bmask = np.zeros(nV, dtype=bool)
        bf = _boundary_faces(np.asarray(T0, np.int64))
        bmask[np.unique(bf.reshape(-1))] = True
        boundary_masks.append(bmask)
        rho, ym, pr = spec.material
        tet_rho.append(np.full(nT, cfg.rho if rho is None or not np.isfinite(rho or np.nan) else rho))
        tet_ym.append(np.full(nT, cfg.ym if ym is None or not np.isfinite(ym or np.nan) else ym))
        tet_pr.append(np.full(nT, cfg.pr if pr is None or not np.isfinite(pr or np.nan) else pr))
        Vs.append(e["V"])
        Ts.append(np.asarray(T0) + off)
        e["range"] = (off, off + nV)
        vol_ranges.append(e["range"])
        vert_comp.append(np.full(nV, len(vol_ranges) - 1, dtype=np.int32))
        off += nV

    if not Vs:
        raise ValueError("scene has no volumetric shapes")
    V = np.concatenate(Vs, axis=0)
    T = np.concatenate(Ts, axis=0)
    vert_comp = np.concatenate(vert_comp)
    surface_mask = np.concatenate(boundary_masks)
    comp_ranges = vol_ranges

    # global rotateModel + `size` apply to the FULL scene: the reference
    # appends codimensional (obj/seg) shapes into V during the shape loop
    # (main.cpp:948-1014), BEFORE the rotate/size block, so codim kinematic
    # geometry is rotated/scaled too and participates in the extent
    # computation. Only meshCO/halfSpace stay in world units (placed
    # post-normalization). We keep codim shapes out of the merged V until
    # after build_mesh, so mirror the reference by transforming V and every
    # codim entry's e['V'] with the same rotation/scale/shift.
    codim = [e for e in entries if e["kind"] != "vol"]

    def _scene_pts():
        return np.concatenate([V] + [e["V"] for e in codim], axis=0)

    if cfg.rotate_model is not None:
        from ipc_tpu.scripting import _axis_angle

        axis, deg = cfg.rotate_model
        R = _axis_angle(axis, np.radians(deg))
        # the reference rotates about the HALF-EXTENT vector
        # (maxCoeff-minCoeff)/2, not the bbox midpoint (main.cpp:1116-1119)
        # — a pure translation difference that cancels when size>0 follows,
        # but canonical for rotateModel scenes without size
        P = _scene_pts()
        c = 0.5 * (P.max(axis=0) - P.min(axis=0))
        V = (V - c) @ R.T + c
        for e in codim:
            e["V"] = (e["V"] - c) @ R.T + c

    # global `size`: normalize the assembled model so its max extent equals
    # cfg.size, then shift its min corner to the origin — AFTER rotateModel,
    # matching reference main.cpp:1141-1146.
    if cfg.size > 0.0:
        P = _scene_pts()
        s = cfg.size / float((P.max(axis=0) - P.min(axis=0)).max())
        V = V * s
        for e in codim:
            e["V"] = e["V"] * s
        lo = np.minimum(V.min(axis=0),
                        np.min([e["V"].min(axis=0) for e in codim], axis=0)
                        if codim else V.min(axis=0))
        V = V - lo
        for e in codim:
            e["V"] = e["V"] - lo

    # `fall` scripts shift the whole scene up by half its (post-
    # normalization) bbox diagonal (reference AST_FALL, AnimScripter.cpp —
    # runs in the Optimizer ctor, i.e. AFTER main.cpp's rotate/size setup)
    script_name = cfg.script
    if script_name and script_name.lower() in ("fall", "fall_noshift"):
        if script_name.lower() == "fall":
            ext = V.max(axis=0) - V.min(axis=0)
            shift = np.array([0.0, 0.5 * float(np.linalg.norm(ext)), 0.0])
            V = V + shift
            for e in entries:
                if e["kind"] != "vol":
                    e["V"] = e["V"] + shift
        script_name = "null"

    # build the deformable mesh first so codimensional shapes can be
    # appended as kinematic surface geometry; compute each codim shape's
    # vertex range in SCENE component order for the scripts
    mesh, meta = build_mesh(
        V,
        T,
        density=np.concatenate(tet_rho),
        ym=np.concatenate(tet_ym),
        pr=np.concatenate(tet_pr),
        vert_comp=vert_comp,
        comp_ranges=comp_ranges,
        dtype=dtype,
    )
    for e in entries:
        if e["kind"] == "vol":
            continue
        tris = e["prim"] if e["kind"] == "surf" else None
        edges = e["prim"] if e["kind"] == "seg" else None
        mesh, meta, rng = append_kinematic_surface(
            mesh, meta, e["V"], tris=tris, edges=edges, dtype=dtype
        )
        e["range"] = rng

    # scene-order component tables for the scripts
    comp_ranges_scene = [e["range"] for e in entries]
    _CODIM = {"vol": 3, "surf": 2, "seg": 1, "pts": 0}
    comp_codim = [_CODIM[e["kind"]] for e in entries]
    V_all = np.asarray(mesh.x_rest, np.float64)
    surface_mask_all = np.concatenate(
        [surface_mask, np.ones(meta.n_verts - len(surface_mask), bool)]
    )

    script = build_script(
        script_name,
        V_all,
        surface_mask_all,
        comp_ranges_scene,
        params=cfg.script_params,
        handle_ratio=cfg.handle_ratio,
        shape_specs=[e["spec"] for e in entries],
        dbc_time_range=cfg.dbc_time_range,
        nbc_time_range=cfg.nbc_time_range,
        comp_codim=comp_codim,
    )
    # fold the script's DBC selection into the mesh (codim verts already DBC)
    import jax.numpy as jnp

    dbc_mesh = np.asarray(mesh.dbc_mask)
    if script.clear_shape_dbc:
        # AST_FALL* resetDBCVertices: drop the scene's shape-DBC selections
        # but keep codimensional kinematic components pinned
        keep = np.zeros_like(dbc_mesh)
        for ci, (s0, s1) in enumerate(comp_ranges_scene):
            if comp_codim[ci] < 3:
                keep[s0:s1] = True
        dbc_mesh = dbc_mesh & keep
    dbc = dbc_mesh | script.dbc_mask()
    mesh = __import__("dataclasses").replace(mesh, dbc_mask=jnp.asarray(dbc))
    return mesh, meta, script


class Simulation:
    """End-to-end simulation bound to one scene config."""

    def __init__(self, cfg: Config, dtype=np.float64, overrides=None):
        self.cfg = cfg
        mesh, meta, script = assemble(cfg, dtype)
        self.mesh, self.meta, self.script = mesh, meta, script

        halfspaces = [
            HalfSpace(HalfSpaceParams(origin=h.origin, normal=h.normal, friction=h.friction))
            for h in cfg.halfspaces
        ]
        # ACO scripts animate the scene's ANALYTIC planes when it declares
        # any (reference AnimScripter ACO* branches drive the ACO list,
        # AnimScripter.cpp:1832-1890); the meshCO fallback binding below is
        # for plane-less scenes that reuse the same script names
        if getattr(script, "aco_kind", None) and halfspaces:
            script.mco_motions = []
        # kinematic mesh collision objects (reference MeshCO<3>): appended
        # as Dirichlet surface-only geometry; contacts + friction flow
        # through the one self-contact pipeline with per-vertex mu
        import jax.numpy as jnp

        vert_mu = None
        self.mesh_co_ranges = []
        # verts the AnimScripter owns (reference result.V = deformable +
        # codim shapes); meshCO verts appended below live OUTSIDE it, so
        # script-level initial transforms (x0_transform: drag*/scaleF/fall
        # families) must not touch them — the reference's MeshCO::V is a
        # separate object that stepAnimScript never shifts
        self.n_script_verts = meta.n_verts
        if cfg.mesh_cos:
            mu_parts = [np.zeros(meta.n_verts)]
            for co in cfg.mesh_cos:
                Vc, Fc = io_mesh.read_obj(co.path)
                # reference MeshCO ctor (MeshCO.cpp:51-58): center on the
                # vertex centroid, rotate, normalize the max bbox extent to
                # `scale`, then translate to origin
                centroid = Vc.mean(axis=0)
                cur_scale = float((Vc.max(axis=0) - Vc.min(axis=0)).max())
                Vc = (co.rotate @ (Vc - centroid[None, :]).T).T * (
                    co.scale / cur_scale
                ) + co.origin[None, :]
                mesh, meta, rng = append_kinematic_surface(mesh, meta, Vc, Fc, dtype=dtype)
                mu_parts.append(np.full(rng[1] - rng[0], co.friction))
                self.mesh_co_ranges.append(rng)
            vert_mu = jnp.asarray(np.concatenate(mu_parts), mesh.x_rest.dtype)
            self.mesh, self.meta = mesh, meta
            # script arrays must cover the appended CO vertices
            script.n_verts = meta.n_verts
            # scripted MeshCO motion (reference MCOVelocity/MCOAngVel +
            # ACOVelocity families): bind each motion to the matching CO's
            # vertex range; rotations spin about the CO origin
            from ipc_tpu.scripting import DBCGroup as _DBCGroup
            from ipc_tpu.scripting import HandleMotion as _HandleMotion

            for mi, motion in enumerate(script.mco_motions):
                if mi >= len(self.mesh_co_ranges):
                    break
                s0, s1 = self.mesh_co_ranges[mi]
                verts = np.arange(s0, s1)
                ang = motion.get("ang")
                if ang is not None and np.any(ang):
                    # full angular-velocity vector: magnitude about the
                    # normalized axis (reference MCORotCylinders et al. use
                    # the arbitrary vector, AnimScripter.cpp rotCenter+rotAxis)
                    ang = np.asarray(ang, float)
                    w = float(np.linalg.norm(ang))
                    axis = ang / w
                    script.handles.append(
                        _HandleMotion(
                            verts=verts,
                            ang_vel=w,
                            axis=axis,
                            center=np.asarray(cfg.mesh_cos[mi].origin, float),
                            lin_vel=motion.get("lin"),
                        )
                    )
                else:
                    script.dbc_groups.append(_DBCGroup(verts, motion.get("lin")))
            if script.mco_motions:
                dbc2 = np.asarray(mesh.dbc_mask) | script.dbc_mask()
                mesh = __import__("dataclasses").replace(
                    mesh, dbc_mask=jnp.asarray(dbc2)
                )
                self.mesh = mesh
            self.script = script

        sc = None
        if (cfg.self_collision or cfg.mesh_cos) and len(mesh.surf_tris) > 0:
            # reference CCDMethod names map onto the two TPU methods:
            # interval/inclusion-based -> "ti", everything else (the CTCD
            # float root-finder role) -> "accd"
            ccd = "ti" if "INCLUSION" in cfg.ccd_method.upper().replace("_", "") or (
                cfg.ccd_method.upper() in ("TI", "TIGHTINCLUSION")
            ) else "accd"
            sc = SelfContact(mesh, meta, friction=cfg.self_fric, vert_mu=vert_mu,
                             ccd_method=ccd)

        p = dict(
            dt=cfg.dt,
            gravity=(0.0, -9.80665, 0.0) if cfg.with_gravity else (0.0, 0.0, 0.0),
            model=cfg.energy,
            fric_iter_amt=cfg.fric_iter_amt,
            kappa_min_mult=cfg.kappa_min_mult,
            time_integration=cfg.time_integration,
            nm_beta=cfg.nm_beta,
            nm_gamma=cfg.nm_gamma,
            damping_stiff=cfg.damping_stiff,
            warm_start=cfg.warm_start,
        )
        if cfg.tuning:
            # tuning = [kappa, dHatEps, dHatTarget, dTolRel, fricDHat0,
            #           fricDHatTarget] (reference Optimizer.cpp:274-313)
            p["kappa"] = cfg.tuning[0]
            if len(cfg.tuning) > 1:
                p["dhat_rel"] = cfg.tuning[1]
            if len(cfg.tuning) > 2:
                p["dhat_target_rel"] = cfg.tuning[2]
            if len(cfg.tuning) > 3:
                p["dtol_rel"] = cfg.tuning[3]
            if len(cfg.tuning) > 4:
                p["fric_dhat0_rel"] = cfg.tuning[4]
            if len(cfg.tuning) > 5:
                p["fric_dhat_target_rel"] = cfg.tuning[5]
        if cfg.dhat is not None:
            # keyword dHat is in sqrt-units; internal is squared. When
            # useAbsParameters the value is absolute (Optimizer.cpp:274-282).
            if cfg.use_abs_parameters:
                p["dhat_rel"] = cfg.dhat / np.sqrt(meta.bbox_diag2)
            else:
                p["dhat_rel"] = cfg.dhat
        if cfg.epsv is not None:
            p["epsv_rel"] = cfg.epsv if not cfg.use_abs_parameters else (
                cfg.epsv / np.sqrt(meta.bbox_diag2)
            )
        if cfg.tol:
            p["rel_gl2_tol"] = cfg.tol[0] ** 2
        if overrides:
            p.update(overrides)
        self.params = SimParams(**p)

        if cfg.constraint_solver in ("QP", "SQP"):
            from ipc_tpu.qp.stepper import QPStepper

            self.stepper = QPStepper(
                mesh, meta, self.params, halfspaces=halfspaces,
                self_contact=sc, script=script, mode=cfg.constraint_solver,
                constraint_type=cfg.constraint_type,
                constraint_offset=cfg.constraint_offset,
            )
        else:
            self.stepper = IPCStepper(
                mesh, meta, self.params, halfspaces=halfspaces, self_contact=sc,
                script=script
            )

    def initial_state(self):
        if self.cfg.restart_path:
            if self.cfg.restart_path.endswith(".npz"):
                return load_status(self.cfg.restart_path, self.stepper)
            return load_status_text(self.cfg.restart_path, self.stepper)
        v0 = self.script.initial_velocity(np.asarray(self.mesh.x_rest))
        x0 = None
        if self.script.x0_transform is not None:
            # scripts that start from a transformed configuration (scaleF /
            # swing / *inv / onepoint / random / drag* families) keep the
            # rest shape and move only the initial positions (the reference
            # mutates mesh.V after restTriInv is built — same semantics).
            # Only the script-owned verts move; appended meshCO kinematic
            # geometry stays where the scene placed it (see __init__).
            x0 = np.asarray(self.mesh.x_rest).copy()
            ns = getattr(self, "n_script_verts", x0.shape[0])
            x0[:ns] = self.script.x0_transform(x0[:ns])
        return self.stepper.initial_state(x0=x0, v0=v0)

    def _check_initial_feasibility(self, state):
        """Abort on an initially inverted or self-intersected start state
        (reference Optimizer.cpp:88-94, 258-264) — a bad scene should fail
        loudly at setup, not opaquely mid-solve."""
        import jax.numpy as jnp

        x0 = np.asarray(state.x)
        tets = np.asarray(self.mesh.tets)
        if len(tets):
            D = x0[tets[:, 1:]] - x0[tets[:, :1]]
            if np.any(np.linalg.det(D) <= 0.0):
                raise RuntimeError(
                    "initial state has inverted elements — check scene "
                    "transforms / initial-configuration script"
                )
        sc = getattr(self.stepper, "sc", None)
        if sc is not None:
            hit, _ = sc.has_intersection(jnp.asarray(state.x))
            if bool(hit):
                raise RuntimeError(
                    "initial state is self-intersected — check scene shape "
                    "placement (reference aborts here too, Optimizer.cpp:258-264)"
                )

    def run(self, out_dir, n_steps=None, save_every=1, use_jit_step=False, verbose=False,
            gif=False):
        """Offline loop (reference progMode=offline, main.cpp:1419-1453):
        step, write status checkpoints + surface meshes + logs."""
        os.makedirs(out_dir, exist_ok=True)
        save_config(self.cfg, os.path.join(out_dir, "config.txt"))
        logger = RunLogger(out_dir)
        state = self.initial_state()
        self._check_initial_feasibility(state)
        self._recorder = None
        self._surf_faces_local = None
        if gif:
            # headless render-per-step + animated GIF (the reference's
            # viewer/GIF.hpp role; utils/render.py)
            from ipc_tpu.utils.render import RunRecorder

            self._recorder = RunRecorder(
                np.asarray(state.x), np.asarray(self.mesh.surf_tris)
            )
            self._recorder.add(np.asarray(state.x))
        total = n_steps if n_steps is not None else int(round(self.cfg.duration / self.cfg.dt))

        step_fn = None
        if use_jit_step:
            if self.script is not None and self.script.host_only():
                raise ValueError(
                    "use_jit_step does not support mesh-sequence scripts "
                    "(per-frame file IO); run the host path for those scenes"
                )
            import dataclasses

            from ipc_tpu.jit_step import initial_device_aux, make_jit_step

            state = dataclasses.replace(
                state, aux=initial_device_aux(self.stepper)
            )
            step_fn = make_jit_step(self.stepper, donate=False)

        t0 = time.perf_counter()
        start = int(state.step)
        try:
            self._run_loop(state, start, total, step_fn, logger, out_dir, save_every, verbose)
        except RuntimeError:
            save_status(os.path.join(out_dir, "status_failed.npz"), self._last_state, -1, self.stepper)
            raise
        finally:
            wall = time.perf_counter() - t0
            logger.write_results_stats(wall)
            logger.write_info()
            logger.close()
            if self._recorder is not None and self._recorder.frames:
                self._recorder.save(os.path.join(out_dir, "anim.gif"))
        return self._last_state

    def _regrow_and_redo(self, prev_state, state, jstats, step_fn):
        """Capacity-overflow protocol for the fully-jitted step: candidate
        tensors and grid buckets have static capacities, so a step whose
        true counts exceeded them silently dropped contact pairs. Grow the
        capacities (x1.5 + headroom, pipeline.ensure_caps semantics),
        re-trace, and REDO the step from the pre-step state (the reference
        never drops pairs: its sets are dynamically sized,
        SelfCollisionHandler.cpp:2447-2498)."""
        sc = self.stepper.sc
        if sc is None:
            return state, jstats, step_fn
        from ipc_tpu.jit_step import make_jit_step

        for _ in range(8):
            if not self.grow_caps(jstats):
                break
            step_fn = make_jit_step(self.stepper, donate=False)
            state, jstats = step_fn(prev_state)
        return state, jstats, step_fn

    def grow_caps(self, jstats):
        """ONE capacity check + growth from a step's stats (the check half
        of _regrow_and_redo, reusable by callers that batch several steps
        between host syncs and redo a whole block on overflow). Returns
        True when any capacity grew (the caller must re-trace)."""
        sc = self.stepper.sc
        grew = False
        if int(jstats.pt_count) > sc.cap_pt:
            sc.cap_pt = int(int(jstats.pt_count) * 1.5) + 64
            grew = True
        if int(jstats.ee_count) > sc.cap_ee:
            sc.cap_ee = int(int(jstats.ee_count) * 1.5) + 64
            grew = True
        if int(jstats.et_count) > sc.cap_et:
            sc.cap_et = int(int(jstats.et_count) * 1.5) + 64
            grew = True
        if int(jstats.bucket_overflow) > sc.grid_K:
            sc.grid_K = int(int(jstats.bucket_overflow) * 1.5) + 8
            grew = True
        grew |= sc.ensure_active_cap(
            int(jstats.active_pt_max), int(jstats.active_ee_max)
        )
        grew |= sc.ensure_fric_cap(int(jstats.fric_count))
        if grew:
            self._check_capacity_budget(sc)
        return grew

    # regrown broad-phase state may not exceed this many bytes: past it the
    # scene's geometry has degenerated (e.g. one huge swept box inflating
    # the grid cell so a single bucket holds most primitives — the flat
    # mat100x100 failure mode, BATTERY_r3.json) and requesting the memory
    # would OOM opaquely; fail with the diagnosis instead
    CAP_BUDGET_BYTES = 8 << 30

    def _check_capacity_budget(self, sc):
        """Project the regrown capacities' memory and refuse degenerate
        growth with a diagnostic instead of an opaque huge allocation.

        The dominant regrown structures: the (H+1, K) bucket tables of the
        tri/edge grids, the candidate/stencil tensors — per candidate row a
        (2,) pair + (4,) vid stencil in int32 PLUS the (4,3) position
        gathers the distance/CCD kernels materialize at the solve dtype
        (several live at once across d0/d1 and the CCD bisection carries:
        ~8 gathered copies is the measured envelope) — and the 12x12 active
        Hessian blocks."""
        from ipc_tpu.contact.spatial_hash import _default_H

        fbytes = np.dtype(self.stepper.dtype).itemsize
        n_tris = int(self.mesh.surf_tris.shape[0])
        n_edges = int(self.mesh.surf_edges.shape[0])
        table = (_default_H(n_tris) + 1 + _default_H(n_edges) + 1) * sc.grid_K * 4
        per_cand = (2 + 4) * 4 + 8 * 12 * fbytes
        cand = (sc.cap_pt + sc.cap_ee + sc.cap_et) * per_cand
        active = (sc.cap_act_pt + sc.cap_act_ee) * 144 * fbytes
        total = table + cand + active
        if total > self.CAP_BUDGET_BYTES:
            raise RuntimeError(
                f"broad-phase capacity regrowth exceeds the memory budget: "
                f"grid tables {table >> 20} MiB (grid_K={sc.grid_K}), candidates "
                f"{cand >> 20} MiB (pt={sc.cap_pt} ee={sc.cap_ee} et={sc.cap_et}), "
                f"active blocks {active >> 20} MiB — degenerate sweep/contact "
                f"geometry (a huge swept AABB inflating the hash cell, or a "
                f"dense coplanar sheet); needs the hierarchical-grid broad "
                f"phase, not more memory"
            )

    def _run_loop(self, state, start, total, step_fn, logger, out_dir, save_every, verbose):
        self._last_state = state
        for k in range(start, total):
            with logger.timers.section("step"):
                if step_fn is not None:
                    prev_state = state
                    state, jstats = step_fn(state)
                    state, jstats, step_fn = self._regrow_and_redo(
                        prev_state, state, jstats, step_fn
                    )
                    # scripted motion blocked by contact is completed by the
                    # device-side moving-DBC augmented Lagrangian inside the
                    # same compiled step (jit_step.py docstring); no host
                    # fallback — al_iters in the stats records the episode

                    class _S:  # adapt JitStepStats to the logger
                        iters = int(jstats.newton_iters)
                        alphas = [float(jstats.last_alpha)]
                        # active (d < dHat) constraint count — what the
                        # reference logs in iterStats, not the padded
                        # candidate count
                        n_constraints = [
                            int(jstats.active_pt_max) + int(jstats.active_ee_max)
                        ]
                        grad_inf = [float(jstats.dist_to_opt)]
                        al_iters = int(jstats.al_iters)

                    stats = _S()
                else:
                    state, stats = self.stepper.step(state, verbose=verbose)
            self._last_state = state
            logger.log_step(k, stats)
            logger.log_system(
                self.mesh, self.meta, state, self.stepper.gravity, self.cfg.dt,
                model=self.cfg.energy,
            )
            if save_every and (k + 1) % save_every == 0:
                if self._recorder is not None:
                    self._recorder.add(np.asarray(state.x))
                with logger.timers.section("io"):
                    save_status(os.path.join(out_dir, f"status{k + 1}.npz"), state, k + 1, self.stepper)
                    # triangulated surface in surface-local indices (the
                    # reference's saveSurfaceMesh writes faces, not a point
                    # cloud)
                    sv = np.asarray(self.mesh.surf_verts)
                    if self._surf_faces_local is None:
                        inv = np.full(self.meta.n_verts, -1, np.int64)
                        inv[sv] = np.arange(len(sv))
                        self._surf_faces_local = inv[np.asarray(self.mesh.surf_tris)]
                    io_mesh.write_obj(
                        os.path.join(out_dir, f"surf{k + 1}.obj"),
                        np.asarray(state.x)[sv],
                        self._surf_faces_local,
                    )


def run_scene(config_path, out_dir=None, n_steps=None, dtype=np.float64, **kw):
    cfg = load_config(config_path)
    sim = Simulation(cfg, dtype=dtype)
    if out_dir is None:
        base = os.path.splitext(os.path.basename(config_path))[0]
        out_dir = os.path.join("output", base)
    return sim.run(out_dir, n_steps=n_steps, **kw)
