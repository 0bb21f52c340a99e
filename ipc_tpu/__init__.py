"""ipc_tpu — a TPU-native Incremental Potential Contact (IPC) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU implementation of *Incremental Potential Contact: Intersection- and
Inversion-free Large Deformation Dynamics* (SIGGRAPH 2020), built TPU-first:

- state is a pytree of fixed-shape arrays (no objects, no dynamic shapes),
- per-tet / per-pair kernels are batched (vmap / Pallas) instead of TBB loops,
- the linear solve is a matrix-free preconditioned CG instead of CHOLMOD,
- collision pipelines (broad phase, narrow phase, CCD) run over padded
  candidate tensors with masks and overflow detection,
- multi-chip scaling uses `jax.sharding.Mesh` + collectives over ICI.

Layer map (mirrors SURVEY.md §1 for the reference at /root/reference):
  L0 ops/        math kernels: SVD, SPD projection, barrier, distances, CCD
  L1 mesh.py     tet mesh + embedded surface state (arrays, not objects)
  L2 energy/     stretch-invariant elasticity energies (NH, FCR)
  L3/L4 contact/ broad phase, narrow phase, barrier/friction energies, CCD
  L5 solver/     matrix-free PCG + preconditioners (replaces LinSysSolver)
  L6 timestepper.py  projected-Newton IP time stepper (replaces Optimizer)
  L7 scripting.py    scripted boundary conditions (replaces AnimScripter)
  L8 config.py       scene-script DSL parser (replaces Config)
  L9 cli.py          offline driver (replaces main.cpp)
"""

__version__ = "0.1.0"
