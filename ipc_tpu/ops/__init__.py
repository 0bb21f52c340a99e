"""L0 math kernels: batched, branch-free, fixed-shape building blocks.

Submodules (import them directly; names are not re-exported to keep module
paths unambiguous):
  barrier     clamped log-barrier b/g/H on squared distances
  distance    PP/PE/PT/EE squared distances, dType classifiers, EE mollifier
  friction    smoothed-Coulomb kernels, tangent bases, relDX operators
  svd3        rotation-consistent (flip-corrected) 3x3 SVD
  spd         SPD projection by eigenvalue clamping
  step_bound  inversion-free step-size bound (cubic smallest positive root)
"""
