"""L5 linear solver: matrix-free PCG + preconditioners (replaces CHOLMOD)."""
