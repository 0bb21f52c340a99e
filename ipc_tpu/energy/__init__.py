"""L2 elasticity energies (stretch-invariant, sigma-space formulation)."""
