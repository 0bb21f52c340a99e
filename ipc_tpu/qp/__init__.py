"""QP/SQP constraint-solver comparison path (reference constraintSolver
QP | SQP; src/CollisionObject/CollisionConstraints.*, Optimizer.cpp QP
plumbing :627-922, fullyImplicit :1340-1515)."""
