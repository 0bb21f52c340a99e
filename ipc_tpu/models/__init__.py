"""Procedural test/benchmark geometry (cubes, mats, rods)."""
