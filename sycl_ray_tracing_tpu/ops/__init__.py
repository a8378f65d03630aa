"""Compute ops: math substrate, intersection, BRDF, sampling, BVH, env map."""
