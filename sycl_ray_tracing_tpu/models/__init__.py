"""Scene model, camera, materials, and the path-tracing integrator."""
