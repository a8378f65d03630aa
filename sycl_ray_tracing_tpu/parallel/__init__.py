"""Multi-chip scaling: mesh construction, sharded rendering, distributed
gradient steps."""
