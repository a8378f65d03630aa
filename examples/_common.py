"""Shared helpers for the benchmark-config examples."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def setup_jax():
    import os

    import jax

    # honor JAX_PLATFORMS=cpu (the axon TPU plugin force-overrides it)
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def small() -> bool:
    return "--small" in sys.argv


def timed_render(render_fn, *args, n: int = 2):
    """Compile + time with true host sync (the tunneled backend's
    block_until_ready does not wait for device completion)."""
    img = np.asarray(render_fn(*args))  # compile + warmup
    times = []
    for _ in range(n):
        t0 = time.time()
        img = np.asarray(render_fn(*args))
        times.append(time.time() - t0)
    return img, min(times)


def report(name: str, seconds: float, rays: int, extra=None):
    out = {
        "example": name,
        "seconds": round(seconds, 3),
        "Mrays_per_s": round(rays / seconds / 1e6, 2),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))
