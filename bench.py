#!/usr/bin/env python
"""Benchmark: forward path-tracing throughput in Mrays/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship dragon-stand-in scene (the reference's pbrt_dragon
asset is absent from the mount — see utils/procedural.py) with BVH
traversal, Cook–Torrance + NEE/MIS + env importance sampling, 720p-class ray
count at 1 spp/iter — matching the BASELINE.json metric definition.

Rays counted = primary rays * (traversals per bounce summed over the bounce
scan): each bounce costs 1 closest-hit + 2 shadow + 2 MIS-sample traversals
(SURVEY.md §3.2), so rays/sample = sum over bounces of 5 per live path.  We
report *primary path segments* (the conservative classic definition:
camera rays x bounces x spp), not the x5 traversal count.

Baseline target: 50 Mrays/s/chip (BASELINE.md).  vs_baseline = value / 50.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    n_tris = 200_000
    width, height = 1280, 720
    bounces = 4
    config = RenderConfig(
        width=width, height=height, samples=1, bounces=bounces
    )

    scene = dragon_scene(n_tris=n_tris)
    camera = pbrt_dragon_camera()

    render = jax.jit(
        lambda s, c, k: pathtracer.render(s, c, config, k)
    )
    key = jax.random.PRNGKey(0)

    # compile + warmup
    img = render(scene, camera, key)
    img.block_until_ready()

    iters = 3
    t0 = time.time()
    for i in range(iters):
        img = render(scene, camera, jax.random.PRNGKey(i + 1))
    img.block_until_ready()
    dt = (time.time() - t0) / iters

    rays = width * height * config.samples * bounces
    mrays = rays / dt / 1e6
    baseline = 50.0
    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip forward (dragon-standin 200k tris, "
                          "720p, 1spp, 4 bounces)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
