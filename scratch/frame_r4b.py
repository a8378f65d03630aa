#!/usr/bin/env python
"""Frame A/B for the round-4b changes (scalar-count tail chunks,
cond-skipped escalation, escalation depth 128): dragon 200k fwd,
fwd+bwd, and 870k fwd with overflow flags, at shipped defaults.

Usage: python scratch/frame_r4b.py [tile_rays]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import time

import numpy as np
import jax


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    from sycl_ray_tracing_tpu import native
    print(f"native SAH lib: {native.available()}", flush=True)

    cam = pbrt_dragon_camera()
    cfg = RenderConfig(width=512, height=512, samples=1, bounces=8,
                       intersect="list", tile_rays=tile, estimator="shared")
    rays = 512 * 512 * 8

    def frame(scene, label):
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k,
                                                      with_aux=True))
        img, aux = f(scene, cam, jax.random.PRNGKey(0))
        np.asarray(img)
        ts = []
        for i in range(3):
            t0 = time.time()
            img, aux = f(scene, cam, jax.random.PRNGKey(i + 1))
            np.asarray(img)
            ts.append(time.time() - t0)
        dt = min(ts)
        ovf = bool(np.asarray(aux["overflow"]))
        print(f"{label:28s} {dt*1e3:8.1f} ms  {rays/dt/1e6:5.2f} Mrays/s  "
              f"overflow={ovf}  mean={float(np.asarray(img).mean()):.4f}",
              flush=True)
        return dt

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    frame(scene, f"dragon200k tile={tile}")

    # fwd+bwd
    mats = scene.materials

    def loss(diffuse, key):
        s = scene.with_materials(dataclasses.replace(mats, diffuse=diffuse))
        return pathtracer.render(s, cam, cfg, key).mean()

    vg = jax.jit(jax.value_and_grad(loss))
    np.asarray(vg(mats.diffuse, jax.random.PRNGKey(0))[1])
    ts = []
    for i in range(3):
        t0 = time.time()
        _, g = vg(mats.diffuse, jax.random.PRNGKey(i + 1))
        np.asarray(g)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{'fwd+bwd':28s} {dt*1e3:8.1f} ms  {rays/dt/1e6:5.2f} Mrays/s",
          flush=True)

    big = dragon_scene(n_tris=870_000, with_sky=True)
    frame(big, f"dragon870k tile={tile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
