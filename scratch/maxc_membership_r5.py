#!/usr/bin/env python
"""Post-membership-certificate MAXC_SHARE sweep (TPU).

The r5 A/B that picked DEFAULT_MAXC_SHARE=128 predates the per-ray
MEMBERSHIP certificate (cluster._membership_cert): 128 won because every
unblocked any-hit ray in a FULL union block had to take the per-ray
escalation pass, so deeper unions (fewer full blocks) bought their
extraction cost back in escalation volume.  Membership certificates
certify most rays of a full block directly, which shifts the optimum
toward SHALLOWER unions (extraction traffic and kernel rounds both scale
with maxc).  Re-measure on the flagship frame.

Usage: python scratch/maxc_membership_r5.py [n_tris]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=n_tris, with_sky=True)
    cam = pbrt_dragon_camera()
    w = h = 512
    rays = w * h * 8

    def frame(maxc):
        lt.DEFAULT_MAXC_SHARE = maxc
        cfg = RenderConfig(width=w, height=h, samples=1, bounces=8,
                           intersect="list", tile_rays=32768,
                           estimator="shared")
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k,
                                                      with_aux=True))
        img, aux = f(scene, cam, jax.random.PRNGKey(0))
        img = np.asarray(img)
        assert np.isfinite(img).all() and img.mean() > 1e-4
        ts = []
        for i in range(3):
            t0 = time.time()
            out, aux = f(scene, cam, jax.random.PRNGKey(1))
            out = np.asarray(out)
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"share mc={maxc:4d}: {dt * 1e3:7.1f} ms "
              f"{rays / dt / 1e6:6.2f} Mrays/s  "
              f"overflow={bool(np.asarray(aux['overflow']))}", flush=True)

    saved = lt.DEFAULT_MAXC_SHARE
    try:
        for maxc in (48, 64, 96, 128):
            try:
                frame(maxc)
            except Exception as e:
                print(f"share mc={maxc}: FAILED {e!r}"[:220], flush=True)
    finally:
        lt.DEFAULT_MAXC_SHARE = saved
    return 0


if __name__ == "__main__":
    sys.exit(main())
