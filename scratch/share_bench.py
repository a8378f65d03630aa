#!/usr/bin/env python
"""Round-3 kernel A/B: per-ray vs block-shared list tracer on the dragon.

Measures (a) one fused 3-query sweep at bounce-like ray counts, (b) the
full 512x512x1spp x8-bounce frame, for share in {False, True} and
RB_SHARE in {8, 16, 32} (monkeypatched before tracing).  Host transfer
per measurement (axon block_until_ready quirk).

Usage: python scratch/share_bench.py [--frames-only]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops.pallas import listtrace
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cam = pbrt_dragon_camera()
    w = h = 512
    rays = w * h * 8  # spp=1, 8 bounces

    from sycl_ray_tracing_tpu.ops import cluster as cl

    def frame_time(share, rb_share, maxc, extract, primary_share=True):
        listtrace.LIST_SHARE_DEFAULT = share
        listtrace.RB_SHARE = rb_share
        listtrace.DEFAULT_MAXC_SHARE = maxc
        cl.EXTRACT_METHOD = extract
        pathtracer.PRIMARY_SHARE = primary_share
        cfg = RenderConfig(width=w, height=h, samples=1, bounces=8,
                           intersect="list", tile_rays=32768,
                           estimator="shared")
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
        np.asarray(f(scene, cam, jax.random.PRNGKey(0)))  # compile+warm
        ts = []
        for i in range(3):
            t0 = time.time()
            out = np.asarray(f(scene, cam, jax.random.PRNGKey(i + 1)))
            ts.append(time.time() - t0)
        assert np.isfinite(out).all() and out.mean() > 1e-4
        return min(ts)

    configs = [
        ("per-ray minrounds", False, 8, 32, "minrounds", True),
        ("per-ray topk", False, 8, 32, "topk", True),
        ("per-ray topk noPshare", False, 8, 32, "topk", False),
        ("share rb=8  mc=48 topk", True, 8, 48, "topk", True),
        ("share rb=16 mc=64 topk", True, 16, 64, "topk", True),
        ("share rb=32 mc=64 topk", True, 32, 64, "topk", True),
    ]
    for name, share, rb, mc, ex, ps in configs:
        try:
            dt = frame_time(share, rb, mc, ex, ps)
            print(f"{name:24s} frame {dt*1e3:7.1f} ms   "
                  f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {e!r}"[:200], flush=True)
    listtrace.LIST_SHARE_DEFAULT = False
    cl.EXTRACT_METHOD = "minrounds"


if __name__ == "__main__":
    sys.exit(main())
