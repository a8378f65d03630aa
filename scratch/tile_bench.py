#!/usr/bin/env python
"""Round-4 A/B: tile_rays x kernel shape on the flagship dragon frame.

VERDICT r3 #2: the list path has no pair-budget transient (the 32k tiling
was inherited from the cluster tracer), and the measured ~8-10ms fixed
cost per fused launch x 64 launches/frame predicts ~500-640ms of glue.
Fewer, bigger tiles should reclaim most of it.

Usage: python scratch/tile_bench.py [n_tris]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    assert cl.EXTRACT_METHOD == "topk"
    scene = dragon_scene(n_tris=n_tris, with_sky=True)
    cam = pbrt_dragon_camera()
    w = h = 512
    rays = w * h * 8

    def frame(share, tile):
        listtrace.LIST_SHARE_DEFAULT = share
        pathtracer.PRIMARY_SHARE = True
        cfg = RenderConfig(width=w, height=h, samples=1, bounces=8,
                           intersect="list", tile_rays=tile,
                           estimator="shared")
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
        img = np.asarray(f(scene, cam, jax.random.PRNGKey(0)))
        assert np.isfinite(img).all() and img.mean() > 1e-4
        ts = []
        for i in range(3):
            t0 = time.time()
            out = np.asarray(f(scene, cam, jax.random.PRNGKey(1)))
            ts.append(time.time() - t0)
        return min(ts), out

    # NOTE: the tiled render folds the RNG key per tile, so images are only
    # comparable at the SAME tile size; the share-vs-per-ray diff below is
    # at matched keys (true estimator deviation, not MC noise).
    for tile in (32768, 65536, 131072, 262144):
        ref = None
        for share in (False, True):
            name = f"{'share' if share else 'per-ray'} tile={tile}"
            try:
                dt, img = frame(share, tile)
                extra = ""
                if not share:
                    ref = img
                elif ref is not None:
                    d = np.abs(img - ref)
                    extra = (f"   mean|d|/mean={d.mean() / ref.mean():.4f}"
                             f" p99|d|={np.quantile(d, 0.99):.4f}")
                print(f"{name:24s} {dt * 1e3:7.1f} ms "
                      f"{rays / dt / 1e6:6.2f} Mrays/s{extra}", flush=True)
            except Exception as e:
                print(f"{name:24s} FAILED: {e!r}"[:220], flush=True)
    listtrace.LIST_SHARE_DEFAULT = False
    return 0


if __name__ == "__main__":
    sys.exit(main())
