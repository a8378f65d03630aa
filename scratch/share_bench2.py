#!/usr/bin/env python
"""Round-3 follow-up A/B: larger rb/maxc for the block-shared kernel +
ACCURACY check (image diff vs the per-ray maxc=48 render and overflow
flag) so the default flip is evidence-based on both axes.

Usage: python scratch/share_bench2.py
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

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cam = pbrt_dragon_camera()
    w = h = 512
    rays = w * h * 8

    def frame(share, rb_share, maxc, extract):
        listtrace.LIST_SHARE_DEFAULT = share
        listtrace.RB_SHARE = rb_share
        listtrace.DEFAULT_MAXC_SHARE = maxc
        cl.EXTRACT_METHOD = extract
        # the accuracy reference must be PURELY per-ray (ADVICE r3: a
        # hardcoded True here rendered the reference's primaries through
        # the share kernel, understating share-mode error on primary hits)
        pathtracer.PRIMARY_SHARE = share
        cfg = RenderConfig(width=w, height=h, samples=1, bounces=8,
                           intersect="list", tile_rays=32768,
                           estimator="shared")
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
        img = np.asarray(f(scene, cam, jax.random.PRNGKey(0)))
        ts = []
        for i in range(3):
            t0 = time.time()
            out = np.asarray(f(scene, cam, jax.random.PRNGKey(1)))
            ts.append(time.time() - t0)
        assert np.isfinite(out).all() and out.mean() > 1e-4
        return min(ts), out  # same key -> directly comparable images

    # accuracy reference: per-ray lists, deep budget (maxc=48)
    listtrace.DEFAULT_MAXC = 48
    ref_dt, ref = frame(False, 8, 48, "topk")
    listtrace.DEFAULT_MAXC = 32
    print(f"{'per-ray mc=48 (ref)':26s} {ref_dt*1e3:7.1f} ms "
          f"{rays/ref_dt/1e6:6.2f} Mrays/s", flush=True)

    configs = [
        (True, 32, 48), (True, 32, 64), (True, 32, 96),
        (True, 64, 64), (True, 64, 96), (True, 128, 96),
    ]
    for share, rb, mc in configs:
        name = f"share rb={rb} mc={mc}"
        try:
            dt, img = frame(share, rb, mc, "topk")
            d = np.abs(img - ref)
            rel = d.mean() / max(ref.mean(), 1e-9)
            p99 = np.quantile(d, 0.99)
            print(f"{name:26s} {dt*1e3:7.1f} ms {rays/dt/1e6:6.2f} Mrays/s"
                  f"   mean|diff|/mean={rel:.4f} p99|diff|={p99:.4f}",
                  flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {e!r}"[:200], flush=True)
    listtrace.LIST_SHARE_DEFAULT = False
    cl.EXTRACT_METHOD = "minrounds"
    return 0


if __name__ == "__main__":
    sys.exit(main())
