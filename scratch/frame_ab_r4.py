#!/usr/bin/env python
"""Round-4 frame-level A/B on the flagship dragon frame (TPU):
escalation on/off, per-ray vs share, maxc sweep, SAH vs Morton.
Every line reports throughput AND the honest overflow flag (a shipped
default must certify the whole frame: flag False).

Usage: python scratch/frame_ab_r4.py [n_tris]
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
    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene
    from sycl_ray_tracing_tpu.utils.config import RenderConfig

    assert cl.EXTRACT_METHOD == "topk"
    from sycl_ray_tracing_tpu import native

    print(f"native SAH lib available: {native.available()}")
    scene = dragon_scene(n_tris=n_tris, with_sky=True)   # order="sah"
    scene_m = None
    cam = pbrt_dragon_camera()
    w = h = 512
    rays = w * h * 8
    orig_run = lt._run

    def frame(scn, share, maxc, esc, ref=None):
        lt.LIST_SHARE_DEFAULT = share
        lt.DEFAULT_MAXC = maxc if not share else lt.DEFAULT_MAXC
        if share:
            lt.DEFAULT_MAXC_SHARE = maxc
        pathtracer.PRIMARY_SHARE = True
        if esc:
            lt._run = orig_run
        else:
            def noesc(*a, **k):
                k["escalate"] = False
                return orig_run(*a, **k)
            lt._run = noesc
        cfg = RenderConfig(width=w, height=h, samples=1, bounces=8,
                           intersect="list", tile_rays=32768,
                           estimator="shared")
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k,
                                                      with_aux=True))
        img, aux = f(scn, cam, jax.random.PRNGKey(0))
        img = np.asarray(img)
        assert np.isfinite(img).all() and img.mean() > 1e-4
        ts = []
        for i in range(3):
            t0 = time.time()
            out, aux = f(scn, cam, jax.random.PRNGKey(1))
            out = np.asarray(out)
            ts.append(time.time() - t0)
        dt = min(ts)
        extra = ""
        if ref is not None:
            d = np.abs(out - ref)
            extra = (f"  mean|d|/mean={d.mean() / ref.mean():.4f}"
                     f" p99|d|={np.quantile(d, 0.99):.4f}")
        print(f"  {dt * 1e3:7.1f} ms {rays / dt / 1e6:6.2f} Mrays/s  "
              f"overflow={bool(np.asarray(aux['overflow']))}{extra}",
              flush=True)
        return out

    import os
    cfg_sel = os.environ.get("AB_CONFIGS", "full")
    configs = [
        ("per-ray mc=32 esc      ", dict(share=False, maxc=32, esc=True)),
        ("per-ray mc=32 noesc    ", dict(share=False, maxc=32, esc=False)),
        ("per-ray mc=16 esc      ", dict(share=False, maxc=16, esc=True)),
        ("per-ray mc=48 noesc    ", dict(share=False, maxc=48, esc=False)),
        ("share   mc=48 esc      ", dict(share=True, maxc=48, esc=True)),
        ("share   mc=96 esc      ", dict(share=True, maxc=96, esc=True)),
    ]
    if cfg_sel == "round2":
        configs = [configs[0], configs[1], configs[4], configs[5]]
    ref = None
    for name, kw in configs:
        print(name, flush=True)
        try:
            out = frame(scene, **kw)
            if ref is None:
                ref = out
        except Exception as e:
            print(f"  FAILED: {e!r}"[:220], flush=True)
        lt.DEFAULT_MAXC = 32
        lt.DEFAULT_MAXC_SHARE = 48
        lt.LIST_SHARE_DEFAULT = False
        lt._run = orig_run

    if os.environ.get("AB_MORTON", "1") == "0":
        return 0
    # SAH vs Morton at the winning shape (per-ray esc defaults)
    print("per-ray mc=32 esc MORTON", flush=True)
    try:
        from sycl_ray_tracing_tpu.ops.cluster import (
            build_clusters,
            default_budgets,
        )

        tris = np.asarray(scene.triangles)
        cs_m = build_clusters(tris, order="morton")
        p1, p2 = default_budgets(32768, cs_m.num_superclusters)
        scene_m = scene.with_clusters(cs_m.with_budgets(p1, p2))
        frame(scene_m, share=False, maxc=32, esc=True)
    except Exception as e:
        print(f"  FAILED: {e!r}"[:220], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
