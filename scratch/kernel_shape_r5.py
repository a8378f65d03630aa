#!/usr/bin/env python
"""Round-5 kernel-shape A/B: re-sweep the list-tracer constants in the
post-count-gating + compact-escalation cost landscape (VERDICT r4 #7).

Each config times the full dragon frame (512x512, 1spp, 8 bounces, list
backend, shared estimator) — the shipped workload, not a microbench.

Usage: python scratch/kernel_shape_r5.py [config ...]
  (no args = all configs)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

CONFIGS = {
    "base": {},
    "rb64": {"RB_SHARE": 64},
    "rb16": {"RB_SHARE": 16},
    "mc64": {"DEFAULT_MAXC_SHARE": 64},
    "mc128": {"DEFAULT_MAXC_SHARE": 128},
    "group16": {"GROUP": 16},
    "chunk8": {"CHUNK": 8},
    "chunk32": {"CHUNK": 32},
    "noprimshare": {"PRIMARY_SHARE": False},
    "esccap32": {"ESC_CAP_DIV": 32},
    "esccap1": {"ESC_CAP_DIV": 1},
    "esccap8": {"ESC_CAP_DIV": 8},
    "esccap16": {"ESC_CAP_DIV": 16},
    "rb16esc8": {"RB_SHARE": 16, "ESC_CAP_DIV": 8},
    "mc64esc8": {"DEFAULT_MAXC_SHARE": 64, "ESC_CAP_DIV": 8},
    "mc128esc8": {"DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 8},
    "rb16mc64esc8": {"RB_SHARE": 16, "DEFAULT_MAXC_SHARE": 64, "ESC_CAP_DIV": 8},
    "group16esc8": {"GROUP": 16, "ESC_CAP_DIV": 8},
    "chunk8esc8": {"CHUNK": 8, "ESC_CAP_DIV": 8},
    "noprimesc8": {"PRIMARY_SHARE": False, "ESC_CAP_DIV": 8},
    "rb16mc128esc8": {"RB_SHARE": 16, "DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 8},
    "group16mc128esc8": {"GROUP": 16, "DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 8},
    "chunk8mc128esc8": {"CHUNK": 8, "DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 8},
    "chunk32mc128esc8": {"CHUNK": 32, "DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 8},
    "noprimmc128esc8": {"PRIMARY_SHARE": False, "DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 8},
    "mc128esc16": {"DEFAULT_MAXC_SHARE": 128, "ESC_CAP_DIV": 16},
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops.pallas import listtrace
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    names = _sys.argv[1:] or list(CONFIGS)
    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cam = pbrt_dragon_camera()
    cfg = RenderConfig(width=512, height=512, samples=1, bounces=8,
                       intersect="list", tile_rays=32768, estimator="shared")
    rays = 512 * 512 * 8

    defaults = {}
    for name in names:
        over = CONFIGS[name]
        for k, v in over.items():
            mod = pathtracer if k == "PRIMARY_SHARE" else listtrace
            defaults.setdefault(k, getattr(mod, k))
            setattr(mod, k, v)
        try:
            f = jax.jit(lambda s, c, k: pathtracer.render(
                s, c, cfg, k, with_aux=True))
            img, aux = f(scene, cam, jax.random.PRNGKey(0))
            np.asarray(img)
            ovf = bool(np.asarray(aux["overflow"]))
            ts = []
            for i in range(3):
                t0 = time.time()
                np.asarray(f(scene, cam, jax.random.PRNGKey(i + 1))[0])
                ts.append(time.time() - t0)
            wall = min(ts)
            print(f"{name:12s} {wall*1e3:8.1f} ms  {rays/wall/1e6:5.2f} "
                  f"Mrays/s  overflow={ovf}  {over}", flush=True)
        finally:
            for k in over:
                mod = pathtracer if k == "PRIMARY_SHARE" else listtrace
                setattr(mod, k, defaults[k])
    return 0


if __name__ == "__main__":
    _sys.exit(main())
