#!/usr/bin/env python
"""Profile the FULL dragon frame (the bench headline) on TPU: wall time +
top device ops from the chrome trace, bucketed by op family.

Usage: python scratch/profile_frame.py [share] [extract] [primary_share]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np


def main():
    share = bool(int(sys.argv[1])) if len(sys.argv) > 1 else False
    extract = sys.argv[2] if len(sys.argv) > 2 else "minrounds"
    pshare = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    listtrace.LIST_SHARE_DEFAULT = share
    cl.EXTRACT_METHOD = extract
    pathtracer.PRIMARY_SHARE = pshare

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cam = pbrt_dragon_camera()
    cfg = RenderConfig(width=512, height=512, samples=1, bounces=8,
                       intersect="list", tile_rays=32768, estimator="shared")
    f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
    np.asarray(f(scene, cam, jax.random.PRNGKey(0)))
    ts = []
    for i in range(3):
        t0 = time.time()
        np.asarray(f(scene, cam, jax.random.PRNGKey(i + 1)))
        ts.append(time.time() - t0)
    rays = 512 * 512 * 8
    wall = min(ts)
    print(f"share={share} extract={extract} pshare={pshare}: "
          f"frame {wall*1e3:.1f} ms  {rays/wall/1e6:.2f} Mrays/s")

    logdir = f"/tmp/prof_frame_{int(share)}_{extract}"
    with jax.profiler.trace(logdir):
        np.asarray(f(scene, cam, jax.random.PRNGKey(9)))

    traces = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace captured")
        return 1
    with gzip.open(traces[-1], "rt") as fh:
        events = json.load(fh)["traceEvents"]
    # keep only device-lane complete events: heuristic — skip host-side
    # python/profiler rows by name prefix
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("$") or name.startswith("np.") or \
               "PjitFunction" in name or "jit_" in name:
                continue
            tot[name] += e["dur"]
            cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    print("top ops (us total, count):")
    for name, us in top:
        print(f"  {us:10.0f}  {cnt[name]:5d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
