#!/usr/bin/env python
"""Profile the FULL dragon frame on TPU and bucket device time by SOURCE
PHASE using the trace events' args metadata (tf_op / long_name carry the
jax op_name attribution that generic fusion.N names hide).

Usage: python scratch/profile_frame2.py
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


PHASES = [
    # (bucket, substrings matched against the op's attribution string)
    ("sort/argsort", ["sort["]),
    ("permute/gather", ["take[", "gather"]),
    ("cand-slab", ["_dense_box_mask", "_dense_cluster_mask", "slab"]),
    ("cand-extract", ["approx_min_k", "approx_max_k", "top_k",
                      "_extract", "cumsum"]),
    ("kernel", ["pallas", "_block_kernel", "_list_kernel", "custom_call"]),
    ("reduce-tail", ["segment", "reduce_min", "reduce_max", "argmin"]),
    ("shading", ["ggx", "cook_torrance", "envmap", "power_heuristic"]),
]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

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
    print(f"frame {wall*1e3:.1f} ms  {rays/wall/1e6:.2f} Mrays/s", flush=True)

    logdir = "/tmp/prof_frame2"
    with jax.profiler.trace(logdir):
        np.asarray(f(scene, cam, jax.random.PRNGKey(9)))

    traces = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace captured")
        return 1
    with gzip.open(traces[-1], "rt") as fh:
        events = json.load(fh)["traceEvents"]

    tot = defaultdict(float)
    cnt = defaultdict(int)
    attr = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("$") or "PjitFunction" in name or \
               "jit_" in name or name.startswith("while") or \
               name.startswith("conditional") or name.startswith("branch"):
                continue
            a = e.get("args") or {}
            s = " ".join(str(v) for v in a.values())[:400]
            tot[name] += e["dur"]
            cnt[name] += 1
            if name not in attr or len(s) > len(attr[name]):
                attr[name] = s

    # bucket by phase
    btot = defaultdict(float)
    for name, us in tot.items():
        s = (name + " " + attr.get(name, "")).lower()
        for bucket, subs in PHASES:
            if any(x.lower() in s for x in subs):
                btot[bucket] += us
                break
        else:
            btot["other"] += us
    print("\nphase buckets (ms of device-op time):")
    for k, v in sorted(btot.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v/1e3:9.1f}")

    print("\ntop ops with attribution:")
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    for name, us in top:
        print(f"  {us/1e3:8.1f}ms {cnt[name]:5d}x {name[:28]:28s} "
              f"| {attr.get(name,'')[:180]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
