#!/usr/bin/env python
"""Profile ONE fused multi_query sweep (dragon bounce workload) on TPU and
print the top ops by self-time from the chrome trace (the tensorboard
converter is broken; parse the trace json.gz directly).

Usage: python scratch/profile_sweep.py [share] [rays] [maxc]
"""

import os as _os, sys as _sys
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
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    maxc = int(sys.argv[3]) if len(sys.argv) > 3 else None
    extract = sys.argv[4] if len(sys.argv) > 4 else "minrounds"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.cluster import build_clusters
    from sycl_ray_tracing_tpu.ops.pallas import listtrace
    from sycl_ray_tracing_tpu.utils.procedural import dragon_standin

    cl.EXTRACT_METHOD = extract

    tris_np = dragon_standin(200_000)
    n = tris_np.shape[0]
    cs = build_clusters(tris_np, order="sah")
    rng = np.random.default_rng(1)
    # bounce-like: surface origins, random dirs; 1/3 of rays any-hit
    idx = rng.integers(0, n, B)
    o = tris_np[idx].mean(axis=1)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o + 1e-4 * d)
    d = jnp.asarray(d)
    live = jnp.asarray(rng.random(B) < 0.6)

    def sweep(o, d, live):
        res, ovf = listtrace.multi_query(
            cs,
            [(o, d, None, live, False),
             (o, -d, None, live, True)],
            maxc=maxc, share=share,
        )
        return res[0][0], res[0][1], res[1][1], ovf

    f = jax.jit(sweep)
    np.asarray(f(o, d, live)[0])  # compile + warm
    t0 = time.time()
    for i in range(5):
        np.asarray(f(o, d, live)[0])
    wall = (time.time() - t0) / 5
    print(f"share={share} B={B} maxc={maxc}: sweep {wall*1e3:.2f} ms "
          f"(incl ~29.7ms tunnel RTT)")

    logdir = f"/tmp/prof_sweep_{int(share)}"
    with jax.profiler.trace(logdir):
        np.asarray(f(o, d, live)[0])

    traces = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace captured")
        return 1
    with gzip.open(traces[-1], "rt") as fh:
        events = json.load(fh)["traceEvents"]
    # device-side complete events, grouped by op name
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            args = e.get("args") or {}
            if "run_id" in args or "program_id" in args or True:
                tot[name] += e["dur"]
                cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
    print("top ops (us total, count):")
    for name, us in top:
        print(f"  {us:10.0f}  {cnt[name]:5d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
