#!/usr/bin/env python
"""Round-5 closed-budget frame profiler.

Fixes the r4 accounting bug (VERDICT r5 item 1): the old profiler summed
EVERY duration event in the chrome trace, mixing host-side waits (e.g. a
731.9 ms blocking np.asarray) into the device-op buckets — hence the
unattributable "other: 1009.6 ms".  This one:

  1. maps pid/tid -> process/thread names from the trace metadata,
  2. sums busy time ONLY on device op tracks,
  3. closes the budget: per-bucket busy + device idle = device span,
  4. prints the top unbucketed ops so "other" can be named and driven
     under 10%.

Usage: python scratch/profile_frame3.py [ntris] [tile] [--bwd] [--inventory]
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
    # (bucket, substrings matched against op name + args attribution).
    # First match wins — order matters.
    ("scan/cond-glue", ["while %while", "conditional %conditional",
                        "branch %branch", " call("]),
    ("kernel", ["branch_6_fun", "branch_0_fun", "branch_1_fun",
                "branch_2_fun", "branch_3_fun", "branch_4_fun",
                "branch_5_fun", "tpu_custom_call", "MosaicKernel"]),
    ("ray-sort", [" sort(s32"]),
    ("cand-topk-sort", ["top_k", "approx_max_k", "approx_min_k",
                        " sort(f32[1536,1600]", " sort(f32[3072,1600]",
                        " sort(f32[1024,1600]", " sort(f32[512,1600]"]),
    ("env-gather", ["f32[512,1024,3]", "f32[512,1024]", "f32[32768,1024]",
                    "f32[512,2]", "f32[512]{0"]),
    ("prim/mat-gather", ["s32[1600,128]", "f32[199716,", "f32[873612,",
                         "f32[2,12]", "f32[4,8]"]),
    ("permute-gather", ["f32[98304,8]", "f32[98304,3]", "f32[32768,8]",
                        "f32[32768,3]", "f32[262144,8]", "f32[262144,3]",
                        "f32[786432,8]", "f32[786432,3]"]),
    ("cand-slab", ["_dense_box_mask", "_dense_cluster_mask", "slab",
                   "1600]", "3072,32", "1024,32"]),
    ("cand-extract", ["_extract", "cumsum", "iota_reduce"]),
    ("reduce-tail", ["segment", "reduce_min", "reduce_max", "argmin",
                     "f32[98304,128]", "f32[32768,128]"]),
    ("copy/format", ["data formatting", " copy("]),
]


def load_trace(logdir):
    traces = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1], "rt") as fh:
        return json.load(fh)["traceEvents"]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.models import pathtracer
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.utils.config import RenderConfig
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    bwd = "--bwd" in sys.argv
    inventory = "--inventory" in sys.argv

    scene = dragon_scene(n_tris=ntris, with_sky=True)
    cam = pbrt_dragon_camera()
    cfg = RenderConfig(width=512, height=512, samples=1, bounces=8,
                       intersect="list", tile_rays=tile, estimator="shared")
    if bwd:
        # replicate bench.py section 2 EXACTLY (same closure structure ->
        # same HLO -> persistent-cache hit, no 20-min recompile)
        import dataclasses

        mats0 = scene.materials

        def loss(diffuse, key):
            s = scene.with_materials(
                dataclasses.replace(mats0, diffuse=diffuse)
            )
            return pathtracer.render(s, cam, cfg, key).mean()

        vg = jax.jit(jax.value_and_grad(loss))
        f = lambda s, c, k: vg(mats0.diffuse, k)  # noqa: E731
    else:
        f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
    r = f(scene, cam, jax.random.PRNGKey(0))
    jax.tree_util.tree_map(np.asarray, r)
    ts = []
    for i in range(3):
        t0 = time.time()
        jax.tree_util.tree_map(np.asarray, f(scene, cam, jax.random.PRNGKey(i + 1)))
        ts.append(time.time() - t0)
    rays = 512 * 512 * 8
    wall = min(ts)
    print(f"ntris={ntris} tile={tile} bwd={bwd} frame {wall*1e3:.1f} ms  "
          f"{rays/wall/1e6:.2f} Mrays/s", flush=True)

    logdir = "/tmp/prof_frame3"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        jax.tree_util.tree_map(np.asarray, f(scene, cam, jax.random.PRNGKey(9)))
    events = load_trace(logdir)

    pname = {}
    tname = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pname[e["pid"]] = e["args"].get("name", "?")
            elif e.get("name") == "thread_name":
                tname[(e["pid"], e.get("tid"))] = e["args"].get("name", "?")

    if inventory:
        busy = defaultdict(float)
        n = defaultdict(int)
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                key = (pname.get(e["pid"], e["pid"]),
                       tname.get((e["pid"], e.get("tid")), e.get("tid")))
                busy[key] += e["dur"]
                n[key] += 1
        print("\ntrack inventory (busy ms, events):")
        for k, v in sorted(busy.items(), key=lambda kv: -kv[1]):
            print(f"  {v/1e3:9.1f} ms {n[k]:6d}ev  pid={k[0]!r:40s} tid={k[1]!r}")
        return 0

    # device op track: process name contains "TPU" and thread is the XLA
    # ops stream (learned from --inventory)
    dev = []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pn = str(pname.get(e["pid"], ""))
        tn = str(tname.get((e["pid"], e.get("tid")), ""))
        if "TPU" in pn and ("XLA Op" in tn or "Ops" in tn or "Stream" in tn):
            dev.append(e)
    if not dev:
        print("no device-track events found — run with --inventory")
        return 1

    t0 = min(e["ts"] for e in dev)
    t1 = max(e["ts"] + e["dur"] for e in dev)
    span = t1 - t0
    # merge busy intervals (events on one device stream shouldn't overlap,
    # but be safe)
    iv = sorted((e["ts"], e["ts"] + e["dur"]) for e in dev)
    busy = 0.0
    cur_s, cur_e = iv[0]
    for s, e2 in iv[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e2
        else:
            cur_e = max(cur_e, e2)
    busy += cur_e - cur_s

    # SELF time: trace events nest (while > conditional > fusion); a
    # parent's own cost is its duration minus its direct children's.
    # Stack sweep over events sorted by (start, -end) per tid.
    tot = defaultdict(float)
    cnt = defaultdict(int)
    attr = {}
    bytid = defaultdict(list)
    for e in dev:
        bytid[e.get("tid")].append(e)
    for tid, evs in bytid.items():
        evs.sort(key=lambda e: (e["ts"], -(e["ts"] + e["dur"])))
        stack = []  # (end, child_sum_accumulator index into selfs)
        selfs = []
        for e in evs:
            s, d = e["ts"], e["dur"]
            while stack and stack[-1][0] <= s:
                stack.pop()
            if stack:
                stack[-1][1][0] += d  # add to parent's child-sum
            stack.append((s + d, [0.0], e))
            selfs.append(stack[-1])
        for end, child, e in selfs:
            name = e.get("name", "?")
            a = e.get("args") or {}
            sa = " ".join(str(v) for v in a.values())[:400]
            tot[name] += max(0.0, e["dur"] - child[0])
            cnt[name] += 1
            if name not in attr or len(sa) > len(attr[name]):
                attr[name] = sa

    btot = defaultdict(float)
    bucket_of = {}
    for name, us in tot.items():
        s = (name + " " + attr.get(name, "")).lower()
        for bucket, subs in PHASES:
            if any(x.lower() in s for x in subs):
                btot[bucket] += us
                bucket_of[name] = bucket
                break
        else:
            btot["other"] += us
            bucket_of[name] = "other"

    print(f"\ndevice span {span/1e3:9.1f} ms   busy {busy/1e3:9.1f} ms   "
          f"idle/gaps {(span-busy)/1e3:9.1f} ms")
    print("\nphase buckets (ms of device busy time):")
    for k, v in sorted(btot.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v/1e3:9.1f}  ({100*v/busy:5.1f}% busy, "
              f"{100*v/span:5.1f}% span)")

    print("\ntop 'other' ops (name these!):")
    top = sorted(((n_, u) for n_, u in tot.items() if bucket_of[n_] == "other"),
                 key=lambda kv: -kv[1])[:30]
    for name, us in top:
        print(f"  {us/1e3:8.1f}ms {cnt[name]:5d}x {name[:30]:30s} "
              f"| {attr.get(name,'')[:200]}")

    print("\ntop ops overall:")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {us/1e3:8.1f}ms {cnt[name]:5d}x [{bucket_of[name]:>14s}] "
              f"{name[:30]:30s} | {attr.get(name,'')[:160]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
