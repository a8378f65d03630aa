#!/usr/bin/env python
"""Dump the compiled TPU HLO of the bench frame and print what the
profile's hottest ops (fusion.872, conditional.56/57, while.83,
fusion.861/844/...) actually compute, so the per-phase table in
docs/PROFILE_R4.md attributes measured time to source phases.

Usage: python scratch/hlo_dump_r4.py [opname ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import sys

import numpy as np
import jax


def main():
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
    compiled = f.lower(scene, cam, jax.random.PRNGKey(0)).compile()
    txt = compiled.as_text()
    out = "/tmp/frame_hlo.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"HLO: {len(txt)} bytes -> {out}")

    names = sys.argv[1:] or [
        "fusion.872", "fusion.861", "fusion.844", "fusion.847",
        "fusion.842", "fusion.859", "fusion.868", "fusion.849",
        "fusion.841", "fusion.840", "convert_reduce_fusion.42",
        "conditional.56", "conditional.57", "while.83", "copy.1891",
        "fusion.854", "fusion.856", "fusion.863", "fusion.835",
    ]
    for nm in names:
        # find the line where the op is DEFINED (assigned)
        pat = re.compile(r"^\s*(?:ROOT )?%?" + re.escape(nm) + r" = .*$",
                         re.M)
        m = pat.search(txt)
        if not m:
            print(f"\n== {nm}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"\n== {nm}:")
        print(line[:600])
        # metadata op_name= attribution if present
        meta = re.search(r'metadata=\{[^}]*op_name="([^"]+)"', line)
        if meta:
            print(f"   op_name: {meta.group(1)[:300]}")
        # if it's a fusion, show its computation's first lines
        cm = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
        if cm and "fusion" in nm:
            comp = cm.group(1)
            cpat = re.compile(r"^%?" + re.escape(comp) + r" \([^)]*\).*?\{",
                              re.M | re.S)
            c = cpat.search(txt)
            if c:
                start = c.start()
                body = txt[start:start + 1500]
                # print ops with op_name metadata in the body
                metas = set(re.findall(r'op_name="([^"]+)"', body))
                for s in sorted(metas)[:8]:
                    print(f"   body op: {s[:220]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
