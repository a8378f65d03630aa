#!/usr/bin/env python
"""Where does the 870k flagship's uncertified tail come from?  Render one
representative bounce wavefront and report, for the rays the share pass
could not certify, their TRUE hit-box counts — the number the escalation
depth must cover.  Decides maxc2=128 vs chunked continuation.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=870_000, with_sky=True)
    cs = scene.clusters
    print(f"clusters={cs.num_clusters} superclusters={cs.num_superclusters}",
          flush=True)

    B = 32768
    rng = np.random.default_rng(0)
    tris = np.asarray(scene.triangles)
    idx = rng.integers(0, tris.shape[0], B)
    o = jnp.asarray(tris[idx].mean(axis=1) + rng.normal(0, .01, (B, 3)).astype(np.float32))

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    d = jnp.asarray(unit(rng.normal(size=(B, 3)).astype(np.float32)))

    # true per-ray hit-box counts (dense oracle)
    @jax.jit
    def counts(o, d):
        inv = cl._inv_dir(d)
        tl = jnp.full((B,), lt.BIG_T, jnp.float32)
        hit, _ = cl._dense_cluster_mask(cs, o, inv, tl)
        return jnp.sum(hit, axis=1)

    c = np.asarray(counts(o, d))
    print(f"hit-box count: mean {c.mean():.1f} p50 {np.percentile(c,50):.0f} "
          f"p90 {np.percentile(c,90):.0f} p99 {np.percentile(c,99):.0f} "
          f"max {c.max()}", flush=True)

    # which rays stay uncertified at the shipped defaults?
    @jax.jit
    def run(o, d):
        t, prim, ovf, res = lt.closest_hit(cs, o, d, with_resolved=True)
        return t, prim, ovf, res

    t, prim, ovf, res = run(o, d)
    res = np.asarray(res)
    print(f"share+esc defaults: overflow={bool(np.asarray(ovf))} "
          f"uncertified {100*(1-res.mean()):.3f}%", flush=True)
    if (~res).any():
        cu = c[~res]
        print(f"uncertified rays' hit-box counts: mean {cu.mean():.1f} "
              f"p50 {np.percentile(cu,50):.0f} max {cu.max()}", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
