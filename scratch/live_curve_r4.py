#!/usr/bin/env python
"""Per-bounce cost vs live fraction (VERDICT r3 next-#6's curve): time one
fused multi_query (the bounce workhorse: 1 closest + 2 any-hit over 32k
rays each) at live fractions 1 .. 1/64 on the dragon stand-in, with the
shipped defaults.  Done = measured cost ~ live fraction; committed to
docs/PROFILE_R4.md.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.ops.cluster import build_clusters
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.procedural import dragon_standin

    B = 32768
    tris_np = dragon_standin(200_000)
    cs = build_clusters(tris_np, order="sah")
    rng = np.random.default_rng(0)
    idx = rng.integers(0, tris_np.shape[0], B)
    o = jnp.asarray(
        tris_np[idx].mean(axis=1) + rng.normal(0, .01, (B, 3)).astype(np.float32)
    )

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    d1 = jnp.asarray(unit(rng.normal(size=(B, 3)).astype(np.float32)))
    d2 = jnp.asarray(unit(rng.normal(size=(B, 3)).astype(np.float32)))
    d3 = jnp.asarray(unit(rng.normal(size=(B, 3)).astype(np.float32)))
    tl = jnp.full((B,), 2.0, jnp.float32)

    def q(m1, m2, m3):
        res, ovf = lt.multi_query(
            cs,
            [(o, d1, None, m1, False),
             (o, d2, tl, m2, True),
             (o, d3, None, m3, True)],
        )
        return res[0][0], res[1][1], res[2][1], ovf

    f = jax.jit(q)
    print("live_frac  ms    (3x32k-ray fused bounce query, shipped defaults)",
          flush=True)
    for frac in (1.0, 0.5, 0.25, 0.125, 1 / 16, 1 / 32, 1 / 64):
        ms = [jnp.asarray(rng.random(B) < frac) for _ in range(3)]
        out = f(*ms)
        np.asarray(out[0])
        ts = []
        for i in range(5):
            t0 = time.time()
            out = f(*ms)
            np.asarray(out[0])
            ts.append(time.time() - t0)
        print(f"{frac:9.4f} {min(ts)*1e3:7.2f}", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
