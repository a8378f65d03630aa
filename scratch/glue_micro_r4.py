#!/usr/bin/env python
"""Micro-costs of the per-launch XLA glue around the list kernel, measured
with in-jit repeat loops (the tunnel has a ~28ms per-dispatch floor, so
each timed op is chained K times inside ONE jit and the floor subtracted
via a null loop of the same shape).

Targets (suspects for the 814ms shipped frame, 64 bounce launches):
  * argsort of the ray sort key      (2x per _run_once: sort + inverse)
  * scatter-based permutation inverse (candidate replacement)
  * packed [B,8] row gather (the permute)
  * candidate_clusters_grouped mc=96 at bounce-like liveness
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 32  # in-jit repeats


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(f(*args))
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{name:44s} {dt * 1e3 / K:9.3f} ms/iter  ({dt * 1e3:7.1f} ms total)",
          flush=True)
    return dt / K


def chain_loop(body):
    """Run body K times with a data dependency through an i32 scalar."""
    def run(x, *rest):
        def step(i, carry):
            s, = carry
            r = body(x, s, *rest)
            return (r,)
        (s,) = jax.lax.fori_loop(0, K, step, (jnp.int32(0),))
        return s
    return run


def main():
    rng = np.random.default_rng(0)
    for n in (32768, 98304, 262144, 786432):
        keys = jnp.asarray(rng.integers(0, 1 << 27, n, dtype=np.int32))
        rows = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))

        timed(f"null loop        n={n}",
              chain_loop(lambda x, s: s + x[0]), keys)
        timed(f"argsort i32      n={n}",
              chain_loop(lambda x, s: s + jnp.argsort(x + s)[0]), keys)
        # inverse permutation via scatter (candidate replacement for the
        # second argsort in _run_once)
        perm = jnp.argsort(keys)
        timed(f"scatter-invert   n={n}",
              chain_loop(lambda p, s: s + jnp.zeros_like(p)
                         .at[p + s].set(jax.lax.iota(jnp.int32, p.shape[0]))[0]),
              perm)
        timed(f"row gather [n,8] n={n}",
              chain_loop(lambda r, s, p: s + r[p + s][0, 0].astype(jnp.int32),
                         ),
              rows, perm)

    # candidate build at bounce-like wavefront (dragon stand-in)
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene
    from sycl_ray_tracing_tpu.ops import cluster as cl

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cs = scene.clusters
    print(f"clusters: {cs.num_clusters}  superclusters: {cs.num_superclusters}",
          flush=True)
    n = 98304
    o = jnp.asarray(rng.standard_normal((n, 3), dtype=np.float32)) * 0.3
    d0 = rng.standard_normal((n, 3)).astype(np.float32)
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True))
    tl = jnp.full((n,), 1e30, jnp.float32)

    def build_grouped(o, s, d, tl):
        c, t, ov = cl.candidate_clusters_grouped(
            cs, o + s * 0.0, d, tl, 96, 32)
        return s + c[0, 0]

    def build_hier(o, s, d, tl):
        c, t, ov = cl.candidate_clusters_hier(
            cs, o + s * 0.0, d, tl, 96, maxs=32, group=32, grouped=True)
        return s + c[0, 0]

    timed("cand grouped mc=96 rb=32 n=98304",
          chain_loop(build_grouped), o, d, tl)
    try:
        timed("cand hier    mc=96 rb=32 n=98304",
              chain_loop(build_hier), o, d, tl)
    except Exception as e:
        print(f"hier FAILED: {e!r}"[:160])
    return 0


if __name__ == "__main__":
    _sys.exit(main())
