#!/usr/bin/env python
"""Round-4 phase microbench: decompose one representative multi_query
launch (a mid-frame bounce: 3x32k rays, dragon 200k + sky) into
  sort | candidate build | kernel | reduction
and measure the KERNEL's cost law: per-block fixed cost, per-round cost,
tail-guard cost (maxc/GROUP sweep).  These constants feed docs/ROOFLINE.md.

Usage: python scratch/phase_bench4.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(f, *a):
    """Times DEVICE work: f must return something tiny (the axon tunnel
    moves big outputs at ~100 MB/s — returning a [98k,128] kernel output
    would measure the transfer, not the kernel)."""
    out = f(*a)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = f(*a)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        ts.append(time.time() - t0)
    return min(ts)


def tiny(f):
    """Wrap a phase so only an O(B) or scalar summary leaves the device."""
    def g(*a):
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
    return g


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cs = scene.clusters
    k2 = cs.num_clusters
    rng = np.random.default_rng(0)

    # representative bounce wavefront: surface origins, random dirs
    B = 3 * 32768
    tris_np = np.asarray(scene.triangles)
    idx = rng.integers(0, tris_np.shape[0] - 4, B)
    o = jnp.asarray(tris_np[idx].mean(axis=1) * 0.999)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tl = jnp.full((B,), lt.BIG_T, jnp.float32)

    # --- phase 1: sort ---------------------------------------------------
    def sort_phase(o, d):
        key = lt._ray_sort_key(cs, o, d)
        return jnp.argsort(key)

    dt = timed(jax.jit(tiny(sort_phase)), o, d)
    print(f"sort ({B} rays):            {dt * 1e3:8.2f} ms")
    perm = jax.jit(sort_phase)(o, d)
    o_s, d_s = o[perm], d[perm]

    # --- phase 2: candidate build (dense slab + topk extract) ------------
    for maxc in (16, 32, 48):
        f = jax.jit(tiny(functools.partial(cl.candidate_clusters, cs,
                                           maxc=maxc)))
        dt = timed(f, o_s, d_s, tl)
        print(f"cand build maxc={maxc:3d}:        {dt * 1e3:8.2f} ms")
    f = jax.jit(tiny(functools.partial(cl.candidate_clusters_grouped, cs,
                                       maxc=48, group=32)))
    dt = timed(f, o_s, d_s, tl)
    print(f"cand build shared mc=48:    {dt * 1e3:8.2f} ms")

    cand, ctn, _of = jax.jit(
        functools.partial(cl.candidate_clusters, cs, maxc=48)
    )(o_s, d_s, tl)
    nvalid = np.asarray((cand >= 0).sum(axis=1))
    print(f"  per-ray candidates: mean {nvalid.mean():.1f} "
          f"p50 {np.percentile(nvalid, 50):.0f} "
          f"p90 {np.percentile(nvalid, 90):.0f} "
          f"p99 {np.percentile(nvalid, 99):.0f} max {nvalid.max()}")

    # --- phase 3: kernel cost law (maxc x group sweep) --------------------
    RB, T = lt.RB, lt.T_CLUSTER
    nb = B // RB
    rays8 = jnp.concatenate(
        [o_s, d_s, tl[:, None], jnp.zeros((B, 1), jnp.float32)], axis=1
    )
    tris_tab = jnp.concatenate(
        [cs.cl_tris.reshape(k2, 9, T), jnp.zeros((1, 9, T), jnp.float32)], 0
    )

    def kernel_only(cand_k, ctn_k, rays, maxc, group):
        saved = lt.GROUP
        lt.GROUP = group
        try:
            kern = functools.partial(lt._list_kernel_impl, maxc=maxc)
            at, ar = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((RB, maxc), lambda b: (b, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((RB, maxc), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((RB, 8), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((RB, T), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((RB, T), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, T), jnp.float32),
                    jax.ShapeDtypeStruct((B, T), jnp.int32),
                ),
                scratch_shapes=[pltpu.VMEM((9, RB, T), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=lt.VMEM_LIMIT_BYTES,
                ),
            )(cand_k, ctn_k, rays, tris_tab)
        finally:
            lt.GROUP = saved
        return at

    for maxc, group, label in (
        (8, 8, "8 rounds, no guard   "),
        (16, 16, "16 rounds, no guard  "),
        (32, 32, "32 rounds, no guard  "),
        (16, 8, "8+guard+8 tail       "),
        (32, 8, "8+guard+24 tail      "),
        (48, 8, "8+guard+40 tail      "),
    ):
        cnd = jnp.where(cand[:, :maxc] >= 0, cand[:, :maxc], k2)
        ctn_k = ctn[:, :maxc]
        f = jax.jit(tiny(functools.partial(kernel_only, maxc=maxc,
                                           group=group)))
        dt = timed(f, cnd, ctn_k, rays8)
        print(f"kernel {label} ({maxc:2d} slots): {dt * 1e3:8.2f} ms "
              f"({dt / nb * 1e9:7.0f} ns/block)")

    # --- phase 4: reduction tail (dense min + winner unpack) --------------
    at = jax.jit(functools.partial(kernel_only, maxc=32, group=8))(
        jnp.where(cand[:, :32] >= 0, cand[:, :32], k2), ctn[:, :32], rays8
    )

    def reduce_phase(at):
        tmin = jnp.min(at, axis=1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, at.shape, 1)
        sel = at <= tmin[:, None]
        pk = jnp.min(jnp.where(sel, lanes, 1 << 30), axis=1)
        return tmin, pk

    dt = timed(jax.jit(tiny(reduce_phase)), at)
    print(f"reduction tail:             {dt * 1e3:8.2f} ms")

    # tunnel transfer rate (for interpreting any non-tiny measurement)
    big = jnp.ones((98304, 128), jnp.float32)
    np.asarray(big)
    t0 = time.time()
    np.asarray(big)
    bw = big.size * 4 / (time.time() - t0) / 1e6
    print(f"tunnel transfer: {bw:.0f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
