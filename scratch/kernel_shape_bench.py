#!/usr/bin/env python
"""Kernel-shape sweep: per-ray RB in {8,16,32} x maxc, and the
block-shared kernel, on an all-live surface wavefront (worst case).
phase_bench4 showed per-block FIXED cost (~2.4us) dominates rounds
(~61ns): fewer, bigger blocks should win.  Reports ns/ray.

Usage: python scratch/kernel_shape_bench.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(f, *a):
    out = f(*a)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = f(*a)
        np.asarray(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cs = scene.clusters
    k2 = cs.num_clusters
    T = lt.T_CLUSTER
    rng = np.random.default_rng(0)

    B = 3 * 32768
    tris_np = np.asarray(scene.triangles)
    idx = rng.integers(0, tris_np.shape[0] - 4, B)
    o = jnp.asarray(tris_np[idx].mean(axis=1) * 0.999)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tl = jnp.full((B,), lt.BIG_T, jnp.float32)
    perm = jnp.argsort(lt._ray_sort_key(cs, o, d))
    o, d = o[perm], d[perm]

    cand48, ctn48, _ = jax.jit(
        functools.partial(cl.candidate_clusters, cs, maxc=48)
    )(o, d, tl)
    candg, ctng, _ = jax.jit(
        functools.partial(cl.candidate_clusters_grouped, cs, maxc=96,
                          group=32)
    )(o, d, tl)

    rays8 = jnp.concatenate(
        [o, d, tl[:, None], jnp.zeros((B, 1), jnp.float32)], axis=1
    )
    tris_tab = jnp.concatenate(
        [cs.cl_tris.reshape(k2, 9, T), jnp.zeros((1, 9, T), jnp.float32)], 0
    )

    def per_ray(cand_k, ctn_k, rays, rb, maxc, reduce_in_kernel):
        nb = B // rb
        saved = lt.RB
        lt.RB = rb
        try:
            if reduce_in_kernel:
                def kern(cand_s, ctn_ref, rays_ref, tris_ref, t_out,
                         at_ref, ar_ref, stk_ref):
                    lt._list_kernel_impl(cand_s, ctn_ref, rays_ref,
                                         tris_ref, at_ref, ar_ref,
                                         maxc=maxc)
                    t_out[:] = jnp.min(at_ref[:], axis=1, keepdims=True)

                out = pl.pallas_call(
                    kern,
                    grid=(nb,),
                    in_specs=[
                        pl.BlockSpec((rb, maxc), lambda b: (b, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((rb, maxc), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((rb, 8), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((rb, 1), lambda b: (b, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
                    scratch_shapes=[
                        pltpu.VMEM((rb, T), jnp.float32),
                        pltpu.VMEM((rb, T), jnp.int32),
                        pltpu.VMEM((9, rb, T), jnp.float32),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",),
                        vmem_limit_bytes=lt.VMEM_LIMIT_BYTES,
                    ),
                )(cand_k, ctn_k, rays, tris_tab)
                return jnp.sum(out)
            kern = functools.partial(lt._list_kernel_impl, maxc=maxc)
            at, ar = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((rb, maxc), lambda b: (b, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((rb, maxc), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, 8), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((rb, T), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, T), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, T), jnp.float32),
                    jax.ShapeDtypeStruct((B, T), jnp.int32),
                ),
                scratch_shapes=[pltpu.VMEM((9, rb, T), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=lt.VMEM_LIMIT_BYTES,
                ),
            )(cand_k, ctn_k, rays, tris_tab)
            return jnp.sum(at)
        finally:
            lt.RB = saved

    for rb in (8, 16, 32):
        for maxc in (16, 32):
            cnd = jnp.where(cand48[:, :maxc] >= 0, cand48[:, :maxc], k2)
            f = jax.jit(functools.partial(per_ray, rb=rb, maxc=maxc,
                                          reduce_in_kernel=False))
            try:
                dt = timed(f, cnd, ctn48[:, :maxc], rays8)
                print(f"per-ray rb={rb:2d} maxc={maxc:2d}: {dt*1e3:8.2f} ms"
                      f" ({dt / B * 1e9:6.0f} ns/ray)", flush=True)
            except Exception as e:
                print(f"per-ray rb={rb:2d} maxc={maxc:2d}: FAILED "
                      f"{e!r}"[:180], flush=True)

    # in-kernel reduction variant (output (rb,1) instead of 2x (rb,128))
    cnd = jnp.where(cand48[:, :32] >= 0, cand48[:, :32], k2)
    f = jax.jit(functools.partial(per_ray, rb=8, maxc=32,
                                  reduce_in_kernel=True))
    try:
        dt = timed(f, cnd, ctn48[:, :32], rays8)
        print(f"per-ray rb=8 mc=32 inkred: {dt*1e3:8.2f} ms "
              f"({dt / B * 1e9:6.0f} ns/ray)", flush=True)
    except Exception as e:
        print(f"inkred FAILED {e!r}"[:180], flush=True)

    # block-shared kernel, rb=32
    for maxc in (48, 96):
        g = B // 32
        cnd = jnp.where(candg[:, :maxc] >= 0, candg[:, :maxc], k2)
        ctn_k = ctng[:, :maxc]
        gpad = -g % 8
        if gpad:
            cnd = jnp.concatenate(
                [cnd, jnp.full((gpad, maxc), k2, jnp.int32)], 0)
            ctn_k = jnp.concatenate(
                [ctn_k, jnp.full((gpad, maxc), lt.BIG_T, jnp.float32)], 0)

        def share_fn(cnd, ctn_k, rays, maxc=maxc, g=g):
            kern = functools.partial(lt._block_kernel_impl, maxc=maxc,
                                     rb=32)
            at, ar = pl.pallas_call(
                kern,
                grid=(g,),
                in_specs=[
                    pl.BlockSpec((8, maxc), lambda b: (b // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, maxc), lambda b: (b // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((32, 8), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((32, T), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((32, T), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, T), jnp.float32),
                    jax.ShapeDtypeStruct((B, T), jnp.int32),
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=lt.VMEM_LIMIT_BYTES,
                ),
            )(cnd, ctn_k, rays, tris_tab)
            return jnp.sum(at)

        f = jax.jit(share_fn)
        try:
            dt = timed(f, cnd, ctn_k, rays8)
            print(f"share   rb=32 maxc={maxc:2d}: {dt*1e3:8.2f} ms "
                  f"({dt / B * 1e9:6.0f} ns/ray)", flush=True)
        except Exception as e:
            print(f"share maxc={maxc}: FAILED {e!r}"[:180], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
