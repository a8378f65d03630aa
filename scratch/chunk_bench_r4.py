#!/usr/bin/env python
"""Measure the scalar-count tail-chunk law (listtrace._tail_guard
mechanism 2): full-grid share-kernel sweeps at synthetic candidate-count
distributions.  Compares
  * all-full counts (every chunk gate fires -> pure gate overhead)
  * half counts / quarter counts (gates skip the dummy tail)
against the pre-chunk law (~61ns/round, kernel_shape_r4.log) to verify a
scalar-operand pl.when avoids the ~1.5us accumulator-dependent
serialization.

Usage: python scratch/chunk_bench_r4.py
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

    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.utils.procedural import dragon_standin

    B = 98304
    tris_np = dragon_standin(200_000)
    cs = cl.build_clusters(tris_np, order="sah")
    rng = np.random.default_rng(0)
    idx = rng.integers(0, tris_np.shape[0], B)
    o = jnp.asarray(
        tris_np[idx].mean(axis=1) + rng.normal(0, .01, (B, 3)).astype(np.float32)
    )
    dn = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(dn / np.linalg.norm(dn, axis=-1, keepdims=True))
    tl = jnp.full((B,), lt.BIG_T, jnp.float32)
    maxc = 96

    # real block-union lists, then rewrite counts/columns synthetically
    cand, ctn, _ = cl.candidate_clusters_grouped(cs, o, d, tl, maxc,
                                                 lt.RB_SHARE)
    cand = np.asarray(cand)
    ctn = np.asarray(ctn)
    g = cand.shape[0]
    k2 = cs.num_clusters

    def sweep(cand_rows, ctn_rows, label):
        # pad to 8-row granule, run the raw kernel at full grid
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        cnt = (cand_rows >= 0).sum(axis=1).astype(np.int32)
        cand_k = np.where(cand_rows >= 0, cand_rows, k2).astype(np.int32)
        cand_k = np.concatenate([cand_k, cnt[:, None]], axis=1)
        gpad = -g % 8
        if gpad:
            cand_k = np.concatenate(
                [cand_k, np.concatenate(
                    [np.full((gpad, maxc), k2, np.int32),
                     np.zeros((gpad, 1), np.int32)], axis=1)], 0)
            ctn_rows = np.concatenate(
                [ctn_rows, np.full((gpad, maxc), lt.BIG_T, np.float32)], 0)
        rays = jnp.concatenate([o, d, tl[:, None],
                                jnp.zeros((B, 1), jnp.float32)], axis=1)
        tris = jnp.concatenate(
            [cs.cl_tris.reshape(k2, 9, cl.T_CLUSTER),
             jnp.zeros((1, 9, cl.T_CLUSTER), jnp.float32)], axis=0)
        kernel = functools.partial(lt._block_kernel_impl, maxc=maxc,
                                   rb=lt.RB_SHARE)

        @jax.jit
        def run(cand_k, ctn_k, rays, tris):
            at, ar = pl.pallas_call(
                kernel,
                grid=(g,),
                in_specs=[
                    pl.BlockSpec((8, maxc + 1), lambda b: (b // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, maxc), lambda b: (b // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((lt.RB_SHARE, 8), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((lt.RB_SHARE, cl.T_CLUSTER),
                                 lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((lt.RB_SHARE, cl.T_CLUSTER),
                                 lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B, cl.T_CLUSTER), jnp.float32),
                    jax.ShapeDtypeStruct((B, cl.T_CLUSTER), jnp.int32),
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=lt.VMEM_LIMIT_BYTES,
                ),
            )(cand_k, ctn_k, rays, tris)
            return jnp.sum(at[:, 0])

        args = (jnp.asarray(cand_k), jnp.asarray(ctn_rows), rays, tris)
        out = run(*args)
        np.asarray(out)
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(run(*args))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{label:32s} {dt*1e3:8.2f} ms  ({dt/g*1e9:7.0f} ns/block, "
              f"mean count {cnt[:g].mean():.1f})", flush=True)

    print(f"blocks={g} maxc={maxc}", flush=True)
    # real lists (natural counts)
    sweep(cand, ctn, "real union lists")
    # all-full: every slot a live (cycling) cluster id
    full_cand = np.tile(np.arange(maxc, dtype=np.int32)[None] % k2, (g, 1))
    full_ctn = np.zeros((g, maxc), np.float32)
    sweep(full_cand, full_ctn, "synthetic all-full (96 rounds)")
    # half/quarter counts
    for frac in (0.5, 0.25):
        n = int(maxc * frac)
        c = np.full((g, maxc), -1, np.int32)
        c[:, :n] = np.arange(n, dtype=np.int32)[None] % k2
        t = np.full((g, maxc), lt.BIG_T, np.float32)
        t[:, :n] = 0.0
        sweep(c, t, f"synthetic count={n}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
