"""Smoke test: the Pallas features the traversal kernel needs, on TPU.

Exercises, in one kernel:
  * PrefetchScalarGridSpec (scalar-prefetched index array)
  * BlockSpec index_map driven by the prefetched scalars (gather pipeline)
  * fori_loop + @pl.when
  * VMEM-resident full-array input (constant index map)
  * dynamic sublane indexing of a VMEM ref
  * reduction outputs
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = 64    # rows per block
T = 128    # lanes


def kernel(cid_ref, table_ref, rays_ref, out_ref):
    b = pl.program_id(0)
    row = table_ref[0, 0, :]                   # (T,) gathered table row
    x = rays_ref[:, 0:1]                       # (RT,1)
    acc = x * row[None, :]                     # (RT,T)

    def body(i, a):
        c = cid_ref[i]                          # prefetched scalar

        @pl.when(c >= 0)
        def _():
            pass

        return a + jnp.float32(1.0)

    n = jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))
    out_ref[:, 0] = jnp.sum(acc, axis=1) + n


def run(platform):
    NB = 8
    cid = jnp.arange(NB, dtype=jnp.int32)[::-1]       # reversed gather
    table = jnp.arange(NB * T, dtype=jnp.float32).reshape(NB, 1, T)
    rays = jnp.ones((NB * RT, 8), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, cid: (cid[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 8), lambda b, cid: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, 1), lambda b, cid: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NB * RT, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=(platform == "cpu"),
    )
    t0 = time.time()
    out = np.asarray(jax.jit(f)(cid, table, rays))
    dt = time.time() - t0
    # expected: block b gathers table row cid[b]; sum + 4
    want = (
        table[np.asarray(cid)].sum(axis=(1,2))[:, None]
        .repeat(RT, axis=1).T.reshape(-1, 1, order="F")
    )
    want = np.repeat(np.asarray(table)[np.asarray(cid)].sum(axis=(1,2)), RT)[:, None] + 4
    ok = np.allclose(out, want)
    print(f"[{platform}] ok={ok} compile+run={dt:.1f}s out[0]={out[0,0]} want={want[0,0]}")
    return ok


if __name__ == "__main__":
    platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    ok = run(platform)
    sys.exit(0 if ok else 1)
