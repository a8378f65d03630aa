"""Smoke test 2: the traversal kernel's critical primitives.

  * vector -> scalar reduction (jnp.sum of a VMEM tile) used as:
      - a fori_loop bound (data-dependent trip count)
      - a dynamic leading-dim index into a VMEM ref
  * @pl.when on a vector-reduced scalar predicate
  * rank-select: c_j = sum(cumsum(mask) <= j) pattern
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(mask_ref, table_ref, out_ref):
    # mask (8, 128) float; set lanes mark "hit clusters"
    m = mask_ref[:] > 0.5                       # (8,128)
    colhit = jnp.any(m, axis=0, keepdims=True)  # (1,128)
    # prefix sum via lower-triangular matmul (cumsum has no Mosaic
    # lowering): cum[j] = sum_{i<=j} colhit[i]
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (ii <= jj).astype(jnp.float32)
    cum = jnp.dot(colhit.astype(jnp.float32), tri,
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    n = jnp.sum(colhit.astype(jnp.int32))       # scalar: number of set cols

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, acc):
        # c = index of j-th set column (rank select)
        c = jnp.sum((cum <= j).astype(jnp.int32))

        @pl.when(c < 128)
        def _():
            pass

        row = table_ref[c]                      # dynamic leading-dim index
        return acc + row

    acc = jax.lax.fori_loop(0, n, body, jnp.zeros((1, 128), jnp.float32))
    out_ref[:] = acc


def run(platform):
    rng = np.random.default_rng(0)
    mask = (rng.random((8, 128)) < 0.05).astype(np.float32)
    table = rng.random((128, 1, 128)).astype(np.float32) * 0 + np.arange(
        128, dtype=np.float32
    )[:, None, None]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=(platform == "cpu"),
    )
    t0 = time.time()
    out = np.asarray(jax.jit(f)(jnp.asarray(mask), jnp.asarray(table)))
    dt = time.time() - t0
    cols = np.where(mask.any(axis=0))[0]
    want = table[cols, 0].sum(axis=0)
    ok = np.allclose(out[0], want)
    print(f"[{platform}] ok={ok} compile+run={dt:.1f}s n_cols={len(cols)} "
          f"out0={out[0,0]:.1f} want0={want[0]:.1f}")
    return ok


if __name__ == "__main__":
    platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    sys.exit(0 if run(platform) else 1)
