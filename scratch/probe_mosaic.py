"""Probe Mosaic features one at a time: run with arg = feature name.
  while  : lax.while_loop with scalar carry + ref ops in body
  ds     : dynamic lane slice x_ref[:, pl.ds(r, 1)]
  extract: scalar extract from computed vector t[i, 0]
  when   : per-ray pl.when from SMEM scalar at dynamic index
  all    : everything combined
"""
import sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEAT = sys.argv[1] if len(sys.argv) > 1 else "all"


def kernel(ns_ref, cand_s, x_ref, o_ref, acc_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    acc_ref[:] = x_ref[:]

    def round_body(r):
        if FEAT in ("ds", "all"):
            col = x_ref[:, pl.ds(r, 1)]
        else:
            col = x_ref[:, 0:1] + jnp.float32(r)
        if FEAT in ("when", "all"):
            for i in range(8):
                @pl.when(cand_s[i, r] > 0)
                def _(i=i):
                    acc_ref[i:i+1, :] = acc_ref[i:i+1, :] * 1.0001
        if FEAT in ("extract", "all"):
            v = col + 1.0
            s = v[3, 0]
            @pl.when(s > 0.0)
            def _():
                o_ref[:] = o_ref[:] + acc_ref[:]
        else:
            o_ref[:] = o_ref[:] + acc_ref[:] + col
        return jnp.max(col) > -1.0

    if FEAT in ("while", "all"):
        def body(carry):
            r, _go = carry
            ok = round_body(r)
            return r + 1, (r + 1 < ns_ref[0]) & ok
        jax.lax.while_loop(lambda c: c[1], body,
                           (jnp.int32(0), ns_ref[0] > 0))
    else:
        for r in range(4):
            round_body(jnp.int32(r) if FEAT == "ds" else r)


x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
cand = jnp.ones((8, 128), jnp.int32)
ns = jnp.array([5], jnp.int32)

f = pl.pallas_call(
    kernel,
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
)
try:
    out = np.asarray(jax.jit(lambda a, b, c: f(a, b, c))(ns, cand, x))
    print(f"{FEAT}: OK", float(out.sum()))
except Exception as e:
    print(f"{FEAT}: FAIL:", type(e).__name__, str(e)[:600])
