"""Microbench: where does the per-round cost go in the list kernel?
Variants (each grid=(4096,), R=16 rounds, RB=8):
  dyncopy : 8x dynamic tile read (9,128) + 9 row writes each
  statcopy: same writes, static tile index (k=b%K2... fixed 7)
  mtonly  : MT math on scratch, no copies
  dynmt   : dyncopy + MT (the real per-round work)
"""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K2, T, RB, R = 1600, 128, 8, 16
NB = 4096

def mk(variant):
    def kernel(cand_s, tris_ref, o_ref, stk_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        for r in range(R):
            if variant in ("dyncopy", "dynmt"):
                for i in range(RB):
                    k = cand_s[i, r]
                    tile = tris_ref[k]
                    for c in range(9):
                        stk_ref[c, i:i+1, :] = tile[c:c+1, :]
            elif variant == "statcopy":
                for i in range(RB):
                    tile = tris_ref[7]
                    for c in range(9):
                        stk_ref[c, i:i+1, :] = tile[c:c+1, :]
            if variant in ("mtonly", "dynmt"):
                p = [stk_ref[c] for c in range(9)]
                e1x, e1y, e1z = p[3]-p[0], p[4]-p[1], p[5]-p[2]
                e2x, e2y, e2z = p[6]-p[0], p[7]-p[1], p[8]-p[2]
                hx = e1y*e2z - e1z*e2y
                hy = e1z*e2x - e1x*e2z
                hz = e1x*e2y - e1y*e2x
                a = e1x*hx + e1y*hy + e1z*hz
                f = 1.0/jnp.where(jnp.abs(a) < 1e-7, 1.0, a)
                u = f*(p[0]*hx + p[1]*hy + p[2]*hz)
                v = f*(p[3]*hx + p[4]*hy + p[5]*hz)
                t = f*(p[6]*hx + p[7]*hy + p[8]*hz)
                ok = (u >= 0) & (v >= 0) & (u+v <= 1) & (t > 1e-7)
                t = jnp.where(ok, t, 1e30)
                o_ref[:] = jnp.minimum(o_ref[:], jnp.min(t, axis=1, keepdims=True))
            else:
                o_ref[:] = o_ref[:] + stk_ref[0, :, 0:1]
    return kernel

rng = np.random.default_rng(0)
cand = jnp.asarray(rng.integers(0, K2, (NB*RB, R)), jnp.int32)
tris = jnp.asarray(rng.normal(size=(K2, 9, T)).astype(np.float32))

for variant in ("dyncopy", "statcopy", "mtonly", "dynmt"):
    f = pl.pallas_call(
        mk(variant),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((RB, R), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB*RB, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9, RB, T), jnp.float32)],
    )
    g = jax.jit(lambda c, t: f(c, t))
    try:
        out = g(cand, tris); np.asarray(out)
        times = []
        for _ in range(5):
            t0 = time.time(); out = g(cand, tris); np.asarray(out)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{variant}: {dt*1000:.1f}ms  ({dt/NB/R*1e9:.0f}ns per block-round)")
    except Exception as e:
        print(f"{variant}: FAIL {type(e).__name__} {str(e)[:300]}")
