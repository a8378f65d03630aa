"""Is per-grid-step overhead the floor? Same total work (4096 sub-blocks x
16 rounds of dyncopy+MT), launched as grid=4096 (1 sub-block/step) vs
grid=512 (8 sub-blocks/step) vs grid=128 (32 sub-blocks/step)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K2, T, RB, R = 1600, 128, 8, 16
TOT = 4096  # total sub-blocks


def mk(sb):
    def kernel(cand_s, tris_ref, o_ref, stk_ref):
        for s in range(sb):
            o_ref[s * RB:(s + 1) * RB, :] = jnp.zeros((RB, 1), jnp.float32)
            for r in range(R):
                for i in range(RB):
                    k = cand_s[s * RB + i, r]
                    tile = tris_ref[k]
                    for c in range(9):
                        stk_ref[c, i:i+1, :] = tile[c:c+1, :]
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
                t = jnp.where((u >= 0) & (v >= 0) & (u+v <= 1), f*(p[6]*hx+p[7]*hy+p[8]*hz), 1e30)
                o_ref[s*RB:(s+1)*RB, :] = jnp.minimum(
                    o_ref[s*RB:(s+1)*RB, :], jnp.min(t, axis=1, keepdims=True))
    return kernel

rng = np.random.default_rng(0)
cand = jnp.asarray(rng.integers(0, K2, (TOT*RB, R)), jnp.int32)
tris = jnp.asarray(rng.normal(size=(K2, 9, T)).astype(np.float32))

for sb in (1, 8, 32):
    grid = TOT // sb
    f = pl.pallas_call(
        mk(sb),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((sb*RB, R), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sb*RB, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TOT*RB, 1), jnp.float32),
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
        print(f"sb={sb:2d} grid={grid}: {dt*1000:.1f}ms ({(dt)/TOT/R*1e9:.0f}ns/sub-block-round)")
    except Exception as e:
        print(f"sb={sb}: FAIL {type(e).__name__} {str(e)[:200]}")
