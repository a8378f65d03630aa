"""Where do the XLA cluster tracer's ms go? Cumulative prefix timing with
scalar outputs (tunnel transfers must stay tiny)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops import cluster as cl

B = 32768
tris_np = dragon_standin(200_000)
cs = cl.build_clusters(tris_np).with_budgets(B * 8, B * 20)

rng = np.random.default_rng(0)
idx = rng.integers(0, tris_np.shape[0], B)
o = jnp.asarray(tris_np[idx].mean(axis=1) + rng.normal(0, .01, (B, 3)).astype(np.float32))
d_np = rng.normal(size=(B, 3)).astype(np.float32)
d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))
t_lim = jnp.full((B,), cl.BIG_T)


def timeit(name, f):
    g = jax.jit(f)
    out = g(o, d)
    np.asarray(out)
    ts = []
    for _ in range(4):
        t0 = time.time()
        np.asarray(g(o, d))
        ts.append(time.time() - t0)
    print(f"{name:34s}: {min(ts)*1000:7.1f} ms")


def upto_ph1(o, d):
    inv_d = cl._inv_dir(d)
    m1 = cl._slab_dense(cs.sc_box, o, inv_d, t_lim)
    return m1.sum()

def upto_ph1c(o, d):
    inv_d = cl._inv_dir(d)
    m1 = cl._slab_dense(cs.sc_box, o, inv_d, t_lim)
    r1, s1, valid1, of1 = cl._expand_pairs(m1, cs.p1_budget)
    return r1.sum() + s1.sum()

def upto_ph2(o, d):
    r2, c2, valid2, rays12, of = cl._build_pairs(cs, o, d, t_lim)
    return r2.sum() + c2.sum() + valid2.sum()

def upto_ph3(o, d):
    r2, c2, valid2, rays12, of = cl._build_pairs(cs, o, d, t_lim)
    r2c = jnp.minimum(r2, B - 1)
    tri_rows = cs.cl_tris[c2]
    rg2 = rays12[r2c]
    t = cl._mt_block(tri_rows, rg2[:, 0:3], rg2[:, 3:6])
    return jnp.where(valid2[:, None], t, cl.BIG_T).sum()

def upto_ph3g(o, d):
    r2, c2, valid2, rays12, of = cl._build_pairs(cs, o, d, t_lim)
    r2c = jnp.minimum(r2, B - 1)
    return cs.cl_tris[c2].sum() + rays12[r2c].sum()

def full(o, d):
    t, p, of = cl.closest_hit(cs, o, d)
    return t.sum() + p.sum()

timeit("ph1 slab dense", upto_ph1)
timeit("ph1 + compact", upto_ph1c)
timeit("ph1+2 (build_pairs)", upto_ph2)
timeit("ph1+2 + ph3 gathers", upto_ph3g)
timeit("ph1+2+3 (gather+MT)", upto_ph3)
timeit("full closest_hit", full)
