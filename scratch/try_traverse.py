import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.ops.cluster import build_clusters
from sycl_ray_tracing_tpu.ops import pallas
from sycl_ray_tracing_tpu.ops.pallas.traverse import closest_hit, any_hit
from sycl_ray_tracing_tpu.ops.intersect import intersect_triangles

rng = np.random.default_rng(7)
tris_np = rng.uniform(-1, 1, (500, 3, 3)).astype(np.float32)
tris = jnp.asarray(tris_np)
cs = build_clusters(tris_np)
o = jnp.asarray(rng.uniform(-2, 2, (300, 3)).astype(np.float32))
d = rng.normal(size=(300, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)

oracle = intersect_triangles(o, d, tris)
t, prim = closest_hit(cs, o, d)
m = np.asarray(oracle.hit)
print("hit match:", (np.asarray(prim >= 0) == m).all())
print("t match:", np.allclose(np.asarray(t)[m], np.asarray(oracle.t)[m], rtol=1e-5))
print("prim match:", (np.asarray(prim)[m] == np.asarray(oracle.prim)[m]).mean())

for tm in (0.5, 2.0, 1e30):
    t_max = jnp.full((300,), tm, jnp.float32)
    got = np.asarray(any_hit(cs, o, d, t_max))
    want = m & (np.asarray(oracle.t) + 1e-4 < tm)
    print(f"any_hit tmax={tm}: match={(got == want).all()}")
