"""Does the dead-lane mask actually skip work? Time closest_hit with
0%/50%/90%/100% dead lanes."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters
from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt

B = 32768
tris_np = dragon_standin(200_000)
cs = build_clusters(tris_np, order="sah")
rng = np.random.default_rng(0)
idx = rng.integers(0, tris_np.shape[0], B)
o = jnp.asarray(tris_np[idx].mean(axis=1) + rng.normal(0,.01,(B,3)).astype(np.float32))
d_np = rng.normal(size=(B,3)).astype(np.float32)
d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))

f = jax.jit(lambda o, d, m: lt.closest_hit(cs, o, d, mask=m))
for frac in (0.0, 0.5, 0.9, 1.0):
    m = jnp.asarray(rng.random(B) >= frac)
    out = f(o, d, m); np.asarray(out[0])
    times = []
    for i in range(5):
        t0 = time.time(); out = f(o, d, m); np.asarray(out[0]); times.append(time.time()-t0)
    print(f"dead={frac:.0%}: {min(times)*1e3:.1f}ms")
