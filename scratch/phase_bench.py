"""Phase timing: RTT baseline, sort, candidate build, kernel, unsort."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters, candidate_clusters, BIG_T
from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt

B = 32768
tris_np = dragon_standin(200_000)
cs = build_clusters(tris_np, order="sah")
rng = np.random.default_rng(0)
idx = rng.integers(0, tris_np.shape[0], B)
o = jnp.asarray(tris_np[idx].mean(axis=1) + rng.normal(0,.01,(B,3)).astype(np.float32))
d_np = rng.normal(size=(B,3)).astype(np.float32)
d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))
t_lim = jnp.full((B,), BIG_T)

def bench(name, f, *args):
    out = f(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out)
    times = []
    for i in range(7):
        t0 = time.time()
        out = f(*args)
        _ = np.asarray(out[0] if isinstance(out, tuple) else out)
        times.append(time.time()-t0)
    print(f"{name}: {min(times)*1e3:.1f}ms")

# RTT baseline: tiny computation
bench("rtt-baseline", jax.jit(lambda x: (x + 1.0).sum()), jnp.ones((8,)))
# sort only
def sort_only(o, d):
    key = lt._ray_sort_key(cs, o, d)
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm[:1] + inv[:1]
bench("sort+inv", jax.jit(sort_only), o, d)
# candidate build only (thin output)
bench("cand-build", jax.jit(lambda o, d: candidate_clusters(cs, o, d, t_lim, 32)[0][:, 0]), o, d)
# full closest (sorted)
bench("full(sort)", jax.jit(lambda o, d: lt.closest_hit(cs, o, d)), o, d)
# full closest without sort
def nosort(o, d):
    t, p, of = lt._run(cs, o, d, t_lim, 32, any_hit=False, sort=False)
    return t
bench("full(nosort)", jax.jit(nosort), o, d)
# dense slab mask only
from sycl_ray_tracing_tpu.ops.cluster import _dense_cluster_mask, _inv_dir
bench("slab-only", jax.jit(lambda o, d: _dense_cluster_mask(cs, o, _inv_dir(d), t_lim)[0].sum()), o, d)
