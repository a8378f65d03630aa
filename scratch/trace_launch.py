"""Profile ONE fused multi_query launch (64k rays, 60% live) and print the
top ops from the chrome trace."""
import glob, gzip, json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters, BIG_T
from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt

B = 65536
tris_np = dragon_standin(200_000)
cs = build_clusters(tris_np, order="sah")
rng = np.random.default_rng(0)
idx = rng.integers(0, tris_np.shape[0], B)
o = jnp.asarray(tris_np[idx].mean(axis=1) + rng.normal(0,.01,(B,3)).astype(np.float32))
d_np = rng.normal(size=(B,3)).astype(np.float32)
d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))
mask = jnp.asarray(rng.random(B) < 0.6)
tl = jnp.full((B,), BIG_T)

def q(o, d, m):
    res, of = lt.multi_query(cs, [(o, d, None, m)])
    return res[0][0]

f = jax.jit(q)
out = f(o, d, mask); np.asarray(out)
times = []
for i in range(5):
    t0 = time.time(); out = f(o, d, mask); np.asarray(out); times.append(time.time()-t0)
print(f"one launch 64k rays 60% live: {min(times)*1e3:.1f}ms (incl ~30ms RTT)")

with jax.profiler.trace("/tmp/jtrace"):
    out = f(o, d, mask)
    np.asarray(out)

path = sorted(glob.glob("/tmp/jtrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(path))["traceEvents"]
durs = {}
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        # keep device-lane events only (heuristic: XLA op names)
        durs[name] = durs.get(name, 0) + e["dur"]
top = sorted(durs.items(), key=lambda kv: -kv[1])[:30]
for name, us in top:
    if us > 200:
        print(f"{us/1000:8.2f}ms  {name[:110]}")
