"""Split timing: candidate_clusters (XLA) vs the Pallas list kernel."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters, candidate_clusters, BIG_T
from sycl_ray_tracing_tpu.ops.pallas import listtrace

B = 32768
MAXC = int(sys.argv[1]) if len(sys.argv) > 1 else 32
tris_np = dragon_standin(200_000)
cs = build_clusters(tris_np)

rng = np.random.default_rng(0)
idx = rng.integers(0, tris_np.shape[0], B)
o_sur = tris_np[idx].mean(axis=1) + rng.normal(0, .01, (B,3)).astype(np.float32)
d_sur = rng.normal(size=(B,3)).astype(np.float32)
d_sur /= np.linalg.norm(d_sur, axis=-1, keepdims=True)
o_j, d_j = jnp.asarray(o_sur), jnp.asarray(d_sur)
t_lim = jnp.full((B,), BIG_T)

def bench(name, f, *args):
    out = f(*args); _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    times = []
    for _i in range(5):
        t0 = time.time()
        out = f(*args)
        _ = np.asarray(out[0] if isinstance(out, tuple) else out)
        times.append(time.time() - t0)
    print(f"{name}: {min(times)*1000:.1f}ms")
    return out

# stage 1 only: candidate lists (reduce output to thin arrays to avoid transfer cost)
f1 = jax.jit(lambda o, d: candidate_clusters(cs, o, d, t_lim, MAXC)[0][:, 0])
bench(f"cand_only maxc={MAXC}", f1, o_j, d_j)

# full list tracer
f2 = jax.jit(lambda o, d: listtrace.closest_hit(cs, o, d, maxc=MAXC))
bench(f"full list maxc={MAXC}", f2, o_j, d_j)

# candidate count stats
cand, ctn, of = jax.jit(lambda o, d: candidate_clusters(cs, o, d, t_lim, MAXC))(o_j, d_j)
n = np.asarray((cand >= 0).sum(axis=1))
print(f"cands/ray: mean={n.mean():.1f} p50={np.percentile(n,50):.0f} p95={np.percentile(n,95):.0f} max={n.max()} overflow={bool(of)}")
