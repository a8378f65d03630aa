"""Quick CPU (interpret) correctness check of the list tracer vs the XLA
cluster tracer on a small mesh."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops import cluster as cl
from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt

tris_np = dragon_standin(4_000)
cs = cl.build_clusters(tris_np).with_budgets(4096 * 8, 4096 * 24)
B = 512
rng = np.random.default_rng(0)
idx = rng.integers(0, tris_np.shape[0], B)
o = jnp.asarray(tris_np[idx].mean(axis=1) + rng.normal(0, .05, (B, 3)).astype(np.float32))
d_np = rng.normal(size=(B, 3)).astype(np.float32)
d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))

# candidate lists sanity: compare the candidate SET against the pair list
t_lim = jnp.full((B,), cl.BIG_T)
cand, ctn, cof = jax.jit(lambda o, d: cl.candidate_clusters(cs, o, d, t_lim, 48))(o, d)
r2, c2, valid2, _, pof = jax.jit(lambda o, d: cl._build_pairs(cs, o, d, t_lim))(o, d)
cand, ctn = np.asarray(cand), np.asarray(ctn)
r2, c2, valid2 = np.asarray(r2), np.asarray(c2), np.asarray(valid2)
ok = True
for i in range(B):
    set_pairs = set(c2[valid2 & (r2 == i)].tolist())
    set_cand = set(cand[i][cand[i] >= 0].tolist())
    if set_pairs != set_cand:
        print(f"ray {i}: pairs {sorted(set_pairs)} != cand {sorted(set_cand)}")
        ok = False
        break
# nearest-first ordering check
mono = np.all(np.diff(ctn, axis=1) >= -1e-6)
print(f"candidate sets match: {ok}; ctn monotone: {mono}; overflow={bool(cof)}")

# closest hit agreement
tx, px, ofx = jax.jit(lambda o, d: cl.closest_hit(cs, o, d))(o, d)
tp, pp, ofp = jax.jit(lambda o, d: lt.closest_hit(cs, o, d, maxc=48))(o, d)
tx, px, tp, pp = map(np.asarray, (tx, px, tp, pp))
agree_hit = ((px >= 0) == (pp >= 0)).mean()
m = (px >= 0) & (pp >= 0)
same_prim = (px[m] == pp[m]).mean()
agree_t = np.allclose(tx[m], tp[m], rtol=1e-4, atol=1e-5)
print(f"closest: hit-agree={agree_hit:.4f} prim-agree={same_prim:.4f} t={agree_t} of={bool(ofp)}")

# any hit agreement
tmax = np.asarray(tx) * 1.0
tmax[tmax >= cl.BIG_T] = 3.0
tmax = jnp.asarray(np.maximum(tmax * rng.uniform(0.5, 1.5, B).astype(np.float32), 0.1))
bx, _ = jax.jit(lambda o, d, tm: cl.any_hit(cs, o, d, tm))(o, d, tmax)
bp, _ = jax.jit(lambda o, d, tm: lt.any_hit(cs, o, d, tm, maxc=48))(o, d, tmax)
bx, bp = np.asarray(bx), np.asarray(bp)
print(f"anyhit: agree={(bx == bp).mean():.4f} ({int(bx.sum())} vs {int(bp.sum())} blocked)")
