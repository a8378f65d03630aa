"""Dragon closest-hit sweep: Pallas VMEM kernel vs XLA cluster tracer.

Round-1 baseline: XLA cluster tracer = ~62ms per 32k-ray secondary sweep.
"""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters, closest_hit as xla_closest
from sycl_ray_tracing_tpu.ops.pallas import traverse
from sycl_ray_tracing_tpu.ops.pallas import listtrace

B = 32768
tris_np = dragon_standin(200_000)
cs = build_clusters(tris_np)
print(f"clusters: K2={cs.num_clusters} K1={cs.num_superclusters} fits={traverse.fits_in_vmem(cs)}")

rng = np.random.default_rng(0)
which = sys.argv[1] if len(sys.argv) > 1 else "both"

# surface-origin rays (the hard incoherent case, like bounce-1 rays):
# origins near the mesh surface, directions uniform sphere
idx = rng.integers(0, tris_np.shape[0], B)
o_sur = tris_np[idx].mean(axis=1) + rng.normal(0, .01, (B,3)).astype(np.float32)
d_sur = rng.normal(size=(B,3)).astype(np.float32)
d_sur /= np.linalg.norm(d_sur, axis=-1, keepdims=True)

# coherent camera-like rays: one origin, directions in a cone toward mesh
o_cam = np.tile(np.array([[0., 1.5, 6.]], np.float32), (B, 1))
px = rng.uniform(-1, 1, B); py = rng.uniform(-1, 1, B)
d_cam = np.stack([px*.5, py*.5 - .3, -np.ones(B)], axis=1).astype(np.float32)
d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
# sort camera rays by pixel-ish order? they're random in a cone; sort by direction morton-ish
ordc = np.lexsort((d_cam[:,1], d_cam[:,0]))
d_cam = d_cam[ordc]

def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = [np.asarray(x) for x in out]   # compile+sync
    times = []
    for _i in range(5):
        t0 = time.time()
        out = f(*args)
        _ = np.asarray(out[0])
        times.append(time.time() - t0)
    dt = min(times)
    print(f"{name}: {dt*1000:.1f}ms  ({B/dt/1e6:.2f} Mrays/s)")
    return out

for label, o, d in (("coherent", o_cam, d_cam), ("surface", o_sur, d_sur)):
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    if which in ("both", "pallas"):
        tp, pp = bench(f"pallas  {label}", lambda a, b: traverse.closest_hit(cs, a, b), o_j, d_j)
    if which in ("both", "list"):
        tl, pls, _of = bench(f"list    {label}", lambda a, b: listtrace.closest_hit(cs, a, b), o_j, d_j)
    if which in ("both", "xla"):
        tx, px_, ofx = bench(f"xla     {label}", lambda a, b: xla_closest(cs.with_budgets(B*8, B*20), a, b), o_j, d_j)
    if which == "both":
        tpn, txn = np.asarray(tp), np.asarray(tx)
        ppn, pxn = np.asarray(pp), np.asarray(px_)
        agree_hit = ((ppn >= 0) == (pxn >= 0)).mean()
        m = (ppn >= 0) & (pxn >= 0)
        agree_t = np.allclose(tpn[m], txn[m], rtol=1e-4, atol=1e-5)
        print(f"  agreement: hit={agree_hit:.4f} t={agree_t} overflow_xla={bool(ofx)}")
        tln, pln = np.asarray(tl), np.asarray(pls)
        agree_hit_l = ((pln >= 0) == (pxn >= 0)).mean()
        ml = (pln >= 0) & (pxn >= 0)
        agree_t_l = np.allclose(tln[ml], txn[ml], rtol=1e-4, atol=1e-5)
        print(f"  list agreement: hit={agree_hit_l:.4f} t={agree_t_l}")
