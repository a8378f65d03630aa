"""Predict kernel cost: clusters-per-block for various ray orders (numpy)."""
import numpy as np
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters, T_CLUSTER
import jax
jax.config.update("jax_platforms", "cpu")

B, RT = 32768, 128
tris = dragon_standin(200_000)
cs = build_clusters(tris)
cb = np.asarray(cs.cl_box)   # [K2,8]
K2 = cb.shape[0]
bmin, bmax = cb[:, 0:3], cb[:, 3:6]

rng = np.random.default_rng(0)
idx = rng.integers(0, tris.shape[0], B)
o_sur = tris[idx].mean(axis=1) + rng.normal(0, .01, (B,3)).astype(np.float32)
d_sur = rng.normal(size=(B,3)).astype(np.float32)
d_sur /= np.linalg.norm(d_sur, axis=-1, keepdims=True)

# camera tile rays: 181x181 grid ~ 32k, pinhole at z=6 looking at mesh, image order
n = 181
ys, xs = np.meshgrid(np.linspace(-0.7,0.7,n), np.linspace(-0.7,0.7,n), indexing="ij")
d_cam = np.stack([xs, ys-0.25, -np.ones_like(xs)], axis=-1).reshape(-1,3).astype(np.float32)[:B]
d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
o_cam = np.tile(np.array([[0.,1.5,6.]],np.float32),(d_cam.shape[0],1))

def morton3(q):  # q: int [N,3] 10-bit
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return (spread(q[:,0]) << 2) | (spread(q[:,1]) << 1) | spread(q[:,2])

def sort_key(o, d, obits=7):
    lo, hi = o.min(0), o.max(0)
    q = ((o - lo) / np.maximum(hi - lo, 1e-9) * ((1<<obits)-1)).astype(np.uint32)
    m = morton3(q)
    octant = ((d[:,0]>0).astype(np.uint32)<<2)|((d[:,1]>0).astype(np.uint32)<<1)|(d[:,2]>0).astype(np.uint32)
    return (octant.astype(np.uint64) << np.uint64(30)) | m.astype(np.uint64)

def clusters_per_block(o, d, label):
    nb = len(o)//RT
    tot = []
    for b in range(nb):
        ob, db = o[b*RT:(b+1)*RT], d[b*RT:(b+1)*RT]
        inv = np.sign(db)/np.maximum(np.abs(db),1e-30)
        t0 = (bmin[None,:,:]-ob[:,None,:])*inv[:,None,:]
        t1 = (bmax[None,:,:]-ob[:,None,:])*inv[:,None,:]
        tn = np.minimum(t0,t1).max(-1); tf = np.maximum(t0,t1).min(-1)
        hit = (tn<=tf)&(tf>1e-7)
        tot.append(hit.any(0).sum())
    tot = np.array(tot)
    print(f"{label}: clusters/block mean={tot.mean():.0f} p50={np.percentile(tot,50):.0f} p90={np.percentile(tot,90):.0f} total={tot.sum()}")

clusters_per_block(o_cam, d_cam, "camera image-order")
clusters_per_block(o_sur, d_sur, "surface unsorted  ")
k = sort_key(o_sur, d_sur)
p = np.argsort(k)
clusters_per_block(o_sur[p], d_sur[p], "surface oct+morton")
k2_ = sort_key(o_sur, d_sur, obits=9)
p2 = np.argsort(k2_)
clusters_per_block(o_sur[p2], d_sur[p2], "surface oct+mort9 ")
# also: per-RAY average (ideal lower bound)
inv = np.sign(d_sur)/np.maximum(np.abs(d_sur),1e-30)
cnt = 0
for s in range(0, B, 4096):
    ob, ib = o_sur[s:s+4096], inv[s:s+4096]
    t0 = (bmin[None,:,:]-ob[:,None,:])*ib[:,None,:]
    t1 = (bmax[None,:,:]-ob[:,None,:])*ib[:,None,:]
    tn = np.minimum(t0,t1).max(-1); tf = np.maximum(t0,t1).min(-1)
    cnt += ((tn<=tf)&(tf>1e-7)).sum()
print(f"surface per-ray avg clusters: {cnt/B:.1f}")
