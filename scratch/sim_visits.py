"""Simulate the nearest-first kernel's visits/block in numpy to find the
cost floor vs block size RT and batch size B (sorted surface rays)."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from sycl_ray_tracing_tpu.utils.procedural import dragon_standin
from sycl_ray_tracing_tpu.ops.cluster import build_clusters, T_CLUSTER

tris = dragon_standin(200_000)
cs = build_clusters(tris)
cb = np.asarray(cs.cl_box)
bmin, bmax = cb[:, 0:3], cb[:, 3:6]
K2 = cb.shape[0]
tri_idx = np.asarray(cs.cl_tri_idx)          # [K2, T]
# per-cluster triangle arrays for MT
V = tris  # [N,3,3]

def mt(o, d, tr):
    """o,d [R,3]; tr [T,3,3] -> t [R,T] (inf on miss)"""
    a, b, c = tr[:, 0], tr[:, 1], tr[:, 2]
    e1, e2 = b - a, c - a
    h = np.cross(d[:, None, :], e2[None, :, :])
    det = (e1[None] * h).sum(-1)
    ok = np.abs(det) > 1e-7
    f = 1.0 / np.where(ok, det, 1.0)
    s = o[:, None, :] - a[None]
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1[None, :, :])
    v = f * (d[:, None, :] * q).sum(-1)
    t = f * (e2[None] * q).sum(-1)
    good = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-7)
    return np.where(good, t, np.inf)

def morton_key(o, d, lo, hi):
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    q = ((o - lo) / np.maximum(hi - lo, 1e-9) * 255).clip(0, 255).astype(np.uint32)
    m = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    oc = ((d[:, 0] > 0).astype(np.uint32) << 2) | ((d[:, 1] > 0).astype(np.uint32) << 1) | (d[:, 2] > 0).astype(np.uint32)
    return (oc.astype(np.uint64) << np.uint64(24)) | (m >> np.uint64(3))

lo = bmin.min(0); hi = bmax.max(0)

def sim(B, RT, nblocks_sample=40, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, tris.shape[0], B)
    o = tris[idx].mean(axis=1) + rng.normal(0, .01, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = np.argsort(morton_key(o, d, lo, hi))
    o, d = o[p], d[p]
    nb = B // RT
    pick = rng.choice(nb, min(nblocks_sample, nb), replace=False)
    visits = []
    for bi in pick:
        ob, db = o[bi*RT:(bi+1)*RT], d[bi*RT:(bi+1)*RT]
        inv = np.sign(db) / np.maximum(np.abs(db), 1e-30)
        t0 = (bmin[None] - ob[:, None]) * inv[:, None]
        t1 = (bmax[None] - ob[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf > 1e-7)
        tnv = np.where(hit, np.maximum(tn, 0), np.inf)     # [RT,K2]
        best = np.full(RT, np.inf)
        done = np.zeros(K2, bool)
        nv = 0
        while True:
            alive = tnv < best[:, None]
            rem = np.where(alive, tnv, np.inf).min(0)
            rem[done] = np.inf
            k = rem.argmin()
            if not np.isfinite(rem[k]):
                break
            nv += 1
            done[k] = True
            t = mt(ob, db, V[tri_idx[k]])
            best = np.minimum(best, t.min(1))
        visits.append(nv)
    visits = np.array(visits)
    print(f"B={B:>8} RT={RT:>3}: visits/block mean={visits.mean():6.1f} p90={np.percentile(visits,90):6.0f}  "
          f"tilecost(mean*RT*T)={visits.mean()*RT*T_CLUSTER/1e3:8.0f}k lanes/block  "
          f"Mrays/s-floor~{RT/ (visits.mean()*1.0e-6) /1e6:7.1f}")

for B in (32768, 262144, 1048576):
    for RT in (32, 128):
        sim(B, RT)
