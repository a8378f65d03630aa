#!/usr/bin/env python
"""Does the membership certificate fire on the real flagship workload?

Reconstructs the integrator's bounce-1 fused query batch (continuation +
env shadow rays) for one 32k-ray tile of the dragon frame, applies the
REAL sort key + block grouping, and reports per query type:
  * fraction of rays in FULL union blocks (the escalation candidates),
  * of those, fraction covered by the membership certificate,
  * fraction certified by the old block distance certificate alone.

Usage: python scratch/member_stats_r5.py [n_tris]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops import envmap as env_ops
    from sycl_ray_tracing_tpu.ops.brdf import ggx_importance_sample
    from sycl_ray_tracing_tpu.ops.cluster import (
        candidate_clusters_grouped,
    )
    from sycl_ray_tracing_tpu.ops.intersect import BIG_T, finalize_hit
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt
    from sycl_ray_tracing_tpu.ops.safe_math import dot
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=n_tris, with_sky=True)
    cs = scene.clusters
    cam = pbrt_dragon_camera()
    w = h = 512
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (px.shape[0], 2))
    ro, rd = cam.generate_rays(px + u[:, 0], py + u[:, 1], w, h)
    # middle tile (contains the dragon, not just sky)
    lo = 4 * 32768
    ro, rd = ro[lo:lo + 32768], rd[lo:lo + 32768]

    t0, prim0, _ = lt.closest_hit(cs, ro, rd)
    hit0 = finalize_hit(ro, rd, scene.triangles, prim0)
    live = np.asarray(hit0.hit)
    print(f"bounce-0 live fraction: {live.mean():.3f}")

    mats = scene.materials
    mi = scene.material_indices[jnp.clip(prim0, 0, n_tris - 1)]
    diffuse = mats.diffuse[mi]
    metal = mats.metalness[mi]
    rough = mats.roughness[mi]
    k2 = jax.random.PRNGKey(1)
    uc = jax.random.uniform(k2, (ro.shape[0], 2))
    view = -rd
    brdf_s, wi_s, pdf_s = ggx_importance_sample(
        diffuse, metal, rough, view, hit0.normal, uc[:, 0], uc[:, 1]
    )
    origin = hit0.point + hit0.normal * 1e-4
    cont_ok = hit0.hit & (pdf_s >= 1e-8) & jnp.isfinite(pdf_s)
    u_e = jax.random.uniform(jax.random.PRNGKey(2), (ro.shape[0], 2))
    wi_e, _, env_pdf, _ = env_ops.sample(scene.env_map, u_e[:, 0], u_e[:, 1])
    env_mask = hit0.hit & (dot(hit0.normal, wi_e) > 0.0)

    # fused batch exactly like multi_query: [cont, env-shadow]
    B = ro.shape[0]
    o = jnp.concatenate([origin, origin], 0)
    d = jnp.concatenate([wi_s, wi_e], 0)
    tl = jnp.full((2 * B,), BIG_T, jnp.float32)
    mask = jnp.concatenate([cont_ok, env_mask], 0)
    qtype = np.concatenate([np.zeros(B, np.int32), np.ones(B, np.int32)])

    # replicate _run_once's mask/root-cull/sort/grouping
    lo3 = jnp.min(cs.sc_box[:, 0:3], axis=0)
    hi3 = jnp.max(cs.sc_box[:, 3:6], axis=0)
    sign = jnp.where(d < 0, -1.0, 1.0)
    inv = sign / jnp.maximum(jnp.abs(d), 1e-30)
    t0r = (lo3[None] - o) * inv
    t1r = (hi3[None] - o) * inv
    tnr = jnp.max(jnp.minimum(t0r, t1r), axis=-1)
    tfr = jnp.min(jnp.maximum(t0r, t1r), axis=-1)
    root = (tnr <= tfr) & (tfr > 1e-7) & (tnr < tl)
    m = mask & root
    tl = jnp.where(m, tl, -BIG_T)
    keyb = lt._ray_sort_key(cs, o, d)
    keyb = jnp.where(m, keyb, jnp.int32(1) << 28)
    perm = jnp.argsort(keyb)
    o, d, tl = o[perm], d[perm], tl[perm]
    qt = qtype[np.asarray(perm)]
    live_s = np.asarray(m)[np.asarray(perm)]

    maxc = lt.DEFAULT_MAXC_SHARE
    rb = lt.RB_SHARE
    cand, ctn, of, covered = candidate_clusters_grouped(
        cs, o, d, tl, maxc, rb, exact=True, ray_cert=True
    )
    candn = np.asarray(cand)
    ctnn = np.asarray(ctn)
    cov = np.asarray(covered)
    full_blk = candn[:, -1] >= 0
    full_ray = np.repeat(full_blk, rb)
    print(f"maxc={maxc} rb={rb}  blocks={candn.shape[0]} "
          f"full-block fraction: {full_blk.mean():.3f}")
    for q, name in ((0, "cont"), (1, "env-shadow")):
        sel = (qt == q) & live_s
        if not sel.any():
            continue
        f = full_ray & sel
        print(f"{name:10s}: live={sel.sum():6d} in-full-block={f.mean():.3f}"
              f" covered|full={cov[f].mean() if f.any() else float('nan'):.3f}"
              f" covered|all={cov[sel].mean():.3f}")
    # distance certificate upper bound (without kernel tmin): rays in
    # non-full blocks are always distance-certified; in full blocks the
    # distance cert needs tmin <= ctn_last which we skip here.
    print(f"uncertified-by-membership (live): "
          f"{(~cov & live_s).sum()} of {live_s.sum()}")
    print("overflow raw:", bool(of))
    return 0


if __name__ == "__main__":
    sys.exit(main())
