#!/usr/bin/env python
"""Measure WHERE the uncertified mass of a real dragon frame lives:
build the exact bounce-1 query sets (continuation + light shadow + env
shadow) the fused integrator issues, then report per-query-type
  * live fraction
  * hit-box count distribution (the certificate's hard bound for misses)
  * uncertified fraction at maxc = 32 / 48 / 96 / 128
This sizes the escalation pass and the roofline's candidate-count tail.

Usage: python scratch/redo_stats.py
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

    from sycl_ray_tracing_tpu.models import pathtracer as pt
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops import envmap as env_ops
    from sycl_ray_tracing_tpu.ops.brdf import ggx_importance_sample
    from sycl_ray_tracing_tpu.ops.intersect import BIG_T
    from sycl_ray_tracing_tpu.ops.safe_math import RAY_OFFSET, dot
    from sycl_ray_tracing_tpu.ops.sampling import sample_triangle_uniform
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

    scene = dragon_scene(n_tris=200_000, with_sky=True)
    cs = scene.clusters
    cam = pbrt_dragon_camera()
    W = H = 512
    B = 32768  # one tile, central band (the heavy one)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = jnp.asarray(xs.reshape(-1)[B * 3:B * 4], jnp.float32)
    py = jnp.asarray(ys.reshape(-1)[B * 3:B * 4], jnp.float32)

    @jax.jit
    def bounce1_queries(key):
        ro, rd = cam.generate_rays(px + 0.5, py + 0.5, W, H)
        hit = pt.intersect_scene(scene, ro, rd, "list")
        live = hit.hit
        _, diffuse, metal, rough = scene.materials.lookup(
            pt._material_of_prim(scene, hit.prim))
        view = -rd
        uc = pt._uniforms(key, 0, pt._CONT, (B, 2))
        brdf_s, wi_s, pdf_s = ggx_importance_sample(
            diffuse, metal, rough, view, hit.normal, uc[:, 0], uc[:, 1])
        cont_ok = live & (pdf_s >= 1e-8) & jnp.isfinite(pdf_s) \
            & jnp.any(brdf_s > 0.0, axis=-1)
        origin = hit.point + hit.normal * RAY_OFFSET
        u = pt._uniforms(key, 0, pt._LIGHT, (B, 3))
        nl = scene.num_lights
        pick = jnp.minimum((u[:, 0] * nl).astype(jnp.int32), nl - 1)
        tri = scene.triangles[scene.emissive_indices[pick]]
        lp, ln, _a = sample_triangle_uniform(
            tri[:, 0], tri[:, 1], tri[:, 2], u[:, 1], u[:, 2])
        to_l = lp - origin
        dist = jnp.linalg.norm(to_l, axis=-1)
        wi_l = to_l / jnp.maximum(dist, 1e-12)[..., None]
        lmask = live & (dot(ln, -wi_l) > 0) & (dot(hit.normal, wi_l) > 0)
        u_e = pt._uniforms(key, 0, pt._ENV, (B, 2))
        wi_e, _r, _p, _ = env_ops.sample(scene.env_map, u_e[:, 0], u_e[:, 1])
        emask = live & (dot(hit.normal, wi_e) > 0)
        return (origin, wi_s, cont_ok, wi_l, dist, lmask, wi_e, emask)

    (origin, wi_s, cont_ok, wi_l, dist, lmask, wi_e, emask) = [
        np.asarray(x) for x in bounce1_queries(jax.random.PRNGKey(0))
    ]
    print(f"bounce-1 live fractions: cont {cont_ok.mean():.3f} "
          f"light {lmask.mean():.3f} env {emask.mean():.3f}")

    @jax.jit
    def counts(o, d, tl):
        inv = cl._inv_dir(d)
        hitm, tn = cl._dense_cluster_mask(cs, o, inv, tl)
        return jnp.sum(hitm, axis=1)

    o = jnp.asarray(origin)
    for name, d, tl, mask, ah in (
        ("cont ", wi_s, np.full(B, BIG_T, np.float32), cont_ok, False),
        ("light", wi_l, dist - 1e-4, lmask, True),
        ("env  ", wi_e, np.full(B, BIG_T, np.float32), emask, True),
    ):
        c = np.asarray(counts(o, jnp.asarray(d), jnp.asarray(tl)))[mask]
        print(f"{name} hit-box count: mean {c.mean():6.1f} p50 "
              f"{np.percentile(c, 50):4.0f} p90 {np.percentile(c, 90):4.0f}"
              f" p99 {np.percentile(c, 99):4.0f} max {c.max():4.0f}")
        for mc in (32, 48, 96, 128):
            from sycl_ray_tracing_tpu.ops.pallas.listtrace import _run_once
            t, packed, res, _ = jax.jit(
                lambda o, d, tl, mc=mc, ah=ah, m=jnp.asarray(mask):
                _run_once(cs, o, d, tl, mc, ah, mask=m)
            )(o, jnp.asarray(d), jnp.asarray(tl))
            res = np.asarray(res)[mask]
            pk = np.asarray(packed)[mask]
            certain = res | (ah & (pk >= 0))
            print(f"      maxc={mc:3d}: uncertified {100 * (~certain).mean():6.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
