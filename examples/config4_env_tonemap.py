#!/usr/bin/env python
"""BASELINE config 4: HDR env-map lighting with env importance sampling +
tone mapping, dragon @ 1080p 256spp."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import numpy as np
from _common import report, setup_jax, small, timed_render

jax = setup_jax()

from sycl_ray_tracing_tpu.models import pathtracer
from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
from sycl_ray_tracing_tpu.ops.tonemap import tonemap
from sycl_ray_tracing_tpu.utils.config import RenderConfig
from sycl_ray_tracing_tpu.utils.procedural import dragon_scene
from sycl_ray_tracing_tpu.utils.png import write_png
from sycl_ray_tracing_tpu.utils.hdr import write_hdr


def main():
    if small():
        w, h, spp, tris = 160, 90, 2, 20_000
    else:
        w, h, spp, tris = 1920, 1080, 256, 200_000
    cfg = RenderConfig(width=w, height=h, samples=spp, bounces=4,
                       tile_rays=32768)
    scene = dragon_scene(n_tris=tris, with_sky=True, sky_res=(512, 1024))
    cam = pbrt_dragon_camera()
    f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
    img, dt = timed_render(f, scene, cam, jax.random.PRNGKey(0), n=1)
    assert np.isfinite(img).all() and img.mean() > 0.01
    write_png("example4.png", np.asarray(tonemap(img)))
    write_hdr("example4.hdr", img)
    report("config4_env_tonemap", dt, w * h * spp * cfg.bounces,
           {"triangles": tris})


if __name__ == "__main__":
    main()
