#!/usr/bin/env python
"""BASELINE config 2: low-poly OBJ mesh + accelerated traversal,
direct + 4-bounce indirect, 512x512 @ 64spp."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import numpy as np
from _common import report, setup_jax, small, timed_render

jax = setup_jax()

from sycl_ray_tracing_tpu.models import pathtracer
from sycl_ray_tracing_tpu.models.camera import cornell_box_camera
from sycl_ray_tracing_tpu.ops.tonemap import tonemap
from sycl_ray_tracing_tpu.utils.config import RenderConfig
from sycl_ray_tracing_tpu.utils.obj_loader import load_scene
from sycl_ray_tracing_tpu.utils.png import write_png


def main():
    size = 64 if small() else 512
    spp = 4 if small() else 64
    tile = 4096 if small() else 32768
    cfg = RenderConfig(width=size, height=size, samples=spp, bounces=4,
                       tile_rays=tile)
    # MIS.obj: the reference's low-poly multi-light test scene (3860 tris)
    from sycl_ray_tracing_tpu.models.camera import mis_camera

    scene = load_scene("/root/reference/data/OBJs/MIS.obj")
    # NOTE the pair-budget hint must match the RAY TILE size, not the image
    scene = scene.build_acceleration(num_rays_hint=tile)
    cam = mis_camera()
    f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k))
    img, dt = timed_render(f, scene, cam, jax.random.PRNGKey(0))
    assert np.isfinite(img).all() and img.mean() > 0.05
    write_png("example2.png", np.asarray(tonemap(img)))
    report("config2_obj_bvh", dt, size * size * spp * cfg.bounces)


if __name__ == "__main__":
    main()
