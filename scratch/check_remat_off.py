import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sycl_ray_tracing_tpu.models import pathtracer
from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera
from sycl_ray_tracing_tpu.utils.config import RenderConfig
from sycl_ray_tracing_tpu.utils.procedural import dragon_scene

scene = dragon_scene(n_tris=200_000, with_sky=True)
cam = pbrt_dragon_camera()
mats = scene.materials
rays = 512 * 512 * 8

for remat in (False,):
    cfg = RenderConfig(width=512, height=512, samples=1, bounces=8,
                       intersect="list", tile_rays=32768,
                       estimator="shared", remat=remat)

    def loss(diffuse, key):
        s = scene.with_materials(dataclasses.replace(mats, diffuse=diffuse))
        return pathtracer.render(s, cam, cfg, key).mean()

    vg = jax.jit(jax.value_and_grad(loss))
    val, g = vg(mats.diffuse, jax.random.PRNGKey(0))
    np.asarray(g)
    assert np.abs(np.asarray(g)).sum() > 0
    ts = []
    for i in range(3):
        t0 = time.time()
        np.asarray(vg(mats.diffuse, jax.random.PRNGKey(i + 1))[1])
        ts.append(time.time() - t0)
    print(f"remat={remat}: fwd+bwd {min(ts)*1e3:.1f} ms  "
          f"{rays/min(ts)/1e6:.2f} Mrays/s", flush=True)
