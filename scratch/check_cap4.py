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

cam = pbrt_dragon_camera()
cfg = RenderConfig(width=512, height=512, samples=1, bounces=8,
                   intersect="list", tile_rays=32768, estimator="shared")
rays = 512 * 512 * 8
for n in (870_000, 200_000):
    scene = dragon_scene(n_tris=n, with_sky=True)
    f = jax.jit(lambda s, c, k: pathtracer.render(s, c, cfg, k, with_aux=True))
    img, aux = f(scene, cam, jax.random.PRNGKey(0))
    np.asarray(img)
    print(f"{n}: overflow:", bool(np.asarray(aux["overflow"])), flush=True)
    t0 = time.time()
    outs = [f(scene, cam, jax.random.PRNGKey(100 + i)) for i in range(4)]
    for o in outs:
        np.asarray(o[0])
    dt = (time.time() - t0) / 4
    print(f"{n}: steady x4 {dt*1e3:.1f} ms/frame  {rays/dt/1e6:.2f} Mrays/s",
          flush=True)
