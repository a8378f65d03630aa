"""Sharding: sharded render executes on an 8-device mesh, matches the
single-device estimator statistically, and the distributed train step
produces finite psum'd gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from sycl_ray_tracing_tpu.models import pathtracer
from sycl_ray_tracing_tpu.models.camera import cornell_box_camera
from sycl_ray_tracing_tpu.parallel.mesh import best_sample_axis, make_mesh
from sycl_ray_tracing_tpu.parallel.render import make_train_step, render_sharded
from sycl_ray_tracing_tpu.utils.config import RenderConfig


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


def test_mesh_shapes():
    m = make_mesh(8, sample_axis=2)
    assert m.shape["data"] == 4 and m.shape["sample"] == 2
    assert best_sample_axis(8, 16) == 8
    assert best_sample_axis(8, 4) == 4
    assert best_sample_axis(8, 3) == 1


def test_sharded_render_runs_and_is_finite(cornell_scene, rng_key):
    cfg = RenderConfig(width=16, height=16, samples=8, bounces=2)
    mesh = make_mesh(8, sample_axis=2)
    img = render_sharded(cornell_scene, cornell_box_camera(), cfg, rng_key, mesh)
    a = np.asarray(img)
    assert a.shape == (16, 16, 3)
    assert np.isfinite(a).all() and (a >= 0).all()
    assert a.mean() > 0.05


def test_sharded_matches_unsharded_statistically(cornell_scene):
    """Same estimator, different RNG streams: images agree to MC noise."""
    cfg = RenderConfig(width=16, height=16, samples=32, bounces=2)
    mesh = make_mesh(8, sample_axis=4)
    cam = cornell_box_camera()
    a = np.asarray(
        render_sharded(cornell_scene, cam, cfg, jax.random.PRNGKey(1), mesh)
    )
    b = np.asarray(pathtracer.render(cornell_scene, cam, cfg, jax.random.PRNGKey(2)))
    mask = (a < 5) & (b < 5)  # exclude the emitter pixels
    rel = np.abs(a - b) / (a + b + 0.2)
    assert rel[mask].mean() < 0.15, rel[mask].mean()


def test_data_only_mesh(cornell_scene, rng_key):
    cfg = RenderConfig(width=8, height=8, samples=4, bounces=2)
    mesh = make_mesh(8, sample_axis=1)
    img = render_sharded(cornell_scene, cornell_box_camera(), cfg, rng_key, mesh)
    assert np.isfinite(np.asarray(img)).all()


def test_train_step_grads(cornell_scene, test_env_map, rng_key):
    cfg = RenderConfig(width=8, height=8, samples=8, bounces=2)
    mesh = make_mesh(8, sample_axis=2)
    scene = cornell_scene.with_env_map(jnp.asarray(test_env_map))
    step = make_train_step(scene, cfg, mesh, optimize_env=True)

    import dataclasses

    ys, xs = jnp.meshgrid(
        jnp.arange(cfg.height, dtype=jnp.float32),
        jnp.arange(cfg.width, dtype=jnp.float32),
        indexing="ij",
    )
    # guess = perturbed materials; target = true materials (rendered inside
    # the step under common random numbers)
    guess = dataclasses.replace(
        scene.materials, diffuse=jnp.clip(scene.materials.diffuse + 0.2, 0, 1)
    )
    loss, grads = step(
        guess, scene.env_map.image, scene.materials, scene.env_map.image,
        cornell_box_camera(), xs.reshape(-1), ys.reshape(-1), rng_key,
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0.0
    g_mats, g_env = grads
    for leaf in jax.tree.leaves(g_mats):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(g_env)).all()
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g_mats))
    assert total > 0.0
    # at the true parameters the common-random-numbers loss is exactly 0
    loss0, _ = step(
        scene.materials, scene.env_map.image, scene.materials,
        scene.env_map.image, cornell_box_camera(),
        xs.reshape(-1), ys.reshape(-1), rng_key,
    )
    assert float(loss0) < 1e-6


def test_weak_scaling_proxy(cornell_scene):
    """Weak-scaling comm-fraction proxy on the virtual CPU mesh (BASELINE
    target: >=90% rays/s scaling on real multi-chip ICI, which cannot be
    measured here).  All N virtual devices share one host's cores, so
    IDEAL weak scaling (constant per-device work, zero comm overhead) is
    wall time growing ~linearly with N; sharding/collective overhead shows
    up as super-linear growth.  efficiency_proxy = (N * t1) / tN.

    The assertion is deliberately loose (CPU timing noise, XLA fusion
    differences across mesh shapes); the printed number is the artifact.
    """
    import time

    from sycl_ray_tracing_tpu.parallel.mesh import pad_to_multiple  # noqa

    cam = cornell_box_camera()
    times = {}
    for n in (1, 8):
        # constant per-device work: W scales with n.  The per-device slice
        # must be 10s of ms — an 8x8x2x2 slice ran in ~1.5 ms, which is
        # pure dispatch overhead and made the proxy measure nothing (r5).
        cfg = RenderConfig(width=32 * n, height=32, samples=4, bounces=3)
        mesh = make_mesh(n, sample_axis=1)
        f = jax.jit(
            lambda s, c, k, cfg=cfg, mesh=mesh: render_sharded(
                s, c, cfg, k, mesh
            )
        )
        f(cornell_scene, cam, jax.random.PRNGKey(0))  # compile
        t0 = time.time()
        for i in range(3):
            np.asarray(f(cornell_scene, cam, jax.random.PRNGKey(i)))
        times[n] = (time.time() - t0) / 3
    eff = (8 * times[1]) / max(times[8], 1e-9)
    print(f"weak-scaling proxy: t1={times[1]*1e3:.1f}ms "
          f"t8={times[8]*1e3:.1f}ms efficiency={eff:.2f}")
    # Bound derivation (r5 analysis, scratch/weak_scaling_r5.log): the 8
    # virtual devices share this host's 4 cores and a single-device render
    # is ~1-core-bound, so 8-on-4 contention alone caps t8 at ~2x t1
    # (eff ~4); the program's collectives are two psums of a tiny [H,W,3]
    # image, negligible on real ICI.  Measured solo: eff ~3.0.  Assert
    # eff > 1.0 (t8 <= 8x t1): ~3x slack for pytest-xdist core contention
    # during the run, but unlike the old 0.3 bound (t8 <= 26x t1!) it
    # still bites on any gross sharding regression.
    assert eff > 1.0


def test_sharded_render_list_backend():
    """The flagship's list (Pallas) backend inside shard_map on the
    8-device mesh: the Mosaic kernel (interpret mode on CPU) composes
    with pixel/sample sharding — this is the structure a multi-chip
    dragon render actually runs."""
    from sycl_ray_tracing_tpu.utils.procedural import dragon_scene
    from sycl_ray_tracing_tpu.models.camera import pbrt_dragon_camera

    scene = dragon_scene(n_tris=2_000, with_sky=True, sky_res=(16, 32))
    cfg = RenderConfig(width=8, height=8, samples=2, bounces=2,
                       intersect="list", estimator="shared")
    mesh = make_mesh(8, sample_axis=2)
    img = render_sharded(scene, pbrt_dragon_camera(), cfg,
                         jax.random.PRNGKey(0), mesh)
    img = np.asarray(img)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4
