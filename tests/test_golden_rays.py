"""The reference's recorded golden-ray regression suite.

The reference hardcodes 572 rays with expected closest-hit points and 222
rays expected to miss, recorded against cornell_pbr.obj
(/root/reference/include/bvh_tests.h:8-1394) and validates both of its BVH
implementations against them at 1e-5 per-component absolute tolerance
(/root/reference/source/tests.cpp:10-14).  Parsing that array data (it is
data, not logic) pins all three of this framework's intersectors — brute
force, lockstep BVH, wavefront cluster tracer — to the reference
implementation's actual recorded behavior.
"""

import re

import jax.numpy as jnp
import numpy as np
import pytest

BVH_TESTS_H = "/root/reference/include/bvh_tests.h"
TOL = 1e-5  # reference compare_points tolerance (tests.cpp:10-14)

_FLOAT = r"(-?\d+(?:\.\d+)?(?:e-?\d+)?)f?"
_RAY_RE = re.compile(
    r"Ray\(Point\(" + r",\s*".join([_FLOAT] * 3) + r"\),\s*Vector\("
    + r",\s*".join([_FLOAT] * 3) + r"\)\)"
)
_POINT_RE = re.compile(r"Point\(" + r",\s*".join([_FLOAT] * 3) + r"\)")


def _parse_golden_data():
    """-> (hit_rays [R,6], hit_points [R,3], miss_rays [M,6]) float32."""
    with open(BVH_TESTS_H) as f:
        text = f.read()
    # three sections, in file order: hitting rays, expected points, miss rays
    hit_sec = text.split("create_ray_inter_vector()")[1]
    pts_sec = hit_sec.split("create_ray_inter_result_points()")[1]
    miss_sec = pts_sec.split("bvh_test_rays_no_inter")[1]
    hit_sec = hit_sec.split("create_ray_inter_result_points()")[0]
    pts_sec = pts_sec.split("bvh_test_rays_no_inter")[0]

    hit_rays = np.array(
        [[float(g) for g in m] for m in _RAY_RE.findall(hit_sec)], np.float32
    )
    miss_rays = np.array(
        [[float(g) for g in m] for m in _RAY_RE.findall(miss_sec)], np.float32
    )
    # the points section contains bare Point(...) entries only
    pts = np.array(
        [[float(g) for g in m] for m in _POINT_RE.findall(pts_sec)],
        np.float32,
    )
    assert hit_rays.shape[0] == pts.shape[0] == 572, (
        hit_rays.shape, pts.shape
    )
    assert miss_rays.shape[0] == 222, miss_rays.shape
    return hit_rays, pts, miss_rays


@pytest.fixture(scope="module")
def golden():
    return _parse_golden_data()


def _pad_rays(rays_o, rays_d, multiple=64):
    """Pad ray count to a friendly batch size (budgets assume batches)."""
    n = rays_o.shape[0]
    pad = (-n) % multiple
    if pad:
        rays_o = np.concatenate(
            [rays_o, np.tile(rays_o[-1:], (pad, 1))], axis=0
        )
        rays_d = np.concatenate(
            [rays_d, np.tile(rays_d[-1:], (pad, 1))], axis=0
        )
    return rays_o, rays_d, n


def _closest_t(backend, scene, rays):
    """Run one intersector; returns (t [R], prim [R]) for the given rays."""
    o, d, n = _pad_rays(rays[:, :3], rays[:, 3:])
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    if backend == "brute":
        from sycl_ray_tracing_tpu.ops.intersect import intersect_triangles

        hit = intersect_triangles(o, d, scene.triangles)
        prim = jnp.where(hit.hit, hit.prim, -1)
        return np.asarray(hit.t)[:n], np.asarray(prim)[:n]
    if backend == "bvh":
        from sycl_ray_tracing_tpu.ops.bvh import build_bvh, closest_prim

        bvh = build_bvh(np.asarray(scene.triangles))
        t, prim = closest_prim(bvh, o, d)
        return np.asarray(t)[:n], np.asarray(prim)[:n]
    if backend == "cluster":
        from sycl_ray_tracing_tpu.ops.cluster import build_clusters, closest_hit

        clusters = build_clusters(np.asarray(scene.triangles))
        t, prim, overflow = closest_hit(clusters, o, d)
        assert not bool(overflow)
        return np.asarray(t)[:n], np.asarray(prim)[:n]
    raise ValueError(backend)


@pytest.mark.parametrize("backend", ["brute", "bvh", "cluster"])
def test_golden_hit_rays(backend, cornell_scene, golden):
    """All 572 recorded rays hit, at the reference's recorded points."""
    from sycl_ray_tracing_tpu.ops.intersect import BIG_T

    hit_rays, expected_pts, _ = golden
    t, prim = _closest_t(backend, cornell_scene, hit_rays)
    assert (t < BIG_T).all(), (
        f"{backend}: {(t >= BIG_T).sum()} recorded hit rays missed"
    )
    assert (prim >= 0).all()
    pts = hit_rays[:, :3] + t[:, None] * hit_rays[:, 3:]
    err = np.abs(pts - expected_pts).max(axis=1)
    bad = err > TOL
    assert not bad.any(), (
        f"{backend}: {bad.sum()}/572 golden points off; worst {err.max():.2e}"
    )


@pytest.mark.parametrize("backend", ["brute", "bvh", "cluster"])
def test_golden_miss_rays(backend, cornell_scene, golden):
    """All 222 recorded miss rays find no intersection."""
    from sycl_ray_tracing_tpu.ops.intersect import BIG_T

    _, _, miss_rays = golden
    t, prim = _closest_t(backend, cornell_scene, miss_rays)
    assert (t >= BIG_T).all(), (
        f"{backend}: {(t < BIG_T).sum()} recorded miss rays reported a hit"
    )
    assert (prim < 0).all()


def test_small_flat_bvh_fixture():
    """The reference's only hand-built unit fixture (tests.cpp:60-101):
    9 flat triangles stacked along -z; the axis ray from the origin must
    hit the NEAREST one at exactly (0, 0, -2) — through every backend."""
    import jax.numpy as jnp

    from sycl_ray_tracing_tpu.ops import bvh as bvh_mod
    from sycl_ray_tracing_tpu.ops import cluster as cl
    from sycl_ray_tracing_tpu.ops.intersect import intersect_triangles
    from sycl_ray_tracing_tpu.ops.pallas import listtrace as lt

    tris = np.array(
        [
            [[0, 0, -2], [2, 0, -2], [1, 1, -2]],
            [[0, 0, -3], [2, 0, -3], [1, 1, -3]],
            [[0, 0, -4], [2, 0, -4], [1, 1, -4]],
            [[0, 0, -5], [2, 0, -5], [1, 1, -5]],
            [[0, 0, -6], [2, 0, -6], [1, 1, -6]],
            [[-2, 0, -2], [0, 0, -2], [-1, 1, -2]],
            [[2, 0, -3], [4, 0, -3], [3, 1, -3]],
            [[0, -2, -4], [2, -2, -4], [1, -1, -4]],
            [[0, -2, -5], [2, -2, -5], [1, -1, -5]],
        ],
        np.float32,
    )
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    expected = np.array([0.0, 0.0, -2.0])

    hit = intersect_triangles(o, d, jnp.asarray(tris))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(np.asarray(hit.point[0]), expected,
                               atol=1e-5)

    bvh = bvh_mod.build_bvh(tris)
    t, prim = bvh_mod.closest_prim(bvh, o, d)
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)

    cs = cl.build_clusters(tris)
    t, prim, _of = cl.closest_hit(cs.with_budgets(64, 64), o, d)
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)

    t, prim, _of = lt.closest_hit(cs, o, d)
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)
