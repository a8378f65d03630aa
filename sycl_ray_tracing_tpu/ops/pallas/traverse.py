"""Pallas TPU traversal megakernel: blocked two-level cluster traversal
with the whole scene resident in VMEM.

This is the kernel the north star names (BASELINE.json: Pallas traversal +
Moller-Trumbore).  It replaces the XLA wavefront cluster tracer's
pair-expansion pipeline (ops/cluster.py) whose cost is dominated by
per-pair HBM row-gathers at ~55 GB/s (7% of peak) plus sort-based
compactions at ~6 ms per pass.  Design:

  * The clustered scene (triangle planes [K2,9,T], child boxes [K1,8,S],
    supercluster boxes) lives ENTIRELY in VMEM for the whole sweep — a
    200k-triangle scene is 7.2 MB; HBM is touched only to stream ray
    blocks in and hit records out.  The per-pair gather cost of the XLA
    path (~4.6 KB per (ray,cluster) pair from HBM) becomes a VMEM read.
  * Rays are processed in blocks of RT=128.  Per block: one dense
    [RT, K1] supercluster slab test, then a data-dependent loop over the
    superclusters ANY ray in the block hit (rank-select via a
    lower-triangular-matmul prefix sum — cumsum has no Mosaic lowering),
    then the same one level down, then scalarized Moller-Trumbore on
    [RT, T] tiles against each surviving cluster.
  * Block-level culling replaces per-ray compaction: a cluster is tested
    by all RT rays if ANY of them hits its box.  Coherent blocks (camera
    rays, sorted wavefronts) visit a handful of clusters; fully random
    blocks degrade toward the dense sweep, so callers should keep rays
    spatially ordered (image-tile order does this for primaries).

Reference equivalent: the flattened-BVH traversal (flattened_bvh.cpp:10-58)
+ Triangle::intersect (triangle.h:16-60).  Same capability (closest-hit,
any-hit with t_max), TPU-first shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_ray_tracing_tpu.ops.cluster import (
    S_CLUSTER,
    SHADOW_EPS,
    T_CLUSTER,
    ClusterScene,
)
from sycl_ray_tracing_tpu.ops.intersect import BIG_T, Hit
from sycl_ray_tracing_tpu.ops.safe_math import EPS

RT = 128          # rays per block
_SC_PAD = 128     # supercluster lane padding (cap: 128 superclusters)

# VMEM cap for the resident scene (triangle planes dominate); beyond this
# the caller must fall back to the HBM-streaming XLA cluster tracer.
VMEM_SCENE_BYTES = 12 * 1024 * 1024


def fits_in_vmem(scene: ClusterScene) -> bool:
    k2 = scene.num_clusters
    return (
        scene.num_superclusters <= _SC_PAD
        and k2 * 9 * T_CLUSTER * 4 <= VMEM_SCENE_BYTES
    )


def _nearest_lane(rem):
    """Lane index of the minimum of ``rem`` (1, L) (first on ties)."""
    L = rem.shape[1]
    mn = jnp.min(rem)
    lanes = jax.lax.broadcasted_iota(jnp.int32, rem.shape, 1)
    return jnp.min(jnp.where(rem <= mn, lanes, L)), mn


def _slab_planes(planes, ox, oy, oz, ix, iy, iz, t_lim):
    """AABB slab test: coordinate planes (6+, L) vs per-ray columns (RT,1).

    Returns (hit (RT, L) bool, tnear (RT, L)).  Rows of ``planes``:
    minx,miny,minz,maxx,maxy,maxz.  Matches ops/cluster.py:_slab_dense
    semantics (tnear <= tfar, tfar > EPS, tnear < t_lim).
    """
    x0 = (planes[0:1, :] - ox) * ix
    y0 = (planes[1:2, :] - oy) * iy
    z0 = (planes[2:3, :] - oz) * iz
    x1 = (planes[3:4, :] - ox) * ix
    y1 = (planes[4:5, :] - oy) * iy
    z1 = (planes[5:6, :] - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(x0, x1), jnp.minimum(y0, y1)),
        jnp.minimum(z0, z1),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(x0, x1), jnp.maximum(y0, y1)),
        jnp.maximum(z0, z1),
    )
    hit = (tnear <= tfar) & (tfar > EPS) & (tnear < t_lim)
    return hit, tnear


def _mt_tile(tri, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore: tri planes (9, T) vs per-ray columns (RT, 1)
    -> t (RT, T) with BIG_T fills (triangle.h:16-60 semantics, EPS=1e-7)."""
    ax, ay, az = tri[0:1, :], tri[1:2, :], tri[2:3, :]
    e1x = tri[3:4, :] - ax
    e1y = tri[4:5, :] - ay
    e1z = tri[5:6, :] - az
    e2x = tri[6:7, :] - ax
    e2y = tri[7:8, :] - ay
    e2z = tri[8:9, :] - az

    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    parallel = jnp.abs(a) < EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    sx, sy, sz = ox - ax, oy - ay, oz - az
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPS)
    )
    return jnp.where(ok, t, BIG_T)


def _ray_columns(rays):
    """rays (RT, 8) -> o/d columns (RT,1) + guarded inverse direction."""
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]

    def inv(d):
        sign = jnp.where(d < 0, -1.0, 1.0)
        return sign / jnp.maximum(jnp.abs(d), 1e-30)

    return ox, oy, oz, dx, dy, dz, inv(dx), inv(dy), inv(dz)


def _traverse_kernel(sc_ref, clbox_ref, tris_ref, rays_ref,
                     t_ref, id_ref, *, k1, any_hit):
    """One ray block against the VMEM-resident scene, nearest-first.

    Both levels loop over boxes in order of increasing block entry-t
    (min over rays of max(tnear, 0)), and re-cull before every visit:
    a box is *alive* only for rays whose current best_t still exceeds
    its entry-t (for occlusion, only for still-unblocked rays).  As
    rays find hits, best_t shrinks and boxes behind hit points go
    stale without being visited — per-ray early termination expressed
    block-wide.  The loop exits when no alive box remains.

    sc_ref:    (8, _SC_PAD) f32   supercluster coordinate planes
    clbox_ref: (K1, 8, S)   f32   child cluster planes per supercluster
    tris_ref:  (K2, 9, T)   f32   triangle coordinate planes per cluster
    rays_ref:  (RT, 8)      f32   o3 d3 t_lim pad
    t_ref:     (RT, 1)      f32   closest t (or t of any blocker)
    id_ref:    (RT, 1)      i32   packed cluster*T+lane winner (-1 miss)
    """
    rays = rays_ref[:]
    ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_columns(rays)
    t_lim = rays[:, 6:7]                                    # (RT,1)

    m1, tn1 = _slab_planes(sc_ref, ox, oy, oz, ix, iy, iz, t_lim)
    tn1v = jnp.where(m1, jnp.maximum(tn1, 0.0), BIG_T)      # (RT,_SC_PAD)
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, _SC_PAD), 1)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, S_CLUSTER), 1)

    def _next(mv, bt, bi, done):
        """Nearest still-useful lane given per-(ray,box) entry-t ``mv``
        (BIG_T where no box hit), current bests, and a (1,L) row that
        is BIG_T on already-visited lanes."""
        alive = mv < bt                                     # (RT, L)
        if any_hit:
            alive = alive & (bi < 0)
        rem = jnp.min(jnp.where(alive, mv, BIG_T), axis=0, keepdims=True)
        return _nearest_lane(jnp.maximum(rem, done))

    def cl_process(k, bt, bi):
        tri = tris_ref[k]                                   # (9, T)
        t = _mt_tile(tri, ox, oy, oz, dx, dy, dz)           # (RT, T)
        tmin = jnp.min(t, axis=1, keepdims=True)            # (RT, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        lane = jnp.min(
            jnp.where(t <= tmin, lanes, T_CLUSTER), axis=1, keepdims=True
        )
        packed = k * T_CLUSTER + lane
        upd = tmin < bt
        bt = jnp.where(upd, tmin, bt)
        bi = jnp.where(upd, packed, bi)
        return bt, bi

    def sc_process(s, bt, bi):
        planes = clbox_ref[s]                               # (8, S)
        m2, tn2 = _slab_planes(planes, ox, oy, oz, ix, iy, iz, bt)
        tn2v = jnp.where(m2, jnp.maximum(tn2, 0.0), BIG_T)

        def cond2(state):
            lane, mn, *_ = state
            return mn < BIG_T

        def body2(state):
            lane, mn, bt, bi, done = state
            k = s * S_CLUSTER + jnp.minimum(lane, S_CLUSTER - 1)
            bt, bi = cl_process(k, bt, bi)
            done = jnp.where(lanes2 == lane, BIG_T, done)
            nlane, nmn = _next(tn2v, bt, bi, done)
            return nlane, nmn, bt, bi, done

        done2 = jnp.zeros((1, S_CLUSTER), jnp.float32)
        lane0, mn0 = _next(tn2v, bt, bi, done2)
        _, _, bt, bi, _ = jax.lax.while_loop(
            cond2, body2, (lane0, mn0, bt, bi, done2)
        )
        return bt, bi

    def cond1(state):
        lane, mn, *_ = state
        return mn < BIG_T

    def body1(state):
        lane, mn, bt, bi, done = state
        s = jnp.minimum(lane, k1 - 1)
        bt, bi = sc_process(s, bt, bi)
        done = jnp.where(lanes1 == lane, BIG_T, done)
        nlane, nmn = _next(tn1v, bt, bi, done)
        return nlane, nmn, bt, bi, done

    best_t = jnp.broadcast_to(t_lim, (RT, 1))
    best_id = jnp.full((RT, 1), -1, jnp.int32)
    done1 = jnp.zeros((1, _SC_PAD), jnp.float32)
    lane0, mn0 = _next(tn1v, best_t, best_id, done1)
    _, _, best_t, best_id, _ = jax.lax.while_loop(
        cond1, body1, (lane0, mn0, best_t, best_id, done1)
    )
    t_ref[:] = best_t
    id_ref[:] = best_id


def _scene_tables(scene: ClusterScene):
    """Reshape the cluster tables into the kernel's plane layouts (views,
    no copies: all reshapes preserve row-major order)."""
    k1 = scene.num_superclusters
    k2 = scene.num_clusters
    # sc planes [8, _SC_PAD]: rows minx..maxz from sc_box [K1,8]
    sc = jnp.transpose(scene.sc_box, (1, 0))                 # [8, K1]
    pad = _SC_PAD - k1
    # padding superclusters: min=max=+big => always-miss sentinel
    fill = jnp.full((8, pad), 3e38, scene.sc_box.dtype)
    sc_planes = jnp.concatenate([sc, fill], axis=1)
    clbox = scene.cl_box_rows.reshape(k1, 8, S_CLUSTER)
    tris = scene.cl_tris.reshape(k2, 9, T_CLUSTER)
    return sc_planes, clbox, tris


def _spread3(v):
    """Spread 8 bits of v so they occupy every third bit (Morton)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _sort_perm(scene: ClusterScene, ray_o, ray_d):
    """Spatial sort permutation: direction octant (MSBs) then Morton code
    of the origin quantized to an 8-bit grid over the scene bounds.

    RT-ray blocks become spatially/directionally coherent, which is what
    the kernel's block-level culling needs (measured on the 200k-tri
    stand-in: unsorted surface blocks touch ~970 clusters, sorted ~350,
    per-ray ideal ~19).  Cost: one 24-bit key sort + inverse-perm sort,
    ~3M keys/ms on TPU — negligible next to traversal."""
    lo = jnp.min(scene.sc_box[:, 0:3], axis=0)
    hi = jnp.max(scene.sc_box[:, 3:6], axis=0)
    q = (ray_o - lo) / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((q * 255.0), 0.0, 255.0).astype(jnp.int32)
    m = (
        (_spread3(q[:, 0]) << 2)
        | (_spread3(q[:, 1]) << 1)
        | _spread3(q[:, 2])
    )
    octant = (
        ((ray_d[:, 0] > 0).astype(jnp.int32) << 2)
        | ((ray_d[:, 1] > 0).astype(jnp.int32) << 1)
        | (ray_d[:, 2] > 0).astype(jnp.int32)
    )
    key = (octant << 24) | (m >> 3)
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm, inv


def _run(scene: ClusterScene, ray_o, ray_d, t_lim, any_hit: bool,
         sort: bool = True):
    B = ray_o.shape[0]
    nb = -(-B // RT)
    pad = nb * RT - B
    inv = None
    if sort and B > RT:
        perm, inv = _sort_perm(scene, ray_o, ray_d)
        ray_o, ray_d, t_lim = ray_o[perm], ray_d[perm], t_lim[perm]
    rays = jnp.concatenate(
        [ray_o, ray_d, t_lim[:, None], jnp.zeros((B, 1), ray_o.dtype)],
        axis=1,
    )
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.zeros((pad, 8), rays.dtype)], axis=0
        )

    sc_planes, clbox, tris = _scene_tables(scene)
    k1 = scene.num_superclusters

    kernel = functools.partial(_traverse_kernel, k1=k1, any_hit=any_hit)
    interpret = jax.default_backend() != "tpu"
    t, packed = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # sc planes
            pl.BlockSpec(memory_space=pltpu.VMEM),           # child boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),           # triangles
            pl.BlockSpec((RT, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # ray blocks
        ],
        out_specs=(
            pl.BlockSpec((RT, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * RT, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb * RT, 1), jnp.int32),
        ),
        interpret=interpret,
    )(sc_planes, clbox, tris, rays)
    t, packed = t[:B, 0], packed[:B, 0]
    if inv is not None:
        t, packed = t[inv], packed[inv]
    from sycl_ray_tracing_tpu.ops.intersect import name_traversal

    return name_traversal(t, packed)


def closest_hit(scene: ClusterScene, ray_o, ray_d):
    """Closest-hit for rays [B,3] -> (t [B], prim [B] i32, -1 on miss).

    Budget-free and overflow-free: the kernel visits exactly the clusters
    each ray block needs; nothing is dropped."""
    if not fits_in_vmem(scene):
        raise ValueError(
            f"scene too large for the VMEM kernel "
            f"({scene.num_clusters} clusters, {scene.num_superclusters} "
            f"superclusters); use the XLA cluster tracer"
        )
    B = ray_o.shape[0]
    t_lim = jnp.full((B,), BIG_T, ray_o.dtype)
    t, packed = _run(scene, ray_o, ray_d, t_lim, any_hit=False)
    hit = packed >= 0
    win = jnp.maximum(packed, 0)
    prim = scene.cl_tri_idx[win // T_CLUSTER, win % T_CLUSTER]
    prim = jnp.where(hit & (t < BIG_T), prim, -1)
    return jnp.where(hit, t, BIG_T), prim


def any_hit(scene: ClusterScene, ray_o, ray_d, t_max):
    """Occlusion: True where any triangle lies at t < t_max - SHADOW_EPS
    (reference evaluate_shadow_ray slack, render_kernel.cpp:744-759)."""
    if not fits_in_vmem(scene):
        raise ValueError("scene too large for the VMEM kernel")
    t, packed = _run(
        scene, ray_o, ray_d, t_max - SHADOW_EPS, any_hit=True
    )
    return packed >= 0


def intersect_pallas(scene: ClusterScene, tris, ray_o, ray_d,
                     of: list | None = None) -> Hit:
    """Closest-hit with a differentiable hit record (stop-gradient +
    finalize recompute, same recipe as ops.cluster.intersect_clusters).
    ``of`` accepted for dispatch symmetry; this kernel cannot overflow."""
    from sycl_ray_tracing_tpu.ops.intersect import finalize_hit

    o_ng = jax.lax.stop_gradient(ray_o)
    d_ng = jax.lax.stop_gradient(ray_d)
    _, prim = closest_hit(scene, o_ng, d_ng)
    return finalize_hit(ray_o, ray_d, tris, prim)
