"""Pallas TPU list tracer: per-ray exact traversal over precomputed
nearest-first candidate-cluster lists.

Why this shape: block-level culling (ops/pallas/traverse.py) is ideal for
coherent primaries but dilutes badly on incoherent bounce/shadow rays —
measured on the 200k-tri stand-in, a 128-ray block touches ~590 clusters
while each ray needs only ~6-16, and even 8-ray blocks share almost
nothing.  The XLA wavefront tracer (ops/cluster.py) does exact per-pair
work but pays ~112ns/pair of materialization glue (pair compaction,
per-pair HBM row-gathers, segment reductions) around ~6ns/pair of actual
intersection math.  This kernel keeps the exact-work property and deletes
the glue:

  * XLA side (ops/cluster.py:candidate_clusters): ONE dense [B,K2] slab
    pass + ``maxc`` packed-key min-rounds produce, per ray, its hit
    clusters in entry-t order — fixed [B,maxc] arrays, no compaction, no
    sorts, no pair budgets.
  * Kernel: 8 rays per block (one vreg sublane group).  Round r loads
    each ray's r-th candidate triangle tile from the VMEM-resident scene
    (leading-dim dynamic index, 4.6 KB each), stacks them per-coordinate,
    and runs ONE (8,128) Moller-Trumbore tile — every sublane intersects
    its OWN cluster: zero cross-ray dilution.
  * Early termination: per-ray candidate entry-t is monotone over rounds,
    so "no ray has tn_r < best_t" is a permanent stop condition; each
    remaining round is predicated off with pl.when (~10 cycles).
  * Per-ray (t, winner) accumulate in the output refs across rounds — the
    XLA tracer's segment_min/segment_max tail (17 ms at 32k rays) does
    not exist here.

Reference equivalent: flattened-BVH traversal + Triangle::intersect
(flattened_bvh.cpp:10-58, triangle.h:16-60): same capability (closest-hit
and any-hit with t_max), TPU-first shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_ray_tracing_tpu.ops.cluster import (
    SHADOW_EPS,
    T_CLUSTER,
    ClusterScene,
    candidate_clusters,
)
from sycl_ray_tracing_tpu.ops.intersect import BIG_T, Hit
from sycl_ray_tracing_tpu.ops.safe_math import EPS

RB = 8            # rays per block = one sublane group
DEFAULT_MAXC = 32  # candidate slots per ray (overflow flagged beyond)

# VMEM cap for the resident triangle table; larger scenes fall back to the
# XLA cluster tracer (a third hierarchy level is the planned fix).
VMEM_SCENE_BYTES = 12 * 1024 * 1024


def fits_in_vmem(scene: ClusterScene) -> bool:
    return (
        scene.num_clusters <= 2048  # candidate_clusters 11-bit id packing
        and scene.num_clusters * 9 * T_CLUSTER * 4 <= VMEM_SCENE_BYTES
    )


def _mt8(ax, ay, az, bx, by, bz, cx, cy, cz, ox, oy, oz, dx, dy, dz, tl):
    """Moller-Trumbore: per-sublane triangle planes (RB,T) vs per-sublane
    ray columns (RB,1) -> t (RB,T), BIG_T where miss or t >= tl.
    triangle.h:16-60 semantics, EPS=1e-7; t_lim folded in (t_lim is BIG_T
    for closest-hit, t_max - SHADOW_EPS for occlusion)."""
    e1x, e1y, e1z = bx - ax, by - ay, bz - az
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
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
        & (t < tl)
    )
    return jnp.where(ok, t, BIG_T)


def _list_kernel_impl(cand_s, cand_v_ref, ctn_ref, rays_ref, tris_ref,
                      t_ref, id_ref, stk_ref, *, maxc, any_hit):
    """One 8-ray block over its candidate lists.

    cand_s:     (RB, maxc) i32 SMEM   candidate cluster per (ray, round)
    cand_v_ref: (RB, maxc) i32 VMEM   same data, vector access
    ctn_ref:    (RB, maxc) f32 VMEM   candidate entry-t (BIG_T empty)
    rays_ref:   (RB, 8)    f32 VMEM   o3 d3 t_lim pad
    tris_ref:   (K2, 9, T) f32 VMEM   resident triangle coordinate tiles
    t_ref:      (RB, 1)    f32        best t (t_lim if miss)
    id_ref:     (RB, 1)    i32        packed cluster*T+lane (-1 miss)
    stk_ref:    (9, RB, T) f32 scratch: per-coordinate stacked tiles
    """
    rays = rays_ref[:]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    tl = rays[:, 6:7]
    t_ref[:] = tl
    id_ref[:] = jnp.full((RB, 1), -1, jnp.int32)

    for r in range(maxc):
        tn_r = ctn_ref[:, r:r + 1]                       # (RB,1)
        bt = t_ref[:]
        useful = tn_r < bt
        if any_hit:
            useful = useful & (id_ref[:] < 0)

        @pl.when(jnp.any(useful))
        def _round(r=r):
            for i in range(RB):
                k = jnp.maximum(cand_s[i, r], 0)
                tile = tris_ref[k]                       # (9, T)
                for c in range(9):
                    stk_ref[c, i:i + 1, :] = tile[c:c + 1, :]
            planes = [stk_ref[c] for c in range(9)]      # 9 x (RB, T)
            t = _mt8(*planes, ox, oy, oz, dx, dy, dz, tl)
            kvec = cand_v_ref[:, r:r + 1]                # (RB,1)
            t = jnp.where(kvec >= 0, t, BIG_T)
            tmin = jnp.min(t, axis=1, keepdims=True)
            lanes = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            lane = jnp.min(
                jnp.where(t <= tmin, lanes, T_CLUSTER), axis=1,
                keepdims=True,
            )
            packed = kvec * T_CLUSTER + lane
            bt0 = t_ref[:]
            upd = tmin < bt0
            t_ref[:] = jnp.where(upd, tmin, bt0)
            id_ref[:] = jnp.where(upd, packed, id_ref[:])


def _run(scene: ClusterScene, ray_o, ray_d, t_lim, maxc, any_hit):
    """Candidate lists (XLA) + list kernel.  Returns (t, packed, overflow)."""
    B = ray_o.shape[0]
    nb = -(-B // RB)
    pad = nb * RB - B
    cand, ctn, overflow = candidate_clusters(scene, ray_o, ray_d, t_lim,
                                             maxc)
    rays = jnp.concatenate(
        [ray_o, ray_d, t_lim[:, None], jnp.zeros((B, 1), ray_o.dtype)],
        axis=1,
    )
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), rays.dtype)], 0)
        cand = jnp.concatenate(
            [cand, jnp.full((pad, maxc), -1, jnp.int32)], 0)
        ctn = jnp.concatenate([ctn, jnp.full((pad, maxc), BIG_T)], 0)

    k2 = scene.num_clusters
    tris = scene.cl_tris.reshape(k2, 9, T_CLUSTER)
    kernel = functools.partial(_list_kernel_impl, maxc=maxc,
                               any_hit=any_hit)
    interpret = jax.default_backend() != "tpu"
    t, packed = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RB, maxc), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),        # cand scalar
            pl.BlockSpec((RB, maxc), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),        # cand vector
            pl.BlockSpec((RB, maxc), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),        # entry-t
            pl.BlockSpec((RB, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),        # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),        # triangle tiles
        ],
        out_specs=(
            pl.BlockSpec((RB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * RB, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb * RB, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((9, RB, T_CLUSTER), jnp.float32)],
        interpret=interpret,
    )(cand, cand, ctn, rays, tris)
    return t[:B, 0], packed[:B, 0], overflow


def closest_hit(scene: ClusterScene, ray_o, ray_d,
                maxc: int = DEFAULT_MAXC):
    """Closest-hit for rays [B,3] -> (t [B], prim [B] i32 -1 on miss,
    overflow) — overflow True iff some ray hit more than ``maxc`` cluster
    boxes (possible dropped hits, like the XLA tracer's pair budgets)."""
    if not fits_in_vmem(scene):
        raise ValueError(
            f"scene too large for the VMEM list tracer "
            f"({scene.num_clusters} clusters); use the XLA cluster tracer"
        )
    B = ray_o.shape[0]
    t_lim = jnp.full((B,), BIG_T, ray_o.dtype)
    t, packed, overflow = _run(scene, ray_o, ray_d, t_lim, maxc,
                               any_hit=False)
    hit = packed >= 0
    win = jnp.maximum(packed, 0)
    prim = scene.cl_tri_idx[win // T_CLUSTER, win % T_CLUSTER]
    prim = jnp.where(hit & (t < BIG_T), prim, -1)
    return jnp.where(hit, t, BIG_T), prim, overflow


def any_hit(scene: ClusterScene, ray_o, ray_d, t_max,
            maxc: int = DEFAULT_MAXC):
    """Occlusion: True where any triangle lies at t < t_max - SHADOW_EPS
    (reference evaluate_shadow_ray slack, render_kernel.cpp:744-759).
    Returns (blocked [B] bool, overflow)."""
    if not fits_in_vmem(scene):
        raise ValueError("scene too large for the VMEM list tracer")
    t, packed, overflow = _run(
        scene, ray_o, ray_d, t_max - SHADOW_EPS, maxc, any_hit=True
    )
    return packed >= 0, overflow


def intersect_list(scene: ClusterScene, tris, ray_o, ray_d,
                   of: list | None = None) -> Hit:
    """Closest-hit with a differentiable hit record (stop-gradient +
    finalize recompute, same recipe as ops.cluster.intersect_clusters)."""
    from sycl_ray_tracing_tpu.ops.intersect import finalize_hit

    o_ng = jax.lax.stop_gradient(ray_o)
    d_ng = jax.lax.stop_gradient(ray_d)
    _, prim, overflow = closest_hit(scene, o_ng, d_ng)
    if of is not None:
        of.append(overflow)
    return finalize_hit(ray_o, ray_d, tris, prim)
