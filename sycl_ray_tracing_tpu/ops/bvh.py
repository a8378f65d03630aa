"""Threaded BVH: Morton-ordered build + stackless skip-link traversal.

TPU-first replacement for the reference's acceleration structures:
  * build: triangles are sorted by Morton code of their AABB centroid and a
    *balanced* binary tree is erected over equal index ranges — an LBVH-style
    GPU construction (SURVEY.md §7.4), fully vectorized in numpy, replacing
    the sequential 8-way octree insertion of bvh.h:83-125
  * layout: one flat SoA node array in DFS preorder — the capability target
    is the reference's FlattenedBVH (flattened_bvh.h:25-39) but with AABBs
    instead of 7-plane k-DOPs (bounding_volume.h) and with *skip links*
    instead of a 100k-entry traversal stack (bvh_constants.h:6)
  * traversal: every ray carries ONE integer (current node).  Box hit on an
    internal node -> descend (node+1); miss or finished leaf -> skip link.
    All rays march in lockstep under ``lax.while_loop`` with masks — no
    per-lane stacks, no divergence, pure gather+VPU work, which is what maps
    onto TPU vector units.
  * the traversal (discrete argmin) runs under stop_gradient; the winning
    primitive's hit record is then *recomputed differentiably*, so camera /
    geometry gradients flow exactly like the brute-force oracle's.

Correctness contract: identical closest-hit results (t, prim) to
ops.intersect.intersect_triangles — enforced by tests/test_bvh.py on random
and recorded ray suites (the generalization of the reference's golden-ray
regression data, bvh_tests.h).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sycl_ray_tracing_tpu.ops.intersect import BIG_T, Hit, _finalize_tri_hit
from sycl_ray_tracing_tpu.ops.safe_math import EPS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ThreadedBVH:
    """Flat threaded BVH (DFS preorder, skip links).

    M nodes; leaves reference contiguous ranges of ``tri_order``.
    """

    aabb_min: jnp.ndarray   # [M,3]
    aabb_max: jnp.ndarray   # [M,3]
    first: jnp.ndarray      # [M] leaf: start into tri_order; internal: 0
    count: jnp.ndarray      # [M] leaf: #tris (may be 0 for padding); internal: -1
    skip: jnp.ndarray       # [M] next DFS node after this subtree; M = end
    tri_order: jnp.ndarray  # [N] permutation of triangle indices
    leaf_size: int = dataclasses.field(
        default=4, metadata=dict(static=True)
    )

    @property
    def num_nodes(self) -> int:
        return self.aabb_min.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coords -> 30-bit Morton codes. x: [N,3] in [0,1]."""
    q = np.clip((x * 1024.0), 0, 1023).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (
        (spread(q[:, 0]) << np.uint64(2))
        | (spread(q[:, 1]) << np.uint64(1))
        | spread(q[:, 2])
    )


def build_bvh(triangles: np.ndarray, leaf_size: int = 4) -> ThreadedBVH:
    """Build a threaded BVH over triangles [N,3,3] (host-side, numpy).

    Morton-sort + balanced index-range tree: O(N log N), fully vectorized —
    every level's AABBs are one reshape+min/max over the level below.
    """
    tris = np.asarray(triangles, np.float32)
    n = tris.shape[0]
    tmin = tris.min(axis=1)  # [N,3]
    tmax = tris.max(axis=1)
    centroid = 0.5 * (tmin + tmax)
    lo = centroid.min(axis=0)
    span = np.maximum(centroid.max(axis=0) - lo, 1e-12)
    codes = _morton3((centroid - lo) / span)
    order = np.argsort(codes, kind="stable").astype(np.int32)

    k0 = max(1, -(-n // leaf_size))          # number of real leaves
    depth = max(0, int(np.ceil(np.log2(k0))))
    k = 1 << depth                            # padded leaf count
    m = 2 * k - 1                             # total nodes

    # leaf AABBs over sorted ranges (padded with empty boxes)
    smin = tmin[order]
    smax = tmax[order]
    pad = k * leaf_size - n
    big = np.float32(3e38)
    smin = np.concatenate([smin, np.full((pad, 3), big, np.float32)])
    smax = np.concatenate([smax, np.full((pad, 3), -big, np.float32)])
    leaf_min = smin.reshape(k, leaf_size, 3).min(axis=1)   # [K,3]
    leaf_max = smax.reshape(k, leaf_size, 3).max(axis=1)

    # per-level AABBs, bottom-up
    mins = [leaf_min]
    maxs = [leaf_max]
    while mins[-1].shape[0] > 1:
        a = mins[-1].reshape(-1, 2, 3)
        b = maxs[-1].reshape(-1, 2, 3)
        mins.append(a.min(axis=1))
        maxs.append(b.max(axis=1))
    mins = mins[::-1]  # mins[d]: level d (root = level 0)
    maxs = maxs[::-1]

    # DFS preorder positions, level by level.
    # subtree size at level d: S(d) = 2^(depth-d+1) - 1
    aabb_min = np.zeros((m, 3), np.float32)
    aabb_max = np.zeros((m, 3), np.float32)
    first = np.zeros((m,), np.int32)
    count = np.full((m,), -1, np.int32)
    skip = np.zeros((m,), np.int32)

    pos = np.zeros((1,), np.int64)  # root at 0
    for d in range(depth + 1):
        s = (1 << (depth - d + 1)) - 1       # size of a subtree rooted here
        aabb_min[pos] = mins[d]
        aabb_max[pos] = maxs[d]
        skip[pos] = pos + s
        if d == depth:                        # leaves
            leaf_ids = np.arange(k, dtype=np.int64)
            first[pos] = (leaf_ids * leaf_size).astype(np.int32)
            count[pos] = np.clip(n - leaf_ids * leaf_size, 0, leaf_size).astype(
                np.int32
            )
        else:
            child_s = (1 << (depth - d)) - 1
            left = pos + 1
            right = pos + 1 + child_s
            pos = np.stack([left, right], axis=1).reshape(-1)

    return ThreadedBVH(
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
        first=jnp.asarray(first),
        count=jnp.asarray(count),
        skip=jnp.asarray(skip),
        tri_order=jnp.asarray(order),
        leaf_size=leaf_size,
    )


def _slab_test(bmin, bmax, o, inv_d, t_best):
    """Ray/AABB slab test bounded by the current best hit distance."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar) & (tfar > EPS) & (tnear < t_best)


def _leaf_intersect(tris, tri_order, first, count, leaf_size, o, d, best_t, best_prim):
    """Test up to ``leaf_size`` triangles of each ray's current leaf."""
    lane = jnp.arange(leaf_size, dtype=jnp.int32)            # [L]
    slot = first[:, None] + lane[None, :]                    # [B,L]
    n = tri_order.shape[0]
    tri_idx = tri_order[jnp.clip(slot, 0, n - 1)]            # [B,L]
    valid_slot = lane[None, :] < count[:, None]

    tri = tris[tri_idx]                                      # [B,L,3,3]
    va = tri[..., 0, :]
    e1 = tri[..., 1, :] - va
    e2 = tri[..., 2, :] - va
    dv = d[:, None, :]
    ov = o[:, None, :]
    h = jnp.cross(dv, e2)
    a = jnp.sum(e1 * h, axis=-1)
    parallel = jnp.abs(a) < EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = ov - va
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(dv * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    ok = (
        valid_slot
        & (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPS)
    )
    t = jnp.where(ok, t, BIG_T)                              # [B,L]
    lane_best = jnp.argmin(t, axis=1)                        # [B]
    lane_t = jnp.take_along_axis(t, lane_best[:, None], axis=1)[:, 0]
    lane_prim = jnp.take_along_axis(tri_idx, lane_best[:, None], axis=1)[:, 0]
    better = lane_t < best_t
    return (
        jnp.where(better, lane_t, best_t),
        jnp.where(better, lane_prim, best_prim),
    )


def closest_prim(bvh: ThreadedBVH, tris, ray_o, ray_d):
    """Lockstep threaded traversal.  Returns (best_t [B], best_prim [B];
    prim = -1 on miss).  Non-differentiable (discrete search)."""
    leaf_size = bvh.leaf_size
    B = ray_o.shape[0]
    m = bvh.num_nodes

    # robust finite inverse direction (no inf*0 NaNs in the slab test)
    sign = jnp.where(ray_d < 0, -1.0, 1.0)
    inv_d = sign / jnp.maximum(jnp.abs(ray_d), 1e-30)

    def cond(state):
        node, _, _ = state
        return jnp.any(node < m)

    def body(state):
        node, best_t, best_prim = state
        nc = jnp.clip(node, 0, m - 1)
        bmin = bvh.aabb_min[nc]
        bmax = bvh.aabb_max[nc]
        cnt = bvh.count[nc]
        first = bvh.first[nc]
        skp = bvh.skip[nc]
        active = node < m

        box_hit = _slab_test(bmin, bmax, ray_o, inv_d, best_t) & active
        is_leaf = cnt >= 0

        do_leaf = box_hit & is_leaf
        lt, lp = _leaf_intersect(
            tris, bvh.tri_order,
            jnp.where(do_leaf, first, 0),
            jnp.where(do_leaf, cnt, 0),
            leaf_size, ray_o, ray_d, best_t, best_prim,
        )
        best_t = jnp.where(do_leaf, lt, best_t)
        best_prim = jnp.where(do_leaf, lp, best_prim)

        descend = box_hit & (~is_leaf)
        nxt = jnp.where(descend, node + 1, skp)
        node = jnp.where(active, nxt, node)
        return node, best_t, best_prim

    node0 = jnp.zeros((B,), jnp.int32)
    t0 = jnp.full((B,), BIG_T, jnp.float32)
    p0 = jnp.full((B,), -1, jnp.int32)
    _, best_t, best_prim = jax.lax.while_loop(cond, body, (node0, t0, p0))
    return best_t, best_prim


def intersect_bvh(bvh: ThreadedBVH, tris, ray_o, ray_d) -> Hit:
    """Closest-hit via BVH, differentiable hit record.

    The discrete search runs under stop_gradient; the winning triangle's
    t/point/normal/uv are recomputed differentiably (same recipe as the
    brute-force path, ops.intersect._finalize_tri_hit).
    """
    o_ng = jax.lax.stop_gradient(ray_o)
    d_ng = jax.lax.stop_gradient(ray_d)
    _, prim = closest_prim(bvh, jax.lax.stop_gradient(tris), o_ng, d_ng)

    safe_prim = jnp.maximum(prim, 0)
    from sycl_ray_tracing_tpu.ops.intersect import moller_trumbore

    t, _, _, valid = moller_trumbore(ray_o, ray_d, tris[safe_prim])
    found = (prim >= 0) & valid
    best_t = jnp.where(found, t, BIG_T)
    # _finalize_tri_hit recomputes point/normal/uv differentiably and sets
    # hit = best_t < BIG_T, which equals ``found`` by construction
    return _finalize_tri_hit(ray_o, ray_d, tris, safe_prim, best_t)
