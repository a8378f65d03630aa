"""Pallas TPU list tracer: exact traversal over precomputed nearest-first
candidate-cluster lists, in two kernel shapes (per-ray and block-shared).

Why this shape: block-level culling (an in-kernel hierarchical traversal,
retired in round 4 — docs/ARCHITECTURE.md "retired paths") is ideal for
coherent primaries but dilutes badly on incoherent bounce/shadow rays —
measured on the 200k-tri stand-in, a 128-ray block touches ~590 clusters
while each ray needs only ~6-16, and even 8-ray blocks share almost
nothing.  The XLA wavefront tracer (ops/cluster.py) does exact per-pair
work but pays ~112ns/pair of materialization glue (pair compaction,
per-pair HBM row-gathers, segment reductions) around ~6ns/pair of actual
intersection math.  This kernel keeps the exact-work property and deletes
the glue.

Two candidate/kernel shapes, selected by ``share``:

  * PER-RAY (share=False, the round-2 design): 8 rays per block (one vreg
    sublane group).  Round r loads each ray's r-th candidate triangle tile
    from the VMEM-resident scene (leading-dim dynamic index, 4.6 KB each),
    stacks them per-coordinate, and runs ONE (8,128) Moller-Trumbore tile —
    every sublane intersects its OWN cluster: zero cross-ray dilution.
  * BLOCK-SHARED (share=True, round 3): one candidate list per block of
    RB_SHARE spatially-sorted rays — the UNION of the block's cluster
    hits, nearest-first by block entry-t (ops/cluster.py
    candidate_clusters_grouped).  Round r loads the block's r-th candidate
    tile ONCE and intersects ALL RB_SHARE rays against it in one
    (RB_SHARE,128) MT tile.  This is the cluster-major amortization the
    per-ray kernel cannot do: the dominant per-round cost (the dynamic
    tile copy) is paid once per BLOCK instead of once per RAY, and the
    candidate extraction (a [rows,K2] threshold-min sweep whose HBM
    traffic dominated at 32k rays) runs on 1/RB_SHARE as many rows.
    The price is union dilution: rays also test block-mates' clusters
    (harmless extra lanes in an already-launched MT round).  Spatial
    sorting keeps unions tight.

Hard-won performance shape (measured on this chip, scratch/micro_copy.py
and scratch/phase_bench.py):
  * A fully pipelined straight-line round is ~140ns; EVERY (8,1)-shaped
    op (lane slice, keepdims reduce, column broadcast) forces a vreg
    relayout worth ~30ns, and EVERY data-dependent pl.when costs ~1.5us
    in pipeline serialization regardless of whether it skips.
  * So: per-round state is two full (RB,T) accumulators (elementwise min
    of t per lane + the round that produced it), ray fields are broadcast
    to (RB,T) ONCE per block, invalid candidate slots point at a
    never-hit dummy tile (index K2) instead of being masked, and the
    per-ray reduction happens in XLA on the kernel's (B,T) outputs.
  * Early termination is ONE data-dependent guard after the first
    ``GROUP`` rounds (candidate entry-t is monotone per ray, so skipped
    work is provably useless); finer-grained ACCUMULATOR-dependent guards
    cost more than the rounds they save, but the tail is additionally
    cut into ``CHUNK``-round pieces gated on the block's candidate COUNT
    — a scalar prefetched from SMEM, free of the pipeline serialization
    (see _tail_guard).  Any-hit rays carry a flag lane (rays[:,7]) so a
    blocked shadow ray stops asking for tail rounds (reference shadow
    rays are cheap by design, render_kernel.cpp:744-759).
  * Dead paths (mask=False) get t_lim=-BIG -> empty candidate lists, and
    the ray sort pushes them into trailing all-dead blocks that exit at
    the guard.

Reference equivalent: flattened-BVH traversal + Triangle::intersect
(flattened_bvh.cpp:10-58, triangle.h:16-60): same capability (closest-hit
and any-hit with t_max), TPU-first shape.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_ray_tracing_tpu.ops.cluster import (
    S_CLUSTER,
    SHADOW_EPS,
    T_CLUSTER,
    ClusterScene,
    candidate_clusters,
    candidate_clusters_grouped,
    candidate_clusters_hier,
)
from sycl_ray_tracing_tpu.ops.intersect import BIG_T, Hit, name_traversal
from sycl_ray_tracing_tpu.ops.safe_math import EPS

RB = 8             # per-ray kernel: rays per block = one sublane group
RB_SHARE = 32      # block-shared kernel: rays sharing one candidate list
DEFAULT_MAXC = 32  # per-ray candidate slots (covers the p99 of surface
                   # wavefronts; the escalation pass handles the tail)
DEFAULT_MAXC_SHARE = 128  # block-union slots.  r5 TPU A/B
                   # (scratch/kernel_shape_r5*.log, all honest
                   # overflow=False): 128 beats 96 beats 64 on the
                   # flagship frame (471.9 / 482.0 / 590.2 ms) because a
                   # DEEPER union leaves fewer full blocks, and every
                   # unblocked any-hit ray in a full block must take the
                   # per-ray escalation pass — escalation volume, not
                   # kernel rounds (count-gated), is the marginal cost.
                   # The same sweep re-confirmed RB_SHARE=32 (~tie with
                   # 16), GROUP=8, CHUNK=16 (8 ~tie, 32 regresses), and
                   # PRIMARY_SHARE=True (529.9 ms when flipped off) in
                   # the post-count-gating landscape (VERDICT r4 #7).
GROUP = 8          # unguarded leading rounds (see module docstring)
CHUNK = 16         # tail rounds per scalar-count gate (see _tail_guard)
ESC_CAP_DIV = 4    # escalation compaction: cap ~= B/4 rows (>=256).  The
                   # redo set is NOT just the ~1% closest-hit tail: every
                   # UNBLOCKED any-hit ray in a block whose union list
                   # filled is uncertifiable by the union certificate
                   # (its t_lim is BIG, so ctn_last < t_lim whenever the
                   # list is full), and sky-bound shadow rays make that
                   # several percent of a launch — and since the
                   # integrator's wavefront compaction (r5) made launches
                   # mostly-LIVE, the redo FRACTION per launch is much
                   # higher than on the old mostly-dead batches (the 870k
                   # flagship needed > B/8 on compacted launches).  B/4
                   # certifies both flagships overflow=False; the cost
                   # stays proportional to the ACTUAL redo count because
                   # the compact pass re-sorts and buckets internally.
HIER_MAXS = 16     # supercluster slots per block in the hierarchical build

# Module default for the ``share`` mode of closest_hit/any_hit/multi_query
# (callers may override per call).  Round-4 flipped this to True WITH the
# exactness escalation: the block-shared kernel amortizes tile loads and
# runs the candidate extraction on 1/RB_SHARE as many rows, and every ray
# its union certificate cannot prove is re-run through a per-ray pass —
# measured on the flagship dragon frame (scratch/frame_ab_r4.log):
# share mc=96 + escalation 2.56 Mrays/s overflow=False vs per-ray exact
# 2.15 / per-ray unhandled-tail 2.37.  Union dilution (rounds) is nearly
# free — the kernel is block-fixed-cost-bound (scratch/phase_bench4:
# ~2.4us/block fixed vs ~61ns/round).
LIST_SHARE_DEFAULT = True


def _resolve_share(scene: ClusterScene, share, maxc=None) -> bool:
    if share is not None:
        return bool(share)
    if maxc is not None:
        # a caller that PINNED maxc asked for per-ray lists of exactly
        # that depth (the deterministic, certifiable contract — pinned
        # calls also skip the escalation pass).  Block-union lists under
        # a pinned depth would silently change what "maxc" bounds.
        return False
    return bool(LIST_SHARE_DEFAULT)

# VMEM cap for the resident triangle table; larger scenes fall back to the
# XLA cluster tracer.  v5e VMEM is 128 MiB; 64 MiB of scene leaves ample
# room for the kernel's ray/candidate/output pipeline buffers.  The real
# 870k-tri pbrt_dragon is ~6.8k clusters = 31.5 MiB: the flagship fits.
VMEM_SCENE_BYTES = 64 * 1024 * 1024
# Mosaic scoped-vmem limit for the kernel launch: the resident scene plus
# a measured non-scene overhead margin (pipeline buffers + scratch were
# ~21.5 MiB at a 31.5 MiB scene; 46 MiB gives ~2x headroom).  Derived from
# VMEM_SCENE_BYTES so the two caps cannot drift apart (ADVICE r3).
VMEM_LIMIT_BYTES = VMEM_SCENE_BYTES + 46 * 1024 * 1024
assert VMEM_LIMIT_BYTES <= 120 * 1024 * 1024, "over v5e physical VMEM"


def fits_in_vmem(scene: ClusterScene) -> bool:
    return (
        scene.num_clusters <= 8192  # 13-bit candidate id packing
        and scene.num_clusters * 9 * T_CLUSTER * 4 <= VMEM_SCENE_BYTES
    )


def _mt8(ax, ay, az, bx, by, bz, cx, cy, cz, ox, oy, oz, dx, dy, dz, tl):
    """Moller-Trumbore on (RB,T) tiles; ALL operands (RB,T) — no column
    broadcasts inside the round (triangle.h:16-60 semantics, EPS=1e-7;
    t_lim folded in: BIG_T for closest-hit, t_max - SHADOW_EPS for
    occlusion)."""
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


def _tail_guard(at_ref, rays, ctn_first, cnt, maxc, round_fn):
    """Early-exit guards after the first GROUP rounds (shared by both
    kernels).  Two nested mechanisms:

    1. ONE data-dependent usefulness guard: entry-t is monotone per list,
       so if no ray's remaining candidates can beat its current best (min
       over lanes) the tail is provably useless — and because the tail
       entry-ts ascend, comparing the FIRST tail slot (``ctn_first``:
       (RB,1) for per-ray lists, scalar for a shared list) is equivalent
       to comparing them all.  A ray with the any-hit flag (rays[:,7] > 0)
       that is already blocked (best < its t_lim) needs nothing more
       either.  This guard depends on the accumulator, so it costs the
       full ~1.5us pl.when pipeline serialization — exactly once.
    2. CHUNK-sized count gates: inside the tail, rounds come in chunks of
       CHUNK, each gated on ``cnt`` (the block's candidate COUNT, a
       scalar prefetched from SMEM that does not depend on any in-kernel
       value) — blocks whose list is half-empty skip the dummy-slot
       rounds entirely instead of intersecting the never-hit tile
       maxc - count times.  Measured: a scalar-operand pl.when avoids the
       accumulator-dependency serialization of mechanism 1
       (scratch/chunk_bench_r4.py).

    Poisoned-last-slot exception: topk recall misses and hier SC-overflow
    set the LAST ctn slot to -BIG_T (not any earlier tail slot), so the
    ascending-entry-t premise holds for every slot this guard reads
    (ctn_first is slot GROUP, and maxc > GROUP here).  Such rows may skip
    tail rounds the pre-round-3 whole-tail guard always ran — safe,
    because they are already flagged overflow and certificate-unresolved,
    so nothing downstream trusts their result.  The count gate may also
    skip a poisoned last slot whose preceding slots are empty (a "short"
    topk row: count < maxc but slot maxc-1 rewritten to cluster 0) — same
    story: that slot is a harmless re-test on an already-unresolved row.
    If extraction ever poisons a non-last slot, or maxc shrinks to
    GROUP+1 with poisoning moved earlier, revisit this guard."""
    bt = jnp.min(at_ref[:], axis=1, keepdims=True)       # (RB,1)
    useful = ctn_first < bt
    ah_done = (rays[:, 7:8] > 0.0) & (bt < rays[:, 6:7])
    useful = useful & (~ah_done)

    @pl.when(jnp.any(useful))
    def _tail():
        for c0 in range(GROUP, maxc, CHUNK):
            @pl.when(cnt > c0)
            def _chunk(c0=c0):
                for r in range(c0, min(c0 + CHUNK, maxc)):
                    round_fn(r)


def _list_kernel_impl(cand_s, ctn_ref, rays_ref, tris_ref,
                      at_ref, ar_ref, stk_ref, *, maxc, interpret=False):
    """One 8-ray block over its PER-RAY candidate lists.

    cand_s:  (RB, maxc+1) i32 SMEM  candidate cluster per (ray, round);
                                  empty slots carry the DUMMY id K2;
                                  column maxc = the block's MAX candidate
                                  count (same value in every row) gating
                                  the tail chunks
    ctn_ref: (RB, maxc) f32 VMEM  candidate entry-t (BIG_T empty)
    rays_ref:(RB, 8)    f32 VMEM  o3 d3 t_lim anyhit_flag
    tris_ref:(K2+1,9,T) f32 VMEM  resident triangle tiles + dummy row K2
    at_ref:  (RB, T)    f32 OUT   per-(ray,lane) min t across rounds
    ar_ref:  (RB, T)    i32 OUT   round that produced at_ref's value
    stk_ref: (9, RB, T) f32 scratch: per-coordinate stacked tiles
    """
    shape = (RB, T_CLUSTER)
    rays = rays_ref[:]
    bc = lambda c: jnp.broadcast_to(rays[:, c:c + 1], shape)  # noqa: E731
    ox, oy, oz, dx, dy, dz, tl = (bc(c) for c in range(7))
    at_ref[:] = tl
    ar_ref[:] = jnp.full(shape, -1, jnp.int32)

    def _round(r):
        for i in range(RB):
            tile = tris_ref[cand_s[i, r]]                # (9, T)
            for c in range(9):
                stk_ref[c, i:i + 1, :] = tile[c:c + 1, :]
        planes = [stk_ref[c] for c in range(9)]          # 9 x (RB, T)
        t = _mt8(*planes, ox, oy, oz, dx, dy, dz, tl)
        upd = t < at_ref[:]
        at_ref[:] = jnp.where(upd, t, at_ref[:])
        ar_ref[:] = jnp.where(upd, jnp.int32(r), ar_ref[:])

    if interpret:
        # interpret mode (CPU tests): a fori_loop keeps the traced graph
        # O(1) in maxc — the unrolled form below compiles ~maxc*RB*9
        # interpreter ops PER BUCKET BRANCH, which made escalation-enabled
        # test runs minutes-per-test.  Guards are skipped: dummy rounds
        # are harmless, outputs are identical.
        jax.lax.fori_loop(
            0, maxc, lambda r, c: (_round(r), c)[1], 0
        )
        return

    for r in range(min(GROUP, maxc)):
        _round(r)

    if maxc > GROUP:
        _tail_guard(at_ref, rays, ctn_ref[:, GROUP:GROUP + 1],
                    cand_s[0, maxc], maxc, _round)


def _block_kernel_impl(cand_s, ctn_s, rays_ref, tris_ref,
                       at_ref, ar_ref, *, maxc, rb, interpret=False):
    """One ``rb``-ray block over its SHARED candidate list.

    cand_s:  (8, maxc+1) i32 SMEM candidate clusters for 8 CONSECUTIVE
                                  blocks (DUMMY=K2 empty); this block reads
                                  row program_id % 8.  Mosaic requires
                                  sublane-dim block sizes divisible by 8,
                                  so single-row blocks are fetched in
                                  8-row granularity (a few hundred SMEM
                                  bytes — refetching is free).  Column
                                  maxc = the block's candidate count
                                  gating the tail chunks.
    ctn_s:   (8, maxc)  f32 SMEM  entry-t, same 8-row layout (BIG_T empty)
    rays_ref:(rb, 8)    f32 VMEM  o3 d3 t_lim anyhit_flag
    tris_ref:(K2+1,9,T) f32 VMEM  resident triangle tiles + dummy row K2
    at_ref:  (rb, T)    f32 OUT   per-(ray,lane) min t across rounds
    ar_ref:  (rb, T)    i32 OUT   round that produced at_ref's value

    The round body loads the shared tile ONCE (one dynamic leading-dim
    index) and row-broadcasts each coordinate plane to (rb, T) — a sublane
    replicate, not a lane relayout — so the per-round cost is ~one tile
    copy + one (rb,T) MT regardless of rb.
    """
    row = pl.program_id(0) % 8
    shape = (rb, T_CLUSTER)
    rays = rays_ref[:]
    bc = lambda c: jnp.broadcast_to(rays[:, c:c + 1], shape)  # noqa: E731
    ox, oy, oz, dx, dy, dz, tl = (bc(c) for c in range(7))
    at_ref[:] = tl
    ar_ref[:] = jnp.full(shape, -1, jnp.int32)

    def _round(r):
        tile = tris_ref[cand_s[row, r]]                  # (9, T)
        planes = [
            jnp.broadcast_to(tile[c:c + 1, :], shape) for c in range(9)
        ]
        t = _mt8(*planes, ox, oy, oz, dx, dy, dz, tl)
        upd = t < at_ref[:]
        at_ref[:] = jnp.where(upd, t, at_ref[:])
        ar_ref[:] = jnp.where(upd, jnp.int32(r), ar_ref[:])

    if interpret:
        # O(1)-trace interpret form; see _list_kernel_impl
        jax.lax.fori_loop(
            0, maxc, lambda r, c: (_round(r), c)[1], 0
        )
        return

    for r in range(min(GROUP, maxc)):
        _round(r)

    if maxc > GROUP:
        _tail_guard(at_ref, rays, ctn_s[row, GROUP],
                    cand_s[row, maxc], maxc, _round)


def _ray_sort_key(scene: ClusterScene, ray_o, ray_d):
    """Spatial sort key: 15-bit Morton of the origin cell (5 bits/axis over
    the scene bounds) above a 12-bit Morton of the DIRECTION (4 bits/axis
    over [-1,1]).  Sorted rays give the kernel homogeneous blocks, so the
    tail guard actually fires (unsorted blocks almost always contain one
    straggler) and block-shared candidate unions stay tight.

    Direction bits matter as much as origin bits: a ray's cluster
    footprint is direction-dominated past the first few cells, and the
    round-2 3-bit octant left same-origin primary bundles sorted in
    SCANLINE order — measured 32-ray unions were ~4.6x the per-ray list
    even for near-parallel rays; 2D-patch ordering via direction Morton
    collapses that."""
    lo = jnp.min(scene.sc_box[:, 0:3], axis=0)
    hi = jnp.max(scene.sc_box[:, 3:6], axis=0)
    q = jnp.clip((ray_o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    cell = (q * 31.0).astype(jnp.int32)                       # [B,3]
    m = jnp.zeros(ray_o.shape[:1], jnp.int32)
    for b in range(5):
        for a in range(3):
            m = m | (((cell[:, a] >> b) & 1) << (3 * b + a))
    dq = (jnp.clip(ray_d * 0.5 + 0.5, 0.0, 1.0) * 15.0).astype(jnp.int32)
    dm = jnp.zeros(ray_d.shape[:1], jnp.int32)
    for b in range(4):
        for a in range(3):
            dm = dm | (((dq[:, a] >> b) & 1) << (3 * b + a))
    return (m << 12) | dm


def _run_once(scene: ClusterScene, ray_o, ray_d, t_lim, maxc, any_hit,
              sort=True, mask=None, share=False,
              bucket_divs=(64, 32, 16, 8, 4, 2), force_dense=False,
              exact=False):
    """ONE candidate-list build (XLA) + list kernel + XLA reduction tail.
    Returns (t [B], packed winner cluster*T+lane [B] (-1 miss), resolved,
    overflow).  ``overflow`` here is the RAW extraction overflow (some
    list/union filled past maxc) — callers wanting the honest "answer may
    be wrong" flag use _run, which consults the per-ray certificates.

    ``any_hit``: scalar bool or [B] bool — rays flagged any-hit only need
    "does anything lie below t_lim"; the kernel's tail guard retires them
    as soon as they are blocked (per-ray flag lane, see _tail_guard).

    ``mask``: optional [B] bool — rays with mask=False are DEAD (their
    result is a guaranteed miss): they get t_lim=-BIG so the candidate
    build yields empty lists (tnear < t_lim never holds), and the sort key
    pushes them behind every live ray.  The launch is then BUCKETED: the
    candidate build and the kernel grid run only over the first
    {1/64, 1/32, ..., 1/2, 1} of blocks — the smallest bucket covering all live
    rays — selected at runtime with lax.switch.  That makes the whole
    sweep cost scale with the live fraction (a fixed-grid kernel has a
    ~30ms floor at 32k rays no matter how many lanes are dead; measured
    in scratch/mask_bench.py).

    ``share``: block-shared candidate lists + kernel (see module
    docstring) — one list per RB_SHARE sorted rays, each tile loaded once
    per block.
    """
    assert maxc <= 128, "winner packing uses at most 7 round bits"
    # rounds-per-lane field width for the packed (lane, round) winner
    rslot = 1 << max(1, (maxc - 1)).bit_length()
    B = ray_o.shape[0]
    rb = RB_SHARE if share else RB
    nb = -(-B // rb)
    pad = nb * rb - B
    k2 = scene.num_clusters
    # root-box cull: a ray that misses the scene's bounding box cannot hit
    # any cluster — fold it into the dead-lane mask so the sort pushes it
    # into trailing blocks the bucketed launch never runs.  Sky-dominated
    # frames (dragon + HDR sky primaries) skip those rays' kernel rounds
    # AND their candidate-build rows entirely.
    lo = jnp.min(scene.sc_box[:, 0:3], axis=0)
    hi = jnp.max(scene.sc_box[:, 3:6], axis=0)
    sign = jnp.where(ray_d < 0, -1.0, 1.0)
    inv = sign / jnp.maximum(jnp.abs(ray_d), 1e-30)
    t0r = (lo[None] - ray_o) * inv
    t1r = (hi[None] - ray_o) * inv
    tnr = jnp.max(jnp.minimum(t0r, t1r), axis=-1)
    tfr = jnp.min(jnp.maximum(t0r, t1r), axis=-1)
    root_hit = (tnr <= tfr) & (tfr > EPS) & (tnr < t_lim)
    explicit_mask = mask is not None
    mask = root_hit if mask is None else (mask & root_hit)
    t_lim = jnp.where(mask, t_lim, -BIG_T)
    if isinstance(any_hit, bool):
        ah = jnp.full((B,), 1.0 if any_hit else 0.0, jnp.float32)
    else:
        ah = any_hit.astype(jnp.float32)
    # Pack ray fields into ONE [B,8] row array BEFORE permuting: gathers
    # on this TPU cost ~10ns per ROW regardless of width, so one 8-wide
    # row gather replaces four narrow ones (~3ms/launch at 98k rays —
    # this permute runs on the FULL batch every launch, before bucketing,
    # so it was the dominant cost of sparse launches).
    rays = jnp.concatenate(
        [ray_o, ray_d, t_lim[:, None], ah[:, None]], axis=1
    )
    perm = None
    if sort and B >= 4 * rb:
        key = _ray_sort_key(scene, ray_o, ray_d)
        if mask is not None:
            key = jnp.where(mask, key, jnp.int32(1) << 28)
        perm = jnp.argsort(key)
        rays = rays[perm]
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), rays.dtype)], 0)
    tris = jnp.concatenate(
        [
            scene.cl_tris.reshape(k2, 9, T_CLUSTER),
            jnp.zeros((1, 9, T_CLUSTER), jnp.float32),  # dummy: never hits
        ],
        axis=0,
    )
    interpret = jax.default_backend() != "tpu"
    if share:
        kernel = functools.partial(_block_kernel_impl, maxc=maxc, rb=rb,
                                   interpret=interpret)
    else:
        kernel = functools.partial(_list_kernel_impl, maxc=maxc,
                                   interpret=interpret)

    # supercluster budget for the hierarchical prefilter scales with maxc
    # so one escalation knob (maxc, see main.py's overflow regrow) deepens
    # BOTH truncation points: default share maxc=48 -> maxs=16 (=HIER_MAXS),
    # doubled maxc=96 -> maxs=32
    maxs = max(HIER_MAXS, maxc // 3)

    def run_bucket(g):
        """Candidate build + kernel over the first ``g`` blocks only."""
        rg = rays[: g * rb]
        # force_dense (escalation passes): skip the hier prefilter — its
        # per-block supercluster truncation poisons certificates, which
        # would leave big-scene escalations unable to certify; the dense
        # [rows, K2] build is exact and affordable on escalation buckets
        big = (not force_dense) and scene.num_clusters > 2 * maxs * S_CLUSTER
        # the per-ray MEMBERSHIP certificate (cluster._membership_cert)
        # requires exact extraction; approx share runs (scratch A/Bs only
        # — _run always passes exact) fall back to block certificates
        covered = None
        if share and big:
            out = candidate_clusters_hier(
                scene, rg[:, 0:3], rg[:, 3:6], rg[:, 6], maxc,
                maxs=maxs, group=rb, grouped=True, exact=exact,
                ray_cert=exact,
            )                                             # (g, maxc)
            cand, ctn, overflow = out[:3]
            covered = out[3] if exact else None
        elif share:
            out = candidate_clusters_grouped(
                scene, rg[:, 0:3], rg[:, 3:6], rg[:, 6], maxc, rb,
                exact=exact, ray_cert=exact,
            )                                             # (g, maxc)
            cand, ctn, overflow = out[:3]
            covered = out[3] if exact else None
        elif big:
            # supercluster-prefiltered build (only where the column cut is
            # >=2x): extraction traffic scales with maxs*64 prefiltered
            # columns, not all K2 clusters — the dominant HBM cost of a
            # sweep at flagship scale (870k tris: 6784 -> 1024 columns)
            cand, ctn, overflow = candidate_clusters_hier(
                scene, rg[:, 0:3], rg[:, 3:6], rg[:, 6], maxc,
                maxs=maxs, group=rb, exact=exact,
            )                                             # (gRB, maxc)
        else:
            cand, ctn, overflow = candidate_clusters(
                scene, rg[:, 0:3], rg[:, 3:6], rg[:, 6], maxc,
                exact=exact,
            )                                             # (gRB, maxc)
        cand_k = jnp.where(cand >= 0, cand, k2)  # empty slot -> dummy
        ctn_k = ctn
        # per-block candidate COUNT, appended as SMEM column maxc: gates
        # the kernel's tail chunks so half-empty lists skip their dummy
        # rounds (see _tail_guard).  Counts the poisoned last slot too
        # (harmless — see the poisoned-last-slot note in _tail_guard).
        cnt = jnp.sum(cand >= 0, axis=1, dtype=jnp.int32)
        if not share:
            # per-ray lists: the gate is per BLOCK of RB rays -> block max
            cnt = jnp.repeat(cnt.reshape(-1, RB).max(axis=1), RB, axis=0)
        cand_k = jnp.concatenate([cand_k, cnt[:, None]], axis=1)
        if share:
            # Mosaic sublane rule: block rows must be divisible by 8, so
            # the per-block (1, maxc) rows ship in 8-row granules — pad
            # the row count and index row program_id%8 inside the kernel
            gpad = -g % 8
            if gpad:
                pad_rows = jnp.concatenate(
                    [jnp.full((gpad, maxc), k2, jnp.int32),
                     jnp.zeros((gpad, 1), jnp.int32)], axis=1)
                cand_k = jnp.concatenate([cand_k, pad_rows], 0)
                ctn_k = jnp.concatenate(
                    [ctn_k, jnp.full((gpad, maxc), BIG_T, jnp.float32)], 0)
            cand_spec = pl.BlockSpec((8, maxc + 1), lambda b: (b // 8, 0),
                                     memory_space=pltpu.SMEM)
            ctn_spec = pl.BlockSpec((8, maxc), lambda b: (b // 8, 0),
                                    memory_space=pltpu.SMEM)
        else:
            cand_spec = pl.BlockSpec((RB, maxc + 1), lambda b: (b, 0),
                                     memory_space=pltpu.SMEM)
            ctn_spec = pl.BlockSpec((RB, maxc), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM)
        at, ar = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                cand_spec,                                    # cand ids
                ctn_spec,                                     # entry-t
                pl.BlockSpec((rb, 8), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),        # rays
                pl.BlockSpec(memory_space=pltpu.VMEM),        # tiles
            ],
            out_specs=(
                pl.BlockSpec((rb, T_CLUSTER), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, T_CLUSTER), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((g * rb, T_CLUSTER), jnp.float32),
                jax.ShapeDtypeStruct((g * rb, T_CLUSTER), jnp.int32),
            ),
            scratch_shapes=(
                [] if share
                else [pltpu.VMEM((9, RB, T_CLUSTER), jnp.float32)]
            ),
            # the resident scene (up to VMEM_SCENE_BYTES) + pipeline
            # buffers exceed Mosaic's default 16 MiB scoped-vmem budget at
            # flagship scale (870k tris = 31.5 MiB of tiles); v5e has
            # 128 MiB.  Blocks are independent -> the grid is parallel.
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=VMEM_LIMIT_BYTES,
            ),
            interpret=interpret,
        )(cand_k, ctn_k, rays[: g * rb], tris)

        # reduction tail INSIDE the bucket (dense reductions only — no
        # argmin on the hot path) so its cost scales with the live prefix
        tlg = rg[:, 6]
        tmin = jnp.min(at, axis=1)                        # [gRB]
        hit = tmin < tlg
        # per-ray EXACTNESS certificate (nearest-first entry-t): a ray
        # with a full candidate list may have had farther clusters
        # dropped, but any dropped hit satisfies t >= its entry-t >=
        # ctn_last — so best <= ctn_last proves no dropped one could win
        lanes = jax.lax.broadcasted_iota(jnp.int32, at.shape, 1)
        sel = at <= tmin[:, None]
        # consistent (lane, round) winner: lane-major packing
        pk = jnp.min(
            jnp.where(sel, lanes * rslot + jnp.minimum(ar, rslot - 1),
                      jnp.int32(1 << 30)), axis=1)
        lane = pk // rslot
        rwin = jnp.minimum(pk % rslot, maxc - 1)
        if share:
            resolved = jnp.broadcast_to(
                (cand[:, maxc - 1] < 0)[:, None], (g, rb)
            ).reshape(-1) | (
                tmin
                <= jnp.broadcast_to(
                    ctn[:, maxc - 1][:, None], (g, rb)
                ).reshape(-1)
            )
            if covered is not None:
                # per-ray membership certificate: exact even in a FULL
                # block when all of THIS ray's hit clusters were kept —
                # fires for the unblocked any-hit rays the distance
                # certificate never could (t_lim BIG ⇒ tmin == t_lim),
                # which were the bulk of the escalation volume
                resolved = resolved | covered
            blk = jnp.arange(g * rb, dtype=jnp.int32) // rb
            cl = cand.reshape(-1)[blk * maxc + rwin]
        else:
            resolved = (cand[:, maxc - 1] < 0) | (tmin <= ctn[:, maxc - 1])
            cl = jnp.take_along_axis(cand, rwin[:, None], axis=1)[:, 0]
        packed = jnp.where(hit, cl * T_CLUSTER + lane, -1)
        t = jnp.where(hit, tmin, BIG_T)

        fill = nb * rb - g * rb
        if fill:
            # beyond the bucket: only dead rays (sort invariant) -> miss
            t = jnp.concatenate([t, jnp.full((fill,), BIG_T)], 0)
            packed = jnp.concatenate(
                [packed, jnp.full((fill,), -1, jnp.int32)], 0)
            resolved = jnp.concatenate(
                [resolved, jnp.ones((fill,), bool)], 0)
        return t, packed, resolved, overflow

    # interpret mode buckets ONLY on explicit masks: each switch branch is
    # a separate interpreter kernel build, and piling extra switch
    # compiles into one CPU process trips a known XLA-CPU compiler abort
    # (root-cull-only masks gain little on CPU anyway — the dead rays'
    # empty candidate lists already exit at the kernel guard)
    if perm is None or (interpret and not explicit_mask):
        t, packed, resolved, overflow = run_bucket(nb)
    else:
        if interpret:
            # interpret mode (CPU tests): 2 buckets keep the lax.switch
            # path covered without 4x interpreter compiles
            buckets = sorted({max(1, -(-nb // bucket_divs[0])), nb})
        else:
            buckets = sorted(
                {max(1, -(-nb // d)) for d in bucket_divs} | {nb}
            )
        n_live = jnp.sum(mask)
        idx = jnp.zeros((), jnp.int32)
        for bkt in buckets[:-1]:
            idx = idx + (n_live > bkt * rb).astype(jnp.int32)
        t, packed, resolved, overflow = jax.lax.switch(
            idx, [functools.partial(run_bucket, g) for g in buckets]
        )

    t, packed, resolved = t[:B], packed[:B], resolved[:B]
    if perm is not None:
        # ONE row-gather for the inverse permutation (same rationale as
        # the input pack): packed ids fit f32 exactly (< 2^20 << 2^24)
        out = jnp.stack(
            [t, packed.astype(jnp.float32), resolved.astype(jnp.float32)],
            axis=1,
        )
        out = out[jnp.argsort(perm)]
        t = out[:, 0]
        packed = out[:, 1].astype(jnp.int32)
        resolved = out[:, 2] > 0.5
    # tag as remat residuals: the whole sweep (sort + candidate build +
    # kernel) is dead code in the integrators' backward replay
    return name_traversal(t, packed, resolved, overflow)


def _certain(any_hit, packed, resolved):
    """A ray's answer is CERTAIN when its exactness certificate holds, or
    (any-hit rays only) when it is already blocked — a found hit below
    t_lim proves "blocked" regardless of dropped clusters."""
    return resolved | (any_hit & (packed >= 0))


def _run(scene: ClusterScene, ray_o, ray_d, t_lim, maxc, any_hit,
         sort=True, mask=None, share=False, escalate=True):
    """Candidate lists (XLA) + list kernel + XLA reduction tail, EXACT.
    Returns (t [B], packed winner cluster*T+lane [B] (-1 miss), resolved,
    overflow).

    Exactness story (VERDICT r3 weak #2 closed):
      * the main pass (per-ray lists, or block-union lists with
        share=True) is followed by a PER-RAY escalation pass over exactly
        the rays whose certificate did NOT fire (and, for any-hit rays,
        that are not already blocked) at doubled depth.  The escalation
        reuses the dead-lane bucketing (1/64..1 of blocks), so its cost
        scales with the unresolved fraction — a few percent of rays on
        sorted render wavefronts (the per-ray candidate-count p99 is ~40
        vs DEFAULT_MAXC=32 on surface wavefronts, scratch/phase_bench4).
        ``escalate=False`` (callers that pinned maxc explicitly) keeps
        the single-pass behavior.
      * ``overflow`` is the HONEST flag: True iff some LIVE ray's answer
        is still uncertified after escalation (any(~certain & live)) —
        certificate-proven frames no longer report overflow
        (render_kernel.cpp:485-502 never drops hits; we flag instead of
        silently dropping).
    """
    if escalate and os.environ.get("LISTTRACE_NO_ESCALATE"):
        # measurement-only kill switch (scratch A/Bs): results may be
        # APPROXIMATE and the overflow flag stays honest about it
        escalate = False
    B = ray_o.shape[0]
    # The overflow-regrow knob (ClusterScene.list_maxc, main.py) also
    # WIDENS the escalation cap: share-mode union depth is already at the
    # 128-slot packing cap by default, so re-rendering a flagged frame
    # must buy more escalation COVERAGE (the other way a frame stays
    # uncertified) — each regrow doubling halves the cap divisor, down to
    # a full-batch escalation sweep.
    div = ESC_CAP_DIV
    if scene.list_maxc:
        div = max(1, div // max(1, scene.list_maxc // DEFAULT_MAXC))
    cap = min(B, max(256, -(-B // (div * 256)) * 256))
    live = jnp.ones((B,), bool) if mask is None else mask
    if isinstance(any_hit, bool):
        ah = jnp.full((B,), any_hit, bool)
    else:
        ah = any_hit
    # The MAIN pass uses EXACT (full-recall) extraction ALWAYS — r5 late
    # fix.  The old scheme let escalate-enabled main passes run approx
    # topk (recall 0.95), believing the count check poisoned every recall
    # miss; it only poisons rows that come back SHORT.  A FULL union row
    # (count > maxc) with a recall miss keeps got == maxc while swapping
    # a true-nearest cluster for a farther one — ctn_last then OVER-states
    # the drop threshold and the distance certificate could wrongly
    # certify a ray whose true closest hit lives in the missed cluster
    # (never healed: certified rays skip escalation).  Exact extraction
    # restores the certificate's premise (kept = the maxc nearest), and
    # is also what the per-ray MEMBERSHIP certificate requires
    # (cluster._membership_cert) — _extract_candidates_topk now also
    # poisons full rows under approx recall as defense in depth.
    will_escalate = escalate and (share or maxc < 128)
    t, packed, resolved, _raw = _run_once(
        scene, ray_o, ray_d, t_lim, maxc, any_hit, sort=sort, mask=mask,
        share=share, exact=True,
    )
    if will_escalate:
        redo = live & ~_certain(ah, packed, resolved)
        maxc2 = min(128, 2 * maxc)

        def _esc(redo):
            # COMPACTED per-ray pass (r5): the r4 escalation re-ran
            # _run_once on the FULL batch (pack + 28-bit-key sort +
            # permute + inverse permute, all at B rows) to heal a ~0-1%
            # tail — ~44 ms of the 389 ms dragon frame
            # (scratch/profile_r5_noesc.log A/B).  Instead, stable-
            # partition the redo rays to the front (one bool-key argsort),
            # gather the first ``cap`` rows, run the per-ray exact pass on
            # those ONLY, and merge back with one [B] row-gather — no
            # scatter, no full-batch permutes.  Rays beyond ``cap``
            # (unseen on the measured flagship: worst-launch redo was
            # between B/64 and B/16, see ESC_CAP_DIV) stay uncertified
            # and keep the overflow flag honest — main.py's maxc regrow
            # remains the remedy, exactly as for a true list overflow.
            #
            # full-recall extraction: an approx recall miss here would
            # poison the same row again and leave it permanently
            # uncertifiable (the 870k flagship's residual overflow=True
            # came exactly from this)
            perm_r = jnp.argsort(~redo)              # stable: redo first
            idx = perm_r[:cap]
            # sort=True inside the CAP-sized pass: trivial at cap rows,
            # and it re-enables the bucketed launch — the kernel grid then
            # scales with the ACTUAL redo count (often 10-100 rays), not
            # with cap
            t2c, p2c, r2c, _raw2 = _run_once(
                scene, ray_o[idx], ray_d[idx], t_lim[idx], maxc2, ah[idx],
                sort=True, mask=redo[idx], share=False, force_dense=True,
                exact=True,
            )
            # merge-back gather: original row -> its compact slot
            pos = jnp.cumsum(redo.astype(jnp.int32)) - 1
            slot = jnp.clip(pos, 0, cap - 1)
            out = jnp.stack(
                [t2c, p2c.astype(jnp.float32), r2c.astype(jnp.float32)],
                axis=1,
            )[slot]                                   # ONE [B] row-gather
            covered = redo & (pos < cap)
            t2 = jnp.where(covered, out[:, 0], t)
            p2 = jnp.where(covered, out[:, 1].astype(jnp.int32), packed)
            r2 = jnp.where(covered, out[:, 2] > 0.5, resolved)
            return t2, p2, r2

        if jax.default_backend() == "tpu":
            # skip the whole escalation pass on launches where every ray
            # certified; the pass-through branch returns the main pass's
            # own arrays and the merge below is then the identity.
            t2, p2, r2 = jax.lax.cond(
                jnp.any(redo), _esc, lambda _: (t, packed, resolved), redo
            )
        else:
            # interpret mode: an extra lax.cond would double the CPU-side
            # interpreter kernel compiles (see the bucket note above)
            t2, p2, r2 = _esc(redo)
        # a certified per-ray answer IS the true closest hit (or true
        # miss), so it replaces the union answer outright: both passes
        # only ever report REAL hits (cluster boxes bound their
        # triangles), so a certified t2 satisfies t2 <= any real hit the
        # union found.  Uncertified escalations keep whichever is nearer
        # (best effort; the ray stays flagged).
        use2 = redo & (r2 | (t2 < t))
        t = jnp.where(use2, t2, t)
        packed = jnp.where(use2, p2, packed)
        resolved = resolved | (redo & r2)
    overflow = jnp.any(live & ~_certain(ah, packed, resolved))
    return name_traversal(t, packed, resolved, overflow)


def _default_maxc(share, scene: ClusterScene | None = None):
    """Candidate-list depth: the scene's escalation override if set (the
    overflow-regrow knob, ClusterScene.list_maxc — interpreted as the
    PER-RAY depth; share-mode unions scale by the same ratio as the
    module defaults, DEFAULT_MAXC_SHARE/DEFAULT_MAXC), else the module
    defaults.  Capped at 128 by the packed-winner encoding (see
    _run_once's rslot)."""
    if scene is not None and scene.list_maxc:
        base = scene.list_maxc
    else:
        return DEFAULT_MAXC_SHARE if share else DEFAULT_MAXC
    mc = base * DEFAULT_MAXC_SHARE // DEFAULT_MAXC if share else base
    return min(128, mc)


def closest_hit(scene: ClusterScene, ray_o, ray_d,
                maxc: int | None = None, mask=None, share=None,
                with_resolved: bool = False):
    """Closest-hit for rays [B,3] -> (t [B], prim [B] i32 -1 on miss,
    overflow) — overflow is the HONEST flag: True iff some live ray's
    answer is still UNCERTIFIED after (in share mode) the per-ray
    escalation pass; a frame whose every ray carries an exactness
    certificate reports False even when candidate lists filled up.
    ``mask``: False lanes are dead rays, reported as misses at ~zero cost
    (see _run_once).

    ``with_resolved=True`` appends the per-ray exactness certificate: a
    resolved ray's answer is provably the true closest hit (its best t is
    at or below the last candidate's entry-t, so no dropped cluster could
    hold a nearer hit).

    Pinning ``maxc`` selects the deterministic contract: PER-RAY lists of
    exactly that depth, exact (full-recall) extraction, and NO escalation
    pass — what you bound is what runs.  ``maxc=None`` (the default)
    selects the adaptive contract: block-shared lists at the module
    default depth plus a per-ray escalation pass over uncertified rays."""
    if not fits_in_vmem(scene):
        raise ValueError(
            f"scene too large for the VMEM list tracer "
            f"({scene.num_clusters} clusters); use the XLA cluster tracer"
        )
    share = _resolve_share(scene, share, maxc)
    escalate = maxc is None
    maxc = _default_maxc(share, scene) if maxc is None else maxc
    B = ray_o.shape[0]
    t_lim = jnp.full((B,), BIG_T, ray_o.dtype)
    t, packed, resolved, overflow = _run(scene, ray_o, ray_d, t_lim,
                                         maxc, any_hit=False, mask=mask,
                                         share=share, escalate=escalate)
    hit = packed >= 0
    win = jnp.maximum(packed, 0)
    prim = scene.cl_tri_idx[win // T_CLUSTER, win % T_CLUSTER]
    prim = jnp.where(hit, prim, -1)
    if with_resolved:
        return t, prim, overflow, resolved
    return t, prim, overflow


def any_hit(scene: ClusterScene, ray_o, ray_d, t_max,
            maxc: int | None = None, mask=None, share=None):
    """Occlusion: True where any triangle lies at t < t_max - SHADOW_EPS
    (reference evaluate_shadow_ray slack, render_kernel.cpp:744-759).
    Returns (blocked [B] bool, overflow) — overflow is the honest flag
    (see closest_hit); a blocked ray is always certain, so only unblocked
    uncertified rays can raise it.  ``mask``: False lanes are dead rays,
    reported unblocked at ~zero cost (see _run_once).  Pinning ``maxc``
    selects per-ray lists + exact extraction + no escalation (see
    closest_hit)."""
    if not fits_in_vmem(scene):
        raise ValueError("scene too large for the VMEM list tracer")
    share = _resolve_share(scene, share, maxc)
    escalate = maxc is None
    maxc = _default_maxc(share, scene) if maxc is None else maxc
    t, packed, _resolved, overflow = _run(
        scene, ray_o, ray_d, t_max - SHADOW_EPS, maxc, any_hit=True,
        mask=mask, share=share, escalate=escalate,
    )
    return packed >= 0, overflow


def intersect_list(scene: ClusterScene, tris, ray_o, ray_d,
                   of: list | None = None, mask=None, share=None) -> Hit:
    """Closest-hit with a differentiable hit record (stop-gradient +
    finalize recompute, same recipe as ops.cluster.intersect_clusters)."""
    from sycl_ray_tracing_tpu.ops.intersect import finalize_hit

    o_ng = jax.lax.stop_gradient(ray_o)
    d_ng = jax.lax.stop_gradient(ray_d)
    _, prim, overflow = closest_hit(scene, o_ng, d_ng, mask=mask,
                                    share=share)
    if of is not None:
        of.append(overflow)
    return finalize_hit(ray_o, ray_d, tris, prim)


def multi_query(scene: ClusterScene, queries,
                maxc: int | None = None, share=None):
    """FUSED scene queries: one sort + candidate build + kernel launch for
    several ray sets (e.g. a bounce's continuation closest-hit + its NEE
    shadow rays).  Per-launch glue (ray sort, bucket switch, dispatch) is
    paid once instead of per query, and mixing the sets improves block
    coherence (shadow rays sort next to the continuations that spawned
    them).

    ``queries``: list of (ray_o [B,3], ray_d [B,3], t_lim [B] or None for
    closest-hit, mask [B] or None[, any_hit bool]).  Returns (results,
    overflow) where results[i] = (t [B], packed [B]) — packed >= 0 means
    "a triangle lies at t < t_lim", which answers BOTH closest-hit
    (t, prim) and occlusion (blocked) exactly; an any-hit query just reads
    packed >= 0.  Shadow t_lims should already include the reference's
    SHADOW_EPS slack.  Queries flagged any_hit=True get the early-exit
    guard (their t/packed still answer "blocked below t_lim" exactly, but
    t may not be the true closest once blocked — don't read it as one).
    Pinning ``maxc`` selects per-ray lists + exact extraction + no
    escalation (see closest_hit).
    """
    if not fits_in_vmem(scene):
        raise ValueError("scene too large for the VMEM list tracer")
    share = _resolve_share(scene, share, maxc)
    escalate = maxc is None
    maxc = _default_maxc(share, scene) if maxc is None else maxc
    os_, ds_, tls, masks, ahs = [], [], [], [], []
    for q in queries:
        o, d, tl, m = q[:4]
        ah = bool(q[4]) if len(q) > 4 else False
        B = o.shape[0]
        os_.append(o)
        ds_.append(d)
        tls.append(jnp.full((B,), BIG_T, o.dtype) if tl is None else tl)
        masks.append(jnp.ones((B,), bool) if m is None else m)
        ahs.append(jnp.full((B,), ah, bool))
    # pure intersection oracle: gradients flow through finalize_hit
    # recompute (packed_to_prim + ops.intersect.finalize_hit), never
    # through the kernel itself
    o = jax.lax.stop_gradient(jnp.concatenate(os_, 0))
    d = jax.lax.stop_gradient(jnp.concatenate(ds_, 0))
    tl = jax.lax.stop_gradient(jnp.concatenate(tls, 0))
    mask = jnp.concatenate(masks, 0)
    ah = jnp.concatenate(ahs, 0)
    # NOTE (r3): an adaptive two-pass (maxc=16 + redo at 48) was tried and
    # reverted — at the time, per-launch glue (4 separate input permute
    # gathers + 3 output gathers, since fused to one row-gather each)
    # made a second pass cost ~as much as the first.  r4's escalation
    # reinstates the idea with the glue fixed and finer buckets; it is
    # now the shipped default (see _run).
    t, packed, _resolved, overflow = _run(scene, o, d, tl, maxc,
                                          any_hit=ah, mask=mask,
                                          share=share, escalate=escalate)
    results = []
    lo = 0
    for q in queries:
        B = q[0].shape[0]
        results.append((t[lo:lo + B], packed[lo:lo + B]))
        lo += B
    return results, overflow


def packed_to_prim(scene: ClusterScene, t, packed):
    """(t, packed) from multi_query -> (t, prim) closest-hit record."""
    hit = packed >= 0
    win = jnp.maximum(packed, 0)
    prim = scene.cl_tri_idx[win // T_CLUSTER, win % T_CLUSTER]
    return jnp.where(hit, t, BIG_T), jnp.where(hit, prim, -1)
