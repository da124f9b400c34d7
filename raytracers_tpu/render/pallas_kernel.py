"""Pallas TPU megakernel: fused ray-gen + culling + intersection + shading.

v4 architecture (v2's layout discipline + a microbenchmark-driven visit):

* **Grid over ray tiles** — ``grid=(num_tiles,)``, each program owns T
  pixels.  The ≤50-bounce loop lives INSIDE the kernel (`lax.while_loop`)
  with a per-tile early exit: a sky tile costs one bounce; only
  mirror-trap tiles run deep (the tile-level load balancing the irreg
  scene demands, SURVEY.md §7 "hard parts").

* **Rays on lanes × spheres on sublanes** — per-ray state is (1, T)
  vectors; the dense closest-hit search is (128, T) vector work per
  128-sphere cluster.  Every broadcast between state and pair space is
  layout-preserving (docs/PERF_NOTES.md lesson 4).

* **Packed-key closest hit** — each visit computes the candidate ``t``
  for 128 spheres, packs it as ``(float_bits(t) & ~0x7F) | lane`` and
  takes ONE min-reduce: the int32 order of positive floats makes
  (t, lane) lexicographic min = closest-hit argmin with lowest-index
  tie-break.  This replaces the per-visit (tmin, winner, 7-field
  readback) bookkeeping of v2 — measured 395 cycles for a naive
  128-sublane reduce, ~90 for the two-stage slice tree used here.
  Cost: t is floored by ≤2^-16 relative (7 mantissa bits), absorbed by
  the reference's own +1.0 re-intersection window (ray.fut:84-85) for
  any t < 2^15; hit/miss classification is exactly unchanged.

* **One-hot payload via MXU** — the winner's 8 sphere fields are read
  back with a single (8,128)@(128,T) dot against the one-hot mask
  (exact: one nonzero term per output, 3-pass bf16 covers f32 — see
  docs/MICROBENCH.json ``dot_payload``); the MXU runs concurrently with
  the VPU so the readback largely hides behind the next visit.
  Pair-term MXU dots were measured SLOWER than the VPU quadratic at
  HIGHEST precision (683 cycles vs ~200) and are not used.

* **Cluster culling with active-ray masking** — per bounce, a min/max
  slab test over cluster-AABB blocks gated by the live-ray mask, so
  late bounces with few survivors visit few clusters; per-cluster flags
  land in VMEM scratch for the scalar visit skip.  NaN slab stages
  report HIT (reference fail-if polarity, ray.fut:64-70 — also the
  conservative direction for culling).

* Shading (mirror scatter, sky miss, 255.99 quantization) is fused; the
  kernel emits final packed int32 pixels.

Reference semantics preserved: open-interval quadratic with near-then-far
root (futhark/ray.fut:32-51), scene_epsilon search window + widened-window
re-intersection (ray.fut:76-86), bounce/absorb/miss rules (ray.fut:126-148),
pixel mapping u=i/w, v=(h-j)/h (ray.fut:150-168).  Depth-1 renders are
bit-exact vs the brute-force oracle (tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh.lbvh import build_clusters
from ..geometry import (MAX_DEPTH, SCENE_EPSILON, T_MAX, T_MIN, Camera,
                        Spheres)

LANE = 128            # spheres per cluster == TPU lane width
DEFAULT_TILE = 512    # rays per grid program
_BIG = float(T_MAX)   # python float: a jnp constant here would be captured

# columns of the per-cluster sphere field layout
_F_CX, _F_CY, _F_CZ, _F_RAD = 0, 1, 2, 3
_F_CR, _F_CG, _F_CB, _F_R2 = 4, 5, 6, 7
# columns of the per-block AABB layout
_A_MNX, _A_MNY, _A_MNZ, _A_MXX, _A_MXY, _A_MXZ = 0, 1, 2, 3, 4, 5

_KEY_MASK = ~np.int32(LANE - 1)                       # clear 7 low bits
_HIT_TH = int(np.float32(_BIG).view(np.int32) & _KEY_MASK)


class PallasScene(NamedTuple):
    """Scene laid out for the megakernel.

    C = number of 128-sphere clusters; CB = ceil(C / 128) cluster blocks.
    ``sphT``:  (C, 128, 8) f32 — [cluster, sphere-in-cluster, field] with
    fields cx, cy, cz, rad, cr, cg, cb, r^2.  Column slices give the
    (128, 1) per-sphere vectors the VPU quadratic wants — no in-kernel
    transposes.
    ``sph8``:  (C, 8, 128) f32 — same data transposed, the LHS of the
    one-hot payload matmul.
    ``aabbT``: (CB, CR, 8) f32 — [block, cluster-in-block, face] with
    faces mnx..mxz and CR = min(128, roundup(C, 8)) cull rows per block
    (small scenes cull on narrow arrays).  Padding clusters carry an
    empty box min=+inf, max=-inf; under the min/max slab they test as
    always-hit, but their flags are either never read (static sweeps are
    bounded by C) or zeroed after culling (dynamic sweeps).
    ``superT``: (1, SBR, 8) f32 — per-BLOCK union AABBs (SBR =
    roundup(CB, 8)): the level-1 cull table for scene-scale rendering.
    ``order`` maps (cluster*128 + lane) -> original sphere index (-1 pad).
    ``tailT``/``tail8``: (P, 8) / (8, P) f32 — the LAST cluster's first P
    rows, P = the real (non-padding) sphere count rounded up to a
    power-of-two sublane multiple.  When P < 128 the kernel peels the
    final cluster into a P-row visit: rgbbox's 400 spheres become
    3 full visits + one 16-row visit instead of 4 full ones (the 112
    padding slots were 22% of its dense intersection work).  P == 128
    (tail full, or front-to-back sorting moved the partial cluster)
    disables the peel.
    """
    sphT: jnp.ndarray
    sph8: jnp.ndarray
    aabbT: jnp.ndarray
    superT: jnp.ndarray
    order: jnp.ndarray
    tailT: jnp.ndarray
    tail8: jnp.ndarray

    @property
    def n_clusters(self) -> int:
        return self.sphT.shape[0]


def build_pallas_scene(sph: Spheres,
                       sort_origin=None,
                       cull_rows: int | None = None,
                       cluster_width: int | None = None) -> PallasScene:
    """Morton-sort + cluster the scene into the packed kernel layout.

    ``sort_origin`` (optional (3,) point, normally the camera origin)
    reorders the clusters front-to-back by AABB-centre distance from that
    point.  The visit sweep walks clusters in array order, and the
    occlusion gate (active for C > 16) prunes clusters whose AABB lies
    entirely behind the current best hit — so a front-to-back order makes
    the gate maximally effective for primary rays, the TPU analogue of the
    reference's ordered BVH descent with a shrinking t_max
    (rust/src/lib.rs:350-356).  Closest-hit output is order-independent
    except within one 2^-16 key-floor tie bucket.  The sort is applied
    WITHIN each 128-cluster block (for C <= 128 that is a global sort):
    block membership — and hence the super-block union AABBs and the
    Morton locality they rely on — is untouched, cluster padding stays at
    the global tail, and the best-t carried across blocks still prunes
    later blocks' clusters.  (Reordering whole blocks would move the
    partial block off the tail, breaking the padding-flag zeroing and the
    static per-block visit counts.)

    ``cull_rows`` overrides the per-block cull-row count CR for
    scene-scale scenes (C > 128; default 128).  Smaller CR = finer
    super-block gating: the per-cluster slab cull runs on (CR, T) rows
    per FLAGGED block only, so fewer irrelevant rows ride each cull, at
    the cost of more scalar block gates.  Semantics identical (culling
    is conservative at any grouping).

    ``cluster_width`` (default 128) sets the sphere rows per cluster
    (leaf size): the visit sweep then tests (W, T) rows per flagged
    cluster.  Narrower clusters halve the slots tested per visit but
    roughly double the cluster count (more cull rows + scalar gates) —
    the round-4 simulation sized leaf-64 at ~15% ceiling for irreg
    (tools/sim_leaf_size.py); this knob makes the end-to-end A/B
    runnable (round-4 VERDICT item 4).  Winner slots are still encoded
    as cluster*128 + lane (the ``order`` table pads each cluster's
    rows to 128 with -1), so the record/replay gradient path is
    width-agnostic.
    """
    W = cluster_width or LANE
    assert W in (32, 64, LANE), W
    n = sph.center.shape[0]
    if n <= LANE:
        # single cluster: no hierarchy to build; pad to the lane width
        # with radius-0 spheres CO-LOCATED WITH THE LAST REAL SPHERE
        # (build_bvh would silently shrink the leaf size below LANE for
        # tiny scenes).  The co-location matters: a radius-0 sphere can
        # still register a hit when the quadratic's disc rounds to +1ulp
        # for a ray passing exactly through its centre; inside a real
        # sphere such a phantom hit always loses the closest-hit min.
        pad = LANE - n
        s = Spheres(
            jnp.concatenate([sph.center,
                             jnp.repeat(sph.center[-1:], pad, axis=0)]),
            jnp.pad(sph.radius, (0, pad)),
            jnp.pad(sph.color, ((0, pad), (0, 0))))
        order = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad),
                        constant_values=-1)
        r = sph.radius[:, None]
        leaf_min = jnp.min(sph.center - r, axis=0, keepdims=True)
        leaf_max = jnp.max(sph.center + r, axis=0, keepdims=True)

        class _B:
            pass
        bvh = _B()
        bvh.n_leaves = 1
        bvh.spheres = s
        bvh.order = order
        bvh.leaf_min = leaf_min
        bvh.leaf_max = leaf_max
    else:
        # clusters-only build: the megakernel never reads the Karras
        # tree, so skip it (rgbbox build 2.0 -> sub-ms; the tree's
        # dynamic-trip-count refit/skip sweeps were the entire cost)
        bvh = build_clusters(sph, leaf_size=W)
    C = bvh.n_leaves
    s = bvh.spheres

    # cull rows per block: for small scenes the slab test runs on
    # (CR, T) arrays instead of (128, T) — at rgbbox's C=4 that is 2
    # vregs per op instead of 64 (the padding rows were 97% of the
    # culling cost).  Scene-scale scenes (C > 128) default to CR=64
    # (or the ``cull_rows`` override): measured plane-100k 97.2 ms at
    # CR=128 vs 95.4 at CR=64/32 — finer blocks cull fewer irrelevant
    # rows and the extra scalar block gates stay cheap (round-4 sweep).
    CR = (max(8, -(-C // 8) * 8) if C <= LANE
          else max(8, min(LANE, cull_rows or 64) // 8 * 8))

    leaf_min, leaf_max = bvh.leaf_min, bvh.leaf_max
    order2d = bvh.order.reshape(C, W)
    perm = None
    if sort_origin is not None and C > 16:
        o = jnp.asarray(sort_origin, jnp.float32)
        ctr = 0.5 * (leaf_min + leaf_max)
        dist = jnp.sum((ctr - o) ** 2, axis=1)
        # per-cull-block argsort (block size matches the sweep's CR rows
        # at C > 128; one global block otherwise)
        segs = [b0 + jnp.argsort(dist[b0:min(b0 + CR, C)])
                for b0 in range(0, C, CR)]
        n_full = C // CR
        if n_full >= 2:
            # scene-scale: ALSO order the full blocks front-to-back (the
            # partial tail block stays last — padding-flag zeroing and the
            # static per-block visit counts rely on it).  The sweep walks
            # blocks in array order and the occlusion gate prunes clusters
            # behind the current best hit, so near blocks first maximise
            # pruning of the far ones; each block's members (and hence its
            # super-union AABB) travel with it untouched.
            blk_d = jnp.stack([jnp.min(dist[b0:b0 + CR])
                               for b0 in range(0, n_full * CR, CR)])
            border = jnp.argsort(blk_d)
            full = jnp.stack(segs[:n_full])
            segs = [full[border].reshape(-1)] + segs[n_full:]
        perm = segs[0] if len(segs) == 1 else jnp.concatenate(segs)
        leaf_min, leaf_max = leaf_min[perm], leaf_max[perm]
        order2d = order2d[perm]

    def field(x):
        x = x.reshape(C, W)
        return x if perm is None else x[perm]

    sph8 = jnp.stack([
        field(s.center[:, 0]), field(s.center[:, 1]), field(s.center[:, 2]),
        field(s.radius),
        field(s.color[:, 0]), field(s.color[:, 1]), field(s.color[:, 2]),
        field(s.radius * s.radius),
    ], axis=1)                                            # (C, 8, 128)
    sphT = jnp.swapaxes(sph8, 1, 2)                       # (C, 128, 8)

    CB = -(-C // CR)

    def pad_clusters(x, fill):
        pad = CB * CR - C
        return jnp.pad(x, (0, pad), constant_values=fill)

    aabbT = jnp.stack([
        pad_clusters(leaf_min[:, 0], np.inf),
        pad_clusters(leaf_min[:, 1], np.inf),
        pad_clusters(leaf_min[:, 2], np.inf),
        pad_clusters(leaf_max[:, 0], -np.inf),
        pad_clusters(leaf_max[:, 1], -np.inf),
        pad_clusters(leaf_max[:, 2], -np.inf),
        jnp.zeros((CB * CR,), jnp.float32),
        jnp.zeros((CB * CR,), jnp.float32),
    ], axis=1).reshape(CB, CR, 8)                         # (CB, CR, 8)

    # level-1 super-AABBs: per-block unions (inf/-inf padding is neutral
    # under min/max and pads to SBR rows as always-miss empty boxes — but
    # note the min/max slab treats empty boxes as always-HIT; their block
    # flags gate visit ranges that are bounded by C, so they are never
    # dereferenced)
    SBR = max(8, -(-CB // 8) * 8)
    blk_min = aabbT[:, :, 0:3].min(axis=1)                # (CB, 3)
    blk_max = aabbT[:, :, 3:6].max(axis=1)
    superT = jnp.concatenate([
        jnp.pad(blk_min, ((0, SBR - CB), (0, 0)), constant_values=np.inf),
        jnp.pad(blk_max, ((0, SBR - CB), (0, 0)), constant_values=-np.inf),
        jnp.zeros((SBR, 2), jnp.float32),
    ], axis=1)[None, :, :]                                # (1, SBR, 8)

    # Tail-cluster peel tables: only when the partial cluster is still
    # LAST (the C > 16 front-to-back sort moves it) — round its real-row
    # count up to a power-of-two sublane multiple for the min slice-tree.
    n_tail = n - (C - 1) * W
    P = W
    if perm is None and n_tail < W:
        P = 8
        while P < n_tail:
            P *= 2
    if W < LANE:
        # winner slots stay encoded cluster*128 + lane for ANY width:
        # pad each cluster's order rows to 128 with -1 so the gradient
        # path's slot -> original-sphere mapping is width-agnostic
        order2d = jnp.pad(order2d, ((0, 0), (0, LANE - W)),
                          constant_values=-1)
    return PallasScene(sphT=sphT, sph8=sph8, aabbT=aabbT, superT=superT,
                       order=order2d,
                       tailT=sphT[C - 1, :P, :], tail8=sph8[C - 1, :, :P])


N_STATE = 13   # ox oy oz dx dy dz lr lg lb rr rg rb active


def _min_sublanes(x):
    """(P, T) -> (1, T) min via a static slice tree: halvings down to
    (8, T), then the in-vreg sublane reduce (≈90 cycles vs 395 naive
    at P=128).  P must be 8 * a power of two (so every slice stays
    sublane-aligned)."""
    m = x
    s = x.shape[0] // 2
    while s >= 8:
        m = jnp.minimum(m[:s, :], m[s:2 * s, :])
        s //= 2
    return jnp.min(m, axis=0, keepdims=True)


def _megakernel(params_ref,               # SMEM (24,) f32
                sphT_ref,                 # VMEM (C, 128, 8) f32
                sph8_ref,                 # VMEM (C, 8, 128) f32
                aabb_ref,                 # VMEM (CB, CR, 8) f32
                super_ref,                # VMEM (1, SBR, 8) f32 block AABBs
                tailT_ref,                # VMEM (P, 8) f32 tail-peel rows
                tail8_ref,                # VMEM (8, P) f32 (transposed)
                *refs,                    # [13 state_in] outputs, scratches
                tile: int, n_clusters: int, max_depth: int,
                far_root: bool, cull: bool, gen_rays: bool = True,
                emit_state: bool = False, block_tiled: bool = False,
                emit_float: bool = False, record: bool = False,
                record_pay: bool = False, hbm_spheres: bool = False,
                lane_groups: int = 1, force_occl: bool = False,
                emit_stats: bool = False, runtime_depth: bool = False):
    T = tile
    C = n_clusters
    CB = aabb_ref.shape[0]
    CR = aabb_ref.shape[1]            # cull rows per block (8..128)
    n_in = 0 if gen_rays else N_STATE
    state_in = refs[:n_in]
    if hbm_spheres:
        # trailing scratches: two sphere-block DMA buffers + semaphores
        # (double-buffered streaming: cluster c+1's block is in flight
        # while cluster c is intersected)
        (hits_ref, hits2_ref, bufA_ref, bufB_ref, semA, semB) = refs[-6:]
        out_refs = refs[n_in:-6]
    else:
        out_refs = refs[n_in:-2]
        hits_ref = refs[-2]
        hits2_ref = refs[-1]
    if emit_stats:
        # per-tile work counters (see _call_megakernel emit_stats): row 0 =
        # Σ sphere-rows over executed visits (per lane), row 1 = bounces run
        stats_ref = out_refs[-1]
        out_refs = out_refs[:-1]
    if record_pay:
        pay_ref = out_refs[-1]
        out_refs = out_refs[:-1]
    if record:
        rec_ref = out_refs[-1]
        out_refs = out_refs[:-1]

    width = params_ref[16]
    height = params_ref[17]
    inv_w = params_ref[18]
    inv_h = params_ref[19]
    row_off = params_ref[12]   # first image row of this shard (0 unsharded)
    if runtime_depth:
        # depth cap as a RUNTIME scalar (params[13]): every phase of a
        # compaction schedule — and every schedule being swept — shares
        # ONE compiled kernel per (gen_rays, emit) structure instead of
        # one per depth cap (compile latency was ~25 s x 4 phase kernels
        # per scene config).  Not available in record modes (rec/pay
        # output shapes are static per segment).
        assert not (record or record_pay), "record shapes need static depth"
        max_d = jnp.int32(params_ref[13])
    else:
        max_d = max_depth

    if gen_rays:
        # ---- fused ray generation (futhark/ray.fut:150-168) ----
        pid = pl.program_id(0)
        lid = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(
            jnp.float32)
        if block_tiled:
            # tiles are (block_h x block_w) image rectangles: image-local
            # rays share a much tighter cluster union than scanline runs
            # (matters for grazing-view scenes like irreg).
            bpr = params_ref[20]       # blocks per image row
            bw = params_ref[21]
            bh = params_ref[22]
            inv_bpr = params_ref[23]
            pidf = jnp.float32(pid)
            tr = jnp.floor(pidf * inv_bpr)
            tc = pidf - tr * bpr
            # f32-reciprocal div/mod can be off by one ulp; renormalise
            # (arithmetic form — Mosaic lacks some select_n broadcasts)
            ov = (tc >= bpr).astype(jnp.float32)
            un = (tc < 0.0).astype(jnp.float32)
            tc = tc - ov * bpr + un * bpr
            tr = tr + ov - un
            inv_bw = 1.0 / bw
            by = jnp.floor(lid * inv_bw)
            bx = lid - by * bw
            ov = (bx >= bw).astype(jnp.float32)
            un = (bx < 0.0).astype(jnp.float32)
            bx = bx - ov * bw + un * bw
            by = by + ov - un
            i = tc * bw + bx
            j = tr * bh + by + row_off
        else:
            ids = pid * T + lid
            j = jnp.floor(ids * inv_w)                  # j = id div w
            i = ids - j * width                         # i = id mod w
            ov = (i >= width).astype(jnp.float32)
            un = (i < 0.0).astype(jnp.float32)
            i = i - ov * width + un * width
            j = j + ov - un + row_off
        u = i * inv_w
        v = (height - j) * inv_h
        # dir = llc + u*horizontal + v*vertical - origin
        dx = (params_ref[0] + u * params_ref[3] + v * params_ref[6]
              - params_ref[9])
        dy = (params_ref[1] + u * params_ref[4] + v * params_ref[7]
              - params_ref[10])
        dz = (params_ref[2] + u * params_ref[5] + v * params_ref[8]
              - params_ref[11])
        ox = jnp.full((1, T), params_ref[9])
        oy = jnp.full((1, T), params_ref[10])
        oz = jnp.full((1, T), params_ref[11])
        lr0 = lg0 = lb0 = active0 = jnp.ones((1, T), jnp.float32)
        rr0 = rg0 = rb0 = jnp.zeros((1, T), jnp.float32)
    else:
        # ---- continuation: load ray state written by a previous phase ----
        (ox, oy, oz, dx, dy, dz, lr0, lg0, lb0, rr0, rg0, rb0,
         active0) = (r[0, :, :] for r in state_in)

    lane_col = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    eps = jnp.float32(SCENE_EPSILON)
    key_mask = jnp.int32(_KEY_MASK)
    krun_init = jnp.int32(_HIT_TH | (LANE - 1))

    NG = lane_groups
    G = T // NG
    ROWS = CB * CR            # flag rows per lane group
    # double-buffered HBM sphere streaming rides the gated 8-cluster runs
    # of the dynamic sweep (the only path hbm scenes take): the run
    # prologue starts cluster base's DMA, each visit waits its own block
    # and prefetches the next into the other buffer, so the fetch hides
    # behind the previous cluster's intersection math.  DMA choreography
    # is UNCONDITIONAL within a gated run (start/wait pairing must be
    # exact); only the compute is flag-gated.  Skipped runs issue no DMAs.
    hbm_stream = hbm_spheres and cull and CB > 1

    def _hbm_wait(c):
        # The wait descriptor deliberately uses sph8_ref.at[0] (not the
        # clamped .at[c] the paired _hbm_start used): wait() only
        # consumes the descriptor's shape + semaphore, and index 0 is
        # always in bounds.  Reconstructing the exact clamped index here
        # would re-evaluate the clamp for no semantic effect.
        par = c & 1

        @pl.when(par == 0)
        def _():
            pltpu.make_async_copy(sph8_ref.at[0], bufA_ref, semA).wait()

        @pl.when(par == 1)
        def _():
            pltpu.make_async_copy(sph8_ref.at[0], bufB_ref, semB).wait()

    def _hbm_start(c, into_parity):
        c = jnp.minimum(c, C - 1)      # padding runs: clamp (data unused)

        @pl.when(into_parity == 0)
        def _():
            pltpu.make_async_copy(sph8_ref.at[c], bufA_ref, semA).start()

        @pl.when(into_parity == 1)
        def _():
            pltpu.make_async_copy(sph8_ref.at[c], bufB_ref, semB).start()

    def closest_hit(ox, oy, oz, dx, dy, dz, active):
        """Culled packed-key search.  Returns (krun (1,T) int32,
        pay (8,T) f32 with the winner's fields).

        With ``lane_groups`` > 1 the visit sweep runs once per lane
        group of G = T/NG rays, each gated on ITS OWN cull flags and
        occlusion window: a (64,32) block tile's 2048-ray union
        overstates every subgroup's cluster needs (measured
        tools/sim_group_cull2.py: irreg visits drop 5.3% -> 2.7% of
        dense at G=256 under occlusion), and fully-dead groups skip
        for free."""
        a = dx * dx + dy * dy + dz * dz
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz
        active_b = active > 0.0

        def slab_ok(blk, oxs, oys, ozs, idxs, idys, idzs, act):
            """Live-overlap mask for an (Rk, 8) AABB table -> (Rk, W)."""
            lo = hi = None
            for face_mn, face_mx, oo, inv in (
                    (_A_MNX, _A_MXX, oxs, idxs),
                    (_A_MNY, _A_MXY, oys, idys),
                    (_A_MNZ, _A_MXZ, ozs, idzs)):
                t0 = (blk[:, face_mn:face_mn + 1] - oo) * inv    # (Rk, W)
                t1 = (blk[:, face_mx:face_mx + 1] - oo) * inv
                alo = jnp.minimum(t0, t1)
                ahi = jnp.maximum(t0, t1)
                lo = alo if lo is None else jnp.maximum(lo, alo)
                hi = ahi if hi is None else jnp.minimum(hi, ahi)
            lo = jnp.maximum(lo, T_MIN)
            hi = jnp.minimum(hi, _BIG)
            # fail-if polarity: NaN stages (axis-parallel ray on a slab
            # plane) report HIT — conservative for culling.
            ok = ~(hi <= lo) & jnp.broadcast_to(act, lo.shape)
            return ok.astype(jnp.float32)

        # (flag-count reductions stay on the VPU: routing them through
        # an MXU ones-dot was measured a consistent slight LOSS — the
        # visit gates' scalar conds then wait on MXU latency.)
        def slab_counts(blk):
            return jnp.sum(slab_ok(blk, ox, oy, oz, inv_dx, inv_dy,
                                   inv_dz, active_b),
                           axis=1, keepdims=True)        # (Rk, 1)

        # Phase A0 (scene-scale, CB > 1): super-AABB culling over whole
        # 128-cluster blocks — an O(C/128) prefilter that gates both the
        # per-cluster culling and the visit sweep, giving ~O(log n)-ish
        # per-ray cost on big Morton-local scenes (the TPU answer to the
        # reference's per-ray tree descent, futhark/bvh.fut:61-84).
        two_level = cull and CB > 1
        if two_level:
            sup = super_ref[0, :, :]                    # (SBR, 8)
            hits2_ref[:, :] = slab_counts(sup)

        # Phase A: min/max slab culling over cluster blocks, masked by the
        # live rays; any-live-hit flags land in VMEM scratch laid out
        # (lane_group * ROWS + cluster, 1) for the scalar visit-skip reads.
        for cb in ([] if not cull else range(CB)):
            def cull_block(cb=cb):
                blk = aabb_ref[pl.ds(cb, 1), :, :].reshape(CR, 8)
                okf = slab_ok(blk, ox, oy, oz, inv_dx, inv_dy, inv_dz,
                              active_b)                  # (CR, T)
                for lg in range(NG):
                    hits_ref[pl.ds(lg * ROWS + cb * CR, CR), :] = jnp.sum(
                        okf[:, lg * G:(lg + 1) * G], axis=1, keepdims=True)
            if two_level:
                # skipped blocks keep stale cluster flags, but the visit
                # sweep re-checks the same block flag before reading them
                @pl.when(hits2_ref[cb, 0] > 0.0)
                def _(cb=cb):
                    cull_block(cb)
            else:
                cull_block(cb)

        if cull and CB > 4 and CB * CR > C:
            # dynamic sweeps run full [block, group] ranges: padding
            # clusters (empty boxes test always-HIT under min/max slabs)
            # must carry zero flags so their visit conds never fire.
            # This MUST run after the cull loop — the last block's cull
            # writes always-hit counts over the padding rows, and a visit
            # with c >= C would DMA past the sphere tables in hbm mode.
            pad_rows = CB * CR - C
            for lg in range(NG):
                hits_ref[pl.ds(lg * ROWS + C, pad_rows), :] = jnp.zeros(
                    (pad_rows, 1), jnp.float32)

        # Phase B: visit flagged clusters; dense quadratic -> packed
        # (t | lane) key -> one min-reduce -> one-hot MXU payload.
        # One full sweep per lane group (NG static instantiations).
        def group_sweep(lg):
            ls = slice(lg * G, (lg + 1) * G)
            oxg, oyg, ozg = ox[:, ls], oy[:, ls], oz[:, ls]
            dxg, dyg, dzg = dx[:, ls], dy[:, ls], dz[:, ls]
            ag = a[:, ls]
            epsa = eps * ag           # the m = a*t eps window, per ray
            invdx, invdy, invdz = (inv_dx[:, ls], inv_dy[:, ls],
                                   inv_dz[:, ls])
            frow = lg * ROWS          # this group's flag-row base

            def visit(c, carry, tail=False):
                anyhit = (hits_ref[frow + c, 0] if cull
                          else jnp.float32(1.0))
                if hbm_stream and not tail:
                    # double-buffer rotation: wait THIS cluster's block
                    # (started by the run prologue or the previous
                    # visit), then prefetch the next cluster of the run
                    # into the other buffer so its fetch overlaps this
                    # cluster's intersection math.  Unconditional (flag-
                    # independent) to keep start/wait pairing exact.
                    _hbm_wait(c)

                    @pl.when(((c + 1) & 7) != 0)
                    def _():
                        _hbm_start(c + 1, (c + 1) & 1)

                def do_visit(carry):
                    krun, pay = carry[0], carry[1]
                    if tail:
                        # peeled partial FINAL cluster: only its P real
                        # rows (rgbbox: 16 of 128 — the padding slots
                        # were 22% of the dense intersection work)
                        blkT = tailT_ref[:, :]               # (P, 8)
                        blk8 = tail8_ref[:, :]               # (8, P)
                    elif hbm_stream:
                        # sphere tables exceed VMEM at this C: the block
                        # was DMA'd ahead by the run's double-buffer
                        # rotation (see visit()); pick this cluster's
                        # buffer by parity.  The select runs in INT32
                        # bit space: the inactive buffer is
                        # uninitialized scratch (or mid-DMA), and an f32
                        # arithmetic select would turn an Inf/NaN bit
                        # pattern there into NaN (Inf*0 = NaN) — int
                        # multiply by 0 is 0 for any bits.
                        par = (c & 1)
                        a_i = jax.lax.bitcast_convert_type(
                            bufA_ref[:, :], jnp.int32)
                        b_i = jax.lax.bitcast_convert_type(
                            bufB_ref[:, :], jnp.int32)
                        blk8 = jax.lax.bitcast_convert_type(
                            a_i * (1 - par) + b_i * par, jnp.float32)
                        blkT = jnp.swapaxes(blk8, 0, 1)
                    elif hbm_spheres:
                        # non-streaming fallback (uncull/simple sweeps):
                        # synchronous per-visit DMA (lane-aligned; a
                        # (128,8) slice would violate Mosaic tiling)
                        d8 = pltpu.make_async_copy(sph8_ref.at[c],
                                                   bufA_ref, semA)
                        d8.start()
                        d8.wait()
                        blkT = jnp.swapaxes(bufA_ref[:, :], 0, 1)
                        blk8 = bufA_ref[:, :]
                    else:
                        # cluster width from the table shape (leaf-64
                        # scenes: (C, W, 8) with W < 128)
                        Wc = sphT_ref.shape[1]
                        blkT = sphT_ref[pl.ds(c, 1), :, :].reshape(Wc, 8)
                        blk8 = sph8_ref[pl.ds(c, 1), :, :].reshape(8, Wc)
                    P = blkT.shape[0]
                    lanes = (lane_col if P == LANE else
                             jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0))
                    sx = blkT[:, _F_CX:_F_CX + 1]        # (P, 1)
                    sy = blkT[:, _F_CY:_F_CY + 1]
                    sz = blkT[:, _F_CZ:_F_CZ + 1]
                    r2 = blkT[:, _F_R2:_F_R2 + 1]
                    ocx = oxg - sx                       # (P, G)
                    ocy = oyg - sy
                    ocz = ozg - sz
                    b_ = ocx * dxg + ocy * dyg + ocz * dzg
                    c_ = ocx * ocx + ocy * ocy + ocz * ocz - r2
                    disc = b_ * b_ - ag * c_
                    pos = disc > 0.0
                    # no where() before the sqrt: a miss's NaN sq flows
                    # into m0/m1 but every consumer is masked by pos
                    # (use0 and m>epsa are false on NaN) — value-identical
                    # to sqrt(where(pos, disc, 1)) and one op cheaper
                    sq = jnp.sqrt(disc)
                    # a-scaled candidates: compare m = a*t = -b ∓ sqrt
                    # instead of t itself.  a = |d|² is PER-RAY, so the
                    # ordering across the sweep's spheres is exactly t's
                    # (multiplying by the same positive inv_a is monotone
                    # in f32) and the two per-slot inv_a multiplies are
                    # saved; the eps window test moves to m > a*eps
                    # (1-ulp-of-eps boundary, inside the 2^-16 key floor
                    # already accepted).  Constraint: a real hit needs
                    # a*t < T_MAX for the BIG sentinel to stay the max —
                    # holds for any sane camera (reference scenes:
                    # a*t < ~1e5 vs 1e9).  bounce_body unscales the
                    # winner with one (1,T) multiply.
                    m0 = -b_ - sq
                    use0 = m0 > epsa
                    if far_root:
                        m1 = -b_ + sq
                        m = jnp.where(use0, m0, m1)
                        tv = jnp.where(pos & (m > epsa), m, _BIG)
                    else:
                        # near-root only: m>epsa after the m0/BIG select
                        # is exactly pos & use0 (BIG > a*eps trivially)
                        tv = jnp.where(pos & use0, m0, _BIG)
                    key = ((jax.lax.bitcast_convert_type(tv, jnp.int32)
                            & key_mask) | lanes)
                    kmin = _min_sublanes(key)            # (1, G)
                    imp_b = kmin < krun
                    impf = imp_b.astype(jnp.float32)
                    # the (8,P)@(P,G) dot reads back the winner's fields
                    # EXACTLY (single nonzero term per output; 3-pass
                    # bf16 covers f32); the 'improved' mask multiplies
                    # the (8,G) RESULT, not the (P,G) one-hot — impf is
                    # exactly 0/1 so the values are identical and the
                    # wide mask multiply is saved
                    onehot = (key == kmin).astype(jnp.float32)
                    pay_c = jax.lax.dot_general(
                        blk8, onehot,
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (8, G)
                    # select-free exact update (Mosaic has no (1,G)->(8,G)
                    # select_n broadcast): pay*0 + pay_c  or  pay*1 + 0
                    pay = pay * (1.0 - impf) + pay_c * impf
                    krun = jnp.minimum(krun, kmin)
                    ret = [krun, pay]
                    if record:
                        cidx = carry[2]
                        cidx = jnp.where(imp_b, jnp.int32(c), cidx)
                        ret.append(cidx)
                    if emit_stats:
                        # exact executed-work counter: P sphere rows were
                        # tested against every lane of this group
                        ret.append(carry[-1] + jnp.float32(P))
                    return tuple(ret)

                # occlusion gate (C > 16 scenes): re-test this cluster's
                # AABB against the group's CURRENT best t — clusters
                # entirely behind the closest hit so far are skipped.
                # Front-to-back cluster order (build_pallas_scene
                # sort_origin) makes the sweep order match; this is the
                # TPU analogue of the reference's shrinking-t_max descent
                # (futhark/bvh.fut:61-84 via objs_hit's fold).  Skipping
                # only changes winners within one 2^-16 key-floor bucket
                # (ties).  measured: the gate pays for C > 16 (irreg
                # 87 -> 77 ms) but LOSES at rgbbox's C=4 (92 -> 111 ms:
                # 4 gates cost more than the visits saved).  force_occl
                # overrides for compacted continuation phases, whose
                # coherent tiles make the gate prune even at tiny C.
                occl = cull and (C > 16 or force_occl)

                def gated(carry):
                    if not occl:
                        return do_visit(carry)
                    cb_g = c // CR
                    r_g = c - cb_g * CR
                    lo = hi = None
                    for fmn, fmx, oo, inv in (
                            (_A_MNX, _A_MXX, oxg, invdx),
                            (_A_MNY, _A_MXY, oyg, invdy),
                            (_A_MNZ, _A_MXZ, ozg, invdz)):
                        t0 = (aabb_ref[cb_g, r_g, fmn] - oo) * inv  # (1, G)
                        t1 = (aabb_ref[cb_g, r_g, fmx] - oo) * inv
                        alo = jnp.minimum(t0, t1)
                        ahi = jnp.maximum(t0, t1)
                        lo = alo if lo is None else jnp.maximum(lo, alo)
                        hi = ahi if hi is None else jnp.minimum(hi, ahi)
                    best_f = jax.lax.bitcast_convert_type(
                        carry[0] & key_mask, jnp.float32)
                    ok = ~(jnp.minimum(hi, _BIG) <= jnp.maximum(lo, T_MIN))
                    # best_f is in m = a*t units (see do_visit): compare
                    # the slab's t-space entry against best_f/a as
                    # lo * a < best_f (a > 0).  fail-if polarity (~>=):
                    # a NaN lo (origin exactly on an axis-parallel slab
                    # plane) must KEEP the cluster, matching slab_ok's
                    # NaN-reports-HIT convention — 'lo < best_f' would
                    # silently skip it.
                    ok &= ~(lo * ag >= best_f)
                    n_ok = jnp.sum(ok.astype(jnp.float32))
                    return jax.lax.cond(n_ok > 0.0, do_visit, lambda x: x,
                                        carry)

                if not cull:
                    return do_visit(carry)
                return jax.lax.cond(anyhit > 0.0, gated, lambda x: x,
                                    carry)

            init = (jnp.full((1, G), krun_init),
                    jnp.ones((8, G), jnp.float32))
            if record:
                init = init + (jnp.zeros((1, G), jnp.int32),)
            if emit_stats:
                init = init + (jnp.zeros((1, G), jnp.float32),)

            def sweep_range(lo_c, n, carry):
                """Visit clusters [lo_c, lo_c+n) with 8-cluster run gates:
                one scalar flag-sum skips 8 cond evaluations at a time."""
                if not cull or n <= 8:
                    return jax.lax.fori_loop(lo_c, lo_c + n, visit, carry)
                for g0 in range(lo_c, lo_c + n, 8):
                    gn = min(8, lo_c + n - g0)
                    gsum = sum(hits_ref[frow + g0 + j, 0]
                               for j in range(gn))
                    carry = jax.lax.cond(
                        gsum > 0.0,
                        lambda x, g0=g0, gn=gn: jax.lax.fori_loop(
                            g0, g0 + gn, visit, x),
                        lambda x: x, carry)
                return carry

            # tail-cluster peel: single-block sweeps visit the last
            # cluster at its real row count P < 128 (build_pallas_scene
            # keeps the partial cluster last exactly when P < 128)
            peel = (tailT_ref.shape[0] < LANE and not hbm_spheres
                    and not (cull and CB > 1))
            if not (cull and CB > 1):
                carry = sweep_range(0, C - 1 if peel else C, init)
                if peel:
                    carry = visit(C - 1, carry, tail=True)
                return carry
            if CB <= 4:
                # unrolled: per-block scalar gate around each cluster run.
                # Do NOT raise this threshold: at CB=7 (plane-100k) the
                # unroll measured 388 ms vs the dynamic path's 144 at the
                # same tile/schedule — ~112 static cond regions explode
                # the kernel code size (tools/ab_plane_bigtile.py).
                carry = init
                for cb in range(CB):
                    n_in_block = min(CR, C - cb * CR)
                    carry = jax.lax.cond(
                        hits2_ref[cb, 0] > 0.0,
                        lambda x, cb=cb, n=n_in_block: sweep_range(
                            cb * CR, n, x),
                        lambda x: x, carry)
                return carry

            # scene-scale sweep, fully dynamic (unrolling 60+ blocks
            # explodes compile time): block cond -> 8-cluster run cond ->
            # visit cond.  Padding-cluster flags were zeroed after
            # culling, so dynamic bounds never reach a visit with c >= C.
            def run_body(args):
                cb, rg, carry = args

                def gated_run(carry):
                    base = cb * CR + rg * 8
                    if hbm_stream:
                        _hbm_start(base, 0)      # 8-aligned base: parity 0
                    return jax.lax.fori_loop(base, base + 8, visit, carry)

                base = cb * CR + rg * 8
                gsum = sum(hits_ref[frow + base + j, 0] for j in range(8))
                return jax.lax.cond(gsum > 0.0, gated_run,
                                    lambda x: x, carry)

            def block_body(cb, carry):
                def runs(carry):
                    return jax.lax.fori_loop(
                        0, CR // 8,
                        lambda rg, x: run_body((cb, rg, x)), carry)
                return jax.lax.cond(hits2_ref[cb, 0] > 0.0, runs,
                                    lambda x: x, carry)

            return jax.lax.fori_loop(0, CB, block_body, init)

        if NG == 1:
            out = group_sweep(0)
        else:
            parts = [group_sweep(lg) for lg in range(NG)]
            out = tuple(jnp.concatenate([p[k] for p in parts], axis=1)
                        for k in range(len(parts[0])))
        if emit_stats:
            # exact CULL rows executed this bounce (per lane): the slab
            # test runs on (CR, T) rows per executed cull block — gated
            # by the super-AABB flags in two-level mode — plus the SBR
            # super rows themselves.  Separating cull work from visit
            # work turns the plane-class roofline split (visits vs cull
            # vs residual) from a modelled upper bound into a counter
            # (round-4 VERDICT item 5).
            if not cull:
                crows = jnp.float32(0.0)
            elif two_level:
                crows = jnp.float32(super_ref.shape[1]) + jnp.float32(
                    CR) * sum(
                    (hits2_ref[cb, 0] > 0.0).astype(jnp.float32)
                    for cb in range(CB))
            else:
                crows = jnp.float32(CR)
            out = out + (crows,)
        return out

    def bounce_body(state):
        if emit_stats:
            scnt, ccnt, state = state[-2], state[-1], state[:-2]
        (depth, n_active, ox, oy, oz, dx, dy, dz,
         lr, lg, lb, rr, rg, rb, active) = state
        ch = closest_hit(ox, oy, oz, dx, dy, dz, active)
        krun, pay = ch[0], ch[1]
        hit_b = krun < jnp.int32(_HIT_TH)
        best_m = jax.lax.bitcast_convert_type(krun & key_mask, jnp.float32)

        # row extraction by masked sublane-sum: exact (other rows are
        # exactly zero) and yields canonical-layout (1,T) values, which
        # direct (8,T) row slicing does not (Mosaic then fails later
        # select_n's with 'Not implemented: Sublane broadcast')
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        def row(r):
            m = (row_ids == r).astype(jnp.float32)
            return jnp.sum(pay * m, axis=0, keepdims=True)   # (1, T)

        scx = row(_F_CX)
        scy = row(_F_CY)
        scz = row(_F_CZ)
        srad = row(_F_RAD)
        sr_ = row(_F_CR)
        sg_ = row(_F_CG)
        sb_ = row(_F_CB)

        # two-phase re-intersection with widened window (ray.fut:84-85);
        # the key floor (≤ 2^-16 relative) is far inside the +1.0 slop
        ocx = ox - scx
        ocy = oy - scy
        ocz = oz - scz
        a = dx * dx + dy * dy + dz * dz
        b_ = ocx * dx + ocy * dy + ocz * dz
        c_ = ocx * ocx + ocy * ocy + ocz * ocz - srad * srad
        disc = b_ * b_ - a * c_
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        inv_a = 1.0 / a
        t0 = (-b_ - sq) * inv_a
        t1 = (-b_ + sq) * inv_a
        # unscale the winner's a*t key back to t for the widened window
        w_hi = best_m * inv_a + 1.0
        ok0 = (t0 < w_hi) & (t0 > T_MIN)
        t2 = jnp.where(ok0, t0, t1)

        px = ox + t2 * dx
        py = oy + t2 * dy
        pz = oz + t2 * dz
        inv_r = 1.0 / srad
        nx = (px - scx) * inv_r
        ny = (py - scy) * inv_r
        nz = (pz - scz) * inv_r
        inv_dn = jax.lax.rsqrt(a)
        ux = dx * inv_dn
        uy = dy * inv_dn
        uz = dz * inv_dn
        udn = ux * nx + uy * ny + uz * nz
        rx = ux - 2.0 * udn * nx
        ry = uy - 2.0 * udn * ny
        rz = uz - 2.0 * udn * nz
        scatter_ok = (rx * nx + ry * ny + rz * nz) > 0.0

        active_b = active > 0.0
        bounce = active_b & hit_b & scatter_ok
        miss = active_b & ~hit_b

        if record:
            # per-bounce path record for the differentiable replay
            # (grad/pallas_diff.py): winner sphere slot for a scattering
            # hit, -1 miss, -2 inactive, -3 absorbed hit
            winner = ch[2] * LANE + (krun & jnp.int32(LANE - 1))
            rec = jnp.where(active_b,
                            jnp.where(hit_b,
                                      jnp.where(scatter_ok, winner, -3),
                                      -1),
                            -2).astype(jnp.int32)
            rec_ref[0, pl.ds(depth, 1), :] = rec
        if record_pay:
            # the winner's 8 sphere fields for the Pallas backward
            # replay (grad/pallas_replay_bwd.py) — already extracted by
            # the one-hot payload; rows beyond the hit mask are
            # where-masked by the consumer via the rec events.  Row 7
            # is unused by the replay; writing ones keeps the tensor
            # fully defined.
            for pr, val in enumerate((scx, scy, scz, srad, sr_, sg_, sb_,
                                      None)):
                v = (jnp.ones((1, T), jnp.float32) if val is None
                     else val)
                pay_ref[0, pl.ds(depth, 1), pl.ds(pr, 1), :] = v.reshape(
                    1, 1, T)

        # sky gradient (ray.fut:141-148)
        tsky = 0.5 * (uy + 1.0)
        skyr = (1.0 - tsky) + tsky * 0.5
        skyg = (1.0 - tsky) + tsky * 0.7
        skyb = (1.0 - tsky) + tsky * 1.0

        rr = jnp.where(miss, lr * skyr, rr)
        rg = jnp.where(miss, lg * skyg, rg)
        rb = jnp.where(miss, lb * skyb, rb)
        lr = jnp.where(bounce, lr * sr_, lr)
        lg = jnp.where(bounce, lg * sg_, lg)
        lb = jnp.where(bounce, lb * sb_, lb)
        ox = jnp.where(bounce, px, ox)
        oy = jnp.where(bounce, py, oy)
        oz = jnp.where(bounce, pz, oz)
        dx = jnp.where(bounce, rx, dx)
        dy = jnp.where(bounce, ry, dy)
        dz = jnp.where(bounce, rz, dz)
        active = jnp.where(bounce, 1.0, 0.0)
        n_active = jnp.sum(active)
        out = (depth + 1, n_active, ox, oy, oz, dx, dy, dz,
               lr, lg, lb, rr, rg, rb, active)
        if emit_stats:
            out = out + (scnt + ch[-2], ccnt + ch[-1])
        return out

    def bounce_cond(state):
        depth, n_active = state[0], state[1]
        return (depth < max_d) & (n_active > 0.0)

    if record:
        # bounces past a tile's early exit read as 'inactive' in replay
        for dd in range(max_depth):
            rec_ref[0, dd:dd + 1, :] = jnp.full((1, T), -2, jnp.int32)
    state = (jnp.int32(0), jnp.sum(active0), ox, oy, oz, dx, dy, dz,
             lr0, lg0, lb0, rr0, rg0, rb0, active0)
    if emit_stats:
        state = state + (jnp.zeros((1, T), jnp.float32), jnp.float32(0.0))
    state = jax.lax.while_loop(bounce_cond, bounce_body, state)
    if record_pay:
        # ones (not zeros) for the rows the bounce loop did not reach:
        # the backward replay divides by the recorded radius before
        # masking, and 0 would put NaN-breeding infs next to the
        # where-masks.  Filled AFTER the loop for [exit_depth, D) and
        # only on live-at-entry tiles — all-dead tiles skip both
        # backward passes via the step-0 record gate (segment 0 has no
        # dead tiles), so their pay block is never read; the old
        # up-front full (D, 8, T) init cost ~2 ms of VMEM stores on the
        # deep segment's mostly-dead tiles.
        @pl.when(jnp.sum(active0) > 0.0)
        def _fill_pay():
            def fill(dd, c):
                for pr in range(8):
                    pay_ref[0, pl.ds(dd, 1), pl.ds(pr, 1), :] = jnp.ones(
                        (1, 1, T), jnp.float32)
                return c
            jax.lax.fori_loop(state[0], max_depth, fill, 0)
    if emit_stats:
        # row 0: per-lane sphere rows tested (Σ over this ray's executed
        # visits); row 1: bounce sweeps this tile ran; row 2: AABB cull
        # rows executed (per lane — every lane rides each (CR, T) slab
        # row).  Exact executed work — the auditable numerators of the
        # VPU-ceiling utilization figures (bench.py) and the per-phase
        # visit/cull breakdown (tools/phase_stats.py).
        stats_ref[0, 0:1, :] = state[-2]
        stats_ref[0, 1:2, :] = jnp.full((1, T),
                                        state[0].astype(jnp.float32))
        stats_ref[0, 2:3, :] = jnp.full((1, T), state[-1])
        state = state[:-2]

    if emit_state:
        for ref, val in zip(out_refs, state[2:2 + N_STATE]):
            ref[0, :, :] = val
    elif emit_float:
        for ref, val in zip(out_refs, state[11:14]):           # rr rg rb
            ref[0, :, :] = val
    else:
        rr, rg, rb = state[11], state[12], state[13]
        # 255.99 quantization + packing (ray.fut:156-162)
        pr = (255.99 * rr).astype(jnp.int32)
        pg = (255.99 * rg).astype(jnp.int32)
        pb = (255.99 * rb).astype(jnp.int32)
        packed = (pr << 16) | (pg << 8) | pb                   # (1, T)
        out_refs[0][0, :, :] = packed


def _count_sum(x):
    """Exact sum of per-lane executed-work counters.

    The counters are integer-valued f32 per lane (each bounded well
    under 2^31: slots tested by one ray over a render); a plain f32
    tree-sum rounds once totals pass 2^24, and a naive int32 per-tile
    lane-sum OVERFLOWS on heavy scene-scale tiles (soup-1M d5: ~9e8
    mean per tile, >2^31 on dense tiles — it silently reported 0.45e9
    of ~30e9 slot-tests).  Split each lane value 16/15 bits FIRST, sum
    each half per tile in int32 (lo < 2^16 * T = 2^27; hi < 2^15 * T =
    2^26 — exact), then reduce the per-tile halves across tiles with
    the same 16/15 split (tile counts <= 2^15).  Every partial is an
    exact int32; the ONLY rounding is the final f32 combine (relative
    error <= 2^-23)."""
    xi = x.astype(jnp.int32)
    lane_lo = jnp.sum(xi & 0xFFFF, axis=-1)           # per-tile, exact
    lane_hi = jnp.sum(xi >> 16, axis=-1)              # per-tile, exact

    def red(pt):                                      # tiles -> f32, exact
        lo = jnp.sum(pt & 0xFFFF)
        hi = jnp.sum(pt >> 16)
        return hi.astype(jnp.float32) * 65536.0 + lo.astype(jnp.float32)

    return red(lane_hi) * 65536.0 + red(lane_lo)


def render_pallas(scene: PallasScene, cam: Camera, width: int, height: int,
                  max_depth: int = MAX_DEPTH, tile: int = DEFAULT_TILE,
                  far_root: bool = True, interpret: bool = False,
                  block: tuple | None = None, cull: bool | None = None,
                  row0=0.0, total_height: int | None = None,
                  lane_groups: int | None = None,
                  with_stats: bool = False):
    """Render -> packed int32 (h, w) via the megakernel.

    ``block=(bh, bw)`` with bh*bw == tile assigns each grid program a 2-D
    image rectangle instead of a scanline run; image-local rays share far
    tighter cluster unions (big win on grazing-view scenes).  The image is
    padded up to block multiples internally (padding rays hit the same
    scene and are cropped away).

    ``cull=None`` auto-enables culling for C > 1 (per-bounce live-ray
    masking makes it pay even for tiny scenes).

    ``row0``/``total_height`` render a horizontal slab [row0, row0+height)
    of a ``total_height``-row image — the shard_map unit for multi-chip
    rendering (parallel/mesh.py).  ``row0`` may be a traced scalar (it is
    a runtime parameter: per-shard offsets don't recompile).
    """
    if cull is None:
        cull = scene.n_clusters > 1
    th = height if total_height is None else total_height
    row0 = jnp.asarray(row0, jnp.float32).reshape(1)
    hw_params = jnp.asarray([width, th, 1.0 / width, 1.0 / th], jnp.float32)
    # params[13] = runtime bounce cap: one compiled kernel per structure
    # serves every depth (and every schedule phase — see _megakernel)
    mid = jnp.concatenate([row0,
                           jnp.asarray([max_depth, 0.0, 0.0], jnp.float32)])
    if block is not None:
        bh, bw = block
        assert bh * bw == tile, (block, tile)
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        num_tiles = (wp // bw) * (hp // bh)
        params = jnp.concatenate([
            cam.llc, cam.horizontal, cam.vertical, cam.origin,
            mid, hw_params,
            jnp.asarray([wp // bw, bw, bh, 1.0 / (wp // bw)], jnp.float32),
        ]).astype(jnp.float32)
        out = _call_megakernel(scene, params, num_tiles, tile, max_depth,
                               far_root, cull, interpret, gen_rays=True,
                               emit_state=False, block_tiled=True,
                               lane_groups=lane_groups,
                               emit_stats=with_stats, runtime_depth=True)
        if with_stats:
            out, stats = out
        img = (out.reshape(hp // bh, wp // bw, bh, bw)
               .transpose(0, 2, 1, 3).reshape(hp, wp))[:height, :width]
        if with_stats:
            return img, dict(slot_tests=_count_sum(stats[:, 0, :]),
                             ray_bounces=_count_sum(stats[:, 1, :]),
                             cull_rows=_count_sum(stats[:, 2, :]))
        return img

    R = width * height
    num_tiles = -(-R // tile)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        mid, hw_params,
        jnp.zeros((4,), jnp.float32),
    ]).astype(jnp.float32)

    out = _call_megakernel(scene, params, num_tiles, tile, max_depth,
                           far_root, cull, interpret, gen_rays=True,
                           emit_state=False, lane_groups=lane_groups,
                           emit_stats=with_stats, runtime_depth=True)
    if with_stats:
        out, stats = out
        return (out.reshape(-1)[:R].reshape(height, width),
                dict(slot_tests=_count_sum(stats[:, 0, :]),
                     ray_bounces=_count_sum(stats[:, 1, :]),
                     cull_rows=_count_sum(stats[:, 2, :])))
    return out.reshape(-1)[:R].reshape(height, width)


def render_pallas_record(scene: PallasScene, cam: Camera, width: int,
                         height: int, max_depth: int = MAX_DEPTH,
                         tile: int = DEFAULT_TILE, far_root: bool = True,
                         interpret: bool = False, cull: bool | None = None,
                         with_pay: bool = False, block: tuple | None = None):
    """Forward render emitting float colours AND the per-bounce path
    record for differentiable replay (grad/pallas_diff.py).

    Returns (colours (h, w, 3) f32, record (max_depth, h*w) int32) where
    record holds the winner sphere SLOT (cluster*128+lane) for a
    scattering hit, -1 miss, -2 inactive, -3 absorbed.  Scanline tiles
    (row-major rays) so the record aligns with primary_rays order.

    ``with_pay=True`` additionally returns (rec_raw, pay) in the raw
    tile layout for the Pallas backward replay: rec_raw
    (num_tiles, D, tile) int32 and pay (num_tiles, D, 8, tile) f32 with
    the winner's sphere fields per bounce (rows cx cy cz rad cr cg cb).

    ``block=(bh, bw)`` uses 2-D image-rectangle tiles like
    ``render_pallas`` (tighter cluster unions -> faster forward); the
    colours and the per-ray ``record`` are unscrambled to image order,
    while rec_raw/pay stay in the raw block-tile layout (the Pallas
    backward regenerates the same block mapping in-kernel).
    """
    if cull is None:
        cull = scene.n_clusters > 1
    R = width * height
    if block is not None:
        bh, bw = block
        assert bh * bw == tile, (block, tile)
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        num_tiles = (wp // bw) * (hp // bh)
        blk_params = jnp.asarray(
            [wp // bw, bw, bh, 1.0 / (wp // bw)], jnp.float32)
    else:
        num_tiles = -(-R // tile)
        blk_params = jnp.zeros((4,), jnp.float32)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                    jnp.float32),
        blk_params,
    ]).astype(jnp.float32)
    out = _call_megakernel(
        scene, params, num_tiles, tile, max_depth, far_root, cull,
        interpret, gen_rays=True, emit_state=False, emit_float=True,
        record=True, record_pay=with_pay, block_tiled=block is not None)
    if with_pay:
        rr, rg, rb, rec, pay = out
    else:
        rr, rg, rb, rec = out

    if block is not None:
        def unscramble(x):
            # (num_tiles, tile) -> (h, w) image order
            return (x.reshape(hp // bh, wp // bw, bh, bw)
                    .transpose(0, 2, 1, 3).reshape(hp, wp)
                    [:height, :width])

        colours = jnp.stack([unscramble(rr), unscramble(rg),
                             unscramble(rb)], axis=-1)
        record = jax.vmap(unscramble)(
            rec.transpose(1, 0, 2)).reshape(max_depth, R)
        if with_pay:
            return colours, record, rec, pay
        return colours, record

    colours = jnp.stack([rr.reshape(-1)[:R], rg.reshape(-1)[:R],
                         rb.reshape(-1)[:R]], axis=-1)
    record = rec.transpose(1, 0, 2).reshape(max_depth, num_tiles * tile)
    if with_pay:
        return (colours.reshape(height, width, 3), record[:, :R], rec, pay)
    return colours.reshape(height, width, 3), record[:, :R]


def render_pallas_record_twophase(scene: PallasScene, cam: Camera,
                                  width: int, height: int,
                                  max_depth: int = MAX_DEPTH,
                                  phase1_depth: int = 6,
                                  tile: int = DEFAULT_TILE,
                                  far_root: bool = True,
                                  interpret: bool = False,
                                  cull: bool | None = None,
                                  block: tuple | None = None,
                                  schedule: tuple | None = None,
                                  sort_prefix: tuple | None = None):
    """Record-mode forward with survivor compaction between phases
    (render_pallas_twophase's structure, emitting the (rec, pay) records
    each segment needs for the segmented Pallas backward replay).

    ``schedule`` = depth caps for all compacted phases but the last
    (default ``(phase1_depth,)``), exactly as in render_pallas_twophase.

    Returns (colours (h, w, 3) f32, aux) where aux carries per-segment
    records in their raw tile layouts — segment 0 in the original
    (scanline/block) ray order, later segments in their compacted
    orders — plus per-boundary sorted state and keys:

      recs[k] (nt, D_k, T), pays[k] (nt, D_k, 8, T)   segment records
      states16[k] (nt, 16, T)   rows 0-8: boundary-k sorted (o,d,light)
      poskeys[k] (Rp,) int32    (dead << 30 | position in segment-k
                                 order) — low bits invert boundary k's
                                 permutation (backward carry hand-off)

    Per-ray arithmetic is identical to the single-phase record kernel,
    so colours are bit-identical to ``render_pallas_record`` (and to the
    plain renderer).

    ``sort_prefix``: per-boundary static sort-width fractions, as in
    ``render_pallas_twophase`` — boundary k re-packs only the prefix
    boundary k-1 packed survivors into; suffix positions pass through
    with IDENTITY permutation (their poskeys keep encoding their own
    position), so the backward's carry hand-off inverts with the same
    prefix.  Exact for any survival rate.  aux["sort_prefix_rows"]
    carries the resolved static row counts for the backward.
    """
    if cull is None:
        cull = scene.n_clusters > 1
    if schedule is None:
        schedule = (phase1_depth,)
    assert sum(schedule) < max_depth, (schedule, max_depth)
    R = width * height
    if block is not None:
        bh, bw = block
        assert bh * bw == tile, (block, tile)
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        num_tiles = (wp // bw) * (hp // bh)
        blk_params = jnp.asarray(
            [wp // bw, bw, bh, 1.0 / (wp // bw)], jnp.float32)
    else:
        num_tiles = -(-R // tile)
        blk_params = jnp.zeros((4,), jnp.float32)
    Rp = num_tiles * tile
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                    jnp.float32),
        blk_params,
    ]).astype(jnp.float32)

    zeros = jnp.zeros((num_tiles, 1, tile), jnp.float32)
    if sort_prefix is None:
        prefs = [None] * len(schedule)
    else:
        prefs = [None if f is None or f >= 1.0
                 else max(tile, int(Rp * f) // tile * tile)
                 for f in sort_prefix]
        prefs += [None] * (len(schedule) - len(prefs))

    def bsort(ops, prefix):
        if prefix is not None and 0 < prefix < Rp:
            head = jax.lax.sort([o[:prefix] for o in ops], dimension=0,
                                num_keys=1)
            return [jnp.concatenate([h, o[prefix:]])
                    for h, o in zip(head, ops)]
        return jax.lax.sort(ops, dimension=0, num_keys=1)

    recs, pays, states16, poskeys = [], [], [], []
    idx = jnp.arange(Rp, dtype=jnp.int32)      # original id, current order
    acc = None                                 # dead rays' colours (3 rows)
    state_in = None
    done = 0
    for k, p in enumerate(schedule):
        out = _call_megakernel(
            scene, params, num_tiles, tile, p, far_root, cull, interpret,
            gen_rays=(k == 0), emit_state=True,
            block_tiled=(k == 0 and block is not None),
            state_in=state_in, record=True, record_pay=True)
        state, rec_k, pay_k = out[:13], out[13], out[14]
        recs.append(rec_k)
        pays.append(pay_k)
        flat = [s.reshape(Rp) for s in state]
        # rays terminate in exactly one phase; continuation phases start
        # from zeroed rr/rg/rb, so addition accumulates exactly
        acc = (flat[9:12] if acc is None
               else [a + f for a, f in zip(acc, flat[9:12])])
        dead = (flat[12] <= 0.0).astype(jnp.int32)
        key = (dead << 30) | jnp.arange(Rp, dtype=jnp.int32)
        sorted_all = bsort([key] + flat[:9] + acc + [idx], prefs[k])
        key_sorted = sorted_all[0]
        poskeys.append(key_sorted)
        acc = list(sorted_all[10:13])
        idx = sorted_all[13]
        active_sorted = (key_sorted >> 30) == 0
        state_in = ([s.reshape(num_tiles, 1, tile)
                     for s in sorted_all[1:10]]
                    + [zeros, zeros, zeros,
                       active_sorted.astype(jnp.float32).reshape(
                           num_tiles, 1, tile)])
        states16.append(jnp.concatenate(
            [jnp.stack(sorted_all[1:10], axis=0)
             .reshape(9, num_tiles, tile).transpose(1, 0, 2),
             jnp.zeros((num_tiles, 7, tile), jnp.float32)], axis=1))
        done += p
    outF = _call_megakernel(scene, params, num_tiles, tile,
                            max_depth - done, far_root, cull, interpret,
                            gen_rays=False, emit_state=False,
                            state_in=state_in,
                            emit_float=True, record=True, record_pay=True)
    rrF, rgF, rbF, recF, payF = outF
    recs.append(recF)
    pays.append(payF)
    # float colours back to original ray order: one sort by original id
    # (3 scatters cost 18.2 ms on v5e, the unpermute sort 5.9 —
    # tools/microbench_unpermute.py); earlier phases' colours ride as
    # the acc operands and merge where the final phase was dead-on-entry
    act_last = (poskeys[-1] >> 30) == 0
    # merge each phase's colours with the accumulator BEFORE the
    # unpermute (where() commutes with the permutation): 3 payload
    # columns instead of 7
    merged = [jnp.where(act_last, phF.reshape(Rp), accv)
              for phF, accv in zip((rrF, rgF, rbF), acc)]
    srt = jax.lax.sort([idx] + merged, dimension=0, num_keys=1)
    colflat = jnp.stack(srt[1:4], axis=-1)
    if block is not None:
        colours = (colflat.reshape(hp // bh, wp // bw, bh, bw, 3)
                   .transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)
                   [:height, :width])
    else:
        colours = colflat[:R].reshape(height, width, 3)
    aux = dict(recs=recs, pays=pays, states16=states16,
               poskeys=poskeys, schedule=tuple(schedule))
    # legacy two-segment aliases (tests, older tools)
    if len(schedule) == 1:
        aux.update(rec1=recs[0], pay1=pays[0], rec2=recs[1], pay2=pays[1],
                   state16=states16[0], key_sorted=poskeys[0])
    return colours, aux


def _call_megakernel(scene, params, num_tiles, tile, max_depth, far_root,
                     cull, interpret, gen_rays, emit_state, state_in=None,
                     block_tiled=False, emit_float=False, record=False,
                     record_pay=False, lane_groups=None, force_occl=False,
                     emit_stats=False, runtime_depth=False):
    """Shared pallas_call wrapper for all megakernel modes.

    ``runtime_depth``: the bounce cap comes from params[13] at runtime;
    ``max_depth`` is ignored (normalised to 0 so every runtime-depth
    call of the same structure lowers to an identical module and shares
    one compile — see _megakernel)."""
    if runtime_depth:
        max_depth = 0
    C = scene.n_clusters
    CB = scene.aabbT.shape[0]
    CR = scene.aabbT.shape[1]
    # sphere tables are 8 KB/cluster; beyond ~1024 clusters (8 MB) they
    # cannot share VMEM with the tile pipeline — keep them in HBM and DMA
    # per visited cluster instead
    hbm_spheres = C > 1024
    if lane_groups is None:
        # default OFF: per-lane-group gated sweeps were measured a NET
        # LOSS on v5e (irreg d50: ng=2 53.5 ms vs ng=1 50.4; ng=4/8 crash
        # the Mosaic compiler) even though the per-group unions prune
        # 2x more visits (tools/sim_group_cull2.py) — the per-cluster
        # scalar cond/gate overhead scales linearly with the group count
        # and outweighs the saved vector work.  Same lesson as the
        # round-1 per-ray traversal kernel: fine-grained scalar gating
        # loses on the TPU's scalar-core + wide-VPU structure.  The knob
        # stays for experiments (tools/ab_lanegroups.py).
        lane_groups = 1
    if lane_groups > 1 and not (cull and CB == 1 and not hbm_spheres
                                and tile % (lane_groups * LANE) == 0):
        lane_groups = 1
    kernel = functools.partial(_megakernel, tile=tile, n_clusters=C,
                               max_depth=max_depth, far_root=far_root,
                               cull=cull, gen_rays=gen_rays,
                               emit_state=emit_state,
                               block_tiled=block_tiled,
                               emit_float=emit_float, record=record,
                               record_pay=record_pay,
                               hbm_spheres=hbm_spheres,
                               lane_groups=lane_groups,
                               force_occl=force_occl,
                               emit_stats=emit_stats,
                               runtime_depth=runtime_depth)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    SBR = scene.superT.shape[1]
    sph_space = (pl.BlockSpec(memory_space=pl.ANY) if hbm_spheres
                 else None)
    P = scene.tailT.shape[0]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                sph_space or vm(scene.sphT.shape, lambda i: (0, 0, 0)),
                sph_space or vm(scene.sph8.shape, lambda i: (0, 0, 0)),
                vm((CB, CR, 8), lambda i: (0, 0, 0)),
                vm((1, SBR, 8), lambda i: (0, 0, 0)),
                vm((P, 8), lambda i: (0, 0)),
                vm((8, P), lambda i: (0, 0))]
    args = [params, scene.sphT, scene.sph8, scene.aabbT, scene.superT,
            scene.tailT, scene.tail8]
    if not gen_rays:
        in_specs += [vm((1, 1, tile), lambda i: (i, 0, 0))] * N_STATE
        args += list(state_in)
    # block (1, 1, tile): the last two dims equal the array dims, which
    # Mosaic accepts, and no in-kernel reshape of the (1, T) result is
    # needed (reshape (1,256)->(8,32) is an unsupported shape cast).
    if emit_state:
        out_specs = [vm((1, 1, tile), lambda i: (i, 0, 0))] * N_STATE
        out_shape = [jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.float32)
                     ] * N_STATE
    elif emit_float:
        out_specs = [vm((1, 1, tile), lambda i: (i, 0, 0))] * 3
        out_shape = [jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.float32)
                     ] * 3
    else:
        out_specs = [vm((1, 1, tile), lambda i: (i, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32)]
    if record:
        out_specs = out_specs + [vm((1, max_depth, tile),
                                    lambda i: (i, 0, 0))]
        out_shape = out_shape + [jax.ShapeDtypeStruct(
            (num_tiles, max_depth, tile), jnp.int32)]
    if record_pay:
        out_specs = out_specs + [vm((1, max_depth, 8, tile),
                                    lambda i: (i, 0, 0, 0))]
        out_shape = out_shape + [jax.ShapeDtypeStruct(
            (num_tiles, max_depth, 8, tile), jnp.float32)]
    if emit_stats:
        # per-tile executed-work counters (instrumented compile variant;
        # never on a timed path): [:, 0, :] sphere rows tested per lane,
        # [:, 1, :] bounce sweeps run, [:, 2, :] cull rows executed
        out_specs = out_specs + [vm((1, 3, tile), lambda i: (i, 0, 0))]
        out_shape = out_shape + [jax.ShapeDtypeStruct(
            (num_tiles, 3, tile), jnp.float32)]
    if not emit_state and not emit_float and not record and not emit_stats:
        out_specs, out_shape = out_specs[0], out_shape[0]
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((lane_groups * CB * CR, 1), jnp.float32),
                        pltpu.VMEM((SBR, 1), jnp.float32)]
        + ([pltpu.VMEM((8, scene.sph8.shape[2]), jnp.float32),
            pltpu.VMEM((8, scene.sph8.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(())]
           if hbm_spheres else []),
        interpret=interpret,
    )(*args)


def render_pallas_twophase(scene: PallasScene, cam: Camera, width: int,
                           height: int, max_depth: int = MAX_DEPTH,
                           phase1_depth: int = 6, tile: int = DEFAULT_TILE,
                           far_root: bool = True, interpret: bool = False,
                           cull: bool | None = None,
                           block: tuple | None = None,
                           row0=0.0, total_height: int | None = None,
                           tile2: int | None = None,
                           lane_groups: int | None = None,
                           schedule: tuple | None = None,
                           coherent: bool = False,
                           occl_cont: bool = False,
                           seg_tiles: int | None = None,
                           sort_prefix: tuple | None = None,
                           with_stats: bool = False):
    """Multi-phase render with survivor compaction between phases.

    ``with_stats``: compile the instrumented kernel variant and ALSO
    return a stats dict with exact executed-work counters —
    ``slot_tests`` (sphere-rows × rays actually tested, summed over
    phases), ``ray_bounces`` (Σ per-lane bounce sweeps), and the
    per-phase lists.  Per-ray arithmetic (and the image) is unchanged;
    use an untimed call of this variant to audit what the production
    kernel executes (bench.py's VPU-ceiling utilization figure).

    ``sort_prefix``: per-boundary STATIC sort-width fractions (None or
    >= 1.0 entries sort the full array).  Boundary k-1 packed survivors
    into a prefix, so boundary k only needs to re-sort that prefix;
    entries should upper-bound the expected survivor fraction (plus
    tile padding).  Exact for ANY survival rate: an active ray beyond
    the prefix is simply not re-packed — its tile stays live and traces
    it normally, its colour still lands via acc_pix, and the suffix
    keys keep carrying ray ids — compaction is an optimization, never
    a correctness requirement (regression-tested with a deliberately
    too-small prefix).

    ``seg_tiles``: compact within independent segments of that many
    tiles instead of globally — rays never leave their segment, so the
    boundary (and the final unpermute) become a batched (S, L) axis-1
    ``lax.sort``, measured ~25% cheaper than one (Rp,) sort
    (tools/microbench_sortkeys.py).  Survivors pack per segment, so up
    to S-1 extra partial tiles stay live per phase; the image is
    bit-identical (per-ray arithmetic is order-independent and the
    unpermute restores ray order segment-wise).  None = global.
    MEASURED NET LOSS at 1000x1000 (tools/ab_seg_sort.py: rgbbox
    47.8 -> 58.5/52.6 ms at seg_tiles 8/16, irreg and plane likewise):
    the extra per-segment partial tiles cost more deep-phase kernel
    time than the batched sort saves.  Kept for experiments; the
    default (None) is the measured-best global sort.

    A tile's bounce loop runs until its DEEPEST ray dies; with measured
    (32,16)-tile max depth ~21 vs mean ray depth ~4 on rgbbox
    (tools/depth_stats.py), most single-phase work is late bounces on
    mostly-dead tiles.  Phase 1 traces everything to ``phase1_depth`` and
    emits full ray state; ONE fused multi-operand ``lax.sort`` (all 13
    state arrays + pixel ids in a single pass — ~3x cheaper than argsort
    + 13 gathers) packs survivors into a contiguous prefix, so phase 2
    runs deep bounces on ~ceil(survivors/tile) tiles while dead tiles
    exit after one loop-condition check.  Per-ray arithmetic is identical
    to the single-phase kernel, so the image is bit-identical.  Measured:
    rgbbox 1000x1000 d50 164 -> 94 ms at phase1_depth=6.

    ``block=(bh,bw)``: 2-D block tiles for phase 1's ray generation
    (tighter cluster unions); phase 2 is position-independent.

    ``tile2``: phase-2 tile size (default: same as ``tile``).  The two
    phases want opposite grains — phase 1's bounce count is capped at
    ``phase1_depth`` so big tiles amortise per-tile fixed costs for
    free, while phase 2 runs each tile to its deepest survivor, so
    small tiles limit deep-tail bounce inflation.

    ``schedule``: depth caps for ALL compacted phases but the last
    (default ``(phase1_depth,)``); the final phase runs to
    ``max_depth``.  Measured decomposition (tools/twophase_breakdown.py,
    rgbbox 1000x1000 d50, v5e): phase 1 40.7 ms, boundary sort 4.3,
    phase 2 32.0 — packed survivor tiles average ~32 FURTHER bounces
    (mirror traps), so a second 4.3 ms boundary mid-tail caps that
    inflation and pays for itself.  Each ray's pixel is produced by
    exactly the phase it terminates in; an ``acc_pix`` operand rides
    the boundary sorts and the final ray-id unpermute merges it with
    the last phase's output, keeping the image bit-identical to the
    single-phase kernel.

    ``coherent``: pack survivors by (direction octant | position
    Morton) instead of original pixel id.  The final unpermute makes
    the interior order free, and the directional slab cull skips
    clusters BEHIND a ray — so direction-coherent tiles can cull
    walls that pixel-ordered tiles (whose rays, deep in mirror
    cascades, head every way) cannot.  Costs one extra sort operand
    (the ray id no longer rides in the key's low bits).

    ``occl_cont``: force the per-cluster occlusion gate ON in
    continuation phases even at C <= 16 (where the primary-phase
    measurement said it loses).  NOTE: unlike ``coherent``, this can
    change winners within one 2^-16 key-floor tie bucket vs the
    ungated single-phase kernel (same caveat as the C > 16 gate).
    """
    if cull is None:
        cull = scene.n_clusters > 1
    th = height if total_height is None else total_height
    row0 = jnp.asarray(row0, jnp.float32).reshape(1)
    mid = jnp.concatenate([row0, jnp.zeros((3,), jnp.float32)])
    hw_params = jnp.asarray([width, th, 1.0 / width, 1.0 / th], jnp.float32)
    if block is not None:
        bh, bw = block
        assert bh * bw == tile, (block, tile)
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        num_tiles = (wp // bw) * (hp // bh)
        Rp = num_tiles * tile
        params = jnp.concatenate([
            cam.llc, cam.horizontal, cam.vertical, cam.origin,
            mid, hw_params,
            jnp.asarray([wp // bw, bw, bh, 1.0 / (wp // bw)],
                        jnp.float32),
        ]).astype(jnp.float32)
    else:
        R = width * height
        num_tiles = -(-R // tile)
        Rp = num_tiles * tile
        params = jnp.concatenate([
            cam.llc, cam.horizontal, cam.vertical, cam.origin,
            mid, hw_params,
            jnp.zeros((4,), jnp.float32),
        ]).astype(jnp.float32)

    if schedule is None:
        schedule = (phase1_depth,)
    # residual depths per phase: schedule entries, last phase to max_depth
    assert sum(schedule) < max_depth, (schedule, max_depth)

    def pack_pix(rr, rg, rb):
        pr = (255.99 * rr).astype(jnp.int32)
        pg = (255.99 * rg).astype(jnp.int32)
        pb = (255.99 * rb).astype(jnp.int32)
        return (pr << 16) | (pg << 8) | pb

    t2 = tile if tile2 is None else tile2
    assert Rp % t2 == 0, (Rp, t2)
    nt2 = Rp // t2
    zeros = jnp.zeros((nt2, 1, t2), jnp.float32)

    # segmented boundary sorts (see seg_tiles in the docstring);
    # coherent repacking moves rays globally, so it forces S=1
    S = (nt2 // seg_tiles if seg_tiles and not coherent
         and nt2 % seg_tiles == 0 and nt2 > seg_tiles else 1)
    L = Rp // S

    def bsort(ops, prefix=None):
        """Boundary sort.  ``prefix`` (static row count, t2-aligned)
        sorts only ops[:prefix] and passes the suffix through untouched:
        after boundary k-1 packed survivors into a prefix, boundary k
        only needs to re-pack that prefix — the sort shrinks
        geometrically with the schedule.  SAFE for any survival rate:
        an active ray left beyond the prefix is simply not re-packed —
        its tile stays live and traces it exactly (compaction is an
        optimization, never a correctness requirement)."""
        if prefix is not None and 0 < prefix < Rp:
            head = jax.lax.sort([o[:prefix] for o in ops], dimension=0,
                                num_keys=1)
            return [jnp.concatenate([h, o[prefix:]])
                    for h, o in zip(head, ops)]
        if S == 1:
            return jax.lax.sort(ops, dimension=0, num_keys=1)
        out = jax.lax.sort([o.reshape(S, L) for o in ops], dimension=1,
                           num_keys=1)
        return [o.reshape(Rp) for o in out]

    if coherent:
        from ..bvh.morton import morton3d
        # scene bounds for position quantization (cluster padding is
        # +inf mins / -inf maxs: neutral under min/max)
        sc_mn = scene.aabbT[:, :, 0:3].reshape(-1, 3).min(axis=0)
        sc_mx = scene.aabbT[:, :, 3:6].reshape(-1, 3).max(axis=0)
        sc_span = sc_mx - sc_mn
        sc_inv = jnp.where(sc_span > 0, 1.0 / jnp.where(sc_span > 0,
                                                        sc_span, 1.0), 0.0)

    if sort_prefix is None:
        prefs = [None] * len(schedule)
    else:
        prefs = [None if f is None or f >= 1.0
                 else max(t2, int(Rp * f) // t2 * t2)
                 for f in sort_prefix]
        prefs += [None] * (len(schedule) - len(prefs))

    state_in = None
    acc_pix = None                    # dead rays' pixels, current order
    idx = None                        # original ray id, current order
    done_so_far = 0
    phase_stats = []
    # runtime depth caps (params[13]): every continuation phase — and the
    # final one, which emits state like the others and packs outside —
    # runs the SAME compiled kernel; a whole schedule costs two compiles
    # (ray-gen phase + shared continuation), and re-sweeping schedules
    # costs none.
    for k, p_depth in enumerate(schedule):
        st = _call_megakernel(
            scene, params.at[13].set(jnp.float32(p_depth)),
            num_tiles if k == 0 else nt2,
            tile if k == 0 else t2, p_depth, far_root, cull, interpret,
            gen_rays=(k == 0), emit_state=True,
            block_tiled=(k == 0 and block is not None),
            state_in=state_in, lane_groups=lane_groups,
            force_occl=(occl_cont and k > 0),
            emit_stats=with_stats, runtime_depth=True)
        if with_stats:
            phase_stats.append(st[-1])
            st = st[:-1]
        done_so_far += p_depth
        flat = [s.reshape(Rp) for s in st]
        active = flat[-1]
        # rays that terminated THIS phase hold their colour in rr/rg/rb
        # (zero before termination and for lanes dead on entry, whose
        # rr/rg/rb were re-zeroed at the previous boundary), so a plain
        # add accumulates each ray's pixel from exactly one phase
        pix = pack_pix(flat[9], flat[10], flat[11])
        acc_pix = pix if acc_pix is None else acc_pix + pix
        if idx is None:
            idx = jnp.arange(Rp, dtype=jnp.int32)
        # one int32 key carries (dead-flag << 30) | pixel_id: live rays
        # sort first, ties resolve by original pixel id (stability and
        # image-space coherence for free)
        dead = (active <= 0.0).astype(jnp.int32)
        if coherent:
            octant = ((flat[3] < 0).astype(jnp.int32)
                      | ((flat[4] < 0).astype(jnp.int32) << 1)
                      | ((flat[5] < 0).astype(jnp.int32) << 2))
            pos = jnp.stack([flat[0], flat[1], flat[2]], axis=1)
            m = morton3d((pos - sc_mn) * sc_inv)          # 30-bit uint32
            key = ((dead << 30) | (octant << 27)
                   | (m >> 3).astype(jnp.int32))
            sorted_all = jax.lax.sort([key] + flat[:9] + [acc_pix, idx],
                                      dimension=0, num_keys=1)
            key_sorted = sorted_all[0]
            active_sorted = (key_sorted >> 30) == 0
            idx = sorted_all[11]
        else:
            key = (dead << 30) | idx
            sorted_all = bsort([key] + flat[:9] + [acc_pix],
                               prefix=prefs[k])
            key_sorted = sorted_all[0]
            active_sorted = (key_sorted >> 30) == 0
            idx = key_sorted & ((1 << 30) - 1)
        acc_pix = sorted_all[10]
        state_in = ([s.reshape(nt2, 1, t2) for s in sorted_all[1:10]]
                    + [zeros, zeros, zeros,
                       active_sorted.astype(jnp.float32).reshape(
                           nt2, 1, t2)])
    out = _call_megakernel(scene,
                           params.at[13].set(
                               jnp.float32(max_depth - done_so_far)),
                           nt2, t2, max_depth - done_so_far, far_root,
                           cull, interpret, gen_rays=False, emit_state=True,
                           state_in=state_in, lane_groups=lane_groups,
                           force_occl=occl_cont, emit_stats=with_stats,
                           runtime_depth=True)
    if with_stats:
        last_stats = out[-1]
        out = out[:-1]
        phase_stats.append(last_stats)
    # hand survivors' pixels back to ray order by RE-SORTING on the
    # unique original ray id instead of scattering: a 1M-row scatter
    # costs 8.7 ms on v5e where the 3-operand sort is 5.6
    # (tools/microbench_unpermute.py) — same lesson as the backward
    # replay's carry hand-off.  Dead-sorted lanes re-pack black in
    # the final phase; taking acc_pix for them preserves earlier
    # phases' colours bit-for-bit.
    active_sorted = state_in[-1].reshape(Rp) > 0.0
    # the final phase emits state like every other phase (shared compile);
    # packing moves outside the kernel — IEEE-identical arithmetic, so
    # the image stays bit-identical
    out_sorted = pack_pix(out[9].reshape(Rp), out[10].reshape(Rp),
                          out[11].reshape(Rp))
    # merge the final phase's pixels with earlier phases' BEFORE the
    # unpermute — where() commutes with the permutation, so the sort
    # carries one payload instead of three (measured: payload count is
    # the sort's cost driver, tools/microbench_sortkeys.py)
    merged = jnp.where(active_sorted, out_sorted, acc_pix)
    _, unsorted = bsort([idx, merged])
    if block is not None:
        img = (unsorted.reshape(hp // bh, wp // bw, bh, bw)
               .transpose(0, 2, 1, 3).reshape(hp, wp))
        img = img[:height, :width]
    else:
        img = unsorted[:R].reshape(height, width)
    if with_stats:
        stats = dict(
            phase_slot_tests=[_count_sum(s[:, 0, :]) for s in phase_stats],
            phase_ray_bounces=[_count_sum(s[:, 1, :]) for s in phase_stats],
            phase_cull_rows=[_count_sum(s[:, 2, :]) for s in phase_stats],
        )
        stats["slot_tests"] = sum(stats["phase_slot_tests"])
        stats["ray_bounces"] = sum(stats["phase_ray_bounces"])
        stats["cull_rows"] = sum(stats["phase_cull_rows"])
        return img, stats
    return img
