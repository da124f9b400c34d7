"""Pallas TPU megakernel: fused ray-gen + culling + intersection + shading.

The BASELINE.json north-star kernel, designed for the TPU execution model
rather than translated from the reference's per-thread GPU code:

* **Grid over ray tiles** — ``grid=(num_tiles,)``, each program owns T
  consecutive pixels.  The ≤50-bounce loop lives INSIDE the kernel
  (`lax.while_loop`) with a per-tile early exit: a sky tile costs one
  bounce; only mirror-trap tiles run deep.  This is the tile-level load
  balancing the irreg scene demands (SURVEY.md §7 "hard parts").

* **Rays on lanes × spheres on sublanes** — per-ray state is (1, T)
  vectors (2 vregs each, so the bounce loop carries stay tiny) and the
  dense closest-hit search is (128, T) vector work per 128-sphere cluster.
  This orientation means every broadcast between state and pair space is
  layout-preserving — no per-op relayouts.  (Two earlier orientations
  failed: (tile,1) state made loop carries explode to ~500 vregs and
  Mosaic's scf.for legalization gave up; (8,W,128) pair math forced a
  transposing relayout on every state↔pair broadcast and ran 40x slow.)

* **Cluster culling, packet-traversal style** — spheres are Morton-sorted
  and grouped into 128-wide clusters (bvh/lbvh.py order); each bounce
  slab-tests all cluster AABBs for the whole tile (dense (128, T) ops per
  128-cluster block), then visits only clusters some live ray overlaps,
  skipped with a scalar `lax.cond` on a VMEM-scratch hit count — the TPU
  analogue of packet traversal (whole-tile descent), replacing the
  reference's per-ray stack walk (futhark/bvh.fut:61-84).

* **Gather-free winner readback** — each visited cluster updates a running
  minimum and pulls the winning sphere's 7 parameters out with a one-hot
  (sublane == winner) contraction, exact because winner ids are unique.
  Sphere/AABB fields are stored as packed (C, 8, 128) blocks: one dynamic
  major-dim read + one (8,128)->(128,8) transpose per visited cluster.

* Shading (mirror scatter, sky miss, 255.99 quantization) is fused; the
  kernel emits final packed int32 pixels.

Reference semantics preserved: open-interval quadratic with near-then-far
root (futhark/ray.fut:32-51), scene_epsilon search window + widened-window
re-intersection (ray.fut:76-86), bounce/absorb/miss rules (ray.fut:126-148),
pixel mapping u=i/w, v=(h-j)/h (ray.fut:150-168).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh.lbvh import build_bvh
from ..geometry import (MAX_DEPTH, SCENE_EPSILON, T_MAX, T_MIN, Camera,
                        Spheres)

LANE = 128            # spheres per cluster == TPU lane width
DEFAULT_TILE = 512    # rays per grid program (measured best of 256/512/1024)
_BIG = float(T_MAX)   # python float: a jnp constant here would be captured

# rows of the packed per-cluster sphere block
_ROW_CX, _ROW_CY, _ROW_CZ, _ROW_RAD = 0, 1, 2, 3
_ROW_CR, _ROW_CG, _ROW_CB = 4, 5, 6
# rows of the packed per-block AABB block
_ROW_MNX, _ROW_MNY, _ROW_MNZ, _ROW_MXX, _ROW_MXY, _ROW_MXZ = 0, 1, 2, 3, 4, 5


class PallasScene(NamedTuple):
    """Scene laid out for the megakernel.

    C = number of 128-sphere clusters; CB = ceil(C / 128) cluster blocks.
    ``spheres``: (C, 8, 128) f32 — rows cx, cy, cz, rad, cr, cg, cb, pad;
    lane = sphere-in-cluster.
    ``aabbs``: (CB, 8, 128) f32 — rows amnx..amxz, pad, pad; lane = cluster
    (padding clusters carry an empty box: min=+inf, max=-inf, never hit).
    ``order`` maps (cluster*128 + lane) -> original sphere index (-1 pad).
    """
    spheres: jnp.ndarray
    aabbs: jnp.ndarray
    order: jnp.ndarray

    @property
    def n_clusters(self) -> int:
        return self.spheres.shape[0]


def build_pallas_scene(sph: Spheres) -> PallasScene:
    """Morton-sort + cluster the scene into the packed kernel layout."""
    bvh = build_bvh(sph, leaf_size=LANE)
    C = bvh.n_leaves
    CB = -(-C // LANE)
    s = bvh.spheres

    def field(x):
        return x.reshape(C, LANE)

    packed = jnp.stack([
        field(s.center[:, 0]), field(s.center[:, 1]), field(s.center[:, 2]),
        field(s.radius),
        field(s.color[:, 0]), field(s.color[:, 1]), field(s.color[:, 2]),
        jnp.zeros((C, LANE), jnp.float32),
    ], axis=1)                                            # (C, 8, 128)

    def pad_to_blocks(x, fill):
        pad = CB * LANE - C
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(CB, LANE)

    aabbs = jnp.stack([
        pad_to_blocks(bvh.leaf_min[:, 0], np.inf),
        pad_to_blocks(bvh.leaf_min[:, 1], np.inf),
        pad_to_blocks(bvh.leaf_min[:, 2], np.inf),
        pad_to_blocks(bvh.leaf_max[:, 0], -np.inf),
        pad_to_blocks(bvh.leaf_max[:, 1], -np.inf),
        pad_to_blocks(bvh.leaf_max[:, 2], -np.inf),
        jnp.zeros((CB, LANE), jnp.float32),
        jnp.zeros((CB, LANE), jnp.float32),
    ], axis=1)                                            # (CB, 8, 128)

    return PallasScene(spheres=packed, aabbs=aabbs,
                       order=bvh.order.reshape(C, LANE))


N_STATE = 13   # ox oy oz dx dy dz lr lg lb rr rg rb active


def _megakernel(params_ref,               # SMEM (24,) f32
                sph_ref,                  # VMEM (C, 8, 128) f32
                aabb_ref,                 # VMEM (CB, 8, 128) f32
                *refs,                    # [13 state_in] outputs, hits scratch
                tile: int, n_clusters: int, max_depth: int,
                far_root: bool, gen_rays: bool = True,
                emit_state: bool = False, block_tiled: bool = False):
    T = tile
    C = n_clusters
    CB = aabb_ref.shape[0]
    n_in = 0 if gen_rays else N_STATE
    state_in = refs[:n_in]
    out_refs = refs[n_in:-1]
    hits_ref = refs[-1]

    width = params_ref[16]
    height = params_ref[17]
    inv_w = params_ref[18]
    inv_h = params_ref[19]

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
            tc, tr = (jnp.where(tc >= bpr, tc - bpr, tc),
                      jnp.where(tc >= bpr, tr + 1.0, tr))
            tc, tr = (jnp.where(tc < 0.0, tc + bpr, tc),
                      jnp.where(tc < 0.0, tr - 1.0, tr))
            inv_bw = 1.0 / bw
            by = jnp.floor(lid * inv_bw)
            bx = lid - by * bw
            bx, by = (jnp.where(bx >= bw, bx - bw, bx),
                      jnp.where(bx >= bw, by + 1.0, by))
            bx, by = (jnp.where(bx < 0.0, bx + bw, bx),
                      jnp.where(bx < 0.0, by - 1.0, by))
            i = tc * bw + bx
            j = tr * bh + by
        else:
            ids = pid * T + lid
            j = jnp.floor(ids * inv_w)                  # j = id div w
            i = ids - j * width                         # i = id mod w
            i, j = (jnp.where(i >= width, i - width, i),
                    jnp.where(i >= width, j + 1.0, j))
            i, j = (jnp.where(i < 0.0, i + width, i),
                    jnp.where(i < 0.0, j - 1.0, j))
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

    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    eps = jnp.float32(SCENE_EPSILON)

    def closest_hit(ox, oy, oz, dx, dy, dz, active):
        """Culled dense search.  All returns (1, T):
        (best_t, hit_mask(f32), scx, scy, scz, srad, sr, sg, sb).

        ``active`` is a f32 0/1 mask (i1 vectors cannot be loop-carried —
        Mosaic scf.for legalization rejects them).
        """
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz
        active_b = active > 0.0

        # Tiny scenes (C <= 8): every tile overlaps most clusters
        # anyway — skip culling and the per-visit scalar cond.
        skip_culling = C <= 8

        # Phase A: dense cluster-AABB culling over cluster blocks; the
        # per-cluster live-ray counts land in VMEM scratch (cluster, 1)
        # for the scalar visit-skip reads.
        for cb in ([] if skip_culling else range(CB)):
            blk = jnp.swapaxes(
                aabb_ref[pl.ds(cb, 1), :, :].reshape(8, LANE), 0, 1)
            mnx = blk[:, _ROW_MNX:_ROW_MNX + 1]          # (128, 1)
            mny = blk[:, _ROW_MNY:_ROW_MNY + 1]
            mnz = blk[:, _ROW_MNZ:_ROW_MNZ + 1]
            mxx = blk[:, _ROW_MXX:_ROW_MXX + 1]
            mxy = blk[:, _ROW_MXY:_ROW_MXY + 1]
            mxz = blk[:, _ROW_MXZ:_ROW_MXZ + 1]
            t_lo = jnp.zeros((LANE, T)) + T_MIN
            t_hi = jnp.zeros((LANE, T)) + _BIG
            ok = None
            for mn, mx, oo, inv in ((mnx, mxx, ox, inv_dx),
                                    (mny, mxy, oy, inv_dy),
                                    (mnz, mxz, oz, inv_dz)):
                t0 = (mn - oo) * inv                     # (128, T)
                t1 = (mx - oo) * inv
                neg = jnp.broadcast_to(inv < 0.0, t0.shape)
                near = jnp.where(neg, t1, t0)
                far = jnp.where(neg, t0, t1)
                t_lo = jnp.maximum(near, t_lo)
                t_hi = jnp.minimum(far, t_hi)
                # fail-if polarity (ray.fut:64-70): NaN stages report HIT,
                # which is also the conservative choice for culling.
                stage_ok = ~(t_hi <= t_lo)
                ok = stage_ok if ok is None else (ok & stage_ok)
            ok = ok & jnp.broadcast_to(active_b, ok.shape)
            counts = jnp.sum(ok.astype(jnp.float32), axis=1,
                             keepdims=True)              # (128, 1)
            hits_ref[pl.ds(cb * LANE, LANE), :] = counts

        # Phase B: visit overlapped clusters (scalar skip), dense quadratic
        # + running (t, payload) minimum with one-hot winner readback.
        def visit(c, carry):
            anyhit = (jnp.float32(1.0) if skip_culling
                      else hits_ref[c, 0])

            def do_visit(carry):
                (best_t, hit, bcx, bcy, bcz, brad, bcr, bcg, bcb) = carry
                blk_raw = sph_ref[pl.ds(c, 1), :, :].reshape(8, LANE)
                blk = jnp.swapaxes(blk_raw, 0, 1)
                sx = blk[:, _ROW_CX:_ROW_CX + 1]         # (128, 1)
                sy = blk[:, _ROW_CY:_ROW_CY + 1]
                sz = blk[:, _ROW_CZ:_ROW_CZ + 1]
                sr = blk[:, _ROW_RAD:_ROW_RAD + 1]
                # (A dynamic best_t-window recheck before the dense
                # quadratic was tried here and measured SLOWER — +80
                # vreg-ops per visit, prunes too rarely; see PERF_NOTES.)
                ocx = ox - sx                            # (128, T)
                ocy = oy - sy
                ocz = oz - sz
                b_ = ocx * dx + ocy * dy + ocz * dz
                c_ = ocx * ocx + ocy * ocy + ocz * ocz - sr * sr
                disc = b_ * b_ - a * c_
                pos = disc > 0.0
                sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
                t0 = (-b_ - sq) * inv_a
                ok0 = (t0 < best_t) & (t0 > eps)
                if far_root:
                    t1 = (-b_ + sq) * inv_a
                    ok1 = (t1 < best_t) & (t1 > eps)
                    t = jnp.where(ok0, t0, jnp.where(ok1, t1, _BIG))
                else:
                    t = jnp.where(ok0, t0, _BIG)
                t = jnp.where(pos & jnp.broadcast_to(active_b, t.shape),
                              t, _BIG)
                tmin = jnp.min(t, axis=0, keepdims=True)  # (1, T)
                improved = tmin < best_t
                # unique winner sublane -> one-hot payload readback.
                # (A single (8,128)@(128,T) MXU dot would be cheaper
                # but Mosaic rejects it here: "Not implemented:
                # Sublane broadcast"; revisit when Mosaic grows it.)
                winner = jnp.min(
                    jnp.where(t == tmin, sub_ids, LANE), axis=0,
                    keepdims=True)                    # (1, T)
                onehot = (sub_ids == winner).astype(
                    jnp.float32)                      # (128, T)

                def pick(row, acc):
                    got = jnp.sum(blk[:, row:row + 1] * onehot,
                                  axis=0, keepdims=True)   # (1, T)
                    return jnp.where(improved, got, acc)

                best_t = jnp.where(improved, tmin, best_t)
                hit = jnp.where(improved, 1.0, hit)
                bcx = pick(_ROW_CX, bcx)
                bcy = pick(_ROW_CY, bcy)
                bcz = pick(_ROW_CZ, bcz)
                brad = pick(_ROW_RAD, brad)
                bcr = pick(_ROW_CR, bcr)
                bcg = pick(_ROW_CG, bcg)
                bcb = pick(_ROW_CB, bcb)
                return (best_t, hit, bcx, bcy, bcz, brad, bcr, bcg,
                        bcb)

            if skip_culling:
                return do_visit(carry)
            return jax.lax.cond(anyhit > 0.0, do_visit, lambda x: x, carry)

        zero = jnp.zeros((1, T), jnp.float32)
        init = (jnp.full((1, T), _BIG), zero,
                zero, zero, zero, jnp.ones((1, T), jnp.float32),
                zero, zero, zero)
        return jax.lax.fori_loop(0, C, visit, init)

    def bounce_body(state):
        (depth, n_active, ox, oy, oz, dx, dy, dz,
         lr, lg, lb, rr, rg, rb, active) = state
        (best_t, hit, scx, scy, scz, srad, sr_, sg_, sb_) = closest_hit(
            ox, oy, oz, dx, dy, dz, active)

        # two-phase re-intersection with widened window (ray.fut:84-85)
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
        w_hi = best_t + 1.0
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

        # Tiny scenes (C <= 8): every tile overlaps most clusters
        # anyway — skip culling and the per-visit scalar cond.
        skip_culling = C <= 8
        hit_b = hit > 0.0
        bounce = active_b & hit_b & scatter_ok
        miss = active_b & ~hit_b

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
        return (depth + 1, n_active, ox, oy, oz, dx, dy, dz,
                lr, lg, lb, rr, rg, rb, active)

    def bounce_cond(state):
        depth, n_active = state[0], state[1]
        return (depth < max_depth) & (n_active > 0.0)

    state = (jnp.int32(0), jnp.sum(active0), ox, oy, oz, dx, dy, dz,
             lr0, lg0, lb0, rr0, rg0, rb0, active0)
    state = jax.lax.while_loop(bounce_cond, bounce_body, state)

    if emit_state:
        for ref, val in zip(out_refs, state[2:2 + N_STATE]):
            ref[0, :, :] = val
    else:
        rr, rg, rb = state[11], state[12], state[13]
        # 255.99 quantization + packing (ray.fut:156-162)
        pr = (255.99 * rr).astype(jnp.int32)
        pg = (255.99 * rg).astype(jnp.int32)
        pb = (255.99 * rb).astype(jnp.int32)
        packed = (pr << 16) | (pg << 8) | pb                   # (1, T)
        out_refs[0][0, :, :] = packed


def render_pallas(scene: PallasScene, cam: Camera, width: int, height: int,
                  max_depth: int = MAX_DEPTH, tile: int = DEFAULT_TILE,
                  far_root: bool = True, interpret: bool = False,
                  block: tuple | None = None):
    """Render -> packed int32 (h, w) via the megakernel.

    ``block=(bh, bw)`` with bh*bw == tile assigns each grid program a 2-D
    image rectangle instead of a scanline run; image-local rays share far
    tighter cluster unions (big win on grazing-view scenes).  The image is
    padded up to block multiples internally (padding rays hit the same
    scene and are cropped away).
    """
    if block is not None:
        bh, bw = block
        assert bh * bw == tile, (block, tile)
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        num_tiles = (wp // bw) * (hp // bh)
        params = jnp.concatenate([
            cam.llc, cam.horizontal, cam.vertical, cam.origin,
            jnp.zeros((4,), jnp.float32),
            jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                        jnp.float32),
            jnp.asarray([wp // bw, bw, bh, 1.0 / (wp // bw)], jnp.float32),
        ]).astype(jnp.float32)
        out = _call_megakernel(scene, params, num_tiles, tile, max_depth,
                               far_root, interpret, gen_rays=True,
                               emit_state=False, block_tiled=True)
        img = (out.reshape(hp // bh, wp // bw, bh, bw)
               .transpose(0, 2, 1, 3).reshape(hp, wp))
        return img[:height, :width]

    R = width * height
    num_tiles = -(-R // tile)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                    jnp.float32),
        jnp.zeros((4,), jnp.float32),
    ]).astype(jnp.float32)

    out = _call_megakernel(scene, params, num_tiles, tile, max_depth,
                           far_root, interpret, gen_rays=True,
                           emit_state=False)
    return out.reshape(-1)[:R].reshape(height, width)


def _call_megakernel(scene, params, num_tiles, tile, max_depth, far_root,
                     interpret, gen_rays, emit_state, state_in=None,
                     block_tiled=False):
    """Shared pallas_call wrapper for all megakernel modes."""
    C = scene.n_clusters
    CB = scene.aabbs.shape[0]
    kernel = functools.partial(_megakernel, tile=tile, n_clusters=C,
                               max_depth=max_depth, far_root=far_root,
                               gen_rays=gen_rays, emit_state=emit_state,
                               block_tiled=block_tiled)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                vm((C, 8, LANE), lambda i: (0, 0, 0)),
                vm((CB, 8, LANE), lambda i: (0, 0, 0))]
    args = [params, scene.spheres, scene.aabbs]
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
    else:
        out_specs = vm((1, 1, tile), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((CB * LANE, 1), jnp.float32)],
        interpret=interpret,
    )(*args)


def render_pallas_twophase(scene: PallasScene, cam: Camera, width: int,
                           height: int, max_depth: int = MAX_DEPTH,
                           phase1_depth: int = 6, tile: int = DEFAULT_TILE,
                           far_root: bool = True, interpret: bool = False):
    """Two-phase render with survivor compaction between phases.

    A tile's bounce loop runs until its DEEPEST ray dies, so a handful of
    mirror-trap rays inflate whole tiles to ~50 bounces (measured ~7x the
    depth-1 cost on rgbbox).  Phase 1 traces everything to ``phase1_depth``
    and emits full ray state; an XLA stable sort then packs the surviving
    (still-active) rays into a contiguous prefix, so in phase 2 only
    ~ceil(survivors/tile) tiles do deep work and every dead tile exits
    after one cheap loop-condition check.  Per-ray arithmetic is identical
    to the single-phase kernel, so the image is bit-identical.
    """
    R = width * height
    num_tiles = -(-R // tile)
    Rp = num_tiles * tile
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                    jnp.float32),
        jnp.zeros((4,), jnp.float32),
    ]).astype(jnp.float32)

    state = _call_megakernel(scene, params, num_tiles, tile, phase1_depth,
                             far_root, interpret, gen_rays=True,
                             emit_state=True)
    flat = [s.reshape(Rp) for s in state]
    active = flat[-1]
    perm = jnp.argsort(1.0 - active, stable=True)
    packed_state = [s[perm].reshape(num_tiles, 1, tile) for s in flat]
    out = _call_megakernel(scene, params, num_tiles, tile,
                           max_depth - phase1_depth, far_root, interpret,
                           gen_rays=False, emit_state=False,
                           state_in=packed_state)
    # undo the permutation: result for original ray i sits at position
    # inv[i]; scatter back with one gather by inverse permutation.
    out_sorted = out.reshape(Rp)
    unsorted = jnp.zeros_like(out_sorted).at[perm].set(out_sorted)
    return unsorted[:R].reshape(height, width)
