"""Pallas TPU megakernel: fused ray-gen + culling + intersection + shading.

The BASELINE.json north-star kernel, designed for the TPU execution model
rather than translated from the reference's per-thread GPU code:

* **Grid over ray tiles** — ``grid=(num_tiles,)``, each program owns T
  consecutive pixels.  The ≤50-bounce loop lives INSIDE the kernel
  (`lax.while_loop`) with a per-tile early exit: a sky tile costs one
  bounce; only mirror-trap tiles run deep.  This is the tile-level load
  balancing the irreg scene demands (SURVEY.md §7 "hard parts").

* **Rays on sublanes × spheres on lanes** — the closest-hit search is a
  dense (T, 128) vector computation per 128-sphere cluster: zero gathers,
  zero per-lane control flow, full VPU occupancy.

* **Cluster culling, packet-traversal style** — spheres are Morton-sorted
  and grouped into 128-wide clusters (bvh/lbvh.py order); each bounce first
  slab-tests all cluster AABBs for the whole tile (dense (T, 128) ops per
  cluster block), then visits only clusters some live ray overlaps (scalar
  `lax.cond` skip) — the TPU analogue of packet traversal (whole-tile
  descent), replacing the reference's per-ray stack walk
  (futhark/bvh.fut:61-84).

* **Gather-free winner readback** — each visited cluster updates a running
  (t, global-sphere-id) minimum; the winning sphere's parameters are pulled
  out with a one-hot (lane == winner) contraction, exact because ids are
  unique.  No dynamic per-lane gathers anywhere.

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
DEFAULT_TILE = 256    # rays per grid program (sublane dimension)
_BIG = float(T_MAX)   # python float: a jnp constant here would be captured


class PallasScene(NamedTuple):
    """Scene laid out for the megakernel.

    C = number of 128-sphere clusters; CB = ceil(C / 128) cluster blocks.
    Sphere fields are (C, 128): row = cluster, lane = sphere-in-cluster.
    Cluster AABB fields are (CB, 128): row = block, lane = cluster.
    ``order`` maps (cluster*128 + lane) -> original sphere index (-1 pad).
    """
    cx: jnp.ndarray
    cy: jnp.ndarray
    cz: jnp.ndarray
    rad: jnp.ndarray
    cr: jnp.ndarray
    cg: jnp.ndarray
    cb: jnp.ndarray
    amnx: jnp.ndarray
    amny: jnp.ndarray
    amnz: jnp.ndarray
    amxx: jnp.ndarray
    amxy: jnp.ndarray
    amxz: jnp.ndarray
    order: jnp.ndarray

    @property
    def n_clusters(self) -> int:
        return self.cx.shape[0]


def build_pallas_scene(spheres: Spheres) -> PallasScene:
    """Morton-sort + cluster the scene into the kernel layout."""
    bvh = build_bvh(spheres, leaf_size=LANE)
    C = bvh.n_leaves
    CB = -(-C // LANE)
    s = bvh.spheres

    def field(x):
        return x.reshape(C, LANE)

    def aabb_lo(x):
        pad = CB * LANE - C
        return jnp.pad(x, (0, pad), constant_values=np.inf).reshape(CB, LANE)

    def aabb_hi(x):
        pad = CB * LANE - C
        return jnp.pad(x, (0, pad), constant_values=-np.inf).reshape(CB, LANE)

    return PallasScene(
        cx=field(s.center[:, 0]), cy=field(s.center[:, 1]),
        cz=field(s.center[:, 2]), rad=field(s.radius),
        cr=field(s.color[:, 0]), cg=field(s.color[:, 1]),
        cb=field(s.color[:, 2]),
        amnx=aabb_lo(bvh.leaf_min[:, 0]),
        amny=aabb_lo(bvh.leaf_min[:, 1]),
        amnz=aabb_lo(bvh.leaf_min[:, 2]),
        amxx=aabb_hi(bvh.leaf_max[:, 0]),
        amxy=aabb_hi(bvh.leaf_max[:, 1]),
        amxz=aabb_hi(bvh.leaf_max[:, 2]),
        order=bvh.order.reshape(C, LANE),
    )


def _megakernel(params_ref,               # SMEM (24,) f32
                cx_ref, cy_ref, cz_ref, rad_ref, cr_ref, cg_ref, cb_ref,
                amnx_ref, amny_ref, amnz_ref, amxx_ref, amxy_ref, amxz_ref,
                out_ref,                  # (1, T) int32 packed pixels
                hits_ref,                 # scratch VMEM (CB*LANE, 1) f32
                *, tile: int, n_clusters: int, max_depth: int,
                far_root: bool):
    T = tile
    C = n_clusters
    CB = amnx_ref.shape[0]

    width = params_ref[16]
    height = params_ref[17]
    inv_w = params_ref[18]
    inv_h = params_ref[19]

    # ---- fused ray generation (futhark/ray.fut:150-168) ----
    pid = pl.program_id(0)
    ids = (pid * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
           ).astype(jnp.float32)
    i = ids - jnp.floor(ids * inv_w) * width        # i = id mod w
    j = jnp.floor(ids * inv_w)                      # j = id div w
    u = i * inv_w
    v = (height - j) * inv_h
    # dir = llc + u*horizontal + v*vertical - origin
    dx = params_ref[0] + u * params_ref[3] + v * params_ref[6] - params_ref[9]
    dy = params_ref[1] + u * params_ref[4] + v * params_ref[7] - params_ref[10]
    dz = params_ref[2] + u * params_ref[5] + v * params_ref[8] - params_ref[11]
    ox = jnp.full((T, 1), params_ref[9])
    oy = jnp.full((T, 1), params_ref[10])
    oz = jnp.full((T, 1), params_ref[11])

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    eps = jnp.float32(SCENE_EPSILON)

    def closest_hit(ox, oy, oz, dx, dy, dz, active):
        """Culled dense search -> (best_t, best sphere payload…), all (T,1).

        Returns (best_t, hit_mask, scx, scy, scz, srad, sr, sg, sb).
        """
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz

        # Phase A: dense cluster-AABB culling; per-cluster live-ray counts
        # land in VMEM scratch in (cluster, 1) layout for scalar reads.
        for cb in range(CB):
            t_lo = jnp.full((T, 1), T_MIN)
            t_hi = jnp.full((T, 1), _BIG)
            ok = None
            for mn_ref, mx_ref, oo, inv in (
                    (amnx_ref, amxx_ref, ox, inv_dx),
                    (amny_ref, amxy_ref, oy, inv_dy),
                    (amnz_ref, amxz_ref, oz, inv_dz)):
                mn = mn_ref[cb:cb + 1, :]
                mx = mx_ref[cb:cb + 1, :]
                t0 = (mn - oo) * inv
                t1 = (mx - oo) * inv
                near = jnp.where(inv < 0.0, t1, t0)
                far = jnp.where(inv < 0.0, t0, t1)
                t_lo = jnp.maximum(near, t_lo)
                t_hi = jnp.minimum(far, t_hi)
                stage_ok = t_hi > t_lo
                ok = stage_ok if ok is None else (ok & stage_ok)
            ok = ok & active
            counts = jnp.sum(ok.astype(jnp.float32), axis=0,
                             keepdims=True)                    # (1, LANE)
            hits_ref[pl.ds(cb * LANE, LANE), :] = counts.reshape(LANE, 1)

        # Phase B: visit overlapped clusters (scalar skip), dense quadratic
        # + running (t, payload) minimum with one-hot winner readback.
        def visit(c, carry):
            (best_t, hit, bcx, bcy, bcz, brad, bcr, bcg, bcb) = carry
            anyhit = hits_ref[c, 0]

            def do_visit(carry):
                (best_t, hit, bcx, bcy, bcz, brad, bcr, bcg, bcb) = carry
                row = pl.ds(c, 1)
                sx = cx_ref[row, :]
                sy = cy_ref[row, :]
                sz = cz_ref[row, :]
                sr = rad_ref[row, :]
                ocx = ox - sx
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
                t = jnp.where(pos & active, t, _BIG)
                tmin = jnp.min(t, axis=1, keepdims=True)      # (T,1)
                improved = tmin < best_t
                # unique winner lane -> one-hot payload readback
                winner = jnp.min(
                    jnp.where(t == tmin, lane_ids, LANE), axis=1,
                    keepdims=True)                             # (T,1)
                onehot = (lane_ids == winner).astype(jnp.float32)

                def pick(vals, acc):
                    got = jnp.sum(vals * onehot, axis=1, keepdims=True)
                    return jnp.where(improved, got, acc)

                best_t = jnp.where(improved, tmin, best_t)
                hit = hit | improved
                bcx = pick(sx, bcx)
                bcy = pick(sy, bcy)
                bcz = pick(sz, bcz)
                brad = pick(sr, brad)
                bcr = pick(cr_ref[row, :], bcr)
                bcg = pick(cg_ref[row, :], bcg)
                bcb = pick(cb_ref[row, :], bcb)
                return (best_t, hit, bcx, bcy, bcz, brad, bcr, bcg, bcb)

            return jax.lax.cond(anyhit > 0.0, do_visit, lambda x: x, carry)

        zero = jnp.zeros((T, 1), jnp.float32)
        init = (jnp.full((T, 1), _BIG), jnp.zeros((T, 1), bool),
                zero, zero, zero, jnp.ones((T, 1), jnp.float32),
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

        bounce = active & hit & scatter_ok
        miss = active & ~hit

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
        n_active = jnp.sum(bounce.astype(jnp.float32))
        return (depth + 1, n_active, ox, oy, oz, dx, dy, dz,
                lr, lg, lb, rr, rg, rb, bounce)

    def bounce_cond(state):
        depth, n_active = state[0], state[1]
        return (depth < max_depth) & (n_active > 0.0)

    zeros = jnp.zeros((T, 1), jnp.float32)
    ones = jnp.ones((T, 1), jnp.float32)
    state = (jnp.int32(0), jnp.float32(1.0), ox, oy, oz, dx, dy, dz,
             ones, ones, ones, zeros, zeros, zeros,
             jnp.ones((T, 1), bool))
    state = jax.lax.while_loop(bounce_cond, bounce_body, state)
    rr, rg, rb = state[11], state[12], state[13]

    # 255.99 quantization + packing (ray.fut:156-162)
    pr = (255.99 * rr).astype(jnp.int32)
    pg = (255.99 * rg).astype(jnp.int32)
    pb = (255.99 * rb).astype(jnp.int32)
    packed = (pr << 16) | (pg << 8) | pb                       # (T,1)
    out_ref[:] = packed.reshape(T)


def render_pallas(scene: PallasScene, cam: Camera, width: int, height: int,
                  max_depth: int = MAX_DEPTH, tile: int = DEFAULT_TILE,
                  far_root: bool = True, interpret: bool = False):
    """Render -> packed int32 (h, w) via the megakernel."""
    R = width * height
    num_tiles = -(-R // tile)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                    jnp.float32),
        jnp.zeros((4,), jnp.float32),
    ]).astype(jnp.float32)

    C = scene.n_clusters
    CB = scene.amnx.shape[0]
    kernel = functools.partial(_megakernel, tile=tile, n_clusters=C,
                               max_depth=max_depth, far_root=far_root)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [vm((C, LANE), lambda i: (0, 0))] * 7 +
                 [vm((CB, LANE), lambda i: (0, 0))] * 6,
        out_specs=vm((tile,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile,), jnp.int32),
        scratch_shapes=[pltpu.VMEM((CB * LANE, 1), jnp.float32)],
        interpret=interpret,
    )(params, scene.cx, scene.cy, scene.cz, scene.rad, scene.cr, scene.cg,
      scene.cb, scene.amnx, scene.amny, scene.amnz, scene.amxx, scene.amxy,
      scene.amxz)
    return out.reshape(-1)[:R].reshape(height, width)
