"""Pallas per-ray traversal megakernel (v3).

The dense packet kernel (pallas_kernel.py) tests every visited 128-sphere
cluster against ALL tile rays — per-tile cluster unions make rgbbox an
effective brute force and grazing irreg tiles visit dozens of clusters.
This kernel gives every ray its OWN traversal, built on a measured Mosaic
capability: ``jnp.take_along_axis((G,128), idx, axis=1)`` — per-lane
dynamic gather within 128-wide rows — costs about one multiply
(docs/PERF_NOTES.md).  That bounds all gatherable tables to 128 lanes:

* rays live as (G, 128) arrays (G = tile/128);
* the cluster skip-link tree (bvh/lbvh.py, leaf_size=K) needs C ≤ 128
  clusters and C-1 ≤ 127 inner nodes — per-node fields are (1, 128) rows
  tiled to (G, 128) and gathered by each ray's current node id;
* sphere fields are (K, 128) tables [row = slot-in-cluster, lane =
  cluster]: a LEAF ROUND statically unrolls k = 0..K-1, each step
  gathering slot k of every ray's own cluster — per-ray sphere tests with
  zero wasted lanes.

Scheduling: each inner-loop iteration either advances tree-mode lanes one
node (slab test → left/skip) or runs one leaf round, chosen by a scalar
policy (leaf round when ≥1/4 of live lanes wait at leaves, or no tree
lanes remain).  Lanes park at -1 when their traversal ends; the loop exits
when all are parked.  Scenes with more than 128 clusters must use the
dense kernel.  NOTE: this kernel is an experimental entry point used
directly (tests/benchmarks only); render/api.py mode='pallas' always uses
the dense megakernel, which measured faster on TPU (docs/PERF_NOTES.md).

Semantics identical to the reference (same quadratic, windows, two-phase
re-intersection and shading as pallas_kernel.py).
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
from ..geometry import MAX_DEPTH, SCENE_EPSILON, T_MAX, T_MIN, Camera, Spheres

LANE = 128
DEFAULT_TILE = 512
_BIG = float(T_MAX)
_DONE = -1.0


class TraversalScene(NamedTuple):
    """Scene tables for the per-ray kernel (all lane dim = 128).

    ``inner``: (8, 128) rows = [mnx mny mnz mxx mxy mxz left skip] per
    inner node (encoded ext ids as f32; C-1 valid lanes).
    ``leaf_skip``: (1, 128) skip link per leaf (cluster), f32 ext id.
    ``spheres``: (K, 8, 128) rows = slot k, fields [cx cy cz rad cr cg cb
    pad], lane = cluster.
    ``order``: (C*K,) original sphere index per (cluster, slot), -1 pad.
    """
    inner: jnp.ndarray
    leaf_skip: jnp.ndarray
    spheres: jnp.ndarray
    order: jnp.ndarray


def build_traversal_scene(sph: Spheres, leaf_size: int | None = None):
    """Build tables.  Returns (TraversalScene, C, K).  Requires the scene
    to fit in C ≤ 128 clusters (use the dense kernel otherwise)."""
    n = sph.center.shape[0]
    if leaf_size is None:
        leaf_size = max(8, -(-n // LANE))
    C = -(-n // leaf_size)
    if C > LANE:
        raise ValueError(f"{C} clusters > 128; use the dense kernel")
    bvh = build_bvh(sph, leaf_size=leaf_size)
    C = bvh.n_leaves
    K = bvh.leaf_size
    n_inner = bvh.n_inner

    def pad_lane(x, fill=0.0):
        return jnp.pad(x.astype(jnp.float32), (0, LANE - x.shape[0]),
                       constant_values=fill)

    inner = jnp.stack([
        pad_lane(bvh.node_min[:, 0], np.inf),
        pad_lane(bvh.node_min[:, 1], np.inf),
        pad_lane(bvh.node_min[:, 2], np.inf),
        pad_lane(bvh.node_max[:, 0], -np.inf),
        pad_lane(bvh.node_max[:, 1], -np.inf),
        pad_lane(bvh.node_max[:, 2], -np.inf),
        pad_lane(bvh.left, _DONE),
        pad_lane(bvh.skip[:n_inner], _DONE),
    ], axis=0)                                     # (8, 128)

    leaf_skip = pad_lane(bvh.skip[n_inner:], _DONE)[None, :]   # (1, 128)

    s = bvh.spheres
    def sf(x):
        # (C*K,) -> (K, 128): row k holds slot k of every cluster
        return jnp.pad(x.reshape(C, K).T.astype(jnp.float32),
                       ((0, 0), (0, LANE - C)))
    spheres = jnp.stack([
        sf(s.center[:, 0]), sf(s.center[:, 1]), sf(s.center[:, 2]),
        sf(s.radius),
        sf(s.color[:, 0]), sf(s.color[:, 1]), sf(s.color[:, 2]),
        jnp.zeros((K, LANE), jnp.float32),
    ], axis=1)                                     # (K, 8, 128)

    scene = TraversalScene(inner=inner, leaf_skip=leaf_skip,
                           spheres=spheres, order=bvh.order)
    return scene, C, K


def _kernel(params_ref, inner_ref, leaf_skip_ref, sph_ref, out_ref,
            *, tile: int, n_clusters: int, leaf_size: int, max_depth: int,
            far_root: bool, block_tiled: bool):
    G = tile // LANE
    C = n_clusters
    K = leaf_size
    NI = C - 1                      # inner node count; leaf ext id = NI + c

    width = params_ref[16]
    height = params_ref[17]
    inv_w = params_ref[18]
    inv_h = params_ref[19]

    pid = pl.program_id(0)
    lid = (jax.lax.broadcasted_iota(jnp.int32, (G, LANE), 0) * LANE
           + jax.lax.broadcasted_iota(jnp.int32, (G, LANE), 1)
           ).astype(jnp.float32)
    if block_tiled:
        bpr = params_ref[20]
        bw = params_ref[21]
        bh = params_ref[22]
        inv_bpr = params_ref[23]
        pidf = jnp.float32(pid)
        tr = jnp.floor(pidf * inv_bpr)
        tc = pidf - tr * bpr
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
        ids = pid * tile + lid
        j = jnp.floor(ids * inv_w)
        i = ids - j * width
        # f32-reciprocal div/mod can be off by one ulp; renormalise
        i, j = (jnp.where(i >= width, i - width, i),
                jnp.where(i >= width, j + 1.0, j))
        i, j = (jnp.where(i < 0.0, i + width, i),
                jnp.where(i < 0.0, j - 1.0, j))
    u = i * inv_w
    v = (height - j) * inv_h
    dx = params_ref[0] + u * params_ref[3] + v * params_ref[6] - params_ref[9]
    dy = params_ref[1] + u * params_ref[4] + v * params_ref[7] - params_ref[10]
    dz = params_ref[2] + u * params_ref[5] + v * params_ref[8] - params_ref[11]
    ox = jnp.full((G, LANE), params_ref[9])
    oy = jnp.full((G, LANE), params_ref[10])
    oz = jnp.full((G, LANE), params_ref[11])

    eps = jnp.float32(SCENE_EPSILON)
    inner_tab = inner_ref[:, :]                      # (8, 128)
    leaf_skip_tab = jnp.broadcast_to(leaf_skip_ref[:, :], (G, LANE))

    def gtab(row_1x128):
        return jnp.broadcast_to(row_1x128, (G, LANE))

    inner_rows = [gtab(inner_tab[r:r + 1, :]) for r in range(8)]

    def gather(tab, idx):
        return jnp.take_along_axis(tab, idx, axis=1)

    def closest_hit(ox, oy, oz, dx, dy, dz, active):
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz

        # per-ray traversal state (f32 carries; i1/i32 both fine but f32
        # keeps the carry uniform): cur ext node id, -1 done
        cur0 = jnp.where(active > 0.0, 0.0, _DONE)
        if NI == 0:
            cur0 = jnp.where(active > 0.0, jnp.float32(NI), _DONE)

        def loop_cond(carry):
            cur = carry[0]
            return jnp.sum(jnp.where(cur >= 0.0, 1.0, 0.0)) > 0.0

        def tree_step(carry):
            cur, best_t, best_c, best_k = carry
            at_tree = (cur >= 0.0) & (cur < NI)
            ii = jnp.clip(cur, 0.0, max(NI - 1, 0)).astype(jnp.int32)
            mnx = gather(inner_rows[0], ii)
            mny = gather(inner_rows[1], ii)
            mnz = gather(inner_rows[2], ii)
            mxx = gather(inner_rows[3], ii)
            mxy = gather(inner_rows[4], ii)
            mxz = gather(inner_rows[5], ii)
            left = gather(inner_rows[6], ii)
            skip = gather(inner_rows[7], ii)
            t_lo = jnp.full((G, LANE), T_MIN)
            t_hi = best_t
            ok = None
            for mn, mx, oo, inv in ((mnx, mxx, ox, inv_dx),
                                    (mny, mxy, oy, inv_dy),
                                    (mnz, mxz, oz, inv_dz)):
                t0 = (mn - oo) * inv
                t1 = (mx - oo) * inv
                neg = inv < 0.0
                near = jnp.where(neg, t1, t0)
                far = jnp.where(neg, t0, t1)
                t_lo = jnp.maximum(near, t_lo)
                t_hi = jnp.minimum(far, t_hi)
                # fail-if polarity (ray.fut:64-70): NaN stages -> HIT
                s_ok = ~(t_hi <= t_lo)
                ok = s_ok if ok is None else (ok & s_ok)
            nxt = jnp.where(ok, left, skip)
            cur = jnp.where(at_tree, nxt, cur)
            return cur, best_t, best_c, best_k

        def leaf_round(carry):
            cur, best_t, best_c, best_k = carry
            at_leaf = cur >= NI
            c = jnp.clip(cur - NI, 0.0, C - 1).astype(jnp.int32)
            for k in range(K):
                row = sph_ref[k]                    # (8, 128)
                sx = gather(gtab(row[0:1, :]), c)
                sy = gather(gtab(row[1:2, :]), c)
                sz = gather(gtab(row[2:3, :]), c)
                sr = gather(gtab(row[3:4, :]), c)
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
                improved = pos & at_leaf & (t < best_t)
                best_t = jnp.where(improved, t, best_t)
                best_c = jnp.where(improved, c.astype(jnp.float32), best_c)
                best_k = jnp.where(improved, jnp.float32(k), best_k)
            nxt = gather(leaf_skip_tab, jnp.clip(cur - NI, 0.0, C - 1
                                                 ).astype(jnp.int32))
            cur = jnp.where(at_leaf, nxt, cur)
            return cur, best_t, best_c, best_k

        def loop_body(carry):
            cur = carry[0]
            n_leaf = jnp.sum(jnp.where(cur >= NI, 1.0, 0.0))
            n_tree = jnp.sum(jnp.where((cur >= 0.0) & (cur < NI), 1.0, 0.0))
            n_alive = n_leaf + n_tree
            do_leaf = (n_leaf * 4.0 >= n_alive) | (n_tree == 0.0)
            return jax.lax.cond(do_leaf, leaf_round, tree_step, carry)

        init = (cur0, jnp.full((G, LANE), _BIG),
                jnp.zeros((G, LANE), jnp.float32),
                jnp.zeros((G, LANE), jnp.float32))
        cur, best_t, best_c, best_k = jax.lax.while_loop(
            loop_cond, loop_body, init)
        hit = jnp.where(best_t < _BIG, 1.0, 0.0)

        # payload readback: static unroll over slots, gather by cluster
        bc = best_c.astype(jnp.int32)
        zeros = jnp.zeros((G, LANE), jnp.float32)
        pay = [zeros] * 7
        for k in range(K):
            m = (best_k == k) & (hit > 0.0)
            row = sph_ref[k]
            for f in range(7):
                g = gather(gtab(row[f:f + 1, :]), bc)
                pay[f] = jnp.where(m, g, pay[f])
        scx, scy, scz, srad, sr_, sg_, sb_ = pay
        srad = jnp.where(hit > 0.0, srad, 1.0)
        return best_t, hit, scx, scy, scz, srad, sr_, sg_, sb_

    def bounce_body(state):
        (depth, n_active, ox, oy, oz, dx, dy, dz,
         lr, lg, lb, rr, rg, rb, active) = state
        (best_t, hit, scx, scy, scz, srad, sr_, sg_, sb_) = closest_hit(
            ox, oy, oz, dx, dy, dz, active)

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
        hit_b = hit > 0.0
        bounce = active_b & hit_b & scatter_ok
        miss = active_b & ~hit_b

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
        return (depth + 1, jnp.sum(active), ox, oy, oz, dx, dy, dz,
                lr, lg, lb, rr, rg, rb, active)

    def bounce_cond(state):
        return (state[0] < max_depth) & (state[1] > 0.0)

    zeros = jnp.zeros((G, LANE), jnp.float32)
    ones = jnp.ones((G, LANE), jnp.float32)
    state = (jnp.int32(0), jnp.float32(1.0), ox, oy, oz, dx, dy, dz,
             ones, ones, ones, zeros, zeros, zeros, ones)
    state = jax.lax.while_loop(bounce_cond, bounce_body, state)
    rr, rg, rb = state[11], state[12], state[13]
    pr = (255.99 * rr).astype(jnp.int32)
    pg = (255.99 * rg).astype(jnp.int32)
    pb = (255.99 * rb).astype(jnp.int32)
    out_ref[0, :, :] = (pr << 16) | (pg << 8) | pb


def render_traversal(scene: TraversalScene, n_clusters: int, leaf_size: int,
                     cam: Camera, width: int, height: int,
                     max_depth: int = MAX_DEPTH, tile: int = DEFAULT_TILE,
                     far_root: bool = True, block: tuple | None = (32, 16),
                     interpret: bool = False):
    """Render -> packed int32 (h, w) via the per-ray traversal kernel."""
    if block is not None:
        bh, bw = block
        assert bh * bw == tile
        wp = -(-width // bw) * bw
        hp = -(-height // bh) * bh
        num_tiles = (wp // bw) * (hp // bh)
        extra = jnp.asarray([wp // bw, bw, bh, 1.0 / (wp // bw)],
                            jnp.float32)
        block_tiled = True
    else:
        R = width * height
        num_tiles = -(-R // tile)
        extra = jnp.zeros((4,), jnp.float32)
        block_tiled = False
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([width, height, 1.0 / width, 1.0 / height],
                    jnp.float32),
        extra,
    ]).astype(jnp.float32)

    kernel = functools.partial(_kernel, tile=tile, n_clusters=n_clusters,
                               leaf_size=leaf_size, max_depth=max_depth,
                               far_root=far_root, block_tiled=block_tiled)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    G = tile // LANE
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  vm((8, LANE), lambda i: (0, 0)),
                  vm((1, LANE), lambda i: (0, 0)),
                  vm(scene.spheres.shape, lambda i: (0, 0, 0))],
        out_specs=vm((1, G, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_tiles, G, LANE), jnp.int32),
        interpret=interpret,
    )(params, scene.inner, scene.leaf_skip, scene.spheres)
    if block is not None:
        img = (out.reshape(hp // bh, wp // bw, bh, bw)
               .transpose(0, 2, 1, 3).reshape(hp, wp))
        return img[:height, :width]
    return out.reshape(-1)[:width * height].reshape(height, width)
