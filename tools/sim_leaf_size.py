#!/usr/bin/env python
"""Occlusion-aware executed-SLOT counts vs cluster leaf size.

irreg executes ~6-8 occlusion-gated 128-row visits per tile-bounce
(~900 slots/ray-bounce — MORE than rgbbox's 400, which is why irreg is
no faster).  Finer clusters cost more per-visit fixed overhead
(microbenched: 64-row visit = 0.82x a 128-row one, 32-row = 0.65x) but
may cut the slots a grazing-view scene's tiles must test.  This sim
replays the tile-union + front-to-back occlusion sweep at leaf sizes
128/64/32 and reports slots and visit-cost units per tile-bounce, so
the variable-row-cluster kernel change can be sized before building it.

Run on CPU: python tools/sim_leaf_size.py [res] [scene ...]
"""
import sys

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracers_tpu import camera, scenes  # noqa: E402
from raytracers_tpu.bvh.lbvh import build_clusters  # noqa: E402
from raytracers_tpu.render.bruteforce import make_closest_hit  # noqa: E402
from raytracers_tpu.render.tracer import primary_rays, shade_step  # noqa: E402

EPS = 0.001
TMAX = 1e9
# measured visit cost relative to a 128-row visit (docs/PERF_NOTES.md
# round-2 "visit granularity" table, per-visit MXU payload)
VISIT_COST = {128: 1.0, 64: 1236 / 1505, 32: 980 / 1505}


def run(scene_name, res, bh=64, bw=32, depth=8):
    sc = scenes.by_name(scene_name)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    o0, d0 = primary_rays(cam, res, res)
    ch = jax.jit(make_closest_hit(sc.spheres, "matmul"))
    shade = jax.jit(lambda o, d, li, re, dn, idx, t: shade_step(
        sc.spheres, o, d, li, re, dn, idx, t))

    R = o0.shape[0]
    jj, ii = np.divmod(np.arange(R), res)
    tid = (jj // bh) * (res // bw) + ii // bw
    ntiles = tid.max() + 1
    org = np.asarray(cam.origin)

    print(f"{scene_name} {res}x{res} ({bh},{bw}) tiles={ntiles}")
    for leaf in (128, 64, 32):
        cl = build_clusters(sc.spheres, leaf_size=leaf)
        bmin, bmax = np.asarray(cl.leaf_min), np.asarray(cl.leaf_max)
        K = bmin.shape[0]
        dist = (((bmin + bmax) / 2 - org) ** 2).sum(-1)
        order = np.argsort(dist)

        o, d = o0, d0
        light = jnp.ones((R, 3), jnp.float32)
        result = jnp.zeros((R, 3), jnp.float32)
        done = jnp.zeros((R,), bool)
        tot_visits = 0.0
        tot_cost = 0.0
        tile_bounces = 0
        for bounce in range(depth):
            live = ~np.asarray(done)
            if live.sum() == 0:
                break
            live_tiles = np.zeros(ntiles, bool)
            np.logical_or.at(live_tiles, tid, live)
            tile_bounces += live_tiles.sum()
            on, dn_ = np.asarray(o), np.asarray(d)
            inv = 1.0 / dn_
            idx, t = ch(o, d)
            tbest = np.asarray(t)
            best = np.full(R, TMAX, np.float32)
            for k in order:
                t0 = (bmin[k] - on) * inv
                t1 = (bmax[k] - on) * inv
                lo = np.minimum(t0, t1).max(1)
                hi = np.maximum(t0, t1).min(1)
                hit = ~(np.minimum(hi, best) <= np.maximum(lo, EPS)) & live
                tflag = np.zeros(ntiles, bool)
                np.logical_or.at(tflag, tid, hit)
                nvis = tflag.sum()
                tot_visits += nvis
                tot_cost += nvis * VISIT_COST[leaf]
                vis = tflag[tid]
                upd = vis & (tbest < TMAX) & (tbest >= lo) & (tbest <= hi)
                best[upd] = np.minimum(best[upd], tbest[upd])
            o, d, light, result, done = shade(o, d, light, result, done,
                                              idx, t)
        slots = tot_visits * leaf
        print(f"  leaf {leaf:3d}: C={K:4d}, visits/tile-bounce "
              f"{tot_visits/tile_bounces:6.2f}, slots/tile-bounce "
              f"{slots/tile_bounces:7.0f}, 128-visit-equiv cost "
              f"{tot_cost/tile_bounces:6.2f}")


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = sys.argv[2:] or ["irreg", "rgbbox"]
    for name in names:
        run(name, res)
