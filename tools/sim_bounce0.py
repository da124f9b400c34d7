#!/usr/bin/env python
"""Per-BOUNCE cluster flag rates for the production tile shape.

sim_group_cull2 reported the phase-1 AGGREGATE visit fraction (rgbbox
~90% of dense).  VERDICT r3 item 1 proposes bounce-0 specialization /
per-tile primary cluster lists — which only pays if bounce 0 culls much
better than the aggregate.  This sim reports the flag rate per bounce
(with and without the occlusion gate) so that idea can be sized on CPU
before any kernel work.

Run: python tools/sim_bounce0.py [res] [scene ...]
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


def run(scene_name, res, bh=64, bw=32, depth=10):
    sc = scenes.by_name(scene_name)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    o, d = primary_rays(cam, res, res)
    ch = jax.jit(make_closest_hit(sc.spheres, "matmul"))
    shade = jax.jit(lambda o, d, li, re, dn, idx, t: shade_step(
        sc.spheres, o, d, li, re, dn, idx, t))

    R = o.shape[0]
    light = jnp.ones((R, 3), jnp.float32)
    result = jnp.zeros((R, 3), jnp.float32)
    done = jnp.zeros((R,), bool)

    jj, ii = np.divmod(np.arange(R), res)
    tid = (jj // bh) * (res // bw) + ii // bw
    ntiles = tid.max() + 1

    cl = build_clusters(sc.spheres, leaf_size=128)
    bmin, bmax = np.asarray(cl.leaf_min), np.asarray(cl.leaf_max)
    K = bmin.shape[0]
    org = np.asarray(cam.origin)
    dist = (((bmin + bmax) / 2 - org) ** 2).sum(-1)
    order = np.argsort(dist)

    print(f"{scene_name} {res}x{res} ({bh},{bw}) tiles={ntiles} C={K}")
    for bounce in range(depth):
        live = ~np.asarray(done)
        if live.sum() == 0:
            break
        on, dn_ = np.asarray(o), np.asarray(d)
        inv = 1.0 / dn_
        # per-ray true winner t for the occlusion-aware replay
        idx, t = ch(o, d)
        tbest = np.asarray(t)
        flags = 0
        flags_occl = 0
        live_tiles = np.zeros(ntiles, bool)
        np.logical_or.at(live_tiles, tid, live)
        best = np.full(R, TMAX, np.float32)
        for k in order:
            t0 = (bmin[k] - on) * inv
            t1 = (bmax[k] - on) * inv
            lo = np.minimum(t0, t1).max(1)
            hi = np.maximum(t0, t1).min(1)
            hit = ~(np.minimum(hi, TMAX) <= np.maximum(lo, EPS)) & live
            tflag = np.zeros(ntiles, bool)
            np.logical_or.at(tflag, tid, hit)
            flags += tflag.sum()
            hit_o = ~(np.minimum(hi, best) <= np.maximum(lo, EPS)) & live
            tflag_o = np.zeros(ntiles, bool)
            np.logical_or.at(tflag_o, tid, hit_o)
            flags_occl += tflag_o.sum()
            # sweep updates best with the true winner where this cluster
            # was visited and contains the winner (approx: clamp by hi)
            vis = tflag_o[tid]
            upd = vis & (tbest < TMAX) & (tbest >= lo) & (tbest <= hi)
            best[upd] = np.minimum(best[upd], tbest[upd])
        lt = live_tiles.sum()
        print(f"  bounce {bounce}: live rays {live.mean():6.1%}, live "
              f"tiles {lt:4d}, flags/live-tile {flags/max(lt,1):.2f} "
              f"(occl {flags_occl/max(lt,1):.2f}) of C={K}")
        o, d, light, result, done = shade(o, d, light, result, done,
                                          idx, t)


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = sys.argv[2:] or ["rgbbox", "irreg"]
    for name in names:
        run(name, res)
