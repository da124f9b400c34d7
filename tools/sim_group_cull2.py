#!/usr/bin/env python
"""Occlusion-aware follow-up to sim_group_cull.py.

The kernel's visit sweep walks clusters front-to-back and prunes a
cluster when every live ray's current best-t puts the cluster fully
behind the hit (the occlusion gate, active at C > 16).  sim_group_cull
ignored that, overstating today's visit count on irreg.  This sim
replays the sweep with per-ray shrinking best-t windows and compares
per-tile vs per-lane-group gate granularity ON TOP of occlusion.

Run on CPU: python tools/sim_group_cull2.py [res]
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
from raytracers_tpu.render.tracer import (  # noqa: E402
    primary_rays, shade_step)

EPS = 0.001
TMAX = 1e9


def sphere_t(o, d, c, r):
    """(R,3) rays x (S,3)+(S,) spheres -> (R,S) nearest root in window."""
    oc = o[:, None] - c[None]                     # (R,S,3)
    b = np.einsum("rsk,rk->rs", oc, d)
    cc = (oc * oc).sum(-1) - r[None] ** 2
    disc = b * b - cc
    ok = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    t1 = -b - sq
    t2 = -b + sq
    t = np.where(t1 > EPS, t1, t2)
    return np.where(ok & (t > EPS), t, TMAX)


def run(scene_name, res, bh=64, bw=32, p1=6):
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
    lid = (jj % bh) * bw + (ii % bw)
    ntiles = tid.max() + 1

    cl = build_clusters(sc.spheres, leaf_size=128)
    bmin, bmax = np.asarray(cl.leaf_min), np.asarray(cl.leaf_max)
    centers = np.asarray(cl.spheres.center).reshape(-1, 128, 3)
    radii = np.asarray(cl.spheres.radius).reshape(-1, 128)
    K = bmin.shape[0]
    # front-to-back by AABB centre distance from camera (kernel order)
    org = np.asarray(cam.origin)
    dist = (((bmin + bmax) / 2 - org) ** 2).sum(-1)
    order = np.argsort(dist)

    grains = {"tile(2048)": bh * bw, "G=512": 512, "G=256": 256,
              "G=128": 128}
    tot = {g: 0.0 for g in grains}
    for bounce in range(1, p1 + 1):
        live = ~np.asarray(done)
        on, dn_ = np.asarray(o), np.asarray(d)
        inv = 1.0 / dn_
        for gname, G in grains.items():
            gidx = tid * (bh * bw // G) + lid // G
            ng = ntiles * (bh * bw // G)
            best = np.full(R, TMAX, np.float32)
            for k in order:
                t0 = (bmin[k] - on) * inv
                t1 = (bmax[k] - on) * inv
                lo = np.minimum(t0, t1).max(1)
                hi = np.maximum(t0, t1).min(1)
                hit = ~(np.minimum(hi, best) <= np.maximum(lo, EPS)) & live
                gflag = np.zeros(ng, bool)
                np.logical_or.at(gflag, gidx, hit)
                visited = gflag[gidx]            # per-ray: my group visits
                tot[gname] += gflag.sum() * (G / (bh * bw))
                if gflag.any():
                    ts = sphere_t(on[visited], dn_[visited],
                                  centers[k], radii[k]).min(1)
                    b = best[visited]
                    best[visited] = np.minimum(b, ts)
        idx, t = ch(o, d)
        o, d, light, result, done = shade(o, d, light, result, done,
                                          idx, t)

    dense = ntiles * K * p1
    print(f"{scene_name} {res}x{res} ({bh},{bw}) tiles, C={K}, p1={p1}, "
          f"occlusion-aware: dense {dense}")
    for gname in grains:
        print(f"  {gname:12s}: {tot[gname]:10.1f} tile-visit units "
              f"({tot[gname]/dense:.1%} of dense)")


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name in ("irreg", "rgbbox"):
        run(name, res)
