#!/usr/bin/env python
"""Simulate per-lane-group culling granularity for the megakernel.

Today the cull ORs per-ray slab hits over the whole tile (2048 rays) and
the visit sweep runs (128 spheres x T rays) vector math for every
surviving cluster.  If instead the sweep ran per lane-GROUP of G rays
(G=128 -> a 4x32-pixel strip of a (64,32) block tile) gated on that
group's own OR-union, two effects compound: tighter unions prune more
clusters, and fully-dead groups (sky strips, finished rays) skip for
free.  This sim bounds the win: expected fraction of (cluster-row x
group) visit work remaining vs the per-tile baseline.

Run on CPU: python tools/sim_group_cull.py [res]
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
from tools.sim_subrow_cull import slab_hits  # noqa: E402


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

    # lane id within a (bh,bw) block tile, row-major: groups of G
    # consecutive lanes are (G/bw)-row strips
    jj, ii = np.divmod(np.arange(R), res)
    tid = (jj // bh) * (res // bw) + ii // bw
    lid = (jj % bh) * bw + (ii % bw)
    ntiles = tid.max() + 1

    cl = build_clusters(sc.spheres, leaf_size=128)
    bmin, bmax = np.asarray(cl.leaf_min), np.asarray(cl.leaf_max)
    K = bmin.shape[0]

    groups = {"tile(2048)": bh * bw, "G=512": 512, "G=256": 256,
              "G=128": 128}
    tot = {g: 0.0 for g in groups}
    dense = 0.0
    for bounce in range(1, p1 + 1):
        live = ~np.asarray(done)
        hits = slab_hits(np.asarray(o), np.asarray(d), bmin, bmax) \
            & live[:, None]
        dense += ntiles * K
        for gname, G in groups.items():
            gidx = tid * (bh * bw // G) + lid // G
            ng = ntiles * (bh * bw // G)
            gc = np.zeros((ng, K), bool)
            np.logical_or.at(gc, gidx, hits)
            # work in per-tile-visit units: each group visit costs G/(bh*bw)
            tot[gname] += gc.sum() * (G / (bh * bw))
        idx, t = ch(o, d)
        o, d, light, result, done = shade(o, d, light, result, done,
                                          idx, t)

    print(f"{scene_name} {res}x{res} ({bh},{bw}) tiles, leaf128 C={K}, "
          f"p1={p1}: dense visit work {dense:.0f}")
    for gname in groups:
        print(f"  {gname:12s}: {tot[gname]:10.1f}  ({tot[gname]/dense:.1%}"
              " of dense)")


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name in ("rgbbox", "irreg"):
        run(name, res)
