#!/usr/bin/env python
"""Simulate sub-row (leaf-32/64) cluster culling for the megakernel.

Question: if clusters were leaf-L (L<128) with 128/L chunks packed per
visit row, how many 128-sublane visit rows per (tile, bounce) would the
per-tile slab cull skip vs today's leaf-128 layout?  Bounds the win of
the sub-row-culling kernel change before building it.

Cost proxy: phase-1 visit work ~ sum over (tile, bounce<=p1) of visited
rows; a row is visited iff ANY live ray in the tile slab-hits ANY of its
chunks' AABBs (t window = (eps, best_t_prev_bounce) approximated as
(eps, inf): the kernel's small-C sweep has no occlusion gate).

Run on CPU: python tools/sim_subrow_cull.py [res]
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


def slab_hits(o, d, bmin, bmax):
    """(R,3) rays x (K,3) boxes -> (R,K) bool hit in (EPS, inf)."""
    inv = 1.0 / d                                     # (R,3)
    t0 = (bmin[None] - o[:, None]) * inv[:, None]     # (R,K,3)
    t1 = (bmax[None] - o[:, None]) * inv[:, None]
    lo = np.minimum(t0, t1).max(axis=2)
    hi = np.maximum(t0, t1).min(axis=2)
    return ~(np.minimum(hi, 1e9) <= np.maximum(lo, EPS))


def run(scene_name, res, bh, bw, p1=6):
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

    # tile ids for (bh, bw) blocks
    jj, ii = np.divmod(np.arange(R), res)
    tid = (jj // bh) * (res // bw) + ii // bw
    ntiles = tid.max() + 1

    layouts = {}
    for L in (128, 64, 32, 16):
        cl = build_clusters(sc.spheres, leaf_size=L)
        layouts[L] = (np.asarray(cl.leaf_min), np.asarray(cl.leaf_max))

    tot_rows = {L: 0.0 for L in layouts}
    tot_tb = 0
    for bounce in range(1, p1 + 1):
        live = ~np.asarray(done)
        on, dn_ = np.asarray(o), np.asarray(d)
        # tiles with any live ray pay the bounce at all
        live_t = np.zeros(ntiles, bool)
        np.logical_or.at(live_t, tid, live)
        tot_tb += int(live_t.sum())
        for L, (bmin, bmax) in layouts.items():
            hits = slab_hits(on, dn_, bmin, bmax) & live[:, None]  # (R,K)
            K = bmin.shape[0]
            # tile x chunk visited
            tc = np.zeros((ntiles, K), bool)
            np.logical_or.at(tc, tid, hits)
            per_row = 128 // L
            Krows = -(-K // per_row)
            pad = Krows * per_row - K
            tcp = np.pad(tc, ((0, 0), (0, pad)))
            rows = tcp.reshape(ntiles, Krows, per_row).any(axis=2)
            tot_rows[L] += rows.sum()
        idx, t = ch(o, d)
        o, d, light, result, done = shade(o, d, light, result, done, idx, t)

    base_rows = -(-layouts[128][0].shape[0] // 1)  # C at leaf 128
    print(f"{scene_name} {res}x{res} tiles ({bh},{bw}), p1={p1}: "
          f"live tile-bounces {tot_tb}/{ntiles * p1}")
    for L in sorted(layouts, reverse=True):
        K = layouts[L][0].shape[0]
        per_row = 128 // L
        Krows = -(-K // per_row)
        dense = tot_tb * Krows
        print(f"  leaf {L:3d}: C={K:4d} rows/visit-sweep={Krows:3d}  "
              f"visited rows {tot_rows[L]:9.0f}  vs dense {dense:9.0f} "
              f"({tot_rows[L] / dense:５.1%})"
              .replace('５', ''))


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for name in ("rgbbox", "irreg"):
        run(name, res, 64, 32)
