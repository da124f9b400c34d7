#!/usr/bin/env python
"""Measure the per-ray bounce-depth distribution and tile-max inflation.

The megakernel's bounce loop runs each tile to its DEEPEST ray, so the cost
model is sum(tile_max_depth), not sum(ray_depth).  This script traces a scene
on CPU recording each ray's termination depth, then reports mean ray depth
and mean tile-max depth for candidate block shapes.
"""
import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from raytracers_tpu import camera, scenes  # noqa: E402
from raytracers_tpu.render.bruteforce import make_closest_hit  # noqa: E402
from raytracers_tpu.render.tracer import primary_rays, shade_step  # noqa: E402


def depth_map(scene_name, res, max_depth=50):
    sc = scenes.by_name(scene_name)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    o, d = primary_rays(cam, res, res)
    ch = make_closest_hit(sc.spheres, "matmul")

    def chunk_depths(od):
        o, d = od
        R = o.shape[0]
        light = jnp.ones((R, 3), jnp.float32)
        result = jnp.zeros((R, 3), jnp.float32)
        done = jnp.zeros((R,), bool)
        depth_at_done = jnp.zeros((R,), jnp.int32)

        def body(k, st):
            o, d, light, result, done, dad = st
            idx, t = ch(o, d)
            o, d, light, result, done2 = shade_step(
                sc.spheres, o, d, light, result, done, idx, t)
            dad = jnp.where(done2 & ~done, k + 1, dad)
            return o, d, light, result, done2, dad

        st = (o, d, light, result, done, depth_at_done)
        st = jax.lax.fori_loop(0, max_depth, body, st)
        done, dad = st[4], st[5]
        return jnp.where(done, dad, max_depth)

    R = o.shape[0]
    C = 12500
    assert R % C == 0, (R, C)
    oo = o.reshape(-1, C, 3)
    dd = d.reshape(-1, C, 3)
    depths = jax.lax.map(chunk_depths, (oo, dd))
    return np.asarray(depths).reshape(res, res)


def tile_stats(dm, bh, bw):
    h, w = dm.shape
    t = dm[:h // bh * bh, :w // bw * bw].reshape(h // bh, bh, w // bw, bw)
    tmax = t.max(axis=(1, 3))
    return tmax.mean(), np.percentile(tmax, [50, 90, 99])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=500)
    args = ap.parse_args()
    for name in ["rgbbox", "irreg"]:
        dm = depth_map(name, args.res)
        print(f"{name} {args.res}x{args.res}: mean ray depth "
              f"{dm.mean():.2f}, p50/p90/p99 "
              f"{np.percentile(dm, [50, 90, 99])}, max {dm.max()}")
        hist = np.bincount(dm.reshape(-1), minlength=51)
        print("  depth histogram (1..12):", hist[1:13],
              " >=13:", hist[13:].sum())
        for bh, bw in [(8, 16), (16, 8), (16, 16), (32, 16), (16, 32),
                       (32, 32)]:
            m, pct = tile_stats(dm, bh, bw)
            print(f"  tile ({bh:2d},{bw:2d}): mean max-depth {m:6.2f}  "
                  f"p50/90/99 {pct}")


if __name__ == "__main__":
    main()
