#!/usr/bin/env python
"""Per-phase tile-size sweep (round-4 VERDICT item 2b): continuation
phases run on compacted survivors, so their tile grain t2 is the one
per-phase geometry knob (block shapes only exist for ray-gen phase 0).
Re-sweeps tile2 at the CURRENT defaults (runtime depth caps +
prefix-bounded sorts — the round-2 sweep that kept t2 = tile predates
both).

Run ON TPU:  python tools/ab_tile2.py
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import camera, scenes
from raytracers_tpu.render.api import pallas_config, prepare_scene
from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
from raytracers_tpu.utils.timing import bench_salted

W = H = 1000


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    for name in ["rgbbox", "irreg"]:
        sc = scenes.by_name(name)
        prep = jax.block_until_ready(jax.jit(
            lambda s: prepare_scene(s, H, W, with_pallas=True,
                                    with_bvh=False))(sc))
        ps = prep.pallas
        cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
        tile, blk, sched, pref = pallas_config(ps.n_clusters)
        for t2 in [None, 1024, 512]:
            def fn(sn, t2=t2):
                img = render_pallas_twophase(
                    sn, cam, W, H, max_depth=50, schedule=sched, tile=tile,
                    block=blk, sort_prefix=pref, tile2=t2)
                return jnp.sum(img & 255)

            def salt(k, ps=ps):
                return (ps._replace(sph8=ps.sph8 + jnp.float32(k) * 1e-30),)

            dt = bench_salted(jax.jit(fn), salt, warmup=1, runs=6)
            print(f"{name} {sched} blk={blk} t2={t2 or tile}: "
                  f"{dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
