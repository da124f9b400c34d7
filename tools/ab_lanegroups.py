#!/usr/bin/env python
"""A/B the per-lane-group gated sweep on hardware (irreg-class scenes).

Run ON TPU: python tools/ab_lanegroups.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu import scenes
from raytracers_tpu.render.api import prepare_scene
from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
W = H = 1000

CFGS = [
    ("irreg", 1), ("irreg", 2), ("irreg", 4), ("irreg", 8),
    ("rgbbox", 1), ("rgbbox", 8),
]


def run(scene_name, ng):
    sc = scenes.by_name(scene_name)
    prep = prepare_scene(sc, H, W, with_pallas=True, with_bvh=False)

    def fn(cam):
        img = render_pallas_twophase(prep.pallas, cam, W, H, max_depth=50,
                                     phase1_depth=6, tile=2048,
                                     block=(64, 32), lane_groups=ng)
        return jnp.sum(img)

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(prep.cam))
    compile_s = time.perf_counter() - t0
    cams = {k: prep.cam._replace(origin=prep.cam.origin
                                 + jnp.float32(k) * 1e-30)
            for k in range(-10, 10)}
    ms = bench_salted(jfn, lambda k: (cams[k],), warmup=2, runs=8) * 1e3
    print(f"{scene_name} lane_groups={ng}: {ms:7.2f} ms "
          f"({W*H/ms/1e3:6.1f} Mrays/s) [compile {compile_s:.0f}s]",
          flush=True)


if __name__ == "__main__":
    for cfg in CFGS:
        try:
            run(*cfg)
        except Exception as e:
            print(f"{cfg} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
