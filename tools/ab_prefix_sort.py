#!/usr/bin/env python
"""A/B prefix-bounded boundary sorts (sort_prefix) end-to-end on TPU."""
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
    ("rgbbox", 2048, (64, 32), (3, 4, 8), None),
    ("rgbbox", 2048, (64, 32), (3, 4, 8), (None, 0.5, 0.25)),
    ("rgbbox", 2048, (64, 32), (3, 4, 8), (None, 0.5, 0.125)),
    ("irreg", 2048, (64, 32), (3, 8), None),
    ("irreg", 2048, (64, 32), (3, 8), (None, 0.125)),
    ("plane", 512, (32, 16), (3, 6), None),
    ("plane", 512, (32, 16), (3, 6), (None, 0.25)),
]
prep_cache = {}
for name, tile, block, sched, pref in CFGS:
    if name not in prep_cache:
        sc = scenes.by_name(name)
        prep_cache[name] = prepare_scene(sc, H, W, with_pallas=True,
                                         with_bvh=False)
    prep = prep_cache[name]

    def fn(ps, cam, sched=sched, pref=pref, tile=tile, block=block):
        img = render_pallas_twophase(ps, cam, W, H, max_depth=50,
                                     tile=tile, block=block,
                                     schedule=sched, sort_prefix=pref)
        return jnp.sum(img)
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(prep.pallas, prep.cam))
    cs = time.perf_counter() - t0
    cams = {k: prep.cam._replace(origin=prep.cam.origin
                                 + jnp.float32(k) * 1e-30)
            for k in range(-10, 10)}
    ms = bench_salted(jfn, lambda k, prep=prep: (prep.pallas, cams[k]),
                      warmup=2, runs=8) * 1e3
    print(f"{name} sort_prefix={pref}: {ms:7.2f} ms [compile {cs:.0f}s]",
          flush=True)
