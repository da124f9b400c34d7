#!/usr/bin/env python
"""Time api.render (the bench path) for the given scenes on the TPU.

Usage: python tools/ab_api_render.py [scene ...]   (default: rgbbox irreg)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import scenes
from raytracers_tpu.render.api import prepare_scene, render
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
W = H = 1000

for name in (sys.argv[1:] or ["rgbbox", "irreg"]):
    sc = scenes.by_name(name)
    prep = jax.block_until_ready(jax.jit(
        lambda s: prepare_scene(s, H, W, leaf_size=8, with_pallas=True))(sc))
    rf = jax.jit(lambda p: jnp.sum(render(p, H, W, mode="pallas")))
    t0 = time.perf_counter()
    jax.device_get(rf(prep))
    compile_s = time.perf_counter() - t0

    def salted(k, prep=prep):
        cam = prep.cam._replace(origin=prep.cam.origin + jnp.float32(k) * 1e-30)
        return (prep._replace(cam=cam),)

    dt = bench_salted(rf, salted, warmup=1, runs=10)
    print(f"{name}: {dt*1e3:.2f} ms ({W*H/dt/1e6:.1f} Mrays/s, "
          f"compile {compile_s:.1f}s)", flush=True)
