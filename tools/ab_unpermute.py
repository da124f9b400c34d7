#!/usr/bin/env python
"""End-to-end check of the sort-unpermute twophase boundary (rgbbox+irreg)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu import camera, scenes
from raytracers_tpu.render.api import prepare_scene, render
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
W = H = 1000
for name in ("rgbbox", "irreg"):
    sc = scenes.by_name(name)
    prep = jax.block_until_ready(jax.jit(lambda s: prepare_scene(
        s, H, W, with_pallas=True))(sc))
    fn = jax.jit(lambda p: jnp.sum(render(p, H, W, mode="pallas")))
    t0 = time.perf_counter()
    jax.device_get(fn(prep))
    compile_s = time.perf_counter() - t0

    def salted(k, prep=prep):
        cam = prep.cam._replace(origin=prep.cam.origin + jnp.float32(k) * 1e-30)
        return (prep._replace(cam=cam),)
    dt = bench_salted(fn, salted, warmup=1, runs=8)
    print(f"{name}: {dt*1e3:7.2f} ms (compile {compile_s:.1f}s)", flush=True)
