#!/usr/bin/env python
"""Sweep twophase phase1_depth for irreg with the front-to-back layout."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu import camera, scenes
from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                 render_pallas_twophase)
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
W = H = 1000
sc = scenes.by_name("irreg")
cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
ps = jax.block_until_ready(jax.jit(
    lambda s: build_pallas_scene(s, sort_origin=sc.look_from))(sc.spheres))

for p in (3, 4, 6):
    fn = jax.jit(lambda ps, cam, p=p: jnp.sum(render_pallas_twophase(
        ps, cam, W, H, max_depth=50, phase1_depth=p, block=(32, 16))))
    t0 = time.perf_counter()
    jax.device_get(fn(ps, cam))
    compile_s = time.perf_counter() - t0

    def salted(k):
        return (ps, cam._replace(origin=cam.origin + jnp.float32(k) * 1e-30))
    dt = bench_salted(fn, salted, warmup=1, runs=5)
    print(f"irreg f2b p1={p}: {dt*1e3:7.2f} ms (first call {compile_s:.1f}s)",
          flush=True)
