#!/usr/bin/env python
"""A/B survivor-packing order (pixel-id vs direction|position coherent)
x forced continuation-phase occlusion gate, on hardware, at the
api.render mode='pallas' deep defaults."""
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

CASES = (("pixel-id      ", False, False),
         ("coherent      ", True, False),
         ("pixel+occl    ", False, True),
         ("coherent+occl ", True, True))

for name, sched in (("rgbbox", (4, 8)), ("irreg", (3, 8))):
    sc = scenes.by_name(name)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    ps = jax.block_until_ready(
        jax.jit(lambda s: build_pallas_scene(
            s, sort_origin=sc.look_from))(sc.spheres))
    for tag, coh, occ in CASES:
        fn = jax.jit(lambda ps, cam, coh=coh, occ=occ: jnp.sum(
            render_pallas_twophase(
                ps, cam, W, H, max_depth=50, schedule=sched,
                tile=2048, block=(64, 32), coherent=coh, occl_cont=occ)))
        t0 = time.perf_counter()
        jax.device_get(fn(ps, cam))
        compile_s = time.perf_counter() - t0

        def salted(k, ps=ps):
            return (ps, cam._replace(
                origin=cam.origin + jnp.float32(k) * 1e-30))
        dt = bench_salted(fn, salted, warmup=1, runs=5)
        print(f"{name:8s} {tag} sched={sched} {dt*1e3:7.2f} ms   "
              f"(first call {compile_s:.1f}s)", flush=True)
