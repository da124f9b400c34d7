#!/usr/bin/env python
"""A/B the scene-scale (CB>1) twophase render across tile/schedule configs,
through the same scene prep as the api path (front-to-back clusters).

Usage: python tools/ab_plane_bigtile.py [scene] [tile,bh,bw,s1[,s2..]] ...
e.g.   python tools/ab_plane_bigtile.py plane 512,32,16,6 2048,64,32,6 \
           2048,64,32,3,8
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import scenes
from raytracers_tpu.render.api import prepare_scene
from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
W = H = 1000
args = sys.argv[1:] or ["plane", "2048,64,32,6"]
name, cfgs = args[0], args[1:]

sc = scenes.by_name(name)
prep = jax.block_until_ready(jax.jit(
    lambda s: prepare_scene(s, H, W, leaf_size=8, with_pallas=True))(sc))

for cfg in cfgs:
    parts = [int(x) for x in cfg.split(",")]
    tile, bh, bw, sched = parts[0], parts[1], parts[2], tuple(parts[3:])
    rf = jax.jit(lambda ps, cam: jnp.sum(render_pallas_twophase(
        ps, cam, W, H, max_depth=50, schedule=sched, tile=tile,
        block=(bh, bw))))
    t0 = time.perf_counter()
    try:
        jax.device_get(rf(prep.pallas, prep.cam))
    except Exception as e:
        print(f"{name} tile={tile} block=({bh},{bw}) sched={sched}: "
              f"COMPILE/RUN FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    compile_s = time.perf_counter() - t0

    def salted(k, prep=prep):
        cam = prep.cam._replace(origin=prep.cam.origin + jnp.float32(k) * 1e-30)
        return (prep.pallas, cam)

    dt = bench_salted(rf, salted, warmup=1, runs=8)
    print(f"{name} tile={tile} block=({bh},{bw}) sched={sched}: "
          f"{dt*1e3:.2f} ms (compile {compile_s:.1f}s)", flush=True)
