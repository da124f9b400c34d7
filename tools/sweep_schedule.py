#!/usr/bin/env python
"""Sweep multi-phase compaction schedules (render_pallas_twophase).

Motivated by tools/twophase_breakdown.py: rgbbox phase 2 runs packed
survivor tiles ~32 further bounces (32 ms of the 75); a second 4.3 ms
boundary should cap that.  irreg's tail is tiny — its knob is
phase-1 depth.

Run ON TPU: python tools/sweep_schedule.py [cfg ...]
where cfg = scene:tile:BHxBW:d1-d2-...  e.g. rgbbox:2048:64x32:4-8
(no args: the built-in CFGS list).
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
    # round 3: plane-100k at its compilable tile (512/(32,16))
    ("plane", 512, (32, 16), (6,)),
    ("plane", 512, (32, 16), (6, 8)),
    ("plane", 512, (32, 16), (3, 8)),
    ("plane", 512, (32, 16), (6, 8, 12)),
]


def run(scene_name, tile, block, sched):
    sc = scenes.by_name(scene_name)
    prep = prepare_scene(sc, H, W, with_pallas=True, with_bvh=False)

    # pass the scene as a jit ARGUMENT: closing over prep.pallas embeds
    # 6+ MB of constants into the HLO, which crashes the remote compile
    # helper on big scenes (plane-100k) — and misses the compile cache
    def fn(ps, cam):
        img = render_pallas_twophase(ps, cam, W, H, max_depth=50,
                                     tile=tile, block=block,
                                     schedule=sched)
        return jnp.sum(img)

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(prep.pallas, prep.cam))
    compile_s = time.perf_counter() - t0
    cams = {k: prep.cam._replace(origin=prep.cam.origin
                                 + jnp.float32(k) * 1e-30)
            for k in range(-10, 10)}
    ms = bench_salted(jfn, lambda k: (prep.pallas, cams[k]),
                      warmup=2, runs=8) * 1e3
    print(f"{scene_name} tile={tile} schedule={sched}: {ms:7.2f} ms "
          f"({W*H/ms/1e3:6.1f} Mrays/s) [compile {compile_s:.0f}s]",
          flush=True)


def parse_cfg(spec):
    scene_name, tile, block, sched = spec.split(":")
    bh, bw = block.split("x")
    return (scene_name, int(tile), (int(bh), int(bw)),
            tuple(int(d) for d in sched.split("-")))


if __name__ == "__main__":
    cfgs = ([parse_cfg(a) for a in sys.argv[1:]]
            if len(sys.argv) > 1 else CFGS)
    for cfg in cfgs:
        try:
            run(*cfg)
        except Exception as e:
            print(f"{cfg} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
