#!/usr/bin/env python
"""A/B twophase configs with API-style salted timing (camera pre-built).

Candidates from tools/sweep_phase1.py (relative trends) re-measured
absolutely: bigger phase-1 tiles + decoupled smaller phase-2 tiles.
Run ON TPU: python tools/ab_twophase_cfg.py [scene]
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
    # (scene, p1, tile, block, cull, tile2)
    # round 2 (gap cells; round-1 results in docs/PERF_NOTES.md):
    ("rgbbox", 6, 2048, (64, 32), None, None),
    ("rgbbox", 6, 2048, (32, 64), None, 512),
    ("rgbbox", 6, 4096, (64, 64), None, 512),
    ("irreg", 6, 2048, (32, 64), None, None),
    ("irreg", 6, 4096, (64, 64), None, None),
]


def run(scene_name, p1, tile, block, cull, tile2):
    sc = scenes.by_name(scene_name)
    prep = prepare_scene(sc, H, W, with_pallas=True, with_bvh=False)

    def fn(cam):
        img = render_pallas_twophase(prep.pallas, cam, W, H, max_depth=50,
                                     phase1_depth=p1, tile=tile,
                                     block=block, cull=cull, tile2=tile2)
        return jnp.sum(img)

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(prep.cam))
    compile_s = time.perf_counter() - t0

    cams = {k: prep.cam._replace(origin=prep.cam.origin
                                 + jnp.float32(k) * 1e-30)
            for k in range(-10, 10)}
    ms = bench_salted(jfn, lambda k: (cams[k],), warmup=2, runs=8) * 1e3
    print(f"{scene_name} p1={p1} tile={tile} block={block} cull={cull} "
          f"tile2={tile2}: {ms:7.2f} ms ({W*H/ms/1e3:6.1f} Mrays/s) "
          f"[compile {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for cfg in CFGS:
        if only and cfg[0] != only:
            continue
        try:
            run(*cfg)
        except Exception as e:
            print(f"{cfg} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
