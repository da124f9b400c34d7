#!/usr/bin/env python
"""Sweep two-phase megakernel configs: phase-1 tile size and culling.

Rationale: phase 1 is depth-capped (d6) and most tiles are fully live, so
per-tile fixed costs and per-visit lax.cond gates are overhead; larger
tiles amortize the former with no bounce-inflation penalty (inflation is
capped by phase1_depth), and cull=False removes the latter (at rgbbox's
C=4 the flags are usually all-pass anyway).

Run ON TPU:  python tools/sweep_phase1.py
"""
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from raytracers_tpu import scenes  # noqa: E402
from raytracers_tpu.geometry import camera  # noqa: E402
from raytracers_tpu.render.api import prepare_scene  # noqa: E402
from raytracers_tpu.render.pallas_kernel import (  # noqa: E402
    render_pallas_twophase)
from raytracers_tpu.utils.timing import bench_salted  # noqa: E402

W = H = 1000


def run(scene_name, p1, tile, block, cull):
    sc = scenes.by_name(scene_name)
    prep = prepare_scene(sc, H, W, with_pallas=True, with_bvh=False)

    def fn(cam):
        img = render_pallas_twophase(prep.pallas, cam, W, H, max_depth=50,
                                     phase1_depth=p1, tile=tile,
                                     block=block, cull=cull)
        return img[::173, ::173]

    jfn = jax.jit(fn)

    # Pre-build all salted cameras: camera() is ~20 jnp ops, i.e. ~20
    # tunneled device dispatches — building it inside the timed loop
    # (make_args runs in bench_salted's timed window) inflated every
    # config by a constant ~13-15 ms.  Salt via the f32 origin nudge
    # like the bench harness instead.
    base = camera(sc.look_from, sc.look_at, (0.0, 1.0, 0.0), sc.fov, W / H)
    import jax.numpy as jnp
    cams = {k: base._replace(origin=base.origin + jnp.float32(k) * 1e-30)
            for k in range(-10, 10)}

    def make_args(k):
        return (cams[k],)

    ms = bench_salted(jfn, make_args, warmup=2, runs=8) * 1e3
    print(f"{scene_name} p1={p1} tile={tile} block={block} cull={cull}: "
          f"{ms:.2f} ms ({W*H/ms/1e3:.1f} Mrays/s)", flush=True)


CFGS = [
    ("rgbbox", 6, 512, (32, 16), None),     # current default (baseline)
    ("rgbbox", 6, 512, (32, 16), False),
    ("rgbbox", 6, 1024, (32, 32), None),
    ("rgbbox", 6, 1024, (32, 32), False),
    ("rgbbox", 6, 2048, (64, 32), False),
    ("irreg", 6, 512, (32, 16), None),      # current default (baseline)
    ("irreg", 6, 1024, (32, 32), None),
    ("irreg", 3, 1024, (32, 32), None),
]

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
