#!/usr/bin/env python
"""A/B plane-100k tile size + run-gate granularity on the dynamic sweep.

bench r4 instrumentation: plane runs at 23% of the VPU issue ceiling —
~75% of its 120 ms is per-tile fixed cost (cull rows + scalar run-gate
conds), not visit math.  Fatter tiles divide those fixed costs by 4.
tile 2048 on the CB>1 path crashed the Mosaic remote compiler in round
2; retest at the current (smaller) kernel.

Run ON TPU: python tools/ab_plane_tile.py [n_spheres]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import camera, scenes
from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                 render_pallas_twophase)
from raytracers_tpu.utils.timing import bench_salted

W = H = 1000


def main():
    sc = scenes.by_name("plane")
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    ps = jax.block_until_ready(jax.jit(
        lambda s: build_pallas_scene(s, sort_origin=sc.look_from))(
            sc.spheres))
    print(f"C={ps.n_clusters} CB={ps.aabbT.shape[0]} CR={ps.aabbT.shape[1]}",
          flush=True)

    for tile, block in [(512, (32, 16)), (1024, (32, 32)),
                        (2048, (64, 32))]:
        try:
            fn = jax.jit(lambda p, c, t=tile, b=block: jnp.sum(
                render_pallas_twophase(p, c, W, H, max_depth=50,
                                       schedule=(3, 6), tile=t, block=b,
                                       sort_prefix=(None, 0.25))))
            jax.device_get(fn(ps, cam))

            def salt(k):
                return (ps, cam._replace(
                    origin=cam.origin + jnp.float32(k) * 1e-30))
            dt = bench_salted(fn, salt, warmup=1, runs=6)
            print(f"tile {tile} block {block}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"tile {tile} block {block}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
