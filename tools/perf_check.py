#!/usr/bin/env python
"""Quick megakernel perf check on the real TPU.

Usage: python tools/perf_check.py [--scene rgbbox] [--depth 50]
       [--tile 512] [--block 32,16] [--cull auto|on|off] [--runs 5]
       [--res 1000] [--twophase]
Each distinct (kernel code, static params) pair costs a 2-5 min compile.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rgbbox")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--block", default="32,16")
    ap.add_argument("--cull", default="auto")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--res", type=int, default=1000)
    ap.add_argument("--twophase", type=int, default=0,
                    help="phase-1 depth for survivor compaction (0=off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytracers_tpu import camera, scenes
    from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                     render_pallas)
    from raytracers_tpu.utils.timing import bench_salted

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    W = H = args.res
    if args.scene.startswith("soup"):
        n = int(args.scene[4:])
        sph = scenes.random_spheres(n, seed=11, extent=400.0)
        ps = jax.block_until_ready(jax.jit(build_pallas_scene)(sph))
        cam = camera((0., 0., 520.), (0., 0., 0.), (0., 1., 0.), 60.0,
                     W / H)
    else:
        sc = scenes.by_name(args.scene)
        ps = jax.block_until_ready(jax.jit(build_pallas_scene)(sc.spheres))
        cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    block = tuple(int(x) for x in args.block.split(",")) \
        if args.block != "none" else None
    cull = {"auto": None, "on": True, "off": False}[args.cull]

    if args.twophase:
        from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
        fn = jax.jit(lambda ps, cam: jnp.sum(render_pallas_twophase(
            ps, cam, W, H, max_depth=args.depth,
            phase1_depth=args.twophase, tile=args.tile, cull=cull,
            block=block)))
    else:
        fn = jax.jit(lambda ps, cam: jnp.sum(render_pallas(
            ps, cam, W, H, max_depth=args.depth, tile=args.tile,
            block=block, cull=cull)))
    t0 = time.perf_counter()
    jax.device_get(fn(ps, cam))
    compile_s = time.perf_counter() - t0

    def salted(k):
        return (ps, cam._replace(origin=cam.origin + jnp.float32(k) * 1e-30))
    dt = bench_salted(lambda ps, cam: fn(ps, cam), salted, warmup=1,
                      runs=args.runs)
    rays = W * H / dt
    print(f"{args.scene} {W}x{H} d{args.depth} tile={args.tile} "
          f"block={block} cull={args.cull} 2ph={args.twophase}: "
          f"{dt*1e3:.2f} ms "
          f"({rays/1e6:.1f} Mrays/s; compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
