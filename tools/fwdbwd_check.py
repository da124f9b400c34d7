#!/usr/bin/env python
"""North-star fwd+bwd check on TPU: gradient of a pixel loss through the
Pallas megakernel (forward) + path replay (backward) at full config."""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1000)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--backward", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--block", type=int, nargs=2, default=None)
    ap.add_argument("--phase1", type=int, default=None,
                    help="survivor-compaction depth (segmented replay)")
    ap.add_argument("--schedule", type=int, nargs="+", default=None,
                    help="multi-boundary compaction schedule")
    ap.add_argument("--prefix", type=float, nargs="+", default=None,
                    help="per-boundary sort-prefix fractions (0 = full)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytracers_tpu import camera, scenes
    from raytracers_tpu.grad.pallas_diff import make_render_pallas_diff
    from raytracers_tpu.utils.timing import bench_salted

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    sc = scenes.rgbbox()
    W = H = args.res
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    kw = {}
    if args.tile:
        kw["tile"] = args.tile
    if args.block:
        kw["block"] = tuple(args.block)
    if args.phase1:
        kw["phase1_depth"] = args.phase1
    if args.schedule:
        kw["schedule"] = tuple(args.schedule)
    if args.prefix:
        kw["sort_prefix"] = tuple(None if p <= 0 else p
                                  for p in args.prefix)
    f = make_render_pallas_diff(W, H, max_depth=args.depth,
                                bwd_chunks=args.chunks,
                                backward=args.backward, **kw)

    def loss(spheres, cam):
        img = f(spheres, cam)
        return jnp.sum(img * img)

    gfn = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    v, g = gfn(sc.spheres, cam)
    jax.block_until_ready(g)
    compile_s = time.perf_counter() - t0
    print(f"loss={float(v):.1f} |g_center|={float(jnp.abs(g.center).sum()):.3f} "
          f"|g_radius|={float(jnp.abs(g.radius).sum()):.3f} "
          f"compile+first {compile_s:.0f}s", file=sys.stderr, flush=True)

    def salted(k):
        return (sc.spheres._replace(
            center=sc.spheres.center + jnp.float32(k) * 1e-30), cam)
    dt = bench_salted(lambda s, c: gfn(s, c)[0], salted, warmup=1,
                      runs=args.runs)
    rays = W * H / dt
    print(f"fwd+bwd rgbbox {W}x{H} d{args.depth}: {dt*1e3:.1f} ms "
          f"({rays/1e6:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
