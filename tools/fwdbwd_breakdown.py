#!/usr/bin/env python
"""Decompose a north-star fwd+bwd config (BASELINE.json: 1000x1000 d50,
gradient of a pixel loss w.r.t. every sphere parameter) into:
  plain render (no record) / record forward / full value_and_grad,
optionally with a per-kernel device-trace breakdown of the full pass.
Same-session numbers only (the tunneled v5e drifts 10-15% day to day).

Run ON TPU:
  python tools/fwdbwd_breakdown.py --scene irreg --schedule 3 6 \
      --prefix 0 0.25 --block 32 64 --trace
"""
import argparse
import sys
import tempfile

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import camera, scenes
from raytracers_tpu.grad.pallas_diff import make_render_pallas_diff
from raytracers_tpu.render.api import prepare_scene
from raytracers_tpu.render.pallas_kernel import (
    render_pallas_record_twophase, render_pallas_twophase)
from raytracers_tpu.utils.timing import bench_salted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rgbbox")
    ap.add_argument("--schedule", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--prefix", type=float, nargs="+", default=[0, 0.5])
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--block", type=int, nargs=2, default=[32, 64])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--trace", action="store_true",
                    help="per-kernel device breakdown of the full fwd+bwd")
    ap.add_argument("--skip-parts", action="store_true",
                    help="only run the full fwd+bwd (skip plain/record)")
    args = ap.parse_args()
    sched = tuple(args.schedule)
    pref = tuple(None if p <= 0 else p for p in args.prefix)
    blk = tuple(args.block)

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    sc = scenes.by_name(args.scene)
    W = H = 1000
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    prep = jax.block_until_ready(jax.jit(
        lambda s: prepare_scene(s, H, W, with_pallas=True,
                                with_bvh=False))(sc))
    scene = prep.pallas
    tag = f"{args.scene} {sched} blk={blk} pref={pref}"

    def salt(k):
        return (scene._replace(sph8=scene.sph8 + jnp.float32(k) * 1e-30),)

    def plain(sn):
        img = render_pallas_twophase(sn, cam, W, H, max_depth=50,
                                     schedule=sched, tile=args.tile,
                                     block=blk, sort_prefix=pref)
        return jnp.sum(img & 255)

    def rec_fwd(sn):
        colours, aux = render_pallas_record_twophase(
            sn, cam, W, H, max_depth=50, schedule=sched, tile=args.tile,
            block=blk, sort_prefix=pref)
        return (jnp.sum(colours) +
                sum(jnp.sum(r[:, :, ::37]) for r in aux["recs"]))

    if not args.skip_parts:
        dt = bench_salted(jax.jit(plain), salt, warmup=1, runs=args.runs)
        print(f"plain render   {tag}: {dt*1e3:.1f} ms", flush=True)
        dt = bench_salted(jax.jit(rec_fwd), salt, warmup=1, runs=args.runs)
        print(f"record forward {tag}: {dt*1e3:.1f} ms", flush=True)

    f = make_render_pallas_diff(W, H, max_depth=50, tile=args.tile,
                                block=blk, schedule=sched,
                                sort_prefix=pref)

    def loss(sph, cm):
        img = f(sph, cm)
        return jnp.sum(img * img)

    gfn = jax.jit(jax.value_and_grad(loss))

    def salt_sph(k):
        return (sc.spheres._replace(
            center=sc.spheres.center + jnp.float32(k) * 1e-30), cam)

    dt = bench_salted(lambda s, c: gfn(s, c)[0], salt_sph, warmup=1,
                      runs=args.runs)
    print(f"full fwd+bwd   {tag}: {dt*1e3:.1f} ms", flush=True)

    if args.trace:
        from raytracers_tpu.utils.profiling import (device_kernel_ms,
                                                    device_trace)
        tdir = tempfile.mkdtemp(prefix=f"fwdbwd_{args.scene}_")
        with device_trace(tdir):
            jax.device_get(gfn(*salt_sph(999))[0])
        kms = device_kernel_ms(tdir)
        groups = {}
        for name, ms in kms.items():
            low = name.lower()
            if "replay" in low or "bwd" in low:
                g = "replay-bwd kernels"
            elif "megakernel" in low or "render" in low or "pallas" in low:
                g = "forward/record kernels"
            elif "sort" in low:
                g = "sorts"
            elif "fusion" in low or "copy" in low or "transpose" in low:
                g = "xla fusions/copies"
            else:
                g = "other"
            groups.setdefault(g, []).append((ms, name))
        total = sum(ms for v in groups.values() for ms, _ in v)
        print(f"device total {total:.1f} ms", flush=True)
        for g in sorted(groups, key=lambda g: -sum(m for m, _ in groups[g])):
            gsum = sum(m for m, _ in groups[g])
            print(f"  {g}: {gsum:.1f} ms")
            for ms, name in sorted(groups[g], reverse=True)[:8]:
                if ms >= 0.3:
                    print(f"      {ms:7.2f}  {name[:90]}")


if __name__ == "__main__":
    main()
