"""Command-line driver with the reference flag contract.

Flags mirror the reference drivers (futhark/main.c:34-57, fsharp/ray.fs:
395-401, rust/src/main.rs:11-28): ``-m height -n width -f out.ppm
-s rgbbox|irreg -r runs``, extended with TPU-native options
(--mode, --leaf-size, --depth, --cpu, --shard).

Output protocol matches the reference driver:
    Using scene <s> (-s to switch).
    Timing over average of <r> runs (-r to change).
    Scene BVH construction in <t>s.
    Rendering in <t>s.
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="raytracers-tpu",
                                description=__doc__.split("\n")[0])
    p.add_argument("-m", dest="height", type=int, default=200,
                   help="image height (reference -m)")
    p.add_argument("-n", dest="width", type=int, default=200,
                   help="image width (reference -n)")
    p.add_argument("-f", dest="imgfile", default=None,
                   help="write PPM to this file (reference -f)")
    p.add_argument("-s", dest="scene", default="rgbbox",
                   help="scene: rgbbox | irreg (reference -s)")
    p.add_argument("-r", dest="runs", type=int, default=10,
                   help="timed runs per phase (reference -r)")
    p.add_argument("--mode", default=None,
                   choices=["bvh", "brute", "brute_matmul", "pallas"],
                   help="closest-hit engine (default: pallas on TPU — the "
                        "flagship kernel, like the reference's driver always "
                        "running its fast path — else bvh)")
    p.add_argument("--leaf-size", type=int, default=8,
                   help="BVH leaf cluster size (spheres per leaf)")
    p.add_argument("--depth", type=int, default=50,
                   help="max bounce depth (reference: 50)")
    p.add_argument("--chunk", type=int, default=None,
                   help="rays per processing chunk (memory bound)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--shard", action="store_true",
                   help="shard rays over all available devices")
    p.add_argument("--native", action="store_true",
                   help="use the native C++ CPU renderer instead of JAX")
    p.add_argument("--validate", action="store_true",
                   help="run BVH/scene invariant checks before rendering")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.mode is None:
        # the reference's driver always runs its fast path; ours is the
        # megakernel on TPU (the XLA traversal elsewhere — the megakernel
        # only interprets off-TPU).  probe_tpu degrades to CPU instead
        # of crashing when the chip is held by another process.
        from .utils.platform import probe_tpu
        args.mode = "pallas" if probe_tpu() else "bvh"

    from . import scenes
    from .image import write_image
    from .utils.timing import bench_fn

    try:
        scene = scenes.by_name(args.scene)
    except ValueError as e:
        # reference driver behaviour: friendly message + nonzero exit
        # (futhark/main.c:78-81), not a traceback
        print(e, file=sys.stderr)
        return 1
    if args.validate:
        from .bvh.lbvh import build_bvh
        from .utils.validate import validate_bvh, validate_spheres
        problems = validate_spheres(scene.spheres) + validate_bvh(
            build_bvh(scene.spheres, leaf_size=args.leaf_size))
        if problems:
            print("VALIDATION FAILED:", *problems, sep="\n  ",
                  file=sys.stderr)
            return 2
        print("validation: scene and BVH invariants OK", file=sys.stderr)
    print(f"Using scene {args.scene} (-s to switch).")
    print(f"Timing over average of {args.runs} runs (-r to change).")

    if args.native:
        from . import native
        bvh_ms, render_ms, img = native.bench(
            scene.spheres, scene.look_from, scene.look_at, scene.fov,
            args.width, args.height, max_depth=args.depth, runs=args.runs)
        print(f"Scene BVH construction in {bvh_ms / 1e3:f}s.")
        print(f"Rendering in {render_ms / 1e3:f}s.")
    else:
        from .render.api import prepare_scene, render

        prep_fn = jax.jit(
            lambda s: prepare_scene(s, args.height, args.width,
                                    leaf_size=args.leaf_size,
                                    with_pallas=args.mode == "pallas"))
        bvh_s = bench_fn(prep_fn, scene, runs=args.runs)
        print(f"Scene BVH construction in {bvh_s:f}s.")
        prep = jax.block_until_ready(prep_fn(scene))

        # the megakernel only compiles on TPU hardware; elsewhere run it
        # through the Pallas interpreter (slow but correct)
        interpret = (args.mode == "pallas"
                     and jax.devices()[0].platform != "tpu")
        if args.shard:
            from .parallel.mesh import render_sharded
            render_fn = jax.jit(lambda p: render_sharded(
                p, args.height, args.width, mode=args.mode,
                max_depth=args.depth, interpret=interpret))
        else:
            render_fn = jax.jit(lambda p: render(
                p, args.height, args.width, mode=args.mode,
                max_depth=args.depth, chunk=args.chunk,
                interpret=interpret))
        render_s = bench_fn(render_fn, prep, runs=args.runs)
        print(f"Rendering in {render_s:f}s.")
        rays = args.width * args.height / render_s
        print(f"({rays / 1e6:.1f} Mrays/s on {jax.devices()[0].platform})",
              file=sys.stderr)
        img = render_fn(prep)

    if args.imgfile is None:
        print("-f not passed, so not writing image to file")
    else:
        print(f"Writing image to {args.imgfile}.")
        write_image(args.imgfile, img)
    return 0


if __name__ == "__main__":
    sys.exit(main())
