#!/usr/bin/env python
"""End-to-end leaf-64 vs leaf-128 A/B on irreg (round-4 VERDICT item 4:
the lever was parked on simulation; this measures it).  Forward render
and fwd+bwd, same session.  Width 64 doubles the cluster count
(irreg C=79 -> 157), engaging the CB=3 two-level cull; winner slots
stay 128-encoded so the gradient engine is width-agnostic
(bit-identity pinned by tests).

Run ON TPU:  python tools/ab_leaf_width.py [--scene irreg]
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracers_tpu import camera, scenes
from raytracers_tpu.grad.pallas_diff import make_render_pallas_diff
from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                 render_pallas_twophase)
from raytracers_tpu.utils.timing import bench_salted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="irreg")
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--skip-grad", action="store_true")
    args = ap.parse_args()
    W = H = 1000

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    sc = scenes.by_name(args.scene)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)

    # forward: both widths at irreg's class config AND width-64 at the
    # scene-scale class config (its C=157 falls in that class)
    fwd_cfgs = [
        (None, 2048, (32, 64), (3, 6), (None, 0.25)),
        (64, 2048, (32, 64), (3, 6), (None, 0.25)),
        (64, 2048, (8, 256), (2, 3, 6), (None, 0.25, 0.12)),
    ]
    for cw, tile, blk, sched, pref in fwd_cfgs:
        ps = jax.block_until_ready(jax.jit(
            lambda s, cw=cw: build_pallas_scene(
                s, sort_origin=sc.look_from, cluster_width=cw))(sc.spheres))

        def fn(sn, tile=tile, blk=blk, sched=sched, pref=pref):
            img = render_pallas_twophase(sn, cam, W, H, max_depth=50,
                                         schedule=sched, tile=tile,
                                         block=blk, sort_prefix=pref)
            return jnp.sum(img & 255)

        def salt(k, ps=ps):
            return (ps._replace(sph8=ps.sph8 + jnp.float32(k) * 1e-30),)

        dt = bench_salted(jax.jit(fn), salt, warmup=1, runs=args.runs)
        print(f"{args.scene} W={cw or 128} C={ps.n_clusters} {sched} "
              f"blk={blk}: forward {dt*1e3:.1f} ms", flush=True)

    if args.skip_grad:
        return
    for cw in [None, 64]:
        f = make_render_pallas_diff(W, H, max_depth=50, tile=2048,
                                    block=(32, 64), schedule=(3, 6),
                                    sort_prefix=(None, 0.25),
                                    cluster_width=cw)

        def loss(sph, cm):
            img = f(sph, cm)
            return jnp.sum(img * img)

        gfn = jax.jit(jax.value_and_grad(loss))

        def salt_sph(k):
            return (sc.spheres._replace(
                center=sc.spheres.center + jnp.float32(k) * 1e-30), cam)

        dt = bench_salted(lambda s, c: gfn(s, c)[0], salt_sph, warmup=1,
                          runs=args.runs)
        print(f"{args.scene} W={cw or 128}: fwd+bwd {dt*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
