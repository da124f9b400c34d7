#!/usr/bin/env python
"""Decompose LBVH build time on TPU: which pass costs what, at 400 and
1M spheres.  Informs the build-time optimisation (VERDICT #7)."""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from raytracers_tpu import scenes
    from raytracers_tpu.bvh.lbvh import build_bvh, _pad_spheres, _refit, _skip_links
    from raytracers_tpu.bvh.morton import morton_codes
    from raytracers_tpu.bvh.radix_tree import build_radix_tree, node_depths
    from raytracers_tpu.geometry import Spheres, sphere_aabb
    from raytracers_tpu.vec import centre
    from raytracers_tpu.render.pallas_kernel import build_pallas_scene
    from raytracers_tpu.utils.timing import bench_salted

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    def salted(sph):
        def f(k):
            return (sph._replace(center=sph.center + jnp.float32(k) * 1e-30),)
        return f

    def bench(name, fn, sph, runs=5):
        jfn = jax.jit(lambda s: jax.tree.map(
            jnp.sum, jax.tree.leaves(fn(s))[0]))
        try:
            jax.device_get(jfn(sph))
            dt = bench_salted(jfn, salted(sph), warmup=1, runs=runs)
            print(f"  {name}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name} FAILED: {str(e)[:200]}", flush=True)

    for label, sph in [("rgbbox (400)", scenes.rgbbox().spheres),
                       ("1M soup", scenes.random_spheres(1_000_000, seed=0))]:
        print(label, flush=True)
        bench("morton codes", lambda s: morton_codes(centre(sphere_aabb(s))),
              sph)
        bench("morton+argsort", lambda s: jnp.argsort(
            morton_codes(centre(sphere_aabb(s))), stable=True), sph)

        def sort_gather(s):
            codes = morton_codes(centre(sphere_aabb(s)))
            perm = jnp.argsort(codes, stable=True).astype(jnp.int32)
            return (s.center[perm], s.radius[perm], s.color[perm],
                    codes[perm])
        bench("…+gathers", sort_gather, sph)

        def tree_only(s):
            _, _, _, sc = sort_gather(s)
            n_leaves = sc.shape[0] // 8
            return build_radix_tree(sc[::8][:n_leaves]).left
        bench("…+karras tree (leaf 8)", tree_only, sph)

        def full(s):
            return build_bvh(s, leaf_size=8).node_min
        bench("full build_bvh leaf=8", full, sph)
        bench("full build_bvh leaf=128",
              lambda s: build_bvh(s, leaf_size=128).node_min, sph)
        bench("build_pallas_scene", lambda s: build_pallas_scene(s).sphT,
              sph)


if __name__ == "__main__":
    main()
