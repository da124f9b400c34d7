#!/usr/bin/env python
"""Multi-device scaling measurement (BASELINE.json: ≥85% efficiency target).

Renders with rays sharded over meshes of 1, 2, 4, … devices and reports
throughput + scaling efficiency.  On a real pod slice this measures ICI
scaling; on the CPU host platform (default fallback) it validates the
sharded code path and emits the same metric format.

    python tools/measure_scaling.py [--res 256] [--scene rgbbox]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " " + _flag).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="rgbbox")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu or jax.devices()[0].platform != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from raytracers_tpu import scenes
    from raytracers_tpu.parallel.distributed import scaling_efficiency
    from raytracers_tpu.parallel.mesh import ray_mesh, render_sharded
    from raytracers_tpu.render.api import prepare_scene
    from raytracers_tpu.utils.timing import bench_salted

    devices = jax.devices()
    sc = scenes.by_name(args.scene)
    H = W = args.res
    prep = jax.block_until_ready(
        jax.jit(lambda s: prepare_scene(s, H, W, leaf_size=8))(sc))

    results = {}
    n = 1
    while n <= len(devices):
        mesh = ray_mesh(devices[:n])
        fn = jax.jit(lambda p, n=n, mesh=mesh: jnp.sum(
            render_sharded(p, H, W, mesh=mesh, mode="bvh")))

        def salted(k):
            cam = prep.cam._replace(
                origin=prep.cam.origin + jnp.float32(k) * 1e-30)
            return (prep._replace(cam=cam),)

        jax.device_get(fn(*salted(-1)))
        dt = bench_salted(fn, salted, warmup=1, runs=args.runs)
        rays = H * W / dt
        eff = (scaling_efficiency(results[1]["rays_per_s"], rays, n)
               if 1 in results else 1.0)
        results[n] = {"devices": n, "ms": dt * 1e3, "rays_per_s": rays,
                      "efficiency": eff}
        print(f"n={n}: {dt*1e3:8.2f} ms  {rays/1e6:8.2f} Mrays/s  "
              f"eff={eff:.2f}")
        n *= 2

    print(json.dumps({str(k): v for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
