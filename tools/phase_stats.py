#!/usr/bin/env python
"""Exact per-phase executed-work breakdown for the production render
configs (VERDICT r3 item 2: "nobody knows where irreg's time goes").

Uses the instrumented megakernel variant (emit_stats) to count the
sphere-rows actually tested per lane per phase, converts them to
model-implied ms at the microbenched VPU issue ceiling, and compares
against the measured wall/device time of the PRODUCTION kernel.

Run ON TPU:  python tools/phase_stats.py [scene ...]
"""
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu import scenes
from raytracers_tpu.render.api import (pallas_config, prepare_scene, render,
                                       render_stats)
from raytracers_tpu.utils.profiling import (CULL_OPS_PER_ROW, OPS_PER_SLOT,
                                            vpu_ceiling_lane_ops)
from raytracers_tpu.utils.timing import bench_salted

W = H = 1000


def main():
    names = sys.argv[1:] or ["rgbbox", "irreg", "plane"]
    mb = json.load(open("docs/MICROBENCH.json"))
    lane_rate = vpu_ceiling_lane_ops(mb)
    print(f"devices: {jax.devices()}  ceiling {lane_rate/1e12:.2f}e12 "
          f"lane-ops/s", flush=True)
    for name in names:
        sc = scenes.by_name(name)
        prep = jax.block_until_ready(jax.jit(lambda s: prepare_scene(
            s, H, W, with_pallas=True, with_bvh=False))(sc))
        C = prep.pallas.n_clusters
        tile, block, sched, pref = pallas_config(C)
        CR = prep.pallas.aabbT.shape[1]
        CB = prep.pallas.aabbT.shape[0]

        # production render timing
        rfn = jax.jit(lambda p: jnp.sum(render(p, H, W, mode="pallas")))
        jax.device_get(rfn(prep))

        def salted(k, prep=prep):
            cam = prep.cam._replace(
                origin=prep.cam.origin + jnp.float32(k) * 1e-30)
            return (prep._replace(cam=cam),)
        dt = bench_salted(rfn, salted, warmup=1, runs=6)

        # instrumented counters (untimed)
        stats = jax.jit(lambda p: render_stats(p, H, W))(prep)
        # single-phase configs (shallow max_depth or a schedule covering
        # it) return no per-phase keys — fall back to one pseudo-phase
        ps = [float(x) for x in stats.get("phase_slot_tests",
                                          [stats["slot_tests"]])]
        pb = [float(x) for x in stats.get("phase_ray_bounces",
                                          [stats["ray_bounces"]])]
        slot = float(stats["slot_tests"])
        rb = float(stats["ray_bounces"])
        tb = rb / tile                              # tile-bounces
        visit_ms = slot * OPS_PER_SLOT / lane_rate * 1e3
        if "cull_rows" in stats:
            # EXACT executed cull rows (round-5 counter: super-gated
            # blocks that skip their (CR, T) slab no longer count)
            cull_lane_ops = float(stats["cull_rows"]) * CULL_OPS_PER_ROW
        else:
            # upper-bound model: every block culled every tile-bounce
            cull_lane_ops = tb * CB * CR * tile * CULL_OPS_PER_ROW
        cull_ms = cull_lane_ops / lane_rate * 1e3
        print(f"\n{name}: C={C} CR={CR} CB={CB} tile={tile} block={block} "
              f"schedule={sched} prefix={pref}")
        print(f"  measured render: {dt*1e3:.2f} ms")
        print(f"  ray-bounces {rb/1e6:.2f}e6 (tile-bounces {tb:.0f}), "
              f"slot-tests {slot/1e9:.3f}e9 "
              f"({slot/max(rb,1):.0f} per ray-bounce)")
        for k, (s, b) in enumerate(zip(ps, pb)):
            vis_per_tb = s / tile / max(b / tile, 1e-9) / 128
            print(f"    phase {k}: ray-bounces {b/1e6:.3f}e6, slots "
                  f"{s/1e9:.3f}e9 ({s/max(b,1):.0f}/ray-bounce, "
                  f"~{vis_per_tb:.2f} 128-row visits/tile-bounce), "
                  f"model {s*OPS_PER_SLOT/lane_rate*1e3:.1f} ms")
        print(f"  model: visits {visit_ms:.1f} ms + cull {cull_ms:.1f} ms "
              f"= {visit_ms+cull_ms:.1f} ms "
              f"(residual {dt*1e3-visit_ms-cull_ms:+.1f} ms = boundary "
              f"sorts + gates + shading + dispatch)")


if __name__ == "__main__":
    main()
