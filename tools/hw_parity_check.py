#!/usr/bin/env python
"""Hardware-vs-interpreter parity check for the Pallas megakernel.

The CI suite runs the kernel only under the Pallas interpreter (CPU); this
script closes the loop on real hardware: compiled renders must reproduce
interpreter renders BIT-FOR-BIT (the kernel's arithmetic is deterministic
and identical in both).  Run ON TPU after kernel changes:

    python tools/hw_parity_check.py        # ~5 min of compiles

Exits nonzero on any mismatch.  (Comparing against the XLA brute oracle
compiled on TPU is NOT a valid parity check: XLA's TPU fusion/approx
choices shift the oracle itself by ulps, which moves ~20% of packed
pixels by one quantisation step — measured; the oracle agrees bit-exactly
only when both run with the same backend arithmetic, e.g. on CPU.)
"""
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from raytracers_tpu import camera, scenes  # noqa: E402
import raytracers_tpu.render.pallas_kernel as pk  # noqa: E402


def main():
    if jax.devices()[0].platform != "tpu":
        print("no TPU attached; nothing to check", file=sys.stderr)
        return 0
    failures = 0
    # (scene, depth, front-to-back sort): the sorted layout is the
    # api.prepare_scene default for 16 < C <= 128 (irreg)
    for name, depth, f2b in [("rgbbox", 1, False), ("rgbbox", 50, False),
                             ("irreg", 50, False), ("irreg", 50, True)]:
        sc = scenes.by_name(name)
        origin = sc.look_from if f2b else None
        ps = jax.block_until_ready(jax.jit(
            lambda s, o=origin: pk.build_pallas_scene(s, sort_origin=o))(
                sc.spheres))
        name = name + ("+f2b" if f2b else "")
        cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)

        for label, kw in [("single", dict(block=(32, 16), tile=512))]:
            fn = jax.jit(lambda ps, cam, kw=kw, depth=depth:
                         pk.render_pallas(ps, cam, 64, 64,
                                          max_depth=depth, **kw))
            hw = np.asarray(jax.device_get(fn(ps, cam)))
            it = np.asarray(pk.render_pallas(ps, cam, 64, 64,
                                             max_depth=depth,
                                             interpret=True, **kw))
            bad = (hw != it).mean()
            status = "OK" if bad == 0 else "MISMATCH"
            print(f"{name} d{depth} {label}: {status} ({bad:.4%})",
                  flush=True)
            failures += bad > 0
        if depth == 50:
            hw2 = np.asarray(jax.device_get(jax.jit(
                lambda ps, cam, depth=depth: pk.render_pallas_twophase(
                    ps, cam, 64, 64, max_depth=depth, phase1_depth=6,
                    block=(32, 16), tile=512))(ps, cam)))
            it2 = np.asarray(pk.render_pallas_twophase(
                ps, cam, 64, 64, max_depth=depth, phase1_depth=6,
                block=(32, 16), tile=512, interpret=True))
            bad = (hw2 != it2).mean()
            print(f"{name} d{depth} twophase: "
                  f"{'OK' if bad == 0 else 'MISMATCH'} ({bad:.4%})",
                  flush=True)
            failures += bad > 0

    # HBM-streamed dynamic sweep (C > 1024: double-buffered sphere DMA)
    soup = scenes.random_spheres(200_000, seed=3)
    ps = jax.block_until_ready(jax.jit(pk.build_pallas_scene)(soup))
    kw = dict(block=(16, 16), tile=256, max_depth=5)
    hw = np.asarray(jax.device_get(jax.jit(
        lambda ps, cam: pk.render_pallas(ps, cam, 48, 48, **kw))(
            ps, camera((0., 0., 3.), (0., 0., -1.), (0., 1., 0.),
                       75.0, 1.0))))
    it = np.asarray(pk.render_pallas(
        ps, camera((0., 0., 3.), (0., 0., -1.), (0., 1., 0.), 75.0, 1.0),
        48, 48, interpret=True, **kw))
    bad = (hw != it).mean()
    print(f"soup-200k d5 hbm-stream: {'OK' if bad == 0 else 'MISMATCH'} "
          f"({bad:.4%})", flush=True)
    failures += bad > 0
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
