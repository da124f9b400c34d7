#!/usr/bin/env python
"""Gradients through the Pallas megakernel (the north-star fwd+bwd path).

Forward: the megakernel renders in record mode (full speed).
Backward: the recorded paths replay differentiably; jax.grad returns
d(loss)/d(center, radius, colour) for every sphere, and d/d(camera).

    python examples/pallas_gradients.py [--res 64] [--depth 8]
(On CPU the kernel runs in interpret mode; on TPU it compiles.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax  # noqa: E402

from raytracers_tpu.utils.platform import probe_tpu  # noqa: E402

ON_TPU = probe_tpu()
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracers_tpu import camera, scenes  # noqa: E402
from raytracers_tpu.grad.pallas_diff import make_render_pallas_diff  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    sc = scenes.rgbbox()
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    f = make_render_pallas_diff(args.res, args.res, max_depth=args.depth,
                                interpret=not ON_TPU)

    def loss(spheres, cam):
        img = f(spheres, cam)
        return jnp.mean(img ** 2)

    (value, (g_sph, g_cam)) = jax.value_and_grad(loss, argnums=(0, 1))(
        sc.spheres, cam)
    print(f"loss = {float(value):.6f}")
    for name in ("center", "radius", "color"):
        g = np.asarray(getattr(g_sph, name))
        print(f"d loss / d {name}: shape {g.shape}, "
              f"|g| mean {np.abs(g).mean():.3e}, max {np.abs(g).max():.3e}")
    print(f"d loss / d camera.origin = {np.asarray(g_cam.origin)}")


if __name__ == "__main__":
    main()
