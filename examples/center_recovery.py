#!/usr/bin/env python
"""Recover perturbed sphere CENTERS from a rendered image.

Path-replay gradients (examples/inverse_rendering.py) are blind to
silhouette motion; this demo uses the soft-visibility reparameterization
(grad/soft_render.py) whose annealed sigmoid silhouettes carry
d(pixel)/d(center) across the boundary.

    python examples/center_recovery.py [--steps 400] [--res 48]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax  # noqa: E402

# default to CPU (the soft renderer is plain XLA; probing jax.devices()
# here would initialize — and possibly fail on — a busy/odd accelerator
# plugin before the override could take effect); pass --tpu to opt in
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracers_tpu import camera  # noqa: E402
from raytracers_tpu.geometry import Spheres  # noqa: E402
from raytracers_tpu.grad.diff_render import render_diff  # noqa: E402
from raytracers_tpu.grad.soft_render import recover_soft  # noqa: E402
from raytracers_tpu.render.bruteforce import make_closest_hit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the attached accelerator (default: CPU)")
    args = ap.parse_args()

    true = Spheres(
        jnp.asarray([[0.0, 0.0, -5.0], [2.5, 0.0, -4.0]], jnp.float32),
        jnp.asarray([1.5, 1.0], jnp.float32),
        jnp.asarray([[0.8, 0.3, 0.2], [0.2, 0.6, 0.9]], jnp.float32))
    cam = camera((0., 0., 2.), (0., 0., -5.), (0., 1., 0.), 60.0, 1.0)
    target = np.asarray(render_diff(
        lambda s: make_closest_hit(s, "precise"), true, cam,
        args.res, args.res, max_depth=1))

    pert = true._replace(center=true.center + jnp.asarray(
        [[0.6, -0.4, 0.3], [-0.5, 0.45, 0.0]]))
    d0 = float(jnp.abs(pert.center - true.center).mean())
    print(f"initial mean |center error| = {d0:.4f}")

    fitted = recover_soft(
        target, cam, pert, steps=args.steps, lr=3e-2,
        callback=lambda i, l, s: (i % 100 == 0) and print(
            f"  step {i}: loss {l:.5f}"))
    d1 = float(jnp.abs(fitted.center - true.center).mean())
    print(f"final mean |center error|   = {d1:.4f}  "
          f"({d0 / max(d1, 1e-9):.1f}x reduction)")
    print("fitted centers:\n", np.asarray(fitted.center))


if __name__ == "__main__":
    main()
