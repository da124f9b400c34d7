#!/usr/bin/env python
"""Inverse rendering demo (BASELINE.json configs[4]).

Renders a small ground-truth scene, perturbs sphere radii/colours, and
recovers them by sharded pixel-gradient descent.  Run:

    python examples/inverse_rendering.py [--steps 120] [--res 32]

Works on CPU (forced 8-device virtual mesh) or TPU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " " + _flag).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from raytracers_tpu import camera
    from raytracers_tpu.geometry import Spheres
    from raytracers_tpu.grad.diff_render import render_diff
    from raytracers_tpu.grad.inverse import recover
    from raytracers_tpu.parallel.mesh import ray_mesh
    from raytracers_tpu.render.bruteforce import make_closest_hit

    truth = Spheres(
        jnp.asarray([[0.0, 0.0, -5.0], [2.5, 0.0, -4.0],
                     [-2.2, 0.8, -6.0]], jnp.float32),
        jnp.asarray([1.5, 1.0, 0.9], jnp.float32),
        jnp.asarray([[0.8, 0.3, 0.2], [0.2, 0.6, 0.9],
                     [0.9, 0.8, 0.2]], jnp.float32))
    cam = camera((0., 0., 2.), (0., 0., -5.), (0., 1., 0.), 60.0, 1.0)
    target = render_diff(lambda s: make_closest_hit(s, "precise"), truth,
                         cam, args.res, args.res, max_depth=4)

    rng = np.random.default_rng(0)
    start = truth._replace(
        radius=truth.radius * jnp.asarray(rng.uniform(0.85, 1.2, 3),
                                          jnp.float32),
        color=jnp.clip(truth.color + jnp.asarray(
            rng.uniform(-0.2, 0.2, (3, 3)), jnp.float32), 0, 1))

    mesh = ray_mesh()
    print(f"mesh: {mesh.devices.size} devices; optimizing radius+color "
          f"({args.steps} steps)")
    trainable = truth._replace(center=jnp.zeros_like(truth.center),
                               radius=jnp.ones_like(truth.radius),
                               color=jnp.ones_like(truth.color))

    losses = []
    fitted, final = recover(
        np.asarray(target), cam, start, mesh, steps=args.steps, lr=args.lr,
        max_depth=4, trainable=trainable,
        callback=lambda i, l, s: losses.append(l))
    print(f"loss: {losses[0]:.4f} -> {final:.4f}")
    print("radius err:", np.abs(np.asarray(fitted.radius - truth.radius)))
    print("colour err:", np.abs(np.asarray(fitted.color
                                           - truth.color)).max(axis=1))


if __name__ == "__main__":
    main()
