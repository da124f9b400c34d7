#!/usr/bin/env python
"""Regenerate golden images under tests/golden/ from the native CPU renderer.

Run from the repo root after `make -C native`:
    python tools/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # goldens never need the TPU

import numpy as np  # noqa: E402

from raytracers_tpu import native, scenes  # noqa: E402
from raytracers_tpu.image import write_ppm  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "golden")

SPECS = [
    # (filename, scene, w, h, max_depth)
    ("rgbbox_200_d1.ppm", "rgbbox", 200, 200, 1),
    ("rgbbox_200_d2.ppm", "rgbbox", 200, 200, 2),
    ("rgbbox_200_d4.ppm", "rgbbox", 200, 200, 4),
    ("rgbbox_200_d8.ppm", "rgbbox", 200, 200, 8),
    ("rgbbox_200.ppm", "rgbbox", 200, 200, 50),
    ("irreg_200.ppm", "irreg", 200, 200, 50),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for fname, scene_name, w, h, depth in SPECS:
        sc = scenes.by_name(scene_name)
        img = native.render(sc.spheres, sc.look_from, sc.look_at, sc.fov,
                            w, h, max_depth=depth)
        path = os.path.join(OUT, fname)
        write_ppm(path, img)
        print(f"wrote {path} ({np.asarray(img).shape})")


if __name__ == "__main__":
    main()
