"""Validation against the reference's own published renders.

The reference repo ships golden images (``/root/reference/rgbbox.png`` and
``irreg.png``, embedded at README.md:21,25, both 500x500).  These are the one
piece of external ground truth available, so we compare full-depth renders
pixel-for-pixel against them.  Exactness policy mirrors test_golden.py: f32
mirror-cascade chaos makes deep-bounce pixels implementation-sensitive (the
reference's own 8 implementations disagree with each other — SURVEY.md §2.3),
so we assert a high exact-match fraction plus a tight mean error, not
bit-identity.

Measured on this implementation: rgbbox 88.8% exact / mean |d| 2.24 of 255;
irreg 99.3% exact / mean |d| 0.01.  Thresholds leave modest headroom.
"""
import os

import numpy as np
import pytest

from raytracers_tpu import scenes
from raytracers_tpu.image import pixel_to_rgb
from raytracers_tpu.render.api import prepare_scene, render

REF_DIR = "/root/reference"


def _load_reference_png(name):
    PIL = pytest.importorskip("PIL.Image")
    path = os.path.join(REF_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"reference image {path} not available")
    return np.asarray(PIL.open(path).convert("RGB")).astype(np.int32)


@pytest.mark.parametrize("name,exact_frac,mean_tol", [
    ("rgbbox", 0.85, 3.0),
    ("irreg", 0.97, 0.1),
])
def test_full_depth_render_matches_published_image(name, exact_frac,
                                                   mean_tol):
    ref = _load_reference_png(name)
    h, w = ref.shape[:2]
    sc = scenes.by_name(name)
    prep = prepare_scene(sc, h, w, leaf_size=8)
    img = np.asarray(render(prep, h, w, mode="bvh", max_depth=50,
                            chunk=h * w // 8))
    ours = pixel_to_rgb(img).astype(np.int32)
    exact = (ref == ours).all(-1).mean()
    mean_d = np.abs(ref - ours).mean()
    assert exact > exact_frac, (name, exact, mean_d)
    assert mean_d < mean_tol, (name, exact, mean_d)
