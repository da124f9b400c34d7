"""Full-image BVH-accelerated rendering vs brute force and goldens."""
import os

import numpy as np
import pytest

from raytracers_tpu import scenes
from raytracers_tpu.image import pixel_to_rgb, read_ppm
from raytracers_tpu.render.api import prepare_scene, render

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _structural_match(img, ref, max_mismatch, max_mean_delta):
    a = pixel_to_rgb(img).astype(np.int32)
    b = pixel_to_rgb(ref).astype(np.int32)
    assert (img != ref).mean() <= max_mismatch
    assert np.abs(a - b).mean() <= max_mean_delta


@pytest.mark.parametrize("leaf_size", [1, 8])
def test_bvh_render_matches_bruteforce_rgbbox(leaf_size):
    sc = scenes.rgbbox()
    prep = prepare_scene(sc, 96, 96, leaf_size=leaf_size)
    bvh_img = np.asarray(render(prep, 96, 96, mode="bvh"))
    brute_img = np.asarray(render(prep, 96, 96, mode="brute"))
    # identical modulo compile-level f32 jitter on grazing rays
    _structural_match(bvh_img, brute_img, max_mismatch=0.12,
                      max_mean_delta=5.0)


def test_bvh_render_matches_bruteforce_irreg():
    sc = scenes.irreg()
    prep = prepare_scene(sc, 64, 64, leaf_size=8)
    bvh_img = np.asarray(render(prep, 64, 64, mode="bvh", chunk=1024))
    brute_img = np.asarray(render(prep, 64, 64, mode="brute", chunk=1024))
    _structural_match(bvh_img, brute_img, max_mismatch=0.02,
                      max_mean_delta=0.5)


def test_bvh_render_depth1_golden_exact():
    sc = scenes.rgbbox()
    prep = prepare_scene(sc, 200, 200, leaf_size=8)
    img = np.asarray(render(prep, 200, 200, mode="bvh", max_depth=1,
                            chunk=8000))
    path = os.path.join(GOLDEN, "rgbbox_200_d1.ppm")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    np.testing.assert_array_equal(img, read_ppm(path))


def test_bvh_render_irreg_golden():
    sc = scenes.irreg()
    prep = prepare_scene(sc, 200, 200, leaf_size=8)
    img = np.asarray(render(prep, 200, 200, mode="bvh", chunk=8000))
    path = os.path.join(GOLDEN, "irreg_200.ppm")
    if not os.path.exists(path):
        pytest.skip("golden missing")
    _structural_match(img, read_ppm(path), max_mismatch=0.02,
                      max_mean_delta=0.5)
