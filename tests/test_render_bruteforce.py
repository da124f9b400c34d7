"""End-to-end brute-force renderer tests (BASELINE.json configs[0] scale)."""
import numpy as np
import jax.numpy as jnp

from raytracers_tpu import camera, scenes
from raytracers_tpu.image import pixel_to_rgb
from raytracers_tpu.render.bruteforce import make_closest_hit
from raytracers_tpu.render.tracer import render_colours, render_packed


def _render(scene, w, h, formulation="precise", **kw):
    cam = camera(scene.look_from, scene.look_at, (0., 1., 0.), scene.fov, w / h)
    ch = make_closest_hit(scene.spheres, formulation)
    return render_packed(ch, scene.spheres, cam, w, h, **kw)


def test_rgbbox_structure():
    sc = scenes.rgbbox()
    img = np.asarray(_render(sc, 64, 64))
    rgb = pixel_to_rgb(img).astype(np.int32)
    # Left third dominated by red wall, right third by blue wall.
    left = rgb[:, :12].reshape(-1, 3).mean(0)
    right = rgb[:, -12:].reshape(-1, 3).mean(0)
    assert left[0] > left[2] + 40, left
    assert right[2] > right[0] + 40, right
    # Top-centre: yellow midwall (r≈g, both > b).
    top = rgb[4:16, 24:40].reshape(-1, 3).mean(0)
    assert top[0] > top[2] and top[1] > top[2], top


def test_irreg_structure():
    sc = scenes.irreg()
    img = np.asarray(_render(sc, 64, 64, chunk=1024))
    rgb = pixel_to_rgb(img).astype(np.int32)
    # Upper rows are pure sky (no spheres above the camera target line).
    sky = rgb[0].reshape(-1, 3)
    assert (sky[:, 2] >= sky[:, 0]).all()
    # Lower half contains bright white-ish sphere pixels.
    assert rgb[40:].max() > 200


def test_matmul_matches_precise():
    sc = scenes.rgbbox()
    a = np.asarray(_render(sc, 64, 64, "precise"))
    b = np.asarray(_render(sc, 64, 64, "matmul"))
    # identical up to a few boundary pixels where f32 expansion error flips
    # a hit decision
    frac_diff = (a != b).mean()
    assert frac_diff < 0.01, frac_diff


def test_chunked_matches_unchunked():
    sc = scenes.rgbbox()
    a = np.asarray(_render(sc, 32, 32))
    b = np.asarray(_render(sc, 32, 32, chunk=100))
    np.testing.assert_array_equal(a, b)


def test_max_depth_one_bounce():
    # config[0]: 1 reflection bounce must still produce a valid image
    sc = scenes.rgbbox()
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    ch = make_closest_hit(sc.spheres)
    col = render_colours(ch, sc.spheres, cam, 32, 32, max_depth=2)
    assert np.isfinite(np.asarray(col)).all()
    assert (np.asarray(col) >= 0).all() and (np.asarray(col) <= 1.0 + 1e-5).all()
