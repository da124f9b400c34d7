"""Gradient correctness: autodiff vs central finite differences.

North-star requirement (BASELINE.json): pixel gradients w.r.t. sphere
center/radius/colour must match finite differences.  We test on a small
smooth configuration (no silhouette-grazing pixels in the loss support) in
f32, so tolerances are FD-noise-limited.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracers_tpu import camera, scenes
from raytracers_tpu.bvh.lbvh import build_bvh
from raytracers_tpu.bvh.traverse import closest_hit_bvh
from raytracers_tpu.geometry import Spheres
from raytracers_tpu.grad.diff_render import render_diff, trace_diff
from raytracers_tpu.render.bruteforce import make_closest_hit
from raytracers_tpu.render.tracer import render_colours


def _mini_scene():
    """Two spheres in front of the camera; one mirror bounce possible."""
    return Spheres(
        jnp.asarray([[0.0, 0.0, -5.0], [2.5, 0.0, -4.0]], jnp.float32),
        jnp.asarray([1.5, 1.0], jnp.float32),
        jnp.asarray([[0.8, 0.3, 0.2], [0.2, 0.6, 0.9]], jnp.float32))


def _loss_fn(mode="brute"):
    cam = camera((0., 0., 2.), (0., 0., -5.), (0., 1., 0.), 60.0, 1.0)

    def oracle_for(s):
        if mode == "bvh":
            return lambda o, d: closest_hit_bvh(build_bvh(s, leaf_size=1), o, d)
        return make_closest_hit(s, "precise")

    def loss(sph):
        img = render_diff(oracle_for, sph, cam, 24, 24, max_depth=5)
        # weighted sum keeps the loss sensitive to colour position shifts
        w = jnp.linspace(0.5, 1.5, 24 * 24 * 3).reshape(24, 24, 3)
        return jnp.sum(img * w)
    return loss


def _fd_grad(loss, x, eps):
    """Central finite differences on a flat array."""
    flat = np.asarray(x).reshape(-1).astype(np.float64)
    g = np.zeros_like(flat)
    for i in range(flat.size):
        up = flat.copy(); up[i] += eps
        dn = flat.copy(); dn[i] -= eps
        g[i] = (float(loss(jnp.asarray(up.reshape(x.shape), jnp.float32)))
                - float(loss(jnp.asarray(dn.reshape(x.shape), jnp.float32)))
                ) / (2 * eps)
    return g.reshape(x.shape)


# eps trades FD curvature/quantisation noise against silhouette crossings:
# a perturbation that moves a silhouette across a sampled pixel adds a jump
# FD sees but the (correct) autodiff gradient does not.
@pytest.mark.parametrize("field,eps,tol", [
    ("color", 1e-2, 2e-2),
    ("radius", 3e-3, 5e-2),
    ("center", 3e-3, 5e-2),
])
def test_grad_matches_fd(field, eps, tol):
    sph = _mini_scene()
    loss = _loss_fn()

    def loss_wrt(x):
        s = sph._replace(**{field: x})
        return loss(s)

    x = getattr(sph, field)
    auto = np.asarray(jax.grad(loss_wrt)(x))
    fd = _fd_grad(loss_wrt, x, eps)
    # normalise by gradient scale; FD in f32 is noisy
    scale = np.abs(fd).max() + 1e-6
    np.testing.assert_allclose(auto / scale, fd / scale, atol=tol)


def test_replay_forward_matches_plain_render():
    """Phase-2 replay must reproduce the plain forward renderer exactly."""
    sph = _mini_scene()
    cam = camera((0., 0., 2.), (0., 0., -5.), (0., 1., 0.), 60.0, 1.0)
    ch = make_closest_hit(sph, "precise")
    plain = render_colours(ch, sph, cam, 32, 32, max_depth=5)
    diff = render_diff(lambda s: make_closest_hit(s, "precise"), sph, cam,
                       32, 32, max_depth=5)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(diff),
                               rtol=1e-5, atol=1e-6)


def test_replay_matches_plain_render_rgbbox_bvh():
    sc = scenes.rgbbox()
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    bvh = build_bvh(sc.spheres, leaf_size=8)
    import functools
    ch = functools.partial(closest_hit_bvh, bvh)
    plain = render_colours(ch, sc.spheres, cam, 48, 48, max_depth=50)
    diff = render_diff(
        lambda s: functools.partial(closest_hit_bvh, build_bvh(s, 8)),
        sc.spheres, cam, 48, 48, max_depth=50)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(diff),
                               rtol=1e-5, atol=1e-6)


def test_grad_nonzero_and_finite():
    sph = _mini_scene()
    loss = _loss_fn()
    grads = jax.grad(lambda s: loss(s))(sph)
    for name, g in grads._asdict().items():
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert np.abs(g).sum() > 0, name
