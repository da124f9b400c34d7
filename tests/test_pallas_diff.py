"""Differentiable Pallas path (grad/pallas_diff.py), interpret mode.

The custom-VJP forward is the megakernel in record mode; the backward is
the XLA path replay.  Checks: forward values match the oracle renderer,
gradients match the established brute-force differentiable path, and a
finite-difference probe confirms the VJP end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracers_tpu import camera, scenes
from raytracers_tpu.grad.diff_render import trace_diff
from raytracers_tpu.grad.pallas_diff import make_render_pallas_diff
from raytracers_tpu.render.bruteforce import make_closest_hit
from raytracers_tpu.render.tracer import primary_rays

W = H = 24
DEPTH = 4


def _setup():
    sc = scenes.rgbbox()
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, W / H)
    return sc.spheres, cam


def _loss_pallas(spheres, cam, depth=DEPTH):
    f = make_render_pallas_diff(W, H, max_depth=depth, interpret=True)
    img = f(spheres, cam)
    return jnp.sum(img * jnp.sin(jnp.arange(img.size).reshape(img.shape)))


def _loss_brute(spheres, cam, depth=DEPTH):
    o, d = primary_rays(cam, W, H)
    col = trace_diff(make_closest_hit(spheres, "precise"), spheres, o, d,
                     max_depth=depth)
    img = col.reshape(H, W, 3)
    return jnp.sum(img * jnp.sin(jnp.arange(img.size).reshape(img.shape)))


def test_forward_matches_oracle():
    spheres, cam = _setup()
    f = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True)
    img = np.asarray(f(spheres, cam))
    o, d = primary_rays(cam, W, H)
    ref = np.asarray(trace_diff(make_closest_hit(spheres, "precise"),
                                spheres, o, d, DEPTH)).reshape(H, W, 3)
    # the packed-key argmin may flip the winner on near-exact t ties
    # (<= 2^-16 relative — touching-sphere silhouettes); measured 3/576
    # pixels here.  Everything else matches to float noise.
    err = np.abs(img - ref).max(-1)
    assert (err > 1e-4).mean() < 0.06, (err > 1e-4).mean()
    assert np.median(err) < 2e-6
    assert err.mean() < 2e-4


def test_grad_matches_brute_path():
    """At depth 3 the discrete path records agree ray-for-ray (at depth 4
    a handful of rays diverge after three chaotic mirror bounces — ulp
    differences between kernel and tracer arithmetic flip their last-step
    outcome; both sides' gradients are correct for their own record)."""
    spheres, cam = _setup()
    g_p = jax.grad(lambda s, c: _loss_pallas(s, c, depth=3))(spheres, cam)
    g_b = jax.grad(lambda s, c: _loss_brute(s, c, depth=3))(spheres, cam)
    for a, b, name in [(g_p.center, g_b.center, "center"),
                       (g_p.radius, g_b.radius, "radius"),
                       (g_p.color, g_b.color, "color")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3, err_msg=name)


def test_grad_finite_difference():
    """Central FD on a smooth 2-sphere configuration (same methodology as
    test_grad.py: no silhouette-grazing pixels in the loss support, so FD
    sees the same continuous landscape as the path-replay gradient)."""
    from raytracers_tpu.geometry import Spheres
    spheres = Spheres(
        jnp.asarray([[0.0, 0.0, -5.0], [2.5, 0.0, -4.0]], jnp.float32),
        jnp.asarray([1.5, 1.0], jnp.float32),
        jnp.asarray([[0.8, 0.3, 0.2], [0.2, 0.6, 0.9]], jnp.float32))
    cam = camera((0., 0., 2.), (0., 0., -5.), (0., 1., 0.), 60.0, 1.0)
    f = make_render_pallas_diff(W, H, max_depth=5, interpret=True)
    w = jnp.linspace(0.5, 1.5, W * H * 3).reshape(H, W, 3)

    def loss(radius):
        return jnp.sum(f(spheres._replace(radius=radius), cam) * w)

    g = jax.grad(loss)(spheres.radius)
    eps = 3e-3
    for i in range(2):
        up = spheres.radius.at[i].add(eps)
        dn = spheres.radius.at[i].add(-eps)
        fd = float((loss(up) - loss(dn)) / (2 * eps))
        an = float(g[i])
        assert abs(fd - an) < 0.03 * (abs(fd) + abs(an)) + 1e-2, (i, fd, an)


def test_grad_chunked_bwd_matches():
    spheres, cam = _setup()
    f1 = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True)
    f4 = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True,
                                 bwd_chunks=4, sort_by_depth=False)
    g1 = jax.grad(lambda s: jnp.sum(f1(s, cam) ** 2))(spheres)
    g4 = jax.grad(lambda s: jnp.sum(f4(s, cam) ** 2))(spheres)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_grad_sorted_bwd_matches_unsorted():
    """Depth-sorted, dead-step-skipping backward replay must reproduce
    the plain chunked replay (identical up to f32 ray-sum ordering)."""
    spheres, cam = _setup()
    f_plain = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True,
                                      bwd_chunks=4, sort_by_depth=False)
    f_sort = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True,
                                     bwd_chunks=4, sort_by_depth=True)

    def loss(f, s, c):
        return jnp.sum(f(s, c) ** 2)

    gs1, gc1 = jax.grad(lambda s, c: loss(f_plain, s, c),
                        argnums=(0, 1))(spheres, cam)
    gs2, gc2 = jax.grad(lambda s, c: loss(f_sort, s, c),
                        argnums=(0, 1))(spheres, cam)
    # the permutation changes f32 ray-sum accumulation order, so the
    # comparison is tolerance-based (observed drift ~1e-4 abs / <1% rel
    # on near-cancelling elements), not exact
    for a, b in zip(jax.tree.leaves((gs1, gc1)), jax.tree.leaves((gs2, gc2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=3e-4)
