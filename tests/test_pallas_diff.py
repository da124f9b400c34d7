"""Differentiable Pallas path (grad/pallas_diff.py), interpret mode.

The custom-VJP forward is the megakernel in record mode; the backward is
either the fused Pallas replay kernel (backward="pallas", the default)
or the XLA path replay (backward="xla").  Checks: forward values match
the oracle renderer, gradients match the established brute-force
differentiable path, the Pallas backward's pass-1 replay BIT-MATCHES
the forward image (it reruns the megakernel's exact arithmetic), and a
finite-difference probe confirms the VJP end to end.

Gradient comparisons across engines are depth-limited: f32 mirror
cascades are chaotic, so ulp-level recompute differences between the
XLA replay's formulas and the megakernel's grow to ~1e-2 relative by
depth 3 and ~100% by depth 6 (measured chaos floor: a 2e-7 center
perturbation scrambles the XLA gradient itself by that much).
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


def _loss_pallas(spheres, cam, depth=DEPTH, backward="pallas"):
    f = make_render_pallas_diff(W, H, max_depth=depth, interpret=True,
                                backward=backward)
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
    outcome; both sides' gradients are correct for their own record).
    backward="xla" so both sides recompute with the same sphere_hit_t
    formulas — the Pallas backward reruns the megakernel's arithmetic
    instead, which drifts ~1e-2 from the tracer's by depth 3 (chaos);
    its link to this chain is test_pallas_bwd_matches_xla_shallow."""
    spheres, cam = _setup()
    g_p = jax.grad(lambda s, c: _loss_pallas(s, c, depth=3,
                                             backward="xla"))(spheres, cam)
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
    f1 = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True,
                                 backward="xla")
    f4 = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True,
                                 backward="xla",
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
                                      backward="xla",
                                      bwd_chunks=4, sort_by_depth=False)
    f_sort = make_render_pallas_diff(W, H, max_depth=DEPTH, interpret=True,
                                     backward="xla",
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


def test_pallas_bwd_replay_bitexact():
    """The backward kernel's pass-1 forward replay must BIT-MATCH the
    megakernel's image at full depth 50: it reruns the megakernel's
    exact arithmetic (reciprocal-multiply roots, rsqrt, key-floored
    widened window) from the (rec, pay) record, so the cotangent sweep
    differentiates the true primal path, not an ulp-divergent cousin."""
    from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                     render_pallas_record)
    from raytracers_tpu.grad.pallas_replay_bwd import replay_bwd_pallas

    spheres, cam = _setup()
    tile = 256
    scene = build_pallas_scene(spheres)
    colours, _, rec_raw, pay = render_pallas_record(
        scene, cam, W, H, max_depth=50, tile=tile, interpret=True,
        with_pay=True)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin,
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([W, H, 1.0 / W, 1.0 / H], jnp.float32),
        jnp.zeros((4,), jnp.float32)]).astype(jnp.float32)
    nt = rec_raw.shape[0]
    gcot = jnp.zeros((nt, 16, tile), jnp.float32)
    _, _, fwdcol = replay_bwd_pallas(params, rec_raw, pay, gcot, tile=tile,
                                     max_depth=50, interpret=True,
                                     emit_fwd=True)
    R = W * H
    rep = np.asarray(fwdcol[:, 0:3, :].transpose(0, 2, 1)
                     .reshape(-1, 3)[:R].reshape(H, W, 3))
    np.testing.assert_array_equal(rep, np.asarray(colours))


def test_pallas_bwd_twophase_segmented():
    """Compacted two-segment record + backward (phase1_depth) must match
    the single-segment Pallas path: forward bit-identical (same per-ray
    arithmetic, survivors compacted by one stable sort), gradients equal
    up to f32 sum ordering (the 9-row cotangent carry at the depth-p cut
    is exact chain rule)."""
    spheres, cam = _setup()
    f1 = make_render_pallas_diff(W, H, max_depth=10, tile=256,
                                 interpret=True)
    f2 = make_render_pallas_diff(W, H, max_depth=10, tile=256,
                                 interpret=True, phase1_depth=3)
    f3 = make_render_pallas_diff(W, H, max_depth=10, tile=256,
                                 interpret=True, phase1_depth=3,
                                 block=(16, 16))
    i1 = np.asarray(f1(spheres, cam))
    np.testing.assert_array_equal(i1, np.asarray(f2(spheres, cam)))
    np.testing.assert_array_equal(i1, np.asarray(f3(spheres, cam)))

    def loss(f):
        def L(s, c):
            img = f(s, c)
            w = jnp.sin(jnp.arange(img.size,
                                   dtype=jnp.float32)).reshape(img.shape)
            return jnp.sum(img * w)
        return L

    g1 = jax.grad(loss(f1), argnums=(0, 1))(spheres, cam)
    for f in (f2, f3):
        gs = jax.grad(loss(f), argnums=(0, 1))(spheres, cam)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gs)):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() <= 1e-5 * (np.abs(a).max() + 1e-8)


def test_pallas_bwd_matches_xla_shallow():
    """Pallas and XLA backwards agree at shallow depth.  Depth 2 keeps
    chaos amplification of their ulp-level formula differences (the XLA
    replay divides where the kernel reciprocal-multiplies) under ~1e-3;
    beyond depth ~4 element-wise comparison is meaningless (chaos floor
    reaches 100% by depth 6 — see module docstring)."""
    spheres, cam = _setup()

    def lossf(f):
        def L(s, c):
            img = f(s, c)
            w = jnp.sin(jnp.arange(img.size,
                                   dtype=jnp.float32)).reshape(img.shape)
            return jnp.sum(img * w)
        return L

    f_x = make_render_pallas_diff(W, H, max_depth=2, interpret=True,
                                  backward="xla")
    f_p = make_render_pallas_diff(W, H, max_depth=2, interpret=True,
                                  backward="pallas")
    gx = jax.grad(lossf(f_x), argnums=(0, 1))(spheres, cam)
    gp = jax.grad(lossf(f_p), argnums=(0, 1))(spheres, cam)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / scale < 3e-3


def test_pallas_bwd_multiphase_schedule():
    """N-boundary record/replay (schedule) matches the single-segment
    path: forward bit-identical, gradients equal up to f32 ordering
    (the carry crosses each boundary by exact chain rule)."""
    spheres, cam = _setup()
    f1 = make_render_pallas_diff(W, H, max_depth=10, tile=256,
                                 interpret=True)
    f2 = make_render_pallas_diff(W, H, max_depth=10, tile=256,
                                 interpret=True, schedule=(2, 3),
                                 block=(16, 16))
    i1 = np.asarray(f1(spheres, cam))
    np.testing.assert_array_equal(i1, np.asarray(f2(spheres, cam)))

    def loss(f):
        def L(s, c):
            img = f(s, c)
            w = jnp.sin(jnp.arange(img.size,
                                   dtype=jnp.float32)).reshape(img.shape)
            return jnp.sum(img * w)
        return L

    g1 = jax.grad(loss(f1), argnums=(0, 1))(spheres, cam)
    g2 = jax.grad(loss(f2), argnums=(0, 1))(spheres, cam)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * (np.abs(a).max() + 1e-8)


def test_pallas_bwd_prefix_sort():
    """Prefix-bounded boundary sorts in the record/replay path: when the
    prefix covers all survivors the forward AND gradients are
    bit-identical; a deliberately too-small prefix still yields the same
    forward and gradients equal up to f32 accumulation order (unpacked
    survivors are traced in place — a pure summation-order change)."""
    spheres, cam = _setup()
    base = dict(max_depth=10, tile=256, block=(16, 16), schedule=(2, 3),
                interpret=True)
    f1 = make_render_pallas_diff(W, H, **base)
    f2 = make_render_pallas_diff(W, H, sort_prefix=(None, 0.5), **base)
    f3 = make_render_pallas_diff(W, H, sort_prefix=(0.25, 0.1), **base)
    i1 = np.asarray(f1(spheres, cam))
    np.testing.assert_array_equal(i1, np.asarray(f2(spheres, cam)))
    np.testing.assert_array_equal(i1, np.asarray(f3(spheres, cam)))

    def L(f):
        return lambda s, c: jnp.sum(f(s, c) ** 2)

    g1 = jax.grad(L(f1), argnums=0)(spheres, cam)
    g2 = jax.grad(L(f2), argnums=0)(spheres, cam)
    g3 = jax.grad(L(f3), argnums=0)(spheres, cam)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * (np.abs(a).max() + 1e-8)


def test_pallas_bwd_chunked_reduce_large_c():
    """C > 8 exercises the chunked in-kernel slot reduction (irreg-class
    scenes used to fall back to the XLA (Rp, C*128) one-hot segment-sum
    — 547 ms measured at 1000^2; the chunked reduction keeps the one-hot
    in VMEM at any C <= 128).  Chunked accumulation touches disjoint
    row ranges, so gradients must match the XLA engine to the same
    shallow-depth tolerance as the small-C test."""
    import numpy as np

    sph = scenes.random_spheres(1330, seed=5, extent=12.0)
    cam = camera((0.0, 2.0, 30.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                 75.0, 1.0)

    def lossf(f):
        def L(s, c):
            img = f(s, c)
            w = jnp.sin(jnp.arange(img.size,
                                   dtype=jnp.float32)).reshape(img.shape)
            return jnp.sum(img * w)
        return L

    f_x = make_render_pallas_diff(W, H, max_depth=2, interpret=True,
                                  backward="xla")
    f_p = make_render_pallas_diff(W, H, max_depth=2, interpret=True,
                                  backward="pallas")
    np.testing.assert_array_equal(np.asarray(f_x(sph, cam)),
                                  np.asarray(f_p(sph, cam)))
    gx = jax.grad(lossf(f_x), argnums=(0,))(sph, cam)
    gp = jax.grad(lossf(f_p), argnums=(0,))(sph, cam)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / scale < 3e-3


def test_cluster_width_64_gradients_bitexact():
    """The gradient engine at cluster_width=64 (irreg: C=157, the
    in-kernel slot reduction's C<=256 extension) returns BIT-identical
    loss and gradients to the width-128 engine: winner slots are
    encoded cluster*128+lane for any width, so record/replay arithmetic
    is unchanged and only the (pure repartitioning) sweep grouping
    differs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracers_tpu import camera, scenes
    from raytracers_tpu.grad.pallas_diff import make_render_pallas_diff

    sc = scenes.irreg()
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    f128 = make_render_pallas_diff(16, 16, max_depth=2, tile=256,
                                   interpret=True)
    f64 = make_render_pallas_diff(16, 16, max_depth=2, tile=256,
                                  interpret=True, cluster_width=64)

    def loss(f, s):
        img = f(s, cam)
        return jnp.sum(img * img)

    l1, g1 = jax.value_and_grad(lambda s: loss(f128, s))(sc.spheres)
    l2, g2 = jax.value_and_grad(lambda s: loss(f64, s))(sc.spheres)
    assert float(l1) == float(l2)
    assert any(float(jnp.abs(a).max()) > 0 for a in jax.tree.leaves(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
