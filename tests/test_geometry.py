"""L1 unit tests: intersection and camera semantics vs scalar ground truth.

Scalar expectations are hand-derived from the reference equations
(futhark/ray.fut:32-70,93-114); see each test's comment.
"""
import math

import numpy as np
import jax.numpy as jnp

from raytracers_tpu.geometry import (Camera, Spheres, aabb_hit, camera,
                                     get_ray, reflect, sky_colour,
                                     sphere_aabb, sphere_hit_t)
from raytracers_tpu.vec import Aabb, vec3


def _s(center, radius=1.0, color=(1, 1, 1)):
    return Spheres(jnp.asarray([center], jnp.float32),
                   jnp.asarray([radius], jnp.float32),
                   jnp.asarray([color], jnp.float32))


def test_sphere_hit_head_on():
    # Ray from origin along +z at unit sphere centered (0,0,5): near root t=4.
    t = sphere_hit_t(vec3(0., 0., 0.), vec3(0., 0., 1.),
                     vec3(0., 0., 5.), jnp.float32(1.0), 0.0, 1e9)
    np.testing.assert_allclose(t, 4.0, rtol=1e-6)


def test_sphere_hit_far_root_from_inside():
    # Origin inside the sphere: near root negative, far root returned.
    t = sphere_hit_t(vec3(0., 0., 5.), vec3(0., 0., 1.),
                     vec3(0., 0., 5.), jnp.float32(1.0), 0.0, 1e9)
    np.testing.assert_allclose(t, 1.0, rtol=1e-6)


def test_sphere_hit_miss():
    t = sphere_hit_t(vec3(0., 0., 0.), vec3(0., 1., 0.),
                     vec3(0., 0., 5.), jnp.float32(1.0), 0.0, 1e9)
    assert np.isinf(t)


def test_sphere_hit_open_interval():
    # t_max equal to the root must *reject* (strict <, ray.fut:39).
    t = sphere_hit_t(vec3(0., 0., 0.), vec3(0., 0., 1.),
                     vec3(0., 0., 5.), jnp.float32(1.0), 0.0, 4.0)
    # near root rejected (not < 4.0) -> far root 6.0 also rejected -> miss
    assert np.isinf(t)
    # window excluding near root but containing far root picks the far root
    t = sphere_hit_t(vec3(0., 0., 0.), vec3(0., 0., 1.),
                     vec3(0., 0., 5.), jnp.float32(1.0), 4.5, 1e9)
    np.testing.assert_allclose(t, 6.0, rtol=1e-6)


def test_sphere_hit_unnormalised_dir():
    # Direction scaling rescales t (the reference never normalises).
    t = sphere_hit_t(vec3(0., 0., 0.), vec3(0., 0., 2.),
                     vec3(0., 0., 5.), jnp.float32(1.0), 0.0, 1e9)
    np.testing.assert_allclose(t, 2.0, rtol=1e-6)


def test_sphere_aabb():
    box = sphere_aabb(_s((1., 2., 3.), radius=0.5))
    np.testing.assert_allclose(box.min[0], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(box.max[0], [1.5, 2.5, 3.5])


def test_aabb_hit_basic():
    box = Aabb(vec3(-1., -1., 4.), vec3(1., 1., 6.))
    hit = aabb_hit(box, vec3(0., 0., 0.), vec3(0., 0., 1.), 0.0, 1e9)
    assert bool(hit)
    miss = aabb_hit(box, vec3(0., 0., 0.), vec3(0., 1., 0.), 0.0, 1e9)
    assert not bool(miss)
    behind = aabb_hit(box, vec3(0., 0., 0.), vec3(0., 0., -1.), 0.0, 1e9)
    assert not bool(behind)


def test_aabb_hit_window():
    box = Aabb(vec3(-1., -1., 4.), vec3(1., 1., 6.))
    # box spans t in [4, 6]; window [0, 3] misses it
    assert not bool(aabb_hit(box, vec3(0., 0., 0.), vec3(0., 0., 1.), 0.0, 3.0))
    assert bool(aabb_hit(box, vec3(0., 0., 0.), vec3(0., 0., 1.), 0.0, 5.0))


def test_aabb_hit_axis_parallel_on_slab():
    # Ray parallel to x inside the slab: 1/0 = inf arithmetic must not
    # produce a false miss (IEEE semantics identical to the reference).
    box = Aabb(vec3(-1., -1., 4.), vec3(1., 1., 6.))
    assert bool(aabb_hit(box, vec3(0., 0., 0.), vec3(0., 0., 1.), 0.0, 1e9))


def test_camera_reference_values():
    # camera((0,30,30),(0,-1,-1),(0,1,0),75,1): manual evaluation of
    # futhark/ray.fut:93-107.
    cam = camera((0., 30., 30.), (0., -1., -1.), (0., 1., 0.), 75.0, 1.0)
    theta = 75.0 * math.pi / 180.0
    half_h = math.tan(theta / 2)
    w = np.array([0., 31., 31.]); w = w / np.linalg.norm(w)
    u = np.cross([0., 1., 0.], w); u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    llc = np.array([0., 30., 30.]) - half_h * u - half_h * v - w
    np.testing.assert_allclose(cam.origin, [0., 30., 30.], atol=1e-5)
    np.testing.assert_allclose(cam.llc, llc, atol=1e-5)
    np.testing.assert_allclose(cam.horizontal, 2 * half_h * u, atol=1e-5)
    np.testing.assert_allclose(cam.vertical, 2 * half_h * v, atol=1e-5)


def test_get_ray_corners():
    cam = camera((0., 0., 0.), (0., 0., -1.), (0., 1., 0.), 90.0, 2.0)
    o, d = get_ray(cam, jnp.float32(0.5), jnp.float32(0.5))
    np.testing.assert_allclose(o, [0., 0., 0.], atol=1e-6)
    # centre of film looks straight down -z
    np.testing.assert_allclose(d, [0., 0., -1.], atol=1e-5)


def test_reflect():
    r = reflect(vec3(1., -1., 0.), vec3(0., 1., 0.))
    np.testing.assert_allclose(r, [1., 1., 0.], atol=1e-6)


def test_sky_colour_endpoints():
    # Straight up: t=1 -> (0.5,0.7,1); straight down: t=0 -> white.
    np.testing.assert_allclose(sky_colour(vec3(0., 1., 0.)), [0.5, 0.7, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(sky_colour(vec3(0., -1., 0.)), [1., 1., 1.],
                               atol=1e-6)
