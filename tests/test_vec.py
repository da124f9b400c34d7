"""L0 unit tests: vector/AABB primitives vs numpy ground truth."""
import numpy as np
import jax.numpy as jnp

from raytracers_tpu.vec import (Aabb, centre, cross, dot, enclosing, norm,
                                normalise, scale, vec3)


def test_vec3_build():
    v = vec3(1.0, 2.0, 3.0)
    assert v.shape == (3,)
    np.testing.assert_allclose(v, [1, 2, 3])


def test_vec3_broadcast():
    v = vec3(np.zeros((4, 5)), 1.0, 2.0)
    assert v.shape == (4, 5, 3)


def test_dot_cross_norm():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 3)).astype(np.float32)
    b = rng.normal(size=(7, 3)).astype(np.float32)
    np.testing.assert_allclose(dot(a, b), np.einsum("ij,ij->i", a, b),
                               rtol=1e-6)
    np.testing.assert_allclose(cross(a, b), np.cross(a, b), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(norm(a), np.linalg.norm(a, axis=-1), rtol=1e-6)
    u = normalise(a)
    np.testing.assert_allclose(norm(u), np.ones(7), rtol=1e-6)


def test_scale():
    v = vec3(1.0, -2.0, 3.0)
    np.testing.assert_allclose(scale(2.0, v), [2, -4, 6])
    # batched scalar
    s = jnp.asarray([1.0, 2.0])
    vv = jnp.stack([v, v])
    np.testing.assert_allclose(scale(s, vv)[1], [2, -4, 6])


def test_enclosing_centre():
    a = Aabb(vec3(0., 0., 0.), vec3(1., 1., 1.))
    b = Aabb(vec3(-1., 0.5, 0.), vec3(0.5, 2., 0.5))
    e = enclosing(a, b)
    np.testing.assert_allclose(e.min, [-1, 0, 0])
    np.testing.assert_allclose(e.max, [1, 2, 1])
    np.testing.assert_allclose(centre(a), [0.5, 0.5, 0.5])
