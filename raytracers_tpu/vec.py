"""L0 math primitives: 3-vectors and axis-aligned bounding boxes, SoA style.

TPU-first design: a "vec3" is just the trailing axis of an ``(..., 3)`` float32
array, so every op here broadcasts over arbitrary batch shapes and vectorizes
onto the VPU.  There is deliberately no Vec3 class — structure-of-arrays is the
layout that maps onto TPU lanes (and is what the reference's own array-language
implementation uses, cf. reference futhark/prim.fut:1-50).

AABBs are a pair of ``(..., 3)`` arrays (min corner, max corner), carried in an
:class:`Aabb` NamedTuple so they travel through jit as a pytree.

Reference parity: semantics of ``enclosing`` / ``centre`` follow
futhark/prim.fut:38-50; ``dot``/``cross``/``normalise`` follow
futhark/prim.fut:22-33.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def vec3(x, y, z, dtype=jnp.float32):
    """Build an (..., 3) vector from components (broadcasting)."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)),
        axis=-1)


def dot(a, b):
    """Dot product over the trailing axis: (...,3),(...,3) -> (...)."""
    return jnp.sum(a * b, axis=-1)


def norm(v):
    return jnp.sqrt(dot(v, v))


def normalise(v):
    return v * (1.0 / norm(v))[..., None]


def scale(s, v):
    """Scalar (...,) times vector (...,3)."""
    return jnp.asarray(s)[..., None] * v


def cross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


class Aabb(NamedTuple):
    """Axis-aligned bounding box; both corners are (..., 3) arrays."""
    min: jnp.ndarray
    max: jnp.ndarray


def enclosing(a: Aabb, b: Aabb) -> Aabb:
    """Smallest AABB containing both (futhark/prim.fut:38-45)."""
    return Aabb(jnp.minimum(a.min, b.min), jnp.maximum(a.max, b.max))


def centre(box: Aabb):
    """AABB centre, computed as min + 0.5*(max-min) (futhark/prim.fut:47-50).

    Written in exactly that associativity (not (min+max)/2) for bit parity
    with the reference in f32.
    """
    return box.min + 0.5 * (box.max - box.min)
