"""L1 geometry: spheres, ray-sphere / ray-AABB intersection, pinhole camera.

All functions are mask-based and broadcast over batch axes — there is no
Option type; a miss is encoded as ``t = +inf`` (the reference's ``opt hit``
becomes a validity mask).  Semantics follow the blessed reference:

* ``sphere_hit``    — futhark/ray.fut:32-51 (near root, else far root, open
                      interval ``t_min < t < t_max``)
* ``aabb_hit``      — futhark/ray.fut:53-70 (staged slab test; each stage must
                      leave a non-empty interval)
* ``Camera``        — futhark/ray.fut:93-114
* ``reflect``       — futhark/ray.fut:116-117

Scene-wide constants (shared by every reference implementation, see
SURVEY.md §2.3): bounce-loop t_min = 0.0, t_max = 1e9, traversal-internal
``scene_epsilon`` = 0.1 (futhark/ray.fut:3,79,130), max depth 50.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .vec import Aabb, cross, dot, normalise, vec3

SCENE_EPSILON = 0.1     # t_min used for sphere tests inside traversal (ray.fut:3)
T_MIN = 0.0             # top-level t_min (ray.fut:130)
T_MAX = 1e9             # top-level t_max (ray.fut:130)
MAX_DEPTH = 50          # bounce limit (ray.fut:154)
INF = float("inf")          # python float: no device op at import time


class Spheres(NamedTuple):
    """SoA sphere soup: center (N,3) f32, radius (N,) f32, color (N,3) f32."""
    center: jnp.ndarray
    radius: jnp.ndarray
    color: jnp.ndarray

    @property
    def count(self) -> int:
        return self.center.shape[0]


def sphere_aabb(s: Spheres) -> Aabb:
    """Per-sphere AABBs: (N,3) min/max (futhark/ray.fut:28-30)."""
    r = s.radius[..., None]
    return Aabb(s.center - r, s.center + r)


def sphere_hit_t(origin, direction, center, radius, t_min, t_max):
    """Ray-sphere intersection parameter, broadcasting over any batch shape.

    Returns ``t`` with +inf where there is no hit in the *open* interval
    (t_min, t_max).  Mirrors futhark/ray.fut:32-51: try the near quadratic
    root first, fall back to the far root.  ``direction`` need not be
    normalised (the reference never normalises primary rays).
    """
    oc = origin - center
    a = dot(direction, direction)
    b = dot(oc, direction)
    c = dot(oc, oc) - radius * radius
    disc = b * b - a * c
    pos = disc > 0.0
    # double-where: sqrt'(0)=inf would poison gradients of missing lanes
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
    root0 = (-b - sq) / a
    root1 = (-b + sq) / a
    ok0 = (root0 < t_max) & (root0 > t_min)
    ok1 = (root1 < t_max) & (root1 > t_min)
    t = jnp.where(ok0, root0, jnp.where(ok1, root1, INF))
    return jnp.where(pos, t, INF)


def hit_record(t, origin, direction, center, radius, color):
    """Reconstruct (p, normal, colour) for a known hit t (ray.fut:40-45)."""
    p = origin + t[..., None] * direction
    normal = (p - center) * (1.0 / radius)[..., None]
    return p, normal, color


def aabb_hit(box: Aabb, origin, direction, t_min, t_max):
    """Slab test, staged exactly like futhark/ray.fut:53-70.

    The reference threads (tmin, tmax) through x, then y, then z, and fails
    as soon as the running interval collapses; the boolean is the AND of the
    three per-stage conditions.  IEEE inf/nan behaviour for axis-parallel
    rays matches because the arithmetic is identical.
    """
    def stage(lo, hi, o, d, tmin, tmax):
        inv = 1.0 / d
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        near = jnp.where(inv < 0.0, t1, t0)
        far = jnp.where(inv < 0.0, t0, t1)
        tmin2 = jnp.maximum(near, tmin)
        tmax2 = jnp.minimum(far, tmax)
        # reference polarity is fail-if ``tmax <= tmin`` (ray.fut:64-70):
        # a NaN stage (0 * inf for an axis-parallel ray with its origin on
        # a slab plane) compares false and therefore reports HIT.
        return tmin2, tmax2, ~(tmax2 <= tmin2)

    tmin1, tmax1, ok1 = stage(box.min[..., 0], box.max[..., 0],
                              origin[..., 0], direction[..., 0], t_min, t_max)
    tmin2, tmax2, ok2 = stage(box.min[..., 1], box.max[..., 1],
                              origin[..., 1], direction[..., 1], tmin1, tmax1)
    _, _, ok3 = stage(box.min[..., 2], box.max[..., 2],
                      origin[..., 2], direction[..., 2], tmin2, tmax2)
    return ok1 & ok2 & ok3


class Camera(NamedTuple):
    """Pinhole camera (futhark/ray.fut:88-107): all fields (3,) f32."""
    origin: jnp.ndarray
    llc: jnp.ndarray
    horizontal: jnp.ndarray
    vertical: jnp.ndarray


def camera(look_from, look_at, vup, vfov_deg, aspect) -> Camera:
    look_from = jnp.asarray(look_from, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)
    theta = vfov_deg * math.pi / 180.0
    half_height = jnp.tan(theta / 2.0)
    half_width = aspect * half_height
    w = normalise(look_from - look_at)
    u = normalise(cross(vup, w))
    v = cross(w, u)
    llc = look_from - half_width * u - half_height * v - w
    return Camera(origin=look_from, llc=llc,
                  horizontal=2.0 * half_width * u,
                  vertical=2.0 * half_height * v)


def get_ray(cam: Camera, s, t):
    """Ray through film coordinates (s, t) in [0,1)² (futhark/ray.fut:109-114).

    s, t may be batched (...,); returns origin (...,3), direction (...,3).
    """
    s = jnp.asarray(s, jnp.float32)
    d = (cam.llc + s[..., None] * cam.horizontal
         + jnp.asarray(t, jnp.float32)[..., None] * cam.vertical - cam.origin)
    origin = jnp.broadcast_to(cam.origin, d.shape)
    return origin, d


def reflect(v, n):
    """Mirror reflection (futhark/ray.fut:116-117)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def sky_colour(direction):
    """Background gradient on miss (futhark/ray.fut:141-148)."""
    unit = normalise(direction)
    t = 0.5 * (unit[..., 1] + 1.0)
    white = vec3(1.0, 1.0, 1.0)
    bg = vec3(0.5, 0.7, 1.0)
    return (1.0 - t)[..., None] * white + t[..., None] * bg
