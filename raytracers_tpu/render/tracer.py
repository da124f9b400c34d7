"""L3 renderer core: ray generation, the iterative bounce loop, image assembly.

TPU-first structure: the whole image is a flat batch of rays; the ≤50-bounce
loop is ONE ``lax.while_loop`` over the entire batch with per-lane masks (the
reference's per-pixel ``loop ... while depth < 50`` at futhark/ray.fut:126-148
becomes lock-step lanes).  The closest-hit oracle is pluggable so brute-force,
BVH-traversal, and Pallas variants share identical shading semantics.

Closest-hit contract (mirrors futhark/ray.fut:76-86 ``objs_hit``):
  ``closest_hit(origins (R,3), dirs (R,3)) -> (idx (R,) int32, t (R,) f32)``
where the search window is (SCENE_EPSILON, T_MAX) and ``idx == -1`` / ``t ==
+inf`` encodes a miss.  The *two-phase* reference structure is preserved: the
oracle returns only the winning index; shading re-intersects that sphere with
the widened window (T_MIN, t+1) — futhark/ray.fut:84-85 — which is also what
keeps the gradient path clean (indices are discrete, re-intersection is
differentiable).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..geometry import (MAX_DEPTH, T_MIN, Camera, Spheres, get_ray,
                        reflect, sky_colour, sphere_hit_t)
from ..vec import dot, normalise
from ..image import colour_to_pixel


def primary_rays(cam: Camera, width: int, height: int):
    """All primary rays for an image, row-major, with the reference's pixel
    mapping: u = i/width, v = (height - j)/height (futhark/ray.fut:150-168).

    Returns origins (h*w, 3), dirs (h*w, 3).
    """
    i = jnp.arange(width, dtype=jnp.float32)
    j = jnp.arange(height, dtype=jnp.float32)
    u = i / width                                   # (w,)
    v = (height - j) / height                       # (h,)
    uu, vv = jnp.meshgrid(u, v)                     # (h, w) each, row-major
    return get_ray(cam, uu.reshape(-1), vv.reshape(-1))


def shade_step(spheres: Spheres, origins, dirs, light, result, done, idx, t):
    """One bounce of shading given the closest-hit result.

    Returns updated (origins, dirs, light, result, done).  Pure function of
    its inputs — shared by forward renderers and the differentiable path.
    """
    hit = idx >= 0
    safe_idx = jnp.maximum(idx, 0)
    c = spheres.center[safe_idx]
    r = spheres.radius[safe_idx]
    col = spheres.color[safe_idx]

    # Phase 2: re-intersect the winner with the widened window (ray.fut:84-85).
    t2 = sphere_hit_t(origins, dirs, c, r, T_MIN, t + 1.0)
    p = origins + t2[..., None] * dirs
    normal = (p - c) * (1.0 / r)[..., None]

    refl = reflect(normalise(dirs), normal)
    scatter_ok = dot(refl, normal) > 0.0            # ray.fut:119-124

    active = ~done
    bounce = active & hit & scatter_ok
    absorb = active & hit & ~scatter_ok
    miss = active & ~hit

    sky = light * sky_colour(dirs)

    new_origins = jnp.where(bounce[..., None], p, origins)
    new_dirs = jnp.where(bounce[..., None], refl, dirs)
    new_light = jnp.where(bounce[..., None], light * col, light)
    new_result = jnp.where(miss[..., None], sky, result)
    # absorb leaves result at black (ray.fut:137-140: colour' = light*0 = 0)
    new_done = done | absorb | miss
    return new_origins, new_dirs, new_light, new_result, new_done


def trace(closest_hit: Callable, spheres: Spheres, origins, dirs,
          max_depth: int = MAX_DEPTH):
    """Trace a batch of rays to final colours (R, 3).

    The while_loop carries (origins, dirs, light, result, done, depth); it
    runs until every lane is done or depth hits max_depth, matching
    futhark/ray.fut:126-148 (paths still alive at the depth cap are black).
    """
    # carries derived from the ray arrays (not fresh constants) so that
    # under shard_map they are 'rays'-varying from the start — this keeps
    # the varying-manual-axes checker (check_vma) satisfiable
    light = jnp.ones_like(origins)
    result = jnp.zeros_like(origins)
    done = jnp.isnan(origins[:, 0])          # all-False, rays-varying

    def cond(state):
        _, _, _, _, done, depth = state
        return (depth < max_depth) & jnp.any(~done)

    def body(state):
        origins, dirs, light, result, done, depth = state
        idx, t = closest_hit(origins, dirs)
        origins, dirs, light, result, done = shade_step(
            spheres, origins, dirs, light, result, done, idx, t)
        return origins, dirs, light, result, done, depth + 1

    state = (origins, dirs, light, result, done, jnp.int32(0))
    *_, result, _, _ = jax.lax.while_loop(cond, body, state)
    return result


def render_colours(closest_hit: Callable, spheres: Spheres, cam: Camera,
                   width: int, height: int, max_depth: int = MAX_DEPTH,
                   chunk: int | None = None):
    """Render the full image to float colours (h, w, 3).

    ``chunk`` splits the ray batch into fixed-size tiles processed by
    ``lax.map`` — bounding peak memory for all-pairs intersection oracles.
    """
    origins, dirs = primary_rays(cam, width, height)
    R = width * height
    if chunk is None or chunk >= R:
        colours = trace(closest_hit, spheres, origins, dirs, max_depth)
    else:
        pad = (-R) % chunk
        if pad:
            origins = jnp.concatenate([origins, origins[:pad]], axis=0)
            dirs = jnp.concatenate([dirs, dirs[:pad]], axis=0)
        o = origins.reshape(-1, chunk, 3)
        d = dirs.reshape(-1, chunk, 3)
        colours = jax.lax.map(
            lambda od: trace(closest_hit, spheres, od[0], od[1], max_depth),
            (o, d)).reshape(-1, 3)[:R]
    return colours.reshape(height, width, 3)


def render_packed(closest_hit: Callable, spheres: Spheres, cam: Camera,
                  width: int, height: int, max_depth: int = MAX_DEPTH,
                  chunk: int | None = None):
    """Render to the reference's packed int32 image (h, w)."""
    return colour_to_pixel(render_colours(
        closest_hit, spheres, cam, width, height, max_depth, chunk))
