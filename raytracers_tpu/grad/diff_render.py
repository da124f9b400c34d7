"""Differentiable rendering: d(pixel)/d(sphere center, radius, colour).

Two-phase design (SURVEY.md §7.5, enabled by the reference's own two-phase
hit structure, futhark/ray.fut:76-86):

  Phase 1 — PATH TRACE (non-differentiable, fast): run the forward bounce
  loop with any closest-hit oracle (BVH or brute force), recording per
  bounce only the DISCRETE outcome: hit sphere index and event
  (bounce / absorb / miss / inactive).  Integer outputs, wrapped in
  ``stop_gradient``.

  Phase 2 — REPLAY (differentiable): re-run the shading chain as a
  ``lax.scan`` over the recorded path.  All continuous quantities
  (intersection t via the quadratic, hit point, normal, reflection,
  attenuation product, sky colour) are recomputed from the live sphere
  parameters, so autodiff flows through ``d(pixel)/d(center,radius,colour)``
  while the combinatorial structure (which sphere, which event) stays
  frozen.  This is exact: away from visibility discontinuities the true
  gradient does not move the discrete path.

  The replay reproduces the reference's widened-window re-intersection
  (search t with (ε, ∞), then final t with (0, t+1) — futhark/ray.fut:84-85)
  so forward replay values bit-match the plain renderer.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..geometry import (MAX_DEPTH, SCENE_EPSILON, T_MAX, T_MIN, Camera,
                        Spheres, reflect, sky_colour, sphere_hit_t)
from ..render.tracer import primary_rays
from ..vec import dot, normalise

# Event codes recorded per (step, ray).
EV_BOUNCE = 0    # hit + successful mirror scatter: path continues
EV_ABSORB = 1    # hit but scatter rejected: path ends black
EV_MISS = 2      # no hit: path ends on sky gradient
EV_INACTIVE = 3  # path already terminated in an earlier step


def trace_paths(closest_hit: Callable, spheres: Spheres, origins, dirs,
                max_depth: int = MAX_DEPTH):
    """Phase 1: forward trace recording (idxs, events), each (D, R)."""

    def step(carry, _):
        o, d, done = carry
        idx, t = closest_hit(o, d)
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        c = spheres.center[safe]
        r = spheres.radius[safe]
        t2 = sphere_hit_t(o, d, c, r, T_MIN, t + 1.0)
        p = o + t2[..., None] * d
        n = (p - c) * (1.0 / r)[..., None]
        refl = reflect(normalise(d), n)
        scatter_ok = dot(refl, n) > 0.0

        event = jnp.where(done, EV_INACTIVE,
                          jnp.where(~hit, EV_MISS,
                                    jnp.where(scatter_ok, EV_BOUNCE,
                                              EV_ABSORB))).astype(jnp.uint8)
        bounce = event == EV_BOUNCE
        o = jnp.where(bounce[..., None], p, o)
        d = jnp.where(bounce[..., None], refl, d)
        done = done | (event == EV_MISS) | (event == EV_ABSORB)
        return (o, d, done), (jnp.where(hit, idx, -1).astype(jnp.int32), event)

    # derived from the ray arrays: 'rays'-varying under shard_map from
    # step 0, keeping the varying-manual-axes checker satisfied
    done0 = jnp.isnan(origins[:, 0])
    _, (idxs, events) = jax.lax.scan(step, (origins, dirs, done0), None,
                                     length=max_depth)
    return jax.lax.stop_gradient(idxs), jax.lax.stop_gradient(events)


def _gather_sphere_params(spheres: Spheres, safe_idx, mode: str):
    """Winner-sphere parameters for a ray batch.

    mode="take": plain XLA gather (fine on CPU / small batches).
    mode="onehot": exact one-hot matmul — on TPU a (R,N)@(N,7) MXU dot
    (and its transpose in the VJP) is ~an order of magnitude faster than
    1e6-element gathers + scatter-add, and exact because each one-hot row
    has a single nonzero.
    """
    if mode == "take":
        return (spheres.center[safe_idx], spheres.radius[safe_idx],
                spheres.color[safe_idx])
    n = spheres.center.shape[0]
    oh = (safe_idx[:, None] == jnp.arange(n, dtype=safe_idx.dtype)[None, :]
          ).astype(jnp.float32)                               # (R, N)
    tab = jnp.concatenate([spheres.center, spheres.radius[:, None],
                           spheres.color], axis=1)            # (N, 7)
    g = jnp.dot(oh, tab, precision=jax.lax.Precision.HIGHEST)
    return g[:, 0:3], g[:, 3], g[:, 4:7]


def replay_paths(spheres: Spheres, origins, dirs, idxs, events,
                 gather: str = "take", remat: bool = False):
    """Phase 2: differentiable shading replay -> colours (R, 3).

    ``remat=True`` rematerialises each step in the backward pass instead
    of storing residuals — essential for gather="onehot" at scale, where
    the (R, N) one-hot would otherwise be kept alive for all D steps
    (50 x 1e6 x 400 f32 = 51 GB at the north-star config)."""

    def step(carry, rec):
        o, d, light, result = carry
        idx, event = rec
        safe = jnp.maximum(idx, 0)
        c, r, col = _gather_sphere_params(spheres, safe, gather)
        # two-phase re-intersection, differentiable in (c, r)
        t1 = sphere_hit_t(o, d, c, r, SCENE_EPSILON, T_MAX)
        t1 = jnp.where(jnp.isfinite(t1), t1, 0.0)
        t2 = sphere_hit_t(o, d, c, r, T_MIN, t1 + 1.0)
        t2 = jnp.where(jnp.isfinite(t2), t2, 0.0)
        p = o + t2[..., None] * d
        n = (p - c) * (1.0 / r)[..., None]
        refl = reflect(normalise(d), n)

        bounce = event == EV_BOUNCE
        miss = event == EV_MISS
        sky = light * sky_colour(d)

        result = jnp.where(miss[..., None], sky, result)
        light = jnp.where(bounce[..., None], light * col, light)
        o = jnp.where(bounce[..., None], p, o)
        d = jnp.where(bounce[..., None], refl, d)
        return (o, d, light, result), None

    light0 = jnp.ones_like(origins)
    result0 = jnp.zeros_like(origins)
    step_fn = jax.checkpoint(step) if remat else step
    (o, d, light, result), _ = jax.lax.scan(
        step_fn, (origins, dirs, light0, result0), (idxs, events))
    return result


def trace_diff(closest_hit: Callable, spheres: Spheres, origins, dirs,
               max_depth: int = MAX_DEPTH):
    """Differentiable colours for a ray batch (R, 3)."""
    idxs, events = trace_paths(closest_hit, spheres, origins, dirs, max_depth)
    return replay_paths(spheres, origins, dirs, idxs, events)


def render_diff(closest_hit_for: Callable, spheres: Spheres, cam: Camera,
                width: int, height: int, max_depth: int = MAX_DEPTH,
                chunk: int | None = None):
    """Differentiable image (h, w, 3).

    ``closest_hit_for(spheres)`` builds the oracle from the LIVE sphere
    parameters (so phase 1 re-runs on current geometry each evaluation —
    required inside an optimisation loop where spheres move).
    """
    origins, dirs = primary_rays(cam, width, height)
    ch = closest_hit_for(spheres)
    R = width * height
    if chunk is None or chunk >= R:
        colours = trace_diff(ch, spheres, origins, dirs, max_depth)
    else:
        pad = (-R) % chunk
        if pad:
            origins = jnp.concatenate([origins, origins[:pad]], axis=0)
            dirs = jnp.concatenate([dirs, dirs[:pad]], axis=0)
        o = origins.reshape(-1, chunk, 3)
        d = dirs.reshape(-1, chunk, 3)
        colours = jax.lax.map(
            lambda od: trace_diff(ch, spheres, od[0], od[1], max_depth),
            (o, d)).reshape(-1, 3)[:R]
    return colours.reshape(height, width, 3)
