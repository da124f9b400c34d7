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
    g = _onehot_gather(
        jnp.concatenate([spheres.center, spheres.radius[:, None],
                         spheres.color], axis=1),             # (N, 7)
        safe_idx)
    return g[:, 0:3], g[:, 3], g[:, 4:7]


def _split3(x):
    """Exact 3-term bf16 decomposition of an f32 array: x = hi + mid + lo
    bit-for-bit (3x8 mantissa bits cover f32's 24; each residual is
    exactly representable, and the f32 re-sum reconstructs x because x
    itself is an f32)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_gather(tab, safe_idx):
    """Exact one-hot row gather ``tab[safe_idx]`` as a single bf16 MXU dot
    each way — (R, N) one-hots are the replay's dominant traffic at the
    north-star config (1e6 x 400 per step), and Precision.HIGHEST would
    split that operand into 3 f32->bf16 passes per dot.  Here the one-hot
    is built in bf16 directly (0/1 exact) and the SMALL side carries the
    3-term split (_split3), concatenated so one (R,N)@(N,21) dot reads the
    big operand once.  Forward values are exact (single nonzero term per
    output, f32 accumulation); the custom VJP computes the table cotangent
    the same way (split the (R,7) cotangent, one (N,R)@(R,21)-shaped dot),
    which is f32-accumulation-exact like HIGHEST up to ray-sum ordering.
    """
    return _onehot_gather_p(tab, safe_idx)


def _oh_of(idx, n):
    return (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]
            ).astype(jnp.bfloat16)                            # (R, N)


@jax.custom_vjp
def _onehot_gather_p(tab, safe_idx):
    g3 = jnp.dot(_oh_of(safe_idx, tab.shape[0]),
                 jnp.concatenate(_split3(tab), axis=1),
                 preferred_element_type=jnp.float32)          # (R, 21)
    return g3[:, 0:7] + g3[:, 7:14] + g3[:, 14:21]


def _onehot_gather_fwd(tab, safe_idx):
    return _onehot_gather_p(tab, safe_idx), (safe_idx, tab.shape[0])


def _onehot_gather_bwd(res, gcot):
    import numpy as np
    safe_idx, n = res
    c3 = jax.lax.dot_general(
        _oh_of(safe_idx, n), jnp.concatenate(_split3(gcot), axis=1),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (N, 21)
    idx_cot = np.zeros(safe_idx.shape, dtype=jax.dtypes.float0)
    return (c3[:, 0:7] + c3[:, 7:14] + c3[:, 14:21], idx_cot)


_onehot_gather_p.defvjp(_onehot_gather_fwd, _onehot_gather_bwd)


def replay_paths(spheres: Spheres, origins, dirs, idxs, events,
                 gather: str = "take", remat: bool = False,
                 skip_dead: bool = False, skip_group: int = 8):
    """Phase 2: differentiable shading replay -> colours (R, 3).

    ``remat=True`` rematerialises each step in the backward pass instead
    of storing residuals — essential for gather="onehot" at scale, where
    the (R, N) one-hot would otherwise be kept alive for all D steps
    (50 x 1e6 x 400 f32 = 51 GB at the north-star config).

    ``skip_dead=True`` scans over GROUPS of ``skip_group`` consecutive
    steps, each wrapped in one ``lax.cond`` on "any ray in this batch
    alive anywhere in the group": groups where the whole batch is
    EV_INACTIVE cost one predicate check instead of skip_group shading
    steps.  A dead step is the identity on the carry (every ``where``
    mask is False), so this is exact.  The cond is per-GROUP because
    XLA's per-step cond overhead was measured to exceed the skipped work
    (docs/PERF_NOTES.md); it only pays when the batch is
    depth-homogeneous — see pallas_diff's sort-by-depth chunking."""

    def step_inner(carry, idx, event):
        o, d, light, result = carry
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
        return (o, d, light, result)

    light0 = jnp.ones_like(origins)
    result0 = jnp.zeros_like(origins)

    if skip_dead:
        D = idxs.shape[0]
        G = min(skip_group, D)
        pad = (-D) % G
        if pad:
            idxs = jnp.concatenate(
                [idxs, jnp.zeros((pad,) + idxs.shape[1:], idxs.dtype)])
            events = jnp.concatenate(
                [events, jnp.full((pad,) + events.shape[1:], EV_INACTIVE,
                                  events.dtype)])
        ng = (D + pad) // G
        idxs_g = idxs.reshape((ng, G) + idxs.shape[1:])
        events_g = events.reshape((ng, G) + events.shape[1:])
        alive_g = jnp.any(
            events_g != EV_INACTIVE,
            axis=tuple(range(1, events_g.ndim)))              # (ng,)

        def group(carry, rec):
            idx_g, ev_g, any_alive = rec

            def live(c):
                for k in range(G):
                    c = step_inner(c, idx_g[k], ev_g[k])
                return c

            carry = jax.lax.cond(any_alive, live, lambda c: c, carry)
            return carry, None

        step_fn = jax.checkpoint(group) if remat else group
        (o, d, light, result), _ = jax.lax.scan(
            step_fn, (origins, dirs, light0, result0),
            (idxs_g, events_g, alive_g))
        return result

    def step(carry, rec):
        idx, event = rec
        return step_inner(carry, idx, event), None

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
