"""Brute-force closest-hit oracles: every ray against every sphere.

Two formulations with identical semantics (futhark/ray.fut:76-86 minus the
BVH pruning, which cannot change the argmin):

* ``precise`` — materialises ``oc = origin - center`` per (ray, sphere) pair;
  bit-faithful to the reference's scalar arithmetic; memory O(R*N*3).

* ``matmul`` — the TPU-native reformulation.  Expanding the quadratic's
  coefficients turns the two per-pair dot products into dense contractions
  that run on the MXU:

      b = origin·dir  - dir @ Cᵀ          (R,3)@(3,N) matmul
      c = |origin|²   - 2·origin @ Cᵀ + (|C|² - r²)

  Everything else is (R, N) elementwise VPU work.  Cost: the expansion incurs
  f32 cancellation error ~1e-4 relative near grazing hits; forward images
  agree with ``precise`` to a handful of boundary pixels.

Ties on t are broken toward the lower sphere index (argmin semantics); the
reference's traversal-order tie-break differs but ties are measure-zero.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp

from ..geometry import SCENE_EPSILON, T_MAX, Spheres, sphere_hit_t
from ..vec import dot


def _best(t_pair):
    """(R, N) pair ts -> (idx (R,), t (R,)); -1/inf on total miss."""
    best_idx = jnp.argmin(t_pair, axis=1).astype(jnp.int32)
    best_t = jnp.min(t_pair, axis=1)
    return jnp.where(jnp.isinf(best_t), -1, best_idx), best_t


def closest_hit_precise(spheres: Spheres, origins, dirs,
                        t_min=SCENE_EPSILON, t_max=T_MAX):
    """All-pairs intersection with exact per-pair ``oc`` arithmetic."""
    t_pair = sphere_hit_t(origins[:, None, :], dirs[:, None, :],
                          spheres.center[None, :, :],
                          spheres.radius[None, :], t_min, t_max)
    return _best(t_pair)


def closest_hit_matmul(spheres: Spheres, origins, dirs,
                       t_min=SCENE_EPSILON, t_max=T_MAX):
    """All-pairs intersection as two matmuls + elementwise (MXU path)."""
    C = spheres.center                       # (N, 3)
    r2 = spheres.radius * spheres.radius     # (N,)
    a = dot(dirs, dirs)[:, None]             # (R, 1)
    od = dot(origins, dirs)[:, None]         # (R, 1)
    oo = dot(origins, origins)[:, None]      # (R, 1)
    dC = dirs @ C.T                          # (R, N)  MXU
    oC = origins @ C.T                       # (R, N)  MXU
    cc = dot(C, C)[None, :]                  # (1, N)
    b = od - dC
    c = oo - 2.0 * oC + (cc - r2[None, :])
    disc = b * b - a * c
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
    inv_a = 1.0 / a
    root0 = (-b - sq) * inv_a
    root1 = (-b + sq) * inv_a
    ok0 = (root0 < t_max) & (root0 > t_min)
    ok1 = (root1 < t_max) & (root1 > t_min)
    t = jnp.where(ok0, root0, jnp.where(ok1, root1, jnp.float32(jnp.inf)))
    t_pair = jnp.where(pos, t, jnp.float32(jnp.inf))
    return _best(t_pair)


def make_closest_hit(spheres: Spheres, formulation: str = "precise"):
    fn = {"precise": closest_hit_precise,
          "matmul": closest_hit_matmul}[formulation]
    return functools.partial(fn, spheres)
