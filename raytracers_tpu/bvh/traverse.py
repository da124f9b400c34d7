"""Lane-parallel stackless BVH traversal (XLA path).

TPU traversal model: TPUs are wide-vector machines, not SIMT — every ray in
the batch advances its own ``cur`` node id each step of ONE shared
``lax.while_loop``; finished lanes idle at the -1 sentinel.  The threaded
(skip-link) layout makes each step a single node visit:

    inner node:  slab test → hit ? left child : skip
    leaf node:   intersect its leaf_size spheres → skip

versus the reference's parent-pointer walk (futhark/bvh.fut:61-84) which
revisits inner nodes on the way back up.  Semantics preserved from
futhark/ray.fut:76-86: sphere tests inside traversal use the
(SCENE_EPSILON, best_t) window; the AABB prune window is (T_MIN, best_t) —
the reference prunes with the fixed top-level window, shrinking it to the
running best is strictly tighter and cannot change the argmin.

Returns the ORIGINAL sphere index (pre-Morton-sort) so shading gathers from
the caller's unsorted scene arrays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry import SCENE_EPSILON, T_MAX, T_MIN, aabb_hit, sphere_hit_t
from ..vec import Aabb
from .lbvh import Bvh

INF = float("inf")          # python float: no device op at import time


def closest_hit_bvh(bvh: Bvh, origins, dirs,
                    t_min=SCENE_EPSILON, t_max=T_MAX):
    """(R,3) rays -> (orig_idx (R,) int32, t (R,) f32); -1/inf on miss."""
    R = origins.shape[0]
    n_inner = bvh.n_inner
    K = bvh.leaf_size

    # carries derived from the ray arrays so they are 'rays'-varying
    # under shard_map from iteration 0 (keeps check_vma satisfied)
    zero = jnp.isnan(origins[:, 0]).astype(jnp.int32)   # all-0, varying
    cur0 = zero                                  # root = inner node 0
    best_t0 = zero.astype(jnp.float32) + t_max
    best_i0 = zero - 1

    def cond(state):
        cur, _, _ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, best_i, best_t = state
        done = cur < 0
        is_leaf = cur >= n_inner
        safe_cur = jnp.where(done, 0, cur)

        # --- inner case: slab test against the node AABB
        ii = jnp.clip(safe_cur, 0, n_inner - 1)
        box = Aabb(bvh.node_min[ii], bvh.node_max[ii])
        box_hit = aabb_hit(box, origins, dirs, T_MIN, best_t)

        # --- leaf case: test the cluster's K spheres
        leaf = jnp.clip(safe_cur - n_inner, 0, bvh.n_leaves - 1)
        base = leaf * K
        sidx = base[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]  # (R,K)
        c = bvh.spheres.center[sidx]            # (R,K,3)
        rad = bvh.spheres.radius[sidx]          # (R,K)
        ts = sphere_hit_t(origins[:, None, :], dirs[:, None, :], c, rad,
                          t_min, best_t[:, None])
        k_best = jnp.argmin(ts, axis=1).astype(jnp.int32)
        k_t = jnp.min(ts, axis=1)
        leaf_improves = is_leaf & ~done & (k_t < best_t)
        best_t = jnp.where(leaf_improves, k_t, best_t)
        best_i = jnp.where(leaf_improves, base + k_best, best_i)

        # --- advance
        nxt_inner = jnp.where(box_hit, bvh.left[ii], bvh.skip[safe_cur])
        nxt = jnp.where(is_leaf, bvh.skip[safe_cur], nxt_inner)
        cur = jnp.where(done, -1, nxt)
        return cur, best_i, best_t

    _, best_i, best_t = jax.lax.while_loop(cond, body,
                                           (cur0, best_i0, best_t0))
    hit = best_i >= 0
    orig = jnp.where(hit, bvh.order[jnp.maximum(best_i, 0)], -1)
    return orig, jnp.where(hit, best_t, INF)


def make_closest_hit(bvh: Bvh):
    """Adapter matching the tracer's closest-hit contract."""
    return functools.partial(closest_hit_bvh, bvh)
