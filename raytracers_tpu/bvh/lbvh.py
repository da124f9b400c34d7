"""LBVH construction: Morton sort → Karras tree → levelwise AABB refit.

TPU-first reformulation of the reference pipeline (futhark/bvh.fut:30-59):

* the hand-rolled 2-bit radix sort becomes ``jnp.argsort`` (XLA's sort is
  the idiomatic primitive — SURVEY.md §7.3),
* the radix tree is the parallel Karras build (radix_tree.py),
* the AABB refit exploits the Karras contiguous-leaf-range property: node
  AABBs are range-min/max queries into sparse tables built by static shifts
  (``_refit_rmq``) — zero sweep loops, 4 gathers total.  The reference's
  levelwise sweep (sized by the *measured* tree depth instead of the
  balanced ⌈log₂n⌉+2 assumption) is kept as ``_refit`` for cross-checks,
* skip links come in closed form (``_skip_links_rmq``): miss(v) is the
  highest node whose leaf range starts at last(v)+1,
* NEW vs the reference: **clustered leaves** — each BVH leaf holds
  ``leaf_size`` consecutive Morton-sorted spheres.  Leaf intersection then
  becomes dense regular vector work (the shape TPUs want), and the tree
  shrinks by leaf_size×, cutting divergent traversal steps.  leaf_size=1
  reproduces the reference structure exactly.
* skip links ("threaded BVH"): every node gets a miss-pointer so traversal
  needs no stack AND no parent backtracking — each step is one node visit,
  where the reference's parent-pointer scheme (futhark/bvh.fut:61-84)
  revisits every inner node up to twice.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import Spheres, sphere_aabb
from ..vec import centre
from .morton import morton_codes
from .radix_tree import RadixTree, build_radix_tree


class Bvh(NamedTuple):
    """Flat SoA LBVH over clustered sphere leaves.

    Shapes: C clusters (leaves), K = leaf_size spheres per cluster,
    M = C*K padded sphere count.  Extended node ids: inner i ∈ [0, C-1),
    leaf c ∈ [C-1, 2C-1).  ``-1`` is the traversal-done sentinel.
    """
    spheres: Spheres            # (M,…) Morton-sorted, radius-0 padded
    order: jnp.ndarray          # (M,) original sphere index, -1 for padding
    left: jnp.ndarray           # (C-1,) encoded child ids
    right: jnp.ndarray          # (C-1,)
    node_min: jnp.ndarray       # (C-1, 3) inner AABBs
    node_max: jnp.ndarray       # (C-1, 3)
    leaf_min: jnp.ndarray       # (C, 3) cluster AABBs
    leaf_max: jnp.ndarray       # (C, 3)
    skip: jnp.ndarray           # (2C-1,) miss link per extended node id
    parent: jnp.ndarray         # (C-1,) parent inner id (root: -1)
    leaf_parent: jnp.ndarray    # (C,) parent inner id

    @property
    def n_leaves(self) -> int:
        return self.leaf_min.shape[0]

    @property
    def n_inner(self) -> int:
        return self.left.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.spheres.center.shape[0] // self.n_leaves


def _pad_spheres(spheres: Spheres, order, m: int):
    """Pad sorted spheres to m entries with radius-0 never-hit spheres
    co-located with the last real sphere (keeps cluster AABBs tight)."""
    n = spheres.center.shape[0]
    pad = m - n
    if pad == 0:
        return spheres, order
    last_c = spheres.center[-1:]
    center = jnp.concatenate(
        [spheres.center, jnp.repeat(last_c, pad, axis=0)], axis=0)
    radius = jnp.concatenate(
        [spheres.radius, jnp.zeros((pad,), spheres.radius.dtype)], axis=0)
    color = jnp.concatenate(
        [spheres.color, jnp.zeros((pad, 3), spheres.color.dtype)], axis=0)
    order = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)], axis=0)
    return Spheres(center, radius, color), order


def _refit(tree: RadixTree, leaf_min, leaf_max, sweeps):
    """Levelwise AABB refit (futhark/bvh.fut:47-58): each sweep recomputes
    every inner AABB from its children's current AABBs; after ``sweeps``
    (= max inner depth + 1) passes all nodes are exact."""
    n_inner = tree.n_inner

    def sweep(state):
        i, node_min, node_max = state
        ext_min = jnp.concatenate([node_min, leaf_min], axis=0)
        ext_max = jnp.concatenate([node_max, leaf_max], axis=0)
        new_min = jnp.minimum(ext_min[tree.left], ext_min[tree.right])
        new_max = jnp.maximum(ext_max[tree.left], ext_max[tree.right])
        return i + 1, new_min, new_max

    init = (jnp.int32(0), jnp.zeros((n_inner, 3), leaf_min.dtype),
            jnp.zeros((n_inner, 3), leaf_max.dtype))
    _, node_min, node_max = jax.lax.while_loop(
        lambda s: s[0] < sweeps, sweep, init)
    return node_min, node_max


def _refit_rmq(first, last, leaf_min, leaf_max):
    """AABB refit as range-min/max queries: a Karras node covers the
    CONTIGUOUS leaf range [first, last], so its AABB is an overlapping
    two-window query into log n sparse tables built by static shifts
    (zero gathers).  Replaces the reference's max_depth levelwise sweeps
    (futhark/bvh.fut:47-58) — each a full-array random gather — with 2
    gathers per bound total (~40 -> 4 gathers at 1M spheres)."""
    n = leaf_min.shape[0]
    kmax = max(1, int(n - 1).bit_length())

    def tables(x, pad, op):
        rows = [x]
        cur = x
        for k in range(1, kmax + 1):
            h = 1 << (k - 1)
            if h < n:
                shifted = jnp.concatenate(
                    [cur[h:], jnp.full((h, 3), pad, x.dtype)], axis=0)
            else:
                shifted = jnp.full((n, 3), pad, x.dtype)
            cur = op(cur, shifted)
            rows.append(cur)
        return jnp.stack(rows).reshape((kmax + 1) * n, 3)

    tmin = tables(leaf_min, jnp.inf, jnp.minimum)
    tmax = tables(leaf_max, -jnp.inf, jnp.maximum)
    length = last - first + 1                     # leaf count, >= 2
    kq = 31 - jax.lax.clz(length.astype(jnp.uint32)).astype(jnp.int32)
    lo = kq * n + first
    hi = kq * n + (last + 1 - (1 << kq))
    node_min = jnp.minimum(tmin[lo], tmin[hi])
    node_max = jnp.maximum(tmax[lo], tmax[hi])
    return node_min, node_max


def _skip_links_rmq(tree: RadixTree):
    """Threaded-BVH miss links in closed form: miss(v) is the next
    subtree in traversal order = the right child of the nearest ancestor
    holding v in its left subtree — which is exactly the HIGHEST node
    whose leaf range starts at last(v) + 1 (ranges starting at the same
    leaf are nested, so the top of each chain is unique: its parent's
    range starts earlier).  One scatter + one gather, replacing the
    levelwise propagation's max_depth gather sweeps."""
    n_inner = tree.n_inner
    n = tree.n_leaves
    parent = tree.parent
    safe_p = jnp.where(parent >= 0, parent, 0)
    pfirst = tree.first[safe_p]
    biggest = (parent < 0) | (pfirst != tree.first)
    # H[x] = encoded id of the highest node starting at leaf x
    # (default: leaf x itself); dummy slot n absorbs non-top nodes
    H = jnp.concatenate([n_inner + jnp.arange(n, dtype=jnp.int32),
                         jnp.zeros((1,), jnp.int32)])
    scatter_idx = jnp.where(biggest, tree.first, n)
    H = H.at[scatter_idx].set(jnp.arange(n_inner, dtype=jnp.int32))[:n]
    ext_last = jnp.concatenate(
        [tree.last, jnp.arange(n, dtype=jnp.int32)])
    x = ext_last + 1
    return jnp.where(x >= n, -1, H[jnp.clip(x, 0, n - 1)])


def _skip_links(tree: RadixTree, sweeps):
    """Threaded-BVH miss links, computed by levelwise propagation of
      miss(v) = right(parent)   if v is the left child
              = miss(parent)    otherwise;  miss(root) = -1.
    Each sweep finalises one more tree level (top-down)."""
    n_inner = tree.n_inner
    n_ext = n_inner + tree.n_leaves
    ext_parent = jnp.concatenate([tree.parent, tree.leaf_parent], axis=0)
    self_id = jnp.arange(n_ext, dtype=jnp.int32)
    safe_p = jnp.where(ext_parent >= 0, ext_parent, 0)
    is_left = tree.left[safe_p] == self_id
    sibling = tree.right[safe_p]

    def sweep(state):
        i, miss = state
        parent_miss = miss[safe_p]           # parents are always inner ids
        new = jnp.where(ext_parent < 0, -1,
                        jnp.where(is_left, sibling, parent_miss))
        return i + 1, new

    init = (jnp.int32(0), jnp.full((n_ext,), -1, jnp.int32))
    _, miss = jax.lax.while_loop(lambda s: s[0] < sweeps, sweep, init)
    return miss


def _sort_by_morton(spheres: Spheres):
    """Morton-sort the spheres with ONE fused multi-operand ``lax.sort``
    (key + 8 payload columns in a single pass) instead of argsort + 7
    random gathers — the same measured lesson as the render path's
    boundary sorts (docs/PERF_NOTES.md: a 1M random gather is ~0.9 ms on
    v5e; the fused sort moves all operands in one pass).  Stable, so
    equal-code sphere order (and hence every downstream golden) is
    bit-identical to the argsort formulation.

    Returns (sorted_spheres, perm, sorted_codes)."""
    boxes = sphere_aabb(spheres)
    codes = morton_codes(centre(boxes))
    n = codes.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    c, r, col = spheres.center, spheres.radius, spheres.color
    out = jax.lax.sort(
        [codes, iota, c[:, 0], c[:, 1], c[:, 2], r,
         col[:, 0], col[:, 1], col[:, 2]],
        dimension=0, num_keys=1, is_stable=True)
    sorted_spheres = Spheres(jnp.stack(out[2:5], axis=1), out[5],
                             jnp.stack(out[6:9], axis=1))
    return sorted_spheres, out[1], out[0]


class Clusters(NamedTuple):
    """Morton-sorted leaf clustering WITHOUT the Karras tree.

    The Pallas megakernel's two-level culling needs only the clustered
    sphere layout and per-cluster AABBs — not the radix tree, refit or
    skip links (whose data-dependent while_loops dominate small-scene
    build time).  This is the megakernel's ``prepare_scene`` analogue of
    the reference's BVH phase (futhark/ray.fut:241-244); the full tree
    (``build_bvh``) remains the deep-traversal structure.
    """
    spheres: Spheres            # (M,…) Morton-sorted, radius-0 padded
    order: jnp.ndarray          # (M,) original sphere index, -1 padding
    leaf_min: jnp.ndarray       # (C, 3) cluster AABBs
    leaf_max: jnp.ndarray       # (C, 3)

    @property
    def n_leaves(self) -> int:
        return self.leaf_min.shape[0]


def build_clusters(spheres: Spheres, leaf_size: int = 1) -> Clusters:
    """Morton sort + cluster + leaf AABBs only (no tree).  ~10 XLA ops:
    the whole build is one sort plus gathers and reshaped min/max."""
    n = spheres.center.shape[0]
    if n < 2:
        raise ValueError("build_clusters requires at least 2 spheres")
    n_leaves = -(-n // leaf_size)
    if n_leaves < 2:
        leaf_size = -(-n // 2)
        n_leaves = -(-n // leaf_size)
    m = n_leaves * leaf_size

    sorted_spheres, perm, _ = _sort_by_morton(spheres)
    sorted_spheres, order = _pad_spheres(sorted_spheres, perm, m)

    sb = sphere_aabb(sorted_spheres)
    leaf_min = sb.min.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_max = sb.max.reshape(n_leaves, leaf_size, 3).max(axis=1)
    return Clusters(spheres=sorted_spheres, order=order,
                    leaf_min=leaf_min, leaf_max=leaf_max)


def build_bvh(spheres: Spheres, leaf_size: int = 1) -> Bvh:
    """Build the LBVH.  ``leaf_size`` is a static Python int."""
    n = spheres.center.shape[0]
    if n < 2:
        raise ValueError("build_bvh requires at least 2 spheres")
    n_leaves = -(-n // leaf_size)
    if n_leaves < 2:
        leaf_size = -(-n // 2)
        n_leaves = -(-n // leaf_size)
    m = n_leaves * leaf_size

    sorted_spheres, perm, sorted_codes = _sort_by_morton(spheres)
    sorted_spheres, order = _pad_spheres(sorted_spheres, perm, m)

    # Cluster AABBs: radius-0 padding cannot extend a cluster's bounds.
    sb = sphere_aabb(sorted_spheres)
    leaf_min = sb.min.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_max = sb.max.reshape(n_leaves, leaf_size, 3).max(axis=1)

    cluster_codes = sorted_codes[::leaf_size][:n_leaves]
    tree = build_radix_tree(cluster_codes)
    # RMQ refit + closed-form skip links (no levelwise sweeps, no
    # node_depths pass): 213 -> 44 ms for the 1M leaf-8 build on v5e
    node_min, node_max = _refit_rmq(tree.first, tree.last,
                                    leaf_min, leaf_max)
    skip = _skip_links_rmq(tree)

    return Bvh(spheres=sorted_spheres, order=order, left=tree.left,
               right=tree.right, node_min=node_min, node_max=node_max,
               leaf_min=leaf_min, leaf_max=leaf_max, skip=skip,
               parent=tree.parent, leaf_parent=tree.leaf_parent)
