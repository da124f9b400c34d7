"""Runtime validation / debug assertions (SURVEY.md §5: the TPU answer to
the reference's language-level safety — JAX is pure, but index structures
like the LBVH can still be silently wrong; these checks make that loud).

``validate_bvh`` runs host-side (numpy) and returns a list of violated
invariants (empty == valid).  Intended for tests, debugging and
``--validate`` style CLI flags, not hot paths.
"""
from __future__ import annotations

import numpy as np

from ..bvh.lbvh import Bvh
from ..geometry import Spheres, sphere_aabb


def validate_bvh(bvh: Bvh, atol: float = 1e-5) -> list[str]:
    problems: list[str] = []
    C = bvh.n_leaves
    n_inner = bvh.n_inner
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    parent = np.asarray(bvh.parent)
    leaf_parent = np.asarray(bvh.leaf_parent)
    skip = np.asarray(bvh.skip)

    # child id ranges
    if not ((left >= 0) & (left < n_inner + C)).all():
        problems.append("left child ids out of range")
    if not ((right >= 0) & (right < n_inner + C)).all():
        problems.append("right child ids out of range")

    # parent consistency
    for cname, child in (("left", left), ("right", right)):
        for i in range(n_inner):
            c = child[i]
            p = parent[c] if c < n_inner else leaf_parent[c - n_inner]
            if p != i:
                problems.append(
                    f"parent mismatch: {cname} child {c} of inner {i} "
                    f"has parent {p}")
                break

    # every node visited exactly once by the skip threading
    cur, seen = 0, []
    limit = 4 * (n_inner + C) + 8
    while cur != -1 and len(seen) <= limit:
        seen.append(cur)
        cur = left[cur] if cur < n_inner else skip[cur]
    if sorted(seen) != list(range(n_inner + C)):
        problems.append("skip links do not thread all nodes exactly once")

    # AABB containment: leaf boxes inside all ancestors
    sb = sphere_aabb(bvh.spheres)
    K = bvh.leaf_size
    smin = np.asarray(sb.min).reshape(C, K, 3).min(axis=1)
    smax = np.asarray(sb.max).reshape(C, K, 3).max(axis=1)
    lmin = np.asarray(bvh.leaf_min)
    lmax = np.asarray(bvh.leaf_max)
    if (smin < lmin - atol).any() or (smax > lmax + atol).any():
        problems.append("sphere AABBs escape their leaf cluster AABBs")
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    ext_min = np.concatenate([nmin, lmin])
    ext_max = np.concatenate([nmax, lmax])
    if ((ext_min[left] < nmin - atol).any()
            or (ext_max[left] > nmax + atol).any()
            or (ext_min[right] < nmin - atol).any()
            or (ext_max[right] > nmax + atol).any()):
        problems.append("child AABBs escape their parent AABBs")

    # order is a permutation (+ -1 padding)
    order = np.asarray(bvh.order)
    real = np.sort(order[order >= 0])
    if not (real == np.arange(real.size)).all():
        problems.append("order is not a permutation of input indices")
    if (order < 0).any():
        pad_r = np.asarray(bvh.spheres.radius)[order < 0]
        if (pad_r != 0).any():
            problems.append("padding spheres must have radius 0")
    return problems


def validate_spheres(spheres: Spheres) -> list[str]:
    problems = []
    c = np.asarray(spheres.center)
    r = np.asarray(spheres.radius)
    col = np.asarray(spheres.color)
    if not np.isfinite(c).all():
        problems.append("non-finite sphere centers")
    if (r < 0).any() or not np.isfinite(r).all():
        problems.append("negative or non-finite radii")
    if not np.isfinite(col).all():
        problems.append("non-finite colors")
    if c.shape[0] != r.shape[0] or c.shape[0] != col.shape[0]:
        problems.append("mismatched SoA field lengths")
    return problems
