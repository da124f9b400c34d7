"""Karras binary radix tree over sorted Morton codes.

Data-parallel construction from "Maximizing Parallelism in the Construction
of BVHs, Octrees, and k-d Trees" (Karras 2012), the same formulation as the
reference (futhark/radixtree.fut:11-72): every inner node i ∈ [0, n-1) is
built independently by three bounded searches (direction, range end, split),
so the whole tree is one ``vmap``.

Node encoding (flat SoA, TPU-friendly — replaces the reference's tagged
``#leaf/#inner`` pointers): a child id ``c`` refers to inner node ``c`` when
``c < n-1`` and to leaf ``c - (n-1)`` otherwise.  ``parent`` is stored for
both inner nodes and leaves (the leaf parents feed skip-link construction).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RadixTree(NamedTuple):
    """n-leaf binary radix tree; n-1 inner nodes, root is inner node 0."""
    left: jnp.ndarray          # (n-1,) int32 encoded child id
    right: jnp.ndarray         # (n-1,) int32 encoded child id
    parent: jnp.ndarray        # (n-1,) int32 parent inner id; root: -1
    leaf_parent: jnp.ndarray   # (n,)   int32 parent inner id

    @property
    def n_inner(self) -> int:
        return self.left.shape[0]

    @property
    def n_leaves(self) -> int:
        return self.leaf_parent.shape[0]

    def is_leaf(self, child):
        return child >= self.n_inner

    def leaf_index(self, child):
        return child - self.n_inner


def _make_delta(codes):
    """delta(i, j): common-prefix length of codes i and j, with the index
    tiebreak for duplicate codes; -1 out of range (futhark/radixtree.fut:13-21)."""
    n = codes.shape[0]

    def delta(i, j):
        in_range = (j >= 0) & (j < n)
        js = jnp.clip(j, 0, n - 1)
        ci = codes[i]
        cj = codes[js]
        same = ci == cj
        d_code = jax.lax.clz(ci ^ cj).astype(jnp.int32)
        d_tie = 32 + jax.lax.clz(
            i.astype(jnp.uint32) ^ js.astype(jnp.uint32)).astype(jnp.int32)
        return jnp.where(in_range, jnp.where(same, d_tie, d_code), -1)

    return delta


def build_radix_tree(codes) -> RadixTree:
    """Sorted (n,) uint32 codes -> RadixTree.  n must be >= 2."""
    codes = jnp.asarray(codes, jnp.uint32)
    n = codes.shape[0]
    n_inner = n - 1
    delta = _make_delta(codes)

    def node(i):
        i = jnp.int32(i)
        # Direction of the node's range (radixtree.fut:27).  The deltas are
        # provably distinct for a (code, index)-lexicographically sorted
        # sequence, so d ∈ {-1, +1}.
        d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
        delta_min = delta(i, i - d)

        # Exponential upper bound for the range length (radixtree.fut:30-34).
        def lmax_cond(l):
            return delta(i, i + l * d) > delta_min
        l_max = jax.lax.while_loop(lmax_cond, lambda l: l * 2, jnp.int32(2))

        # Binary search for the exact range end (radixtree.fut:36-41).
        def end_body(state):
            l, t = state
            better = delta(i, i + (l + t) * d) > delta_min
            return jnp.where(better, l + t, l), t // 2
        l, _ = jax.lax.while_loop(lambda s: s[1] > 0, end_body,
                                  (jnp.int32(0), l_max // 2))
        j = i + l * d

        # Binary search for the split position (radixtree.fut:44-51).
        delta_node = delta(i, j)

        def split_body(state):
            s, q = state
            t = (l + (q * 2) - 1) // (q * 2)   # ceil-div, radixtree.fut:4
            better = delta(i, i + (s + t) * d) > delta_node
            return jnp.where(better, s + t, s), q * 2
        s, _ = jax.lax.while_loop(lambda st: st[1] <= l, split_body,
                                  (jnp.int32(0), jnp.int32(1)))
        gamma = i + s * d + jnp.minimum(d, 0)

        first = jnp.minimum(i, j)
        last = jnp.maximum(i, j)
        # Child encoding (radixtree.fut:53-62): split at gamma|gamma+1.
        left_is_leaf = first == gamma
        right_is_leaf = last == gamma + 1
        left = jnp.where(left_is_leaf, n_inner + gamma, gamma)
        right = jnp.where(right_is_leaf, n_inner + gamma + 1, gamma + 1)
        return left, right, first, last

    idx = jnp.arange(n_inner, dtype=jnp.int32)
    left, right, first, last = jax.vmap(node)(idx)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)

    # Parent pointers by scattering over children (radixtree.fut:66-72),
    # extended to leaves for skip-link construction.
    all_parent = jnp.full((n_inner + n,), -1, jnp.int32)
    all_parent = all_parent.at[left].set(idx)
    all_parent = all_parent.at[right].set(idx)
    parent = all_parent[:n_inner]
    leaf_parent = all_parent[n_inner:]
    return RadixTree(left=left, right=right, parent=parent,
                     leaf_parent=leaf_parent)


def node_depths(tree: RadixTree):
    """Depth of every inner node (root = 0 at depth 0), via pointer doubling:
    ~32 sweeps of two (n,) gathers each.

    Returns (depths (n-1,) int32, max_depth scalar int32).  Used to size the
    levelwise refit exactly instead of assuming a balanced tree (the
    reference assumes ⌈log₂n⌉+2 sweeps, futhark/bvh.fut:47; a skewed code
    distribution can exceed that).

    The Karras root is always inner node 0 (its range pins index 0); making
    the root a fixpoint (depth 0, self-jump) lets the doubling recurrence
    ``d[v] += d[j[v]]; j[v] = j[j[v]]`` run unconditionally.
    """
    parent = tree.parent
    depth = (parent >= 0).astype(jnp.int32)
    jump = jnp.where(parent >= 0, parent, 0)

    def body(_, state):
        depth, jump = state
        return depth + depth[jump], jump[jump]

    depth, _ = jax.lax.fori_loop(0, 32, body, (depth, jump))
    return depth, jnp.max(depth)
