"""Karras binary radix tree over sorted Morton codes.

Data-parallel construction from "Maximizing Parallelism in the Construction
of BVHs, Octrees, and k-d Trees" (Karras 2012), the same SEMANTICS as the
reference (futhark/radixtree.fut:11-72), but a TPU-first formulation.

The reference (and the round-1 ``build_radix_tree_searches`` below, kept as
a cross-check oracle) gives every node three data-dependent searches
(direction, range end, split) — under ``vmap`` each search iteration is a
full-array random gather, and random gathers are the most expensive
primitive on TPU (measured ~0.9 ms per 125k-element gather; the search
build costs ~100 ms at 1M spheres).  ``build_radix_tree`` instead exploits
a property of sorted code sequences:

    delta(i, j) = min over k in [i, j) of A[k],   A[k] = delta(k, k+1)

so every Karras search is a range-min query over the STATIC array A of
adjacent deltas (computed by one shift, zero gathers).  A sparse table
(log n levels of static shifted mins — pure vector ops) then answers

* the range-end search by binary lifting: ~log n single gathers,
* the split search in ONE packed (delta << 21 | index) argmin query:
  2 gathers (the range minimum is provably unique — two positions
  flipping the same top bit would need a higher bit to flip between
  them, which would be a smaller minimum),

cutting the build from ~3·log n gathers per search chain to ~log n + 2
total.  The same contiguous-range property powers the O(1)-query AABB
refit and closed-form skip links in lbvh.py.

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
    """n-leaf binary radix tree; n-1 inner nodes, root is inner node 0.

    ``first``/``last``: each Karras node covers a CONTIGUOUS leaf range
    [first, last] (the property behind the RMQ build/refit/skip links).
    """
    left: jnp.ndarray          # (n-1,) int32 encoded child id
    right: jnp.ndarray         # (n-1,) int32 encoded child id
    parent: jnp.ndarray        # (n-1,) int32 parent inner id; root: -1
    leaf_parent: jnp.ndarray   # (n,)   int32 parent inner id
    first: jnp.ndarray         # (n-1,) int32 leaf-range start
    last: jnp.ndarray          # (n-1,) int32 leaf-range end (inclusive)

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


def build_radix_tree_searches(codes) -> RadixTree:
    """Round-1 per-node-search build (the reference's literal formulation,
    radixtree.fut:23-64).  Kept as the cross-check oracle for
    ``build_radix_tree`` and for small scenes; ~3 log n random gathers per
    node chain make it ~5x slower than the RMQ build at 1M spheres."""
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
                     leaf_parent=leaf_parent,
                     first=first.astype(jnp.int32),
                     last=last.astype(jnp.int32))


def adjacent_deltas(codes):
    """A[k] = delta(k, k+1) for sorted (n,) uint32 codes -> (n-1,) int32.

    One shift, zero gathers.  Properties (both used below):
    * delta(i, j) = min_{k in [i,j)} A[k]  (common prefix of a sorted
      sequence = the worst adjacent step; equal-code runs carry the
      32 + clz(index) tiebreak, which is the same min over index bits);
    * adjacent values are always distinct, and the minimum over any
      node range is unique (two equal minima would need the same top
      bit to flip twice, forcing a higher — smaller-A — flip between).
    """
    codes = jnp.asarray(codes, jnp.uint32)
    n = codes.shape[0]
    ci, cj = codes[:-1], codes[1:]
    idx = jnp.arange(n - 1, dtype=jnp.uint32)
    d_code = jax.lax.clz(ci ^ cj).astype(jnp.int32)
    d_tie = 32 + jax.lax.clz(idx ^ (idx + 1)).astype(jnp.int32)
    return jnp.where(ci == cj, d_tie, d_code)


def _sparse_min_table(A, kmax: int, pad):
    """ST[k][p] = min(A[p : p+2^k]) with out-of-range slots = ``pad``
    -> (kmax+1, m).  Pure static shifts; zero gathers."""
    m = A.shape[0]
    rows = [A]
    cur = A
    for k in range(1, kmax + 1):
        h = 1 << (k - 1)
        if h < m:
            shifted = jnp.concatenate(
                [cur[h:], jnp.full((h,), pad, A.dtype)])
        else:
            shifted = jnp.full((m,), pad, A.dtype)
        cur = jnp.minimum(cur, shifted)
        rows.append(cur)
    return jnp.stack(rows)


def build_radix_tree(codes) -> RadixTree:
    """Sorted (n,) uint32 codes -> RadixTree.  n must be >= 2.

    RMQ formulation (module docstring): identical output to
    ``build_radix_tree_searches`` (property-tested), ~log n total gathers
    instead of ~3 log n gather-loop iterations per node."""
    codes = jnp.asarray(codes, jnp.uint32)
    n = codes.shape[0]
    if n >= (1 << 21):
        # the packed (delta << 21 | idx) argmin field holds 21 index bits;
        # beyond 2M leaves fall back to the search build (cluster counts
        # this large are far past any current workload)
        return build_radix_tree_searches(codes)
    n_inner = n - 1
    m = n_inner                       # adjacent-delta count
    kmax = max(1, int(m - 1).bit_length())

    A = adjacent_deltas(codes)                       # (m,)
    # window mins; pad -2 so any window crossing the end fails even for
    # the root's delta_min = -1
    ST = _sparse_min_table(A, kmax, jnp.int32(-2))
    # packed (delta << 21 | position) for the one-query split argmin
    P = _sparse_min_table(
        (A << 21) | jnp.arange(m, dtype=jnp.int32), kmax,
        jnp.int32(jnp.iinfo(jnp.int32).max))

    i = jnp.arange(n_inner, dtype=jnp.int32)
    a_prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), A[:-1]])
    # direction + boundary delta (radixtree.fut:27): adjacent deltas are
    # provably distinct, so d is +-1
    d = jnp.where(A > a_prev, jnp.int32(1), jnp.int32(-1))
    delta_min = jnp.where(d > 0, a_prev, A)

    # range end by binary lifting: extend [i, pos) (d=+1) or [pos, i)
    # (d=-1) by the largest power-of-two window whose min still beats
    # delta_min; one gather per level (radixtree.fut:30-41's exponential
    # + binary searches fused)
    pos = i
    for k in range(kmax, -1, -1):
        step = 1 << k
        q_idx = jnp.where(d > 0, pos, pos - step)
        valid = (q_idx >= 0) & (q_idx < m)
        qv = ST[k][jnp.clip(q_idx, 0, m - 1)]
        ok = valid & (qv > delta_min)
        pos = jnp.where(ok, pos + d * step, pos)
    first = jnp.where(d > 0, i, pos)
    last = jnp.where(d > 0, pos, i)

    # split = the unique argmin of A over [first, last) in ONE overlapping
    # two-window query (radixtree.fut:44-51's binary search collapsed)
    length = last - first                            # >= 1
    kq = 31 - jax.lax.clz(length.astype(jnp.uint32)).astype(jnp.int32)
    Pf = P.reshape(-1)
    q1 = Pf[kq * m + first]
    q2 = Pf[kq * m + (last - (1 << kq))]
    gamma = jnp.minimum(q1, q2) & ((1 << 21) - 1)

    left_is_leaf = first == gamma
    right_is_leaf = last == gamma + 1
    left = jnp.where(left_is_leaf, n_inner + gamma, gamma)
    right = jnp.where(right_is_leaf, n_inner + gamma + 1, gamma + 1)

    all_parent = jnp.full((n_inner + n,), -1, jnp.int32)
    all_parent = all_parent.at[left].set(i)
    all_parent = all_parent.at[right].set(i)
    return RadixTree(left=left, right=right, parent=all_parent[:n_inner],
                     leaf_parent=all_parent[n_inner:],
                     first=first, last=last)


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
