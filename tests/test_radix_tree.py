"""Karras radix tree structural invariants (cf. futhark/radixtree.fut).

An (n)-leaf radix tree must be a single binary tree rooted at inner node 0
in which every leaf appears exactly once and each inner node's range of
leaves is contiguous.  We verify by explicit numpy walks, including the
duplicate-code tiebreak path.
"""
import numpy as np
import pytest

from raytracers_tpu.bvh.radix_tree import build_radix_tree, node_depths


def _walk(tree):
    """Recursively collect leaves below each node; assert consistency."""
    n_inner = tree.left.shape[0]
    left = np.asarray(tree.left)
    right = np.asarray(tree.right)
    parent = np.asarray(tree.parent)
    leaf_parent = np.asarray(tree.leaf_parent)

    seen_leaves = []

    def leaves_below(node, depth=0):
        assert depth < 10 * (n_inner + 2), "cycle detected"
        out = []
        for child in (left[node], right[node]):
            if child >= n_inner:
                leaf = child - n_inner
                seen_leaves.append(leaf)
                assert leaf_parent[leaf] == node
                out.append(leaf)
            else:
                assert parent[child] == node
                out.extend(leaves_below(child, depth + 1))
        return out

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        all_leaves = leaves_below(0)
    finally:
        sys.setrecursionlimit(old)
    return all_leaves


def _check(codes):
    codes = np.asarray(codes, np.uint32)
    tree = build_radix_tree(codes)
    n = len(codes)
    leaves = _walk(tree)
    assert sorted(leaves) == list(range(n))
    # Karras invariant: every inner node covers a CONTIGUOUS leaf range and
    # an in-order walk yields leaves in sorted order.
    assert leaves == list(range(n))
    assert np.asarray(tree.parent)[0] == -1
    return tree


def test_two_leaves():
    t = _check([3, 7])
    assert np.asarray(t.left)[0] == 1   # leaf 0 encoded as n_inner + 0 = 1
    assert np.asarray(t.right)[0] == 2


def test_small_known():
    # the example shape from the Karras paper: 8 leaves
    _check([0b00001, 0b00010, 0b00100, 0b00101, 0b10011, 0b11000, 0b11001,
            0b11110])


def test_random_sorted():
    rng = np.random.default_rng(3)
    for n in (2, 3, 5, 17, 100, 1000):
        codes = np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        _check(codes)


def test_all_duplicate_codes():
    # tiebreak-by-index must produce a valid (balanced) tree
    for n in (2, 3, 8, 33):
        _check(np.full(n, 12345, np.uint32))


def test_mixed_duplicates():
    codes = np.sort(np.array([5, 5, 5, 9, 9, 100, 100, 100, 100, 2**31],
                             np.uint32))
    _check(codes)


def test_adversarial_skewed():
    # codes 1,2,4,8,... produce a maximally unbalanced (chain) tree
    codes = np.array([1 << i for i in range(30)], np.uint32)
    tree = _check(codes)
    _, max_depth = node_depths(tree)
    assert int(max_depth) == 28  # chain of n-1=29 inner nodes, depths 0..28


def test_node_depths_balanced():
    codes = np.arange(64, dtype=np.uint32)
    tree = build_radix_tree(codes)
    depths, max_depth = node_depths(tree)
    assert int(max_depth) == 5   # perfectly balanced over 64 leaves
    assert int(np.asarray(depths)[0]) == 0


def test_duplicates_depth_balanced():
    # duplicate codes with index tiebreak form balanced subtrees
    tree = build_radix_tree(np.full(256, 7, np.uint32))
    _, max_depth = node_depths(tree)
    assert int(max_depth) <= 8


def test_rmq_build_matches_search_build():
    """The RMQ formulation (sparse-table lifting + one-query split) must
    reproduce the reference-literal per-node-search build EXACTLY — same
    children, parents, and leaf ranges — on random, duplicate-heavy and
    adversarial inputs."""
    from raytracers_tpu.bvh.radix_tree import build_radix_tree_searches

    rng = np.random.default_rng(11)
    cases = [np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint32))
             for n in (2, 3, 4, 7, 64, 257, 1000)]
    cases += [np.full(17, 9, np.uint32),
              np.sort(np.array([5, 5, 5, 9, 9, 100, 100, 100, 100, 2**31],
                               np.uint32)),
              np.array([1 << i for i in range(30)], np.uint32),
              np.sort(rng.integers(0, 4, size=333, dtype=np.uint32))]
    for codes in cases:
        a = build_radix_tree(codes)
        b = build_radix_tree_searches(codes)
        for fa, fb, name in zip(a, b, a._fields):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb),
                                          err_msg=f"{name} n={len(codes)}")
