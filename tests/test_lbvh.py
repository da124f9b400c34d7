"""LBVH build invariants and traversal-vs-brute-force equivalence."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracers_tpu import scenes
from raytracers_tpu.bvh.lbvh import build_bvh
from raytracers_tpu.bvh.traverse import closest_hit_bvh
from raytracers_tpu.geometry import Spheres, sphere_aabb
from raytracers_tpu.render.bruteforce import closest_hit_precise


def _random_spheres(n, seed=0):
    rng = np.random.default_rng(seed)
    return Spheres(
        jnp.asarray(rng.uniform(-40, 40, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 4.0, (n,)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)))


def _random_rays(r, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-60, 60, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("leaf_size", [1, 4, 16])
def test_aabb_containment(leaf_size):
    sph = _random_spheres(333)
    bvh = build_bvh(sph, leaf_size=leaf_size)
    # each sorted sphere's AABB inside its cluster AABB
    sb = sphere_aabb(bvh.spheres)
    K = bvh.leaf_size
    C = bvh.n_leaves
    smin = np.asarray(sb.min).reshape(C, K, 3)
    smax = np.asarray(sb.max).reshape(C, K, 3)
    assert (smin >= np.asarray(bvh.leaf_min)[:, None, :] - 1e-5).all()
    assert (smax <= np.asarray(bvh.leaf_max)[:, None, :] + 1e-5).all()
    # each inner node's AABB == union of its children's AABBs
    ext_min = np.concatenate([np.asarray(bvh.node_min),
                              np.asarray(bvh.leaf_min)])
    ext_max = np.concatenate([np.asarray(bvh.node_max),
                              np.asarray(bvh.leaf_max)])
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    np.testing.assert_allclose(
        np.asarray(bvh.node_min),
        np.minimum(ext_min[left], ext_min[right]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bvh.node_max),
        np.maximum(ext_max[left], ext_max[right]), rtol=1e-6)


def test_order_is_permutation():
    sph = _random_spheres(100)
    bvh = build_bvh(sph, leaf_size=8)
    order = np.asarray(bvh.order)
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(100))
    # padded entries have radius 0
    pad_mask = order < 0
    assert (np.asarray(bvh.spheres.radius)[pad_mask] == 0).all()


def test_skip_links_form_full_traversal():
    """Unconditionally following hit links (always descend) must visit every
    node exactly once — the skip threading is a preorder linearisation."""
    sph = _random_spheres(57)
    bvh = build_bvh(sph, leaf_size=4)
    n_inner = bvh.n_inner
    left = np.asarray(bvh.left)
    skip = np.asarray(bvh.skip)
    cur, visited = 0, []
    while cur != -1:
        visited.append(cur)
        cur = left[cur] if cur < n_inner else skip[cur]
        if len(visited) > 4 * (2 * bvh.n_leaves):
            raise AssertionError("skip links loop")
    assert sorted(visited) == list(range(2 * bvh.n_leaves - 1))


def _assert_hits_equivalent(bi, bt, ti, tt, max_disagree=0.0):
    """Compare closest-hit results between two oracles.

    XLA lowers the shared quadratic differently in different graphs
    (fusion/FMA choices), so near-grazing rays can see ~1e-5 relative t
    jitter and, on a measure-zero set, flipped hit decisions.  We require
    index agreement on ≥ (1 - max_disagree) of rays and tight t agreement
    where indices match."""
    bi, bt, ti, tt = map(np.asarray, (bi, bt, ti, tt))
    disagree = (bi != ti).mean()
    assert disagree <= max_disagree, (disagree, max_disagree)
    same = bi == ti
    hit = same & (bi >= 0)
    np.testing.assert_allclose(bt[hit], tt[hit], rtol=1e-4)
    miss = same & (bi < 0)
    assert np.isinf(bt[miss]).all() and np.isinf(tt[miss]).all()


@pytest.mark.parametrize("leaf_size", [1, 4, 16])
def test_traversal_matches_bruteforce_random(leaf_size):
    sph = _random_spheres(357)
    bvh = build_bvh(sph, leaf_size=leaf_size)
    o, d = _random_rays(512)
    bi, bt = closest_hit_precise(sph, o, d)
    ti, tt = closest_hit_bvh(bvh, o, d)
    _assert_hits_equivalent(bi, bt, ti, tt, max_disagree=0.005)


@pytest.mark.parametrize("scene_name", ["rgbbox", "irreg"])
def test_traversal_matches_bruteforce_scene(scene_name):
    sc = scenes.by_name(scene_name)
    bvh = build_bvh(sc.spheres, leaf_size=4)
    # rays from the scene camera region pointing into the scene
    rng = np.random.default_rng(7)
    o = jnp.asarray(np.float32(sc.look_from)[None, :].repeat(256, 0))
    d = jnp.asarray(np.float32(sc.look_at)[None, :]
                    - np.float32(sc.look_from)[None, :]
                    + rng.normal(scale=20.0, size=(256, 3)).astype(np.float32))
    bi, bt = closest_hit_precise(sc.spheres, o, d)
    ti, tt = closest_hit_bvh(bvh, o, d)
    _assert_hits_equivalent(bi, bt, ti, tt, max_disagree=0.005)


def test_duplicate_position_spheres():
    # all spheres at the same point: degenerate Morton codes everywhere
    sph = Spheres(jnp.zeros((33, 3)), jnp.ones((33,)) * 0.5,
                  jnp.ones((33, 3)))
    bvh = build_bvh(sph, leaf_size=4)
    o = jnp.asarray([[0., 0., -10.]] * 4)
    d = jnp.asarray([[0., 0., 1.]] * 4)
    ti, tt = closest_hit_bvh(bvh, o, d)
    np.testing.assert_allclose(np.asarray(tt), 9.5, rtol=1e-5)


@pytest.mark.parametrize("scene_name,leaf_size",
                         [("rgbbox", 128), ("irreg", 128), ("irreg", 32)])
def test_clusters_match_bvh_fields(scene_name, leaf_size):
    """build_clusters (the megakernel's tree-free prepare path) must
    reproduce build_bvh's clustering bit-for-bit: same Morton sort, same
    padding, same leaf AABBs — only the Karras tree is skipped."""
    from raytracers_tpu.bvh.lbvh import build_clusters

    sph = scenes.by_name(scene_name).spheres
    full = build_bvh(sph, leaf_size=leaf_size)
    fast = build_clusters(sph, leaf_size=leaf_size)
    assert fast.n_leaves == full.n_leaves
    assert np.array_equal(np.asarray(fast.order), np.asarray(full.order))
    assert np.array_equal(np.asarray(fast.leaf_min),
                          np.asarray(full.leaf_min))
    assert np.array_equal(np.asarray(fast.leaf_max),
                          np.asarray(full.leaf_max))
    for f in ("center", "radius", "color"):
        assert np.array_equal(np.asarray(getattr(fast.spheres, f)),
                              np.asarray(getattr(full.spheres, f)))


def test_rmq_refit_and_skip_links_match_sweeps():
    """The RMQ refit (range-min/max queries over the contiguous leaf
    ranges) and closed-form skip links must equal the levelwise-sweep
    versions exactly, including on skewed and duplicate-code trees."""
    import numpy as np

    from raytracers_tpu.bvh.lbvh import (_refit, _refit_rmq, _skip_links,
                                         _skip_links_rmq)
    from raytracers_tpu.bvh.radix_tree import build_radix_tree, node_depths

    rng = np.random.default_rng(5)
    cases = [np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint32))
             for n in (2, 3, 33, 500)]
    cases += [np.full(64, 3, np.uint32),
              np.array([1 << i for i in range(30)], np.uint32)]
    for codes in cases:
        n = len(codes)
        tree = build_radix_tree(codes)
        leaf_min = rng.standard_normal((n, 3)).astype(np.float32)
        leaf_max = leaf_min + rng.random((n, 3)).astype(np.float32)
        _, max_depth = node_depths(tree)
        a_min, a_max = _refit(tree, leaf_min, leaf_max, max_depth + 1)
        b_min, b_max = _refit_rmq(tree.first, tree.last, leaf_min, leaf_max)
        np.testing.assert_array_equal(np.asarray(a_min), np.asarray(b_min))
        np.testing.assert_array_equal(np.asarray(a_max), np.asarray(b_max))
        a_skip = _skip_links(tree, max_depth + 2)
        b_skip = _skip_links_rmq(tree)
        np.testing.assert_array_equal(np.asarray(a_skip), np.asarray(b_skip))
