"""Pallas megakernel tests (interpreter mode; the real TPU is bench-only)."""
import numpy as np
import pytest

from raytracers_tpu import camera, scenes
from raytracers_tpu.image import pixel_to_rgb
from raytracers_tpu.render.api import prepare_scene, render
from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                 render_pallas)


def _pair(scene_name, w, h, depth, tile=256):
    sc = scenes.by_name(scene_name)
    ps = build_pallas_scene(sc.spheres)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, w / h)
    img = np.asarray(render_pallas(ps, cam, w, h, max_depth=depth, tile=tile,
                                   interpret=True))
    prep = prepare_scene(sc, h, w, leaf_size=8)
    ref = np.asarray(render(prep, h, w, mode="brute", max_depth=depth,
                            chunk=2048))
    return img, ref


@pytest.mark.parametrize("scene_name", ["rgbbox", "irreg"])
def test_pallas_depth1_exact(scene_name):
    img, ref = _pair(scene_name, 64, 64, 1)
    np.testing.assert_array_equal(img, ref)


@pytest.mark.parametrize("n,want_p", [(37, 64), (300, 64), (385, 8)])
def test_pallas_tail_peel_exact(n, want_p):
    """The peeled partial final cluster (P < 128 real rows) must not
    change results: depth-1 renders stay bit-exact vs the brute oracle
    for sphere counts that leave ragged tails (single-cluster, mid, and
    a 1-sphere tail)."""
    from raytracers_tpu.geometry import Spheres
    from raytracers_tpu.render.bruteforce import make_closest_hit
    from raytracers_tpu.render.tracer import render_packed
    full = scenes.by_name("irreg").spheres
    sph = Spheres(full.center[:n], full.radius[:n], full.color[:n])
    ps = build_pallas_scene(sph)
    assert ps.tailT.shape[0] == want_p, (n, ps.tailT.shape)
    w = h = 48
    cam = camera((-8., 4., 6.), (0., 1., 0.), (0., 1., 0.), 80.0, w / h)
    img = np.asarray(render_pallas(ps, cam, w, h, max_depth=1, tile=256,
                                   interpret=True))
    ref = np.asarray(render_packed(make_closest_hit(sph, "precise"), sph,
                                   cam, w, h, max_depth=1, chunk=512))
    np.testing.assert_array_equal(img, ref)


def test_pallas_front_to_back_order_exact():
    """Front-to-back cluster ordering (build_pallas_scene sort_origin, the
    api.prepare_scene default) must not change closest-hit results: depth-1
    renders stay bit-exact vs the brute oracle for irreg (C=79, the config
    the sort activates for)."""
    sc = scenes.by_name("irreg")
    w = h = 64
    ps = build_pallas_scene(sc.spheres, sort_origin=sc.look_from)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, w / h)
    img = np.asarray(render_pallas(ps, cam, w, h, max_depth=1, tile=256,
                                   interpret=True))
    prep = prepare_scene(sc, h, w, leaf_size=8, with_pallas=True)
    ref = np.asarray(render(prep, h, w, mode="brute", max_depth=1,
                            chunk=2048))
    np.testing.assert_array_equal(img, ref)
    # the api path builds the sorted layout: same pixels through render()
    api_img = np.asarray(render(prep, h, w, mode="pallas", max_depth=1,
                                interpret=True))
    np.testing.assert_array_equal(api_img, ref)


def test_pallas_full_depth_structural():
    img, ref = _pair("rgbbox", 64, 64, 50)
    a = pixel_to_rgb(img).astype(np.int32)
    b = pixel_to_rgb(ref).astype(np.int32)
    assert (img != ref).mean() < 0.12          # f32 mirror-cascade chaos
    assert np.abs(a - b).mean() < 4.0


def test_pallas_nonsquare_and_ragged_tiles():
    # width*height not a multiple of the tile exercises the tail tile
    img, ref = _pair("rgbbox", 31, 19, 3)
    assert img.shape == (19, 31)
    assert (img != ref).mean() < 0.05


def test_pallas_cluster_culling_multi_block():
    # irreg has 79 clusters (single block); force multi-block coverage with
    # a random 20k-sphere soup -> 157 clusters -> 3 cluster blocks at the
    # scene-scale default CR=64 (round 4)
    from raytracers_tpu.scenes import random_spheres
    sph = random_spheres(20_000, seed=5, extent=200.0)
    ps = build_pallas_scene(sph)
    assert ps.aabbT.shape[0] > 1
    cam = camera((0., 0., 260.), (0., 0., 0.), (0., 1., 0.), 60.0, 1.0)
    img = np.asarray(render_pallas(ps, cam, 32, 32, max_depth=2,
                                   interpret=True))
    from raytracers_tpu.render.bruteforce import make_closest_hit
    from raytracers_tpu.render.tracer import render_packed
    ref = np.asarray(render_packed(make_closest_hit(sph, "precise"), sph,
                                   cam, 32, 32, max_depth=2, chunk=256))
    assert (img != ref).mean() < 0.01


def test_twophase_bit_identical():
    """Survivor-compaction rendering must reproduce single-phase bits."""
    from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
    from raytracers_tpu import camera, scenes
    from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                     render_pallas)
    sc = scenes.rgbbox()
    ps = build_pallas_scene(sc.spheres)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    a = np.asarray(render_pallas(ps, cam, 40, 40, max_depth=50,
                                 interpret=True))
    b = np.asarray(render_pallas_twophase(ps, cam, 40, 40, max_depth=50,
                                          phase1_depth=5, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_twophase_segmented_sort_bit_identical():
    """Segmented boundary sorts (seg_tiles) are a pure repartitioning of
    the compaction: identical bits, survivors just pack per segment."""
    from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
    sc = scenes.irreg()
    ps = build_pallas_scene(sc.spheres, sort_origin=sc.look_from)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    kw = dict(max_depth=50, schedule=(3, 8), tile=256, block=(16, 16),
              interpret=True)
    a = np.asarray(render_pallas_twophase(ps, cam, 64, 64, **kw))
    b = np.asarray(render_pallas_twophase(ps, cam, 64, 64, seg_tiles=4,
                                          **kw))
    np.testing.assert_array_equal(a, b)


def test_twophase_prefix_sort_bit_identical():
    """Prefix-bounded boundary sorts are exact for ANY survival rate —
    even a deliberately too-small prefix (actives left beyond it are
    traced in place; compaction is an optimization, not a correctness
    requirement)."""
    from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
    sc = scenes.rgbbox()
    ps = build_pallas_scene(sc.spheres)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    kw = dict(max_depth=50, schedule=(3, 4, 8), tile=256, block=(16, 16),
              interpret=True)
    a = np.asarray(render_pallas_twophase(ps, cam, 64, 64, **kw))
    b = np.asarray(render_pallas_twophase(
        ps, cam, 64, 64, sort_prefix=(None, 0.5, 0.25), **kw))
    c = np.asarray(render_pallas_twophase(
        ps, cam, 64, 64, sort_prefix=(0.25, 0.07, 0.07), **kw))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_block_tiled_matches_scanline():
    """2-D block tiling is a pure work-partitioning change: identical bits."""
    sc = scenes.rgbbox()
    ps = build_pallas_scene(sc.spheres)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    a = np.asarray(render_pallas(ps, cam, 52, 52, max_depth=3,
                                 interpret=True))
    b = np.asarray(render_pallas(ps, cam, 52, 52, max_depth=3, tile=256,
                                 block=(16, 16), interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_scene_scale_100k():
    """Scene-scale path: a 100k-sphere soup (782 clusters, 7 blocks)
    renders through the two-level-culled kernel and matches brute force."""
    from raytracers_tpu.scenes import random_spheres
    from raytracers_tpu.render.bruteforce import make_closest_hit
    from raytracers_tpu.render.tracer import render_packed
    sph = random_spheres(100_000, seed=11, extent=400.0)
    ps = build_pallas_scene(sph)
    assert ps.aabbT.shape[0] > 1          # exercises the super-AABB gate
    cam = camera((0., 0., 520.), (0., 0., 0.), (0., 1., 0.), 60.0, 1.0)
    img = np.asarray(render_pallas(ps, cam, 16, 16, max_depth=2,
                                   interpret=True, cull=True))
    # the culling guarantee is exactness: two-level culled == unculled
    unculled = np.asarray(render_pallas(ps, cam, 16, 16, max_depth=2,
                                        interpret=True, cull=False))
    np.testing.assert_array_equal(img, unculled)
    # cull_rows (finer cull blocks, CR=32 -> CB=25) is a pure regrouping
    # of the same conservative cull: bit-identical
    ps32 = build_pallas_scene(sph, cull_rows=32)
    assert ps32.aabbT.shape[:2] == (-(-ps32.n_clusters // 32), 32)
    img32 = np.asarray(render_pallas(ps32, cam, 16, 16, max_depth=2,
                                     interpret=True, cull=True))
    np.testing.assert_array_equal(img, img32)
    # vs the oracle, allow tie-flips: an overlapping random soup is full
    # of near-coincident surfaces where the packed-key argmin and the
    # oracle argmin may disagree within an ulp
    ref = np.asarray(render_packed(make_closest_hit(sph, "matmul"), sph,
                                   cam, 16, 16, max_depth=2, chunk=256))
    assert (img != ref).mean() < 0.05


def test_pallas_front_to_back_multi_block_exact():
    """The within-block front-to-back sort at CB > 1 must leave the
    culled render identical to the unsorted layout (order-independent
    closest hit; block unions untouched)."""
    from raytracers_tpu.scenes import random_spheres
    sph = random_spheres(100_000, seed=11, extent=400.0)
    origin = (0., 0., 520.)
    ps = build_pallas_scene(sph)
    pss = build_pallas_scene(sph, sort_origin=origin)
    assert pss.aabbT.shape[0] > 1
    # the sort is a pure permutation of cluster rows (same sphere ids,
    # same -1 padding lanes)
    np.testing.assert_array_equal(np.sort(np.asarray(ps.order), axis=None),
                                  np.sort(np.asarray(pss.order), axis=None))
    cam = camera(origin, (0., 0., 0.), (0., 1., 0.), 60.0, 1.0)
    a = np.asarray(render_pallas(ps, cam, 16, 16, max_depth=2,
                                 interpret=True, cull=True))
    b = np.asarray(render_pallas(pss, cam, 16, 16, max_depth=2,
                                 interpret=True, cull=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_hbm_streamed_dynamic_sweep_200k():
    """>1024-cluster scenes: sphere tables live in HBM (per-visit DMA)
    and the visit sweep is the fully dynamic block->group->cluster cond
    nest.  Exact vs the brute oracle at depth 1."""
    from raytracers_tpu.scenes import random_spheres
    from raytracers_tpu.render.bruteforce import make_closest_hit
    from raytracers_tpu.render.tracer import render_packed
    sph = random_spheres(200_000, seed=3, extent=500.0)
    ps = build_pallas_scene(sph)
    assert ps.sphT.shape[0] > 1024        # HBM + dynamic sweep engaged
    cam = camera((0., 0., 650.), (0., 0., 0.), (0., 1., 0.), 60.0, 1.0)
    img = np.asarray(render_pallas(ps, cam, 8, 8, max_depth=1,
                                   interpret=True))
    ref = np.asarray(render_packed(make_closest_hit(sph, "matmul"), sph,
                                   cam, 8, 8, max_depth=1, chunk=64))
    np.testing.assert_array_equal(img, ref)


def test_twophase_block_tiled_bit_identical():
    """Block-tiled phase-1 compaction reproduces the block-tiled
    single-phase render exactly."""
    from raytracers_tpu.render.pallas_kernel import render_pallas_twophase
    sc = scenes.rgbbox()
    ps = build_pallas_scene(sc.spheres)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    a = np.asarray(render_pallas(ps, cam, 52, 44, max_depth=50, tile=256,
                                 block=(16, 16), interpret=True))
    b = np.asarray(render_pallas_twophase(ps, cam, 52, 44, max_depth=50,
                                          phase1_depth=5, tile=256,
                                          block=(16, 16), interpret=True))
    np.testing.assert_array_equal(a, b)


def test_multiphase_schedule_matches_single():
    """A multi-boundary compaction schedule is a pure repartitioning of
    the bounce loop: images are bit-identical to the single-phase kernel
    for every schedule (each ray's pixel is produced by exactly the
    phase it terminates in and accumulated across the boundary sorts)."""
    import numpy as np

    from raytracers_tpu import camera, scenes
    from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                     render_pallas,
                                                     render_pallas_twophase)
    for name in ("rgbbox", "irreg"):
        sc = scenes.by_name(name)
        ps = build_pallas_scene(sc.spheres)
        cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
        a = np.asarray(render_pallas(ps, cam, 40, 40, max_depth=30,
                                     interpret=True))
        for sched in ((4, 8), (3, 3, 6)):
            b = np.asarray(render_pallas_twophase(
                ps, cam, 40, 40, max_depth=30, schedule=sched,
                interpret=True))
            np.testing.assert_array_equal(a, b)
        # coherent survivor packing is a pure reorder (the final ray-id
        # unpermute undoes it); occl_cont only changes winners within a
        # key-floor tie bucket — none at this scene/res (measured-off
        # experiment knobs, tools/ab_coherent.py)
        b = np.asarray(render_pallas_twophase(
            ps, cam, 40, 40, max_depth=30, schedule=(4, 8),
            interpret=True, coherent=True, occl_cont=True))
        np.testing.assert_array_equal(a, b)


def test_with_stats_bit_identical_and_counts():
    """The instrumented (emit_stats) kernel variant must not change the
    image, and its counters must be exact: with culling off, every tile
    tests all C*128 sphere rows each bounce, so slot_tests ==
    ray_bounces * 128 * C exactly (rgbbox C=4, no tail peel when the
    sweep is unculled... the peel still applies: 3*128+16=400)."""
    import jax.numpy as jnp

    from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                     render_pallas,
                                                     render_pallas_twophase)
    sc = scenes.rgbbox()
    ps = build_pallas_scene(sc.spheres)
    cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
    a = np.asarray(render_pallas(ps, cam, 32, 32, max_depth=4, tile=256,
                                 interpret=True))
    b, st = render_pallas(ps, cam, 32, 32, max_depth=4, tile=256,
                          interpret=True, with_stats=True)
    np.testing.assert_array_equal(a, np.asarray(b))
    # uncull comparison: force cull=False -> every bounce sweeps all
    # clusters (tail peeled at 16 rows: 3*128 + 16 = 400 slots)
    c, st0 = render_pallas(ps, cam, 32, 32, max_depth=4, tile=256,
                           interpret=True, with_stats=True, cull=False)
    np.testing.assert_array_equal(a, np.asarray(c))
    assert float(st0["slot_tests"]) == float(st0["ray_bounces"]) * 400
    # culled never exceeds dense
    assert float(st["slot_tests"]) <= float(st0["slot_tests"])
    # exact cull-row counter: unculled sweeps run no slab rows; the
    # culled single-block sweep runs exactly CR (= roundup(C/8)*8 = 8
    # for rgbbox) rows per bounce sweep per lane
    assert float(st0["cull_rows"]) == 0.0
    assert float(st["cull_rows"]) == float(st["ray_bounces"]) * 8

    # twophase stats: same image, per-phase counters sum to the total
    d = np.asarray(render_pallas_twophase(ps, cam, 32, 32, max_depth=30,
                                          schedule=(3, 6), tile=256,
                                          interpret=True))
    e, st2 = render_pallas_twophase(ps, cam, 32, 32, max_depth=30,
                                    schedule=(3, 6), tile=256,
                                    interpret=True, with_stats=True)
    np.testing.assert_array_equal(d, np.asarray(e))
    assert float(st2["slot_tests"]) == sum(
        float(x) for x in st2["phase_slot_tests"])
    assert len(st2["phase_slot_tests"]) == 3


def test_hbm_stream_with_stats():
    """emit_stats composes with the HBM-streamed dynamic sweep: same
    image, and the counters bound the executed work by the dense sweep
    (slots <= C*128 per executed ray-bounce)."""
    from raytracers_tpu.scenes import random_spheres
    sph = random_spheres(140_000, seed=9, extent=500.0)
    ps = build_pallas_scene(sph)
    assert ps.sphT.shape[0] > 1024        # HBM path engaged
    cam = camera((0., 0., 650.), (0., 0., 0.), (0., 1., 0.), 60.0, 1.0)
    img = np.asarray(render_pallas(ps, cam, 8, 8, max_depth=2, tile=64,
                                   block=(8, 8), interpret=True))
    img2, st = render_pallas(ps, cam, 8, 8, max_depth=2, tile=64,
                             block=(8, 8), interpret=True,
                             with_stats=True)
    np.testing.assert_array_equal(img, np.asarray(img2))
    C = ps.n_clusters
    assert 0 < float(st["slot_tests"]) <= float(st["ray_bounces"]) * C * 128


def test_cluster_width_64_bitexact():
    """leaf-64 clusters (build_pallas_scene cluster_width=64) reproduce
    the width-128 render bit-for-bit: the closest-hit winner is
    order-independent outside key-floor tie buckets, and these scenes
    hit none at these configs.  irreg at width 64 (C=157) additionally
    engages the CB=3 two-level cull path."""
    from raytracers_tpu.render.pallas_kernel import (build_pallas_scene,
                                                     render_pallas)
    for name, res, depth in [("rgbbox", 24, 4), ("irreg", 32, 6)]:
        sc = scenes.by_name(name)
        cam = camera(sc.look_from, sc.look_at, (0., 1., 0.), sc.fov, 1.0)
        ps128 = build_pallas_scene(sc.spheres)
        ps64 = build_pallas_scene(sc.spheres, cluster_width=64)
        assert ps64.sphT.shape[1] == 64
        assert ps64.order.shape[1] == 128          # slot encoding padded
        a = np.asarray(render_pallas(ps128, cam, res, res, max_depth=depth,
                                     tile=256, interpret=True))
        b = np.asarray(render_pallas(ps64, cam, res, res, max_depth=depth,
                                     tile=256, interpret=True))
        np.testing.assert_array_equal(a, b)


def test_count_sum_exact_at_scene_scale():
    """_count_sum must stay exact (to final-f32 rounding) at soup-scale
    totals: the naive int32 per-tile lane-sum overflowed on dense tiles
    (>2^31 slot-tests per tile at soup-1M d5) and silently reported
    0.45e9 of 133.6e9 — compare against an f64 oracle at e12 scale."""
    import numpy as np

    from raytracers_tpu.render.pallas_kernel import _count_sum
    rng = np.random.default_rng(0)
    x = rng.integers(0, 3_000_000, size=(489, 2048)).astype(np.float32)
    want = float(x.astype(np.float64).sum())        # ~1.5e12
    got = float(_count_sum(x))
    assert abs(got - want) / want < 3e-7, (got, want)
    # and small totals are bit-exact
    y = np.full((3, 8), 7.0, np.float32)
    assert float(_count_sum(y)) == 168.0
