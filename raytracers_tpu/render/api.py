"""Public rendering API: prepare_scene / render, the reference's entry-point
contract (futhark/ray.fut:239-247) in TPU-native form.

``prepare_scene`` builds the LBVH + camera once (the reference's
``prepared_scene`` opaque value); ``render`` consumes it.  Both are pure
functions of pytrees, so callers can ``jax.jit`` them (width/height/mode are
static).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

from ..bvh.lbvh import Bvh, build_bvh
from ..bvh.traverse import closest_hit_bvh
from ..geometry import MAX_DEPTH, Camera, Spheres, camera
from ..scenes import Scene
from . import bruteforce
from .tracer import render_colours, render_packed


class PreparedScene(NamedTuple):
    """BVH + camera, ready to render (cf. futhark ``prepared_scene``)."""
    spheres: Spheres      # original order (shading gathers by original index)
    bvh: Bvh | None       # None when built with with_bvh=False (pallas-only)
    cam: Camera
    pallas: object = None  # PallasScene when prepared with with_pallas=True


def prepare_scene(scene: Scene, height: int, width: int,
                  leaf_size: int = 8,
                  with_pallas: bool = False,
                  with_bvh: bool = True) -> PreparedScene:
    """Build acceleration + camera for a scene (futhark/ray.fut:241-244).

    vup=(0,1,0), aspect = w/h, per the reference.  ``with_pallas`` also
    builds the megakernel scene layout (TPU fast path); ``with_bvh=False``
    skips the deep traversal tree when only the megakernel will render
    (the megakernel needs just the Morton clustering — half the build).
    """
    from .pallas_kernel import build_pallas_scene

    cam = camera(scene.look_from, scene.look_at, (0.0, 1.0, 0.0), scene.fov,
                 width / height)
    return PreparedScene(
        spheres=scene.spheres,
        bvh=build_bvh(scene.spheres, leaf_size=leaf_size) if with_bvh
        else None,
        cam=cam,
        # front-to-back cluster order w.r.t. the camera: makes the
        # occlusion gate prune far clusters on primary bounces (see
        # build_pallas_scene docstring; irreg measured win)
        pallas=build_pallas_scene(scene.spheres,
                                  sort_origin=scene.look_from)
        if with_pallas else None)


def _oracle(prepared: PreparedScene, mode: str):
    if mode == "bvh":
        if prepared.bvh is None:
            raise ValueError("prepare_scene(..., with_bvh=True) required "
                             "for mode='bvh'")
        return functools.partial(closest_hit_bvh, prepared.bvh)
    if mode in ("brute", "brute_matmul"):
        formulation = "precise" if mode == "brute" else "matmul"
        return bruteforce.make_closest_hit(prepared.spheres, formulation)
    raise ValueError(f"unknown render mode: {mode}")


def pallas_config(C: int):
    """Measured-best megakernel config by scene class:
    (tile, block, schedule, sort_prefix).  See render() for the sweep
    provenance.  Round 4: the scene-scale class moved to tile 2048 —
    the round-2 Mosaic crash on the multi-block path is gone, and the
    instrumented counters showed plane at 23% VPU utilization at tile
    512 (per-tile cull rows + scalar gates dominated).  Final config
    2048/(8,256)/(2,3,6): 122.3 -> 82.8 ms across the tile, schedule,
    block-shape, and cull-rows sweeps; tile 4096 measured a loss."""
    if C > 128:
        # block-shape sweep (runtime block params, round 4): (8,256)
        # wide-shallow tiles suit the horizon view — 94.3 -> 84.7 ms;
        # schedule re-sweep at that shape: (2,3,6) 82.8 vs (2,4,8) 85.8
        return 2048, (8, 256), (2, 3, 6), (None, 0.25, 0.12)
    if C <= 16:
        return 2048, (64, 32), (3, 4, 8), (None, 0.5, 0.25)
    # irreg-class: (32,64) measured 41.3 vs 43.4 at (64,32) (round 4)
    return 2048, (32, 64), (3, 6), (None, 0.25)


def pallas_diff_config(C: int):
    """Measured-best FWD+BWD engine config by scene class:
    (tile, block, schedule, sort_prefix) for
    grad.pallas_diff.make_render_pallas_diff.  Differs from the render
    configs (pallas_config): each boundary costs the BACKWARD a gflat
    gather + a carry sort, so fwd+bwd optima prefer fewer boundaries
    than the forward-only optima (docs/PERF_NOTES.md round-3/5 sweeps).
    Round 5: irreg gets its own class — the round-4 bench ran irreg's
    fwd+bwd at rgbbox's config; the native (3, 6)/(32, 64) forward
    config measured faster end-to-end once the backward's chunked slot
    reduction was gated (same-session table in PERF_NOTES round 5)."""
    if C <= 16:
        return 2048, (64, 32), (3, 4, 8), (None, 0.5, 0.25)
    return 2048, (32, 64), (3, 6), (None, 0.25)


def render(prepared: PreparedScene, height: int, width: int,
           mode: str = "bvh", max_depth: int = MAX_DEPTH,
           chunk: int | None = None, interpret: bool = False,
           phase1_depth: int | None = None,
           schedule: tuple | None = None):
    """Render to the packed int32 image (h, w) (futhark/ray.fut:246-247).

    mode="pallas" uses the fused TPU megakernel (requires prepare_scene
    with_pallas=True); other modes use the XLA tracer.  ``schedule``
    (or legacy single-boundary ``phase1_depth``) overrides the measured
    per-scene-class default compaction schedule of deep pallas renders.
    """
    if mode == "pallas":
        from .pallas_kernel import render_pallas, render_pallas_twophase
        if prepared.pallas is None:
            raise ValueError("prepare_scene(..., with_pallas=True) required "
                             "for mode='pallas'")
        # Measured-best configs by scene class (tools/sweep_schedule.py,
        # tools/ab_twophase_cfg.py, v5e 1000x1000 d50):
        # * C <= 16 (rgbbox-class, dense sweeps): tile 2048/(64,32),
        #   schedule (3, 4, 8) — packed phase-2 tiles averaged ~32 further
        #   bounces (mirror traps); each boundary sheds the rays dead by
        #   its depth cap ((6,) 75.1 -> (6,8) 61.5 -> (4,8) 58.4 ->
        #   (3,4,8) 54.5 ms; neighbours (3,3,8)/(2,4,8)/(3,4,6) all lose,
        #   a fourth boundary (3,4,8,12) costs more than it compacts).
        # * 16 < C <= 128 (irreg-class, culled sweeps): same tiles,
        #   schedule (3, 6) (round-3 re-sweep at prefixed sorts: 40.8 ms
        #   vs 41.9 at the old (3, 8), (3, 7) 41.4 — shallow mean depth,
        #   small deep tail).
        # * C > 128 (scene-scale, multi-block sweeps): round 4 moved to
        #   tile 2048, (8,256) wide-shallow blocks, schedule (2, 3, 6)
        #   — the round-2 Mosaic crash on the tile-2048 multi-block
        #   path no longer reproduces, and the instrumented counters
        #   showed tile 512 running at 23% VPU utilization (per-tile
        #   cull rows + scalar gates).  plane-100k 122.3 -> 82.8 ms
        #   across the tile/schedule/block/cull-rows sweeps; tile 4096
        #   measured a loss (wider unions beat the fixed-cost halving).
        # Boundary sorts shrink geometrically with the schedule: boundary
        # k re-packs only the prefix the previous boundary packed
        # survivors into (sort_prefix; EXACT for any survival rate —
        # stragglers beyond the prefix just trace un-packed).  Fractions
        # upper-bound the measured survivor curves with slack (rgbbox
        # 45.5%/10.3% at d3/d7; irreg 4.3% at d3); measured: rgbbox
        # 47.3 -> 41.4 ms, irreg 46.8 -> 42.1, plane 128.5 -> 123.5.
        tile, block, default_sched, default_pref = pallas_config(
            prepared.pallas.n_clusters)
        if schedule is None:
            schedule = ((phase1_depth,) if phase1_depth is not None
                        else default_sched)
            sort_prefix = default_pref
        else:
            sort_prefix = None
        if max_depth >= 16 and sum(schedule) < max_depth:
            return render_pallas_twophase(
                prepared.pallas, prepared.cam, width, height,
                max_depth=max_depth, schedule=schedule,
                interpret=interpret, tile=tile, block=block,
                sort_prefix=sort_prefix)
        # shallow renders use the same class-tuned tile/block as deep ones
        return render_pallas(prepared.pallas, prepared.cam, width, height,
                             max_depth=max_depth, interpret=interpret,
                             tile=tile, block=block)
    return render_packed(_oracle(prepared, mode), prepared.spheres,
                         prepared.cam, width, height, max_depth, chunk)


def render_stats(prepared: PreparedScene, height: int, width: int,
                 max_depth: int = MAX_DEPTH, interpret: bool = False):
    """Exact executed-work counters for the DEFAULT pallas render config.

    Runs the instrumented kernel variant with the same tile/block/schedule
    /sort_prefix that ``render(mode='pallas')`` would pick, so the
    returned ``slot_tests``/``ray_bounces`` audit exactly what the
    production kernel executes (per-ray arithmetic is identical).  Used
    by bench.py's default-on device-utilization report."""
    from .pallas_kernel import render_pallas, render_pallas_twophase
    if prepared.pallas is None:
        raise ValueError("prepare_scene(..., with_pallas=True) required")
    tile, block, schedule, sort_prefix = pallas_config(
        prepared.pallas.n_clusters)
    if max_depth >= 16 and sum(schedule) < max_depth:
        _, stats = render_pallas_twophase(
            prepared.pallas, prepared.cam, width, height,
            max_depth=max_depth, schedule=schedule, interpret=interpret,
            tile=tile, block=block, sort_prefix=sort_prefix,
            with_stats=True)
        return stats
    _, stats = render_pallas(prepared.pallas, prepared.cam, width, height,
                             max_depth=max_depth, interpret=interpret,
                             tile=tile, block=block, with_stats=True)
    return stats


def render_float(prepared: PreparedScene, height: int, width: int,
                 mode: str = "bvh", max_depth: int = MAX_DEPTH,
                 chunk: int | None = None, interpret: bool = False):
    """Render to float colours (h, w, 3) — the differentiable output.

    mode="pallas" uses the megakernel's float-emitting record mode (for
    gradients through it use grad.pallas_diff.make_render_pallas_diff)."""
    if mode == "pallas":
        from .pallas_kernel import render_pallas_record
        if prepared.pallas is None:
            raise ValueError("prepare_scene(..., with_pallas=True) required "
                             "for mode='pallas'")
        colours, _ = render_pallas_record(
            prepared.pallas, prepared.cam, width, height,
            max_depth=max_depth, interpret=interpret)
        return colours
    return render_colours(_oracle(prepared, mode), prepared.spheres,
                          prepared.cam, width, height, max_depth, chunk)
