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


def render(prepared: PreparedScene, height: int, width: int,
           mode: str = "bvh", max_depth: int = MAX_DEPTH,
           chunk: int | None = None, interpret: bool = False,
           phase1_depth: int = 6):
    """Render to the packed int32 image (h, w) (futhark/ray.fut:246-247).

    mode="pallas" uses the fused TPU megakernel (requires prepare_scene
    with_pallas=True); other modes use the XLA tracer.  ``phase1_depth``
    tunes the survivor-compaction boundary of deep pallas renders
    (measured: 6 best for rgbbox at 93 ms vs 103 at 4; shallow-tile
    scenes like irreg gain ~2 ms at 3-4 — tools/sweep_irreg_p1.py).
    """
    if mode == "pallas":
        from .pallas_kernel import render_pallas, render_pallas_twophase
        if prepared.pallas is None:
            raise ValueError("prepare_scene(..., with_pallas=True) required "
                             "for mode='pallas'")
        # 2-D block tiles measured best (1.7x on irreg, neutral on rgbbox);
        # deep renders use survivor compaction: a (32,16) tile's max bounce
        # depth is ~21 while the mean ray needs ~4, so packing the ~15% of
        # rays still alive after 6 bounces into dense tiles nearly halves
        # the wall time (rgbbox 164 -> 93 ms, irreg 77 -> 73 ms measured).
        # tile=2048/(64,32) beats 512/(32,16) by ~12% on both scenes
        # (phase 1 is depth-capped, so bigger tiles amortise per-tile
        # fixed costs with bounded inflation; tools/ab_twophase_cfg.py:
        # rgbbox 87.5 -> 75.6 ms, irreg 58.2 -> 50.2 ms; 4096 loses on
        # irreg).
        if max_depth >= 16:
            return render_pallas_twophase(
                prepared.pallas, prepared.cam, width, height,
                max_depth=max_depth, phase1_depth=phase1_depth,
                interpret=interpret, tile=2048, block=(64, 32))
        return render_pallas(prepared.pallas, prepared.cam, width, height,
                             max_depth=max_depth, interpret=interpret,
                             block=(32, 16))
    return render_packed(_oracle(prepared, mode), prepared.spheres,
                         prepared.cam, width, height, max_depth, chunk)


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
