"""Multi-chip distribution: rays sharded over a device mesh, scene replicated.

The reference suite is single-node shared-memory only (SURVEY.md §2.4); the
TPU-native scaling story replaces thread pools with a 1-D ``jax.sharding``
mesh over axis ``'rays'``:

* every device traces its contiguous slice of the ray batch
  (``shard_map`` with ``P('rays')`` on ray arrays),
* scene + BVH are replicated (``P()``) — they are small and read-only,
* no cross-device traffic during rendering (rays are independent); the only
  collectives are gradient ``psum``s in the inverse-rendering step
  (grad/inverse.py) riding ICI.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.devices()`` then spans all hosts and the same code shards globally.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import MAX_DEPTH
from ..image import colour_to_pixel
from ..render.api import PreparedScene, _oracle
from ..render.tracer import primary_rays, trace


def ray_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis 'rays'."""
    import numpy as np
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("rays",))


def _pad_to(x, r):
    """Pad axis 0 to r rows by cycling the input (padding rays are traced
    and discarded).  Tiling handles r > 2*len(x) — tiny-image many-device
    calls (R < n_devices - R) would otherwise silently mis-shape."""
    n = x.shape[0]
    if n == r:
        return x
    reps = -(-r // n)
    return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:r]


def trace_sharded(prepared: PreparedScene, origins, dirs, mesh: Mesh,
                  mode: str = "bvh", max_depth: int = MAX_DEPTH):
    """Trace a ray batch sharded over mesh axis 'rays' -> colours (R, 3)."""
    n_dev = mesh.devices.size
    R = origins.shape[0]
    Rp = -(-R // n_dev) * n_dev
    origins = _pad_to(origins, Rp)
    dirs = _pad_to(dirs, Rp)

    oracle_src = prepared.bvh if mode == "bvh" else prepared.spheres

    def shard_fn(o, d, prep):
        ch = _oracle(prep, mode)
        return trace(ch, prep.spheres, o, d, max_depth)

    rep = jax.tree.map(lambda _: P(), prepared)
    # check_vma stays ON: all loop/scan carries in the tracer and the BVH
    # traversal are derived from the sharded ray arrays, so they are
    # 'rays'-varying from iteration 0 and the checker is satisfied.
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("rays"), P("rays"), rep),
                       out_specs=P("rays"))
    colours = fn(origins, dirs, prepared)
    del oracle_src
    return colours[:R]


def render_pallas_sharded(scene, cam, height: int, width: int,
                          mesh: Mesh | None = None,
                          max_depth: int = MAX_DEPTH,
                          tile: int | None = None,
                          block: tuple | None = None,
                          schedule: tuple | None = None,
                          sort_prefix: tuple | None = None,
                          interpret: bool = False):
    """Sharded megakernel render: each device renders a horizontal slab
    of the image (its share of the Pallas tile grid); scene + BVH tables
    replicated; zero collectives (rays are independent).  Bit-identical
    to the single-device render: the slab boundary falls on block-tile
    rows, so every pixel sees the same (i, j) -> ray -> tile math.

    ``scene`` is a PallasScene (render.pallas_kernel).  The per-shard row
    offset is a runtime parameter, so one compiled kernel serves every
    shard count.
    """
    from ..render.pallas_kernel import render_pallas, render_pallas_twophase

    mesh = mesh if mesh is not None else ray_mesh()
    n = mesh.devices.size

    # same measured per-scene-class defaults as render/api.py (tile
    # grouping does not change per-ray arithmetic, so any choice stays
    # bit-identical; these are the fast ones).  Small images fall back
    # to (32,16)/512: a 64-row block would pad every device's slab to
    # 64 rows and burn the saving on padding lanes.
    from ..render.api import pallas_config

    C = scene.n_clusters
    dtile, dblock, dsched, dpref = pallas_config(C)
    if tile is None or block is None:
        if height < n * dblock[0] or width < dblock[1]:
            # small images: the class-default block would pad every
            # device's slab beyond its real rows
            tile, block = 512, (32, 16)
        else:
            tile, block = dtile, dblock
    if schedule is None:
        # same measured-best schedules + boundary sort prefixes as the
        # unsharded api.render defaults (each shard's slab sorts
        # independently; prefixes are exact for any survival rate)
        schedule = dsched
        if sort_prefix is None:
            sort_prefix = dpref
    bh = block[0] if block is not None else 1
    rows_per = -(-height // (n * bh)) * bh       # slab height, block-aligned
    hp = rows_per * n
    offsets = (jnp.arange(n, dtype=jnp.float32) * rows_per).reshape(n, 1)

    def shard_fn(offs, scene, cam):
        if max_depth >= 16 and sum(schedule) < max_depth:
            # same survivor-compaction policy as the unsharded render():
            # each device sorts its own slab (per-ray arithmetic does not
            # depend on tile grouping, so this stays bit-identical)
            slab = render_pallas_twophase(
                scene, cam, width, rows_per, max_depth=max_depth,
                schedule=schedule, tile=tile, block=block,
                interpret=interpret, row0=offs[0, 0], total_height=height,
                sort_prefix=sort_prefix)
        else:
            slab = render_pallas(scene, cam, width, rows_per,
                                 max_depth=max_depth, tile=tile, block=block,
                                 interpret=interpret, row0=offs[0, 0],
                                 total_height=height)
        return slab.reshape(1, rows_per, width)

    rep_scene = jax.tree.map(lambda _: P(), scene)
    rep_cam = jax.tree.map(lambda _: P(), cam)
    # check_vma=False here (unlike the tracer path above): pallas_call
    # does not propagate varying-manual-axes metadata, so the checker
    # cannot see that the kernel output is 'rays'-varying via its offs
    # input; correctness is pinned by test_sharding's bit-identity test.
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("rays"), rep_scene, rep_cam),
                       out_specs=P("rays"), check_vma=False)
    img = fn(offsets, scene, cam).reshape(hp, width)
    return img[:height]


def render_sharded(prepared: PreparedScene, height: int, width: int,
                   mesh: Mesh | None = None, mode: str = "bvh",
                   max_depth: int = MAX_DEPTH, interpret: bool = False):
    """Full-image sharded render -> packed int32 (h, w)."""
    mesh = mesh if mesh is not None else ray_mesh()
    if mode == "pallas":
        if prepared.pallas is None:
            raise ValueError("prepare_scene(..., with_pallas=True) required "
                             "for mode='pallas'")
        return render_pallas_sharded(prepared.pallas, prepared.cam, height,
                                     width, mesh, max_depth,
                                     interpret=interpret)
    origins, dirs = primary_rays(prepared.cam, width, height)
    colours = trace_sharded(prepared, origins, dirs, mesh, mode, max_depth)
    return colour_to_pixel(colours.reshape(height, width, 3))
