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
    pad = r - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, x[:pad]], axis=0)


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
    # check_vma=False: the bounce while_loop's carry starts as replicated
    # zeros and becomes rays-varying inside the body; the strict varying-
    # manual-axes check rejects that even though it is semantically fine.
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("rays"), P("rays"), rep),
                       out_specs=P("rays"), check_vma=False)
    colours = fn(origins, dirs, prepared)
    del oracle_src
    return colours[:R]


def render_sharded(prepared: PreparedScene, height: int, width: int,
                   mesh: Mesh | None = None, mode: str = "bvh",
                   max_depth: int = MAX_DEPTH):
    """Full-image sharded render -> packed int32 (h, w)."""
    mesh = mesh if mesh is not None else ray_mesh()
    origins, dirs = primary_rays(prepared.cam, width, height)
    colours = trace_sharded(prepared, origins, dirs, mesh, mode, max_depth)
    return colour_to_pixel(colours.reshape(height, width, 3))
