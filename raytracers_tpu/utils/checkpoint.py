"""Checkpoint / resume (SURVEY.md §5).

The reference's only 'checkpoint' is the reusable ``prepared_scene`` value
(futhark/ray.fut:239-247).  Here:

* BVH caching — a built LBVH can be saved/loaded as an .npz so large scenes
  skip the Morton-sort + tree build on reload,
* inverse-rendering checkpoints — sphere parameters AND the full optimizer
  state (e.g. Adam moments) round-trip through .npz, so an interrupted fit
  resumes exactly where it left off (``save_train_state`` /
  ``load_train_state``; see tests/test_utils.py for the resume guarantee).
"""
from __future__ import annotations

import os

import jax
import numpy as np
import jax.numpy as jnp

from ..bvh.lbvh import Bvh
from ..geometry import Spheres

_BVH_FIELDS = ("order", "left", "right", "node_min", "node_max", "leaf_min",
               "leaf_max", "skip", "parent", "leaf_parent")


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' when missing; normalise so save(p)/load(p)
    round-trips for suffix-less paths too."""
    return path if path.endswith(".npz") else path + ".npz"


def save_bvh(path: str, bvh: Bvh) -> None:
    arrays = {f: np.asarray(getattr(bvh, f)) for f in _BVH_FIELDS}
    arrays["sph_center"] = np.asarray(bvh.spheres.center)
    arrays["sph_radius"] = np.asarray(bvh.spheres.radius)
    arrays["sph_color"] = np.asarray(bvh.spheres.color)
    np.savez_compressed(_npz_path(path), **arrays)


def load_bvh(path: str) -> Bvh:
    z = np.load(_npz_path(path))
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
    np.savez_compressed(_npz_path(path), **arrays)


def load_spheres(path: str) -> tuple[Spheres, int, dict]:
    z = np.load(_npz_path(path))
    spheres = Spheres(jnp.asarray(z["center"]), jnp.asarray(z["radius"]),
                      jnp.asarray(z["color"]))
    extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return spheres, int(z["step"]), extra


def save_train_state(path: str, state, step: int = 0,
                     loss: float = float("nan")) -> None:
    """Checkpoint a full training state pytree (e.g. grad.inverse
    InverseState = spheres + optax opt_state) by flattened leaves."""
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["step"] = np.asarray(step)
    arrays["loss"] = np.asarray(loss, np.float64)
    np.savez_compressed(_npz_path(path), **arrays)


def load_train_state(path: str, like) -> tuple[object, int, float]:
    """Restore a training state saved by ``save_train_state``.

    ``like`` is a template pytree with the target structure (e.g. a freshly
    initialised InverseState); leaf order must match the saved one.
    Returns (state, step, loss-at-save — nan for old checkpoints)."""
    z = np.load(_npz_path(path))
    treedef = jax.tree.structure(like)
    n = treedef.num_leaves
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    loss = float(z["loss"]) if "loss" in z.files else float("nan")
    return jax.tree.unflatten(treedef, leaves), int(z["step"]), loss


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> str | None:
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory)
             if f.startswith(prefix) and f.endswith(".npz")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix):-4]))
    return os.path.join(directory, cands[-1])
