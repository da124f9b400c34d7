"""L4 scene generators: rgbbox, irreg, and a random scene for scale benches.

Semantics follow futhark/ray.fut:176-237 (the blessed reference; sphere order
matters only for bitwise traversal parity, so we reproduce it exactly:
leftwall ++ midwall ++ rightwall ++ bottom).  Midwall colour is yellow
(1,1,0), matching Futhark/Rust — the Haskell/Scala green variant is a known
reference discrepancy (SURVEY.md §2.3).

Scenes are built with numpy on the host (they are tiny and built once), and
returned as device-ready SoA Spheres.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .geometry import Spheres


class Scene(NamedTuple):
    look_from: tuple
    look_at: tuple
    fov: float
    spheres: Spheres


def _grid(n: int, k: float):
    """Coordinates -k/2 + (k/n)*i for i in 0..n-1 (futhark/ray.fut:183-215)."""
    i = np.arange(n, dtype=np.float32)
    return (np.float32(-k / 2.0) + np.float32(k / n) * i).astype(np.float32)


def _wall(fixed_axis: int, fixed_val: float, n: int, k: float, color,
          axes: tuple) -> np.ndarray:
    """n*n sphere grid on a wall; `axes` gives the (outer, inner) varying axes
    to reproduce the reference's tabulate_2d iteration order."""
    g = _grid(n, k)
    outer, inner = axes
    centers = np.zeros((n, n, 3), dtype=np.float32)
    centers[..., fixed_axis] = fixed_val
    centers[..., outer] = g[:, None]
    centers[..., inner] = g[None, :]
    return centers.reshape(n * n, 3)


def rgbbox() -> Scene:
    """400-sphere RGB box scene (futhark/ray.fut:176-221)."""
    n, k = 10, 60.0
    r = np.float32(k / (n * 2.0))
    # leftwall: x=-k/2, (y outer, z inner), red
    left = _wall(0, -k / 2, n, k, None, (1, 2))
    # midwall: z=-k/2, (x outer, y inner), yellow
    mid = _wall(2, -k / 2, n, k, None, (0, 1))
    # rightwall: x=+k/2, (y outer, z inner), blue
    right = _wall(0, +k / 2, n, k, None, (1, 2))
    # bottom: y=-k/2, (x outer, z inner), white
    bottom = _wall(1, -k / 2, n, k, None, (0, 2))
    centers = np.concatenate([left, mid, right, bottom], axis=0)
    colors = np.concatenate([
        np.tile(np.float32([1, 0, 0]), (n * n, 1)),
        np.tile(np.float32([1, 1, 0]), (n * n, 1)),
        np.tile(np.float32([0, 0, 1]), (n * n, 1)),
        np.tile(np.float32([1, 1, 1]), (n * n, 1)),
    ], axis=0)
    radii = np.full((4 * n * n,), r, dtype=np.float32)
    spheres = Spheres(jnp.asarray(centers), jnp.asarray(radii),
                      jnp.asarray(colors))
    return Scene(look_from=(0.0, 30.0, 30.0), look_at=(0.0, -1.0, -1.0),
                 fov=75.0, spheres=spheres)


def irreg() -> Scene:
    """10,000-sphere load-imbalanced plane scene (futhark/ray.fut:223-237)."""
    n, k = 100, 600.0
    r = np.float32(k / (n * 2.0))
    bottom = _wall(1, 0.0, n, k, None, (0, 2))
    colors = np.ones((n * n, 3), dtype=np.float32)
    radii = np.full((n * n,), r, dtype=np.float32)
    spheres = Spheres(jnp.asarray(bottom), jnp.asarray(radii),
                      jnp.asarray(colors))
    return Scene(look_from=(0.0, 12.0, 30.0), look_at=(0.0, 10.0, -1.0),
                 fov=75.0, spheres=spheres)


def plane(n_side: int = 316) -> Scene:
    """irreg's structure at scale: an n_side x n_side sphere plane (default
    ~100k spheres), radius = spacing/2 so surface coverage matches irreg.
    A SURFACE scene — the fair scale test for hierarchy culling (a random
    volumetric soup of mirrors has no ray coherence for ANY tracer)."""
    n, k = n_side, 600.0
    r = np.float32(k / (n * 2.0))
    bottom = _wall(1, 0.0, n, k, None, (0, 2))
    colors = np.ones((n * n, 3), dtype=np.float32)
    radii = np.full((n * n,), r, dtype=np.float32)
    spheres = Spheres(jnp.asarray(bottom), jnp.asarray(radii),
                      jnp.asarray(colors))
    return Scene(look_from=(0.0, 12.0, 30.0), look_at=(0.0, 10.0, -1.0),
                 fov=75.0, spheres=spheres)


def random_spheres(n: int, seed: int = 0, extent: float = 1000.0) -> Spheres:
    """Uniform random sphere soup for LBVH-construction benchmarks at scale
    (BASELINE.json configs[3]: 1M spheres).  Not part of the reference."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent / 2, extent / 2, size=(n, 3)).astype(np.float32)
    radii = rng.uniform(0.5, 3.0, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    return Spheres(jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(colors))


SCENES = {"rgbbox": rgbbox, "irreg": irreg, "plane": plane}


def by_name(name: str) -> Scene:
    if name not in SCENES:
        raise ValueError(f"Unknown scene: {name}. Known scenes: "
                         + ", ".join(sorted(SCENES)))
    return SCENES[name]()
