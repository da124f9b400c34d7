"""Soft-visibility differentiable rendering: silhouette-aware gradients.

The path-replay gradient (diff_render.py / pallas_diff.py) is exact for
all continuous shading terms but blind to visibility motion: moving a
sphere's silhouette across a pixel is a step discontinuity, so pure
CENTER recovery stalls (grad/inverse.py's documented limitation; VERDICT
round-1 item 4).

This module adds the missing boundary term with a SoftRas-style
reparameterization (Liu et al. 2019, "Soft Rasterizer", adapted from
triangles to sphere ray tracing):

* per (ray, sphere) the quadratic's margin  m = disc / a = r² − d⊥²
  (d⊥ = ray-to-center distance) is a smooth signed silhouette distance:
  m > 0 inside the silhouette, < 0 outside;
* hard visibility  [m > 0]  becomes  sigmoid(m / (sigma · r²)) — the
  sigma-width band around the silhouette carries nonzero d(pixel)/d(center);
* the hard closest-hit argmin becomes a depth softmin: colours aggregate
  with weights  w_i ∝ vis_i · exp(−t_i / gamma), plus a background term.

As sigma, gamma → 0 this converges to the hard depth-1 render.  The
optimiser story: soft gradients move CENTERS (and radii) into place;
the hard path-replay then refines colour/radius detail (recover_soft
anneals sigma across steps).  All-pairs (R, N) arrays — sized for
inverse problems, not for the forward benchmark path.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..geometry import Camera, Spheres, sky_colour
from ..render.tracer import primary_rays


def soft_render(spheres: Spheres, origins, dirs, sigma: float = 3e-2,
                gamma: float = 2e-2):
    """Soft depth-1 render -> colours (R, 3), smooth in all sphere params.

    ``sigma``: silhouette softness (relative to r², dimensionless).
    ``gamma``: depth-aggregation temperature (relative to scene scale).
    """
    o = origins[:, None, :]                     # (R, 1, 3)
    d = dirs[:, None, :]
    c = spheres.center[None, :, :]              # (1, N, 3)
    r = spheres.radius[None, :]                 # (1, N)

    oc = o - c                                  # (R, N, 3)
    a = jnp.sum(dirs * dirs, axis=-1)[:, None]  # (R, 1)
    b = jnp.sum(oc * d, axis=-1)                # (R, N)
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b * b - a * cc
    m = disc / a                                # r² − d⊥²  (signed margin)

    vis = jax.nn.sigmoid(m / (sigma * (r * r + 1e-8)))
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    t = (-b - sq) / a                           # near root (smoothed)
    # behind-the-camera spheres must not contribute
    front = jax.nn.sigmoid(t / (gamma + 1e-8))
    # irrelevant spheres must not claim the softmax NORMALIZER: (a) a
    # behind-camera sphere's t clamps to ~0, (b) a MISSED sphere's near
    # root degenerates to its perpendicular-foot distance (sq ~ 0),
    # often closer than the true hit.  Either way the nearest-logit slot
    # goes to a sphere whose weight vis*front is ~0, every real
    # candidate's exp(logit - max) underflows, and hit rays collapse to
    # the epsilon (all-black, near-NaN quotient VJP) — any camera inside
    # the scene bounds (rgbbox) triggered it.  Gate the softmin to
    # front-facing spheres within the silhouette band's support
    # (vis < ~2e-9 beyond 20 sigmas — their weight is zero regardless,
    # so the where() boundary is gradient-invisible).
    relevant = (t > 0.0) & (m > -20.0 * sigma * (r * r + 1e-8))
    t_safe = jnp.where(relevant, t, jnp.float32(1e7))

    scale = jnp.max(jnp.abs(spheres.center)) + 1.0
    logits = -t_safe / (gamma * scale)
    w = vis * front * jnp.exp(logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True)))
    # background weight = transparency: the product of (1 - vis) over all
    # spheres (SoftRas-style).  The earlier depth-based form
    # exp(min(logits) - max(logits)) underflows to exact 0 whenever the
    # scene's depth SPREAD exceeds ~87 temperatures (rgbbox: t in
    # ~30-90 at temperature 0.62) — sky pixels went black and the
    # 1e-20 denominator's square underflowed f32 to 0, NaN-ing the
    # whole VJP.  Transparency is scale-free: miss rays (all vis ~ 0)
    # get w_bg ~ 1 -> sky; solid hits get w_bg ~ 0.  As sigma -> 0 it
    # converges to the same hard visibility.
    w_bg = jnp.prod(1.0 - vis * front, axis=1, keepdims=True)
    # epsilon: guards 0/0 for degenerate all-zero weights; 1e-12 (not
    # 1e-20) so denom**2 in the quotient-rule VJP stays normal in f32
    denom = jnp.sum(w, axis=1, keepdims=True) + w_bg + 1e-12
    sky = sky_colour(dirs)                      # (R, 3)
    colours = (w[..., None] * spheres.color[None, :, :]).sum(axis=1)
    return (colours + w_bg * sky) / denom


def soft_render_image(spheres: Spheres, cam: Camera, width: int,
                      height: int, sigma: float = 3e-2,
                      gamma: float = 2e-2):
    o, d = primary_rays(cam, width, height)
    return soft_render(spheres, o, d, sigma, gamma).reshape(
        height, width, 3)


def recover_soft(target_image, cam: Camera, init_spheres: Spheres,
                 steps: int = 300, lr: float = 5e-2,
                 sigma0: float = 1e-1, sigma1: float = 1e-2,
                 gamma: float = 2e-2,
                 trainable: Spheres | None = None,
                 callback: Callable | None = None) -> Spheres:
    """Fit sphere parameters — INCLUDING CENTERS — to a target image by
    annealed soft-visibility gradient descent.

    sigma anneals geometrically sigma0 -> sigma1: wide bands early give
    long-range silhouette gradients; narrow bands late sharpen geometry.
    """
    h, w = target_image.shape[:2]
    target = jnp.asarray(target_image, jnp.float32)
    opt = optax.adam(lr)
    state = opt.init(init_spheres)
    spheres = init_spheres

    decay = (sigma1 / sigma0) ** (1.0 / max(steps - 1, 1))

    @jax.jit
    def step(spheres, state, sigma):
        def loss_fn(sph):
            img = soft_render_image(sph, cam, w, h, sigma, gamma)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(spheres)
        if trainable is not None:
            grads = jax.tree.map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable)
        updates, state = opt.update(grads, state, spheres)
        spheres = optax.apply_updates(spheres, updates)
        spheres = spheres._replace(
            radius=jnp.maximum(spheres.radius, 1e-2),
            color=jnp.clip(spheres.color, 0.0, 1.0))
        return spheres, state, loss

    sigma = sigma0
    for i in range(steps):
        spheres, state, loss = step(spheres, state, jnp.float32(sigma))
        sigma *= decay
        if callback is not None:
            callback(i, float(loss), spheres)
    return spheres
