"""Morton (Z-order) codes for LBVH construction.

30-bit 3D Morton codes on a 1024³ grid, exactly the reference quantization
(futhark/bvh.fut:8-22): each coordinate is normalised to [0,1], scaled by
1024, clamped to [0,1023], truncated, and bit-interleaved x:y:z from the
high bit (code = xx*4 + yy*2 + zz).

All ops are uint32 bit arithmetic on (N,) lanes — pure VPU work.
"""
from __future__ import annotations

import jax.numpy as jnp


def expand_bits(v):
    """Spread the low 10 bits of each lane out to every 3rd bit
    (futhark/bvh.fut:8-13, the standard magic-number interleave)."""
    v = jnp.asarray(v, jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(p):
    """(…,3) coordinates already normalised to [0,1] -> (…,) uint32 codes."""
    q = jnp.clip(p * 1024.0, 0.0, 1023.0)
    xx = expand_bits(q[..., 0].astype(jnp.uint32))
    yy = expand_bits(q[..., 1].astype(jnp.uint32))
    zz = expand_bits(q[..., 2].astype(jnp.uint32))
    return xx * 4 + yy * 2 + zz


def normalise_centres(centres):
    """Min/max-normalise (N,3) points to [0,1] per axis (futhark/bvh.fut:31-40).

    Degenerate axes (max == min, e.g. the irreg scene's constant y) map to 0
    rather than 0/0=NaN; the reference relies on NaN→0 u32 conversion for the
    same net effect.
    """
    lo = jnp.min(centres, axis=0)
    hi = jnp.max(centres, axis=0)
    span = hi - lo
    return jnp.where(span > 0, (centres - lo) / jnp.where(span > 0, span, 1.0),
                     0.0)


def morton_codes(centres):
    """(N,3) raw centre coordinates -> (N,) uint32 Morton codes."""
    return morton3d(normalise_centres(centres))
