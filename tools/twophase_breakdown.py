#!/usr/bin/env python
"""Decompose the twophase render: phase-1 kernel / boundary sort /
phase-2 kernel / unpermute.  Each stage timed cumulatively (jit of the
prefix) so dispatch overheads cancel in the differences.

Run ON TPU: python tools/twophase_breakdown.py [scene]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu import scenes
from raytracers_tpu.render.api import prepare_scene
from raytracers_tpu.render import pallas_kernel as pk
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
W = H = 1000
TILE, BLOCK, P1 = 2048, (64, 32), 6


def stages(scene, cam, stop):
    """Replicates render_pallas_twophase up to `stop` stages."""
    bh, bw = BLOCK
    wp = -(-W // bw) * bw
    hp = -(-H // bh) * bh
    num_tiles = (wp // bw) * (hp // bh)
    Rp = num_tiles * TILE
    row0 = jnp.zeros((1,), jnp.float32)
    mid = jnp.concatenate([row0, jnp.zeros((3,), jnp.float32)])
    hw_params = jnp.asarray([W, H, 1.0 / W, 1.0 / H], jnp.float32)
    params = jnp.concatenate([
        cam.llc, cam.horizontal, cam.vertical, cam.origin, mid, hw_params,
        jnp.asarray([wp // bw, bw, bh, 1.0 / (wp // bw)], jnp.float32),
    ]).astype(jnp.float32)
    state = pk._call_megakernel(scene, params, num_tiles, TILE, P1,
                                True, scene.n_clusters > 1, False,
                                gen_rays=True, emit_state=True,
                                block_tiled=True)
    if stop == "phase1":
        return sum(jnp.sum(s[:, :, ::517]) for s in state)
    flat = [s.reshape(Rp) for s in state]
    active = flat[-1]
    pr = (255.99 * flat[9]).astype(jnp.int32)
    pg = (255.99 * flat[10]).astype(jnp.int32)
    pb = (255.99 * flat[11]).astype(jnp.int32)
    base_pix = (pr << 16) | (pg << 8) | pb
    dead = (active <= 0.0).astype(jnp.int32)
    key = (dead << 30) | jnp.arange(Rp, dtype=jnp.int32)
    sorted_all = jax.lax.sort([key] + flat[:9], dimension=0, num_keys=1)
    if stop == "sort":
        return sum(jnp.sum(s[::517]) for s in sorted_all) + jnp.sum(
            base_pix[::517])
    key_sorted = sorted_all[0]
    active_sorted = (key_sorted >> 30) == 0
    idx_sorted = key_sorted & ((1 << 30) - 1)
    nt2 = Rp // TILE
    zeros = jnp.zeros((nt2, 1, TILE), jnp.float32)
    packed_state = ([s.reshape(nt2, 1, TILE) for s in sorted_all[1:10]]
                    + [zeros, zeros, zeros,
                       active_sorted.astype(jnp.float32).reshape(
                           nt2, 1, TILE)])
    out = pk._call_megakernel(scene, params, nt2, TILE, 50 - P1,
                              True, scene.n_clusters > 1, False,
                              gen_rays=False, emit_state=False,
                              state_in=packed_state)
    if stop == "phase2":
        return jnp.sum(out[:, :, ::517]) + jnp.sum(idx_sorted[::517])
    out_sorted = out.reshape(Rp)
    _, act_b, out_b = jax.lax.sort(
        [idx_sorted, active_sorted.astype(jnp.int32), out_sorted],
        dimension=0, num_keys=1)
    unsorted = jnp.where(act_b == 1, out_b, base_pix)
    return jnp.sum(unsorted[::517])


def main(name):
    sc = scenes.by_name(name)
    prep = prepare_scene(sc, H, W, with_pallas=True, with_bvh=False)
    cams = {k: prep.cam._replace(origin=prep.cam.origin
                                 + jnp.float32(k) * 1e-30)
            for k in range(-10, 10)}
    prev = 0.0
    for stop in ("phase1", "sort", "phase2", "full"):
        fn = jax.jit(lambda cam, stop=stop: stages(prep.pallas, cam, stop))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(prep.cam))
        comp = time.perf_counter() - t0
        ms = bench_salted(fn, lambda k: (cams[k],), warmup=2, runs=8) * 1e3
        print(f"{name} up to {stop:7s}: {ms:7.2f} ms (+{ms-prev:6.2f}) "
              f"[compile {comp:.0f}s]", flush=True)
        prev = ms


if __name__ == "__main__":
    names = sys.argv[1:] or ["rgbbox", "irreg"]
    for n in names:
        main(n)
