#!/usr/bin/env python
"""Size the MXU-quadratic visit: replace the per-visit VPU oc/b/c2
elementwise chain (14 of ~30 visit ops) with one fused (2*rows, 16) @
(16, T) MXU dot over per-ray features.

b  = o.d - c.d           (row [  -cx -cy -cz  0 0 0  1 0 ...] . F)
c2 = |o|^2 - 2c.o + |c|^2 - r^2
     (row [0 0 0  -2cx -2cy -2cz  0 1  |c|^2-r^2 ...] . F)
F  = [dx dy dz ox oy oz o.d |o|^2 1 0...]   per-ray (16, T)

The dot is bf16 single-pass here (sizing only; exact variants would
3-split the G side for ~3x the MXU time, still tiny).  Run ON TPU.
"""
import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from raytracers_tpu.utils.timing import bench_salted  # noqa: E402

CLOCK_GHZ = 0.94
T = 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _min_rows(x, rows):
    m = x
    s = rows // 2
    while s >= 8:
        m = jnp.minimum(m[:s, :], m[s:2 * s, :])
        s //= 2
    return jnp.min(m, axis=0, keepdims=True)


def visit_kernel(x_ref, sphT_ref, sph8_ref, g_ref, o_ref, *, iters, rows,
                 mode, splits):
    salt = x_ref[0, 0]
    lid = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(jnp.float32)
    ox = lid * 1e-3 + salt
    oy = lid * 2e-3
    oz = jnp.full((1, T), 30.0)
    dx = lid * 1e-4 + 0.1
    dy = lid * -1e-4 + 0.2
    dz = jnp.full((1, T), -1.0)
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    eps = jnp.float32(0.1)
    BIGF = jnp.float32(1e9)
    key_mask = ~jnp.int32(rows - 1)

    if mode == "mxuquad":
        # per-bounce feature build (amortised over visits in the real
        # kernel; charged per-iteration here = worst case)
        odot = ox * dx + oy * dy + oz * dz
        o2 = ox * ox + oy * oy + oz * oz
        one = jnp.ones((1, T), jnp.float32)
        F = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, odot, o2, one] +
            [jnp.zeros((1, T), jnp.float32)] * 7, axis=0)     # (16, T)
        Fb = F.astype(jnp.bfloat16)

    def visit(c, carry):
        krun, pay = carry
        if mode == "mxuquad":
            G = g_ref[pl.ds(0, 1), :, :].reshape(2 * rows * splits, 16)
            bc = jax.lax.dot_general(
                G.astype(jnp.bfloat16), Fb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (2*rows*s, T)
            if splits > 1:
                bc = sum(bc[i * 2 * rows:(i + 1) * 2 * rows]
                         for i in range(splits))
            b_ = bc[:rows] + salt * jnp.float32(c) * 1e-20
            c_ = bc[rows:2 * rows]
        else:
            blkT = sphT_ref[pl.ds(0, 1), :, :].reshape(rows, 8)
            sx = blkT[:, 0:1] + (salt * jnp.float32(c))
            sy = blkT[:, 1:2]
            sz = blkT[:, 2:3]
            r2 = blkT[:, 7:8]
            ocx = ox - sx
            ocy = oy - sy
            ocz = oz - sz
            b_ = ocx * dx + ocy * dy + ocz * dz
            c_ = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b_ * b_ - a * c_
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        t0 = (-b_ - sq) * inv_a
        t1 = (-b_ + sq) * inv_a
        t = jnp.where(t0 > eps, t0, t1)
        tv = jnp.where(pos & (t > eps), t, BIGF)
        key = ((jax.lax.bitcast_convert_type(tv, jnp.int32) & key_mask)
               | lane_col)
        kmin = _min_rows(key, rows)
        imp_b = kmin < krun
        impf = imp_b.astype(jnp.float32)
        onehot = (key == kmin).astype(jnp.float32) * impf
        blk8 = sph8_ref[pl.ds(0, 1), :, :].reshape(8, rows)
        pay_c = jax.lax.dot_general(
            blk8, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        pay = pay * (1.0 - impf) + pay_c
        krun = jnp.minimum(krun, kmin)
        return krun, pay

    krun = jnp.full((1, T), jnp.int32(0x7F000000))
    pay = jnp.zeros((8, T), jnp.float32)
    krun, pay = jax.lax.fori_loop(0, iters, visit, (krun, pay))
    o_ref[0, :, :] = pay + krun.astype(jnp.float32)


def bench_visit(rows, mode, splits=1, iters=256, grid=16):
    f = pl.pallas_call(
        functools.partial(visit_kernel, iters=iters, rows=rows, mode=mode,
                          splits=splits),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, rows, 8), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, rows), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 2 * rows * splits, 16),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, T), jnp.float32),
    )
    sphT = jnp.ones((1, rows, 8), jnp.float32) * 0.1
    sph8 = jnp.ones((1, 8, rows), jnp.float32) * 0.2
    G = jnp.ones((1, 2 * rows * splits, 16), jnp.float32) * 0.05
    fn = jax.jit(lambda x: jnp.sum(f(x, sphT, sph8, G)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    return dt, dt * CLOCK_GHZ * 1e9 / (grid * iters)


def main():
    out = {}
    for rows, mode, splits in [(128, "vpu", 1), (128, "mxuquad", 1),
                               (128, "mxuquad", 3), (32, "vpu", 1),
                               (32, "mxuquad", 3)]:
        dt, cyc = bench_visit(rows, mode, splits)
        tag = f"rows{rows}_{mode}{splits if mode == 'mxuquad' else ''}"
        out[tag] = round(cyc, 1)
        log(f"{tag}: {cyc:.0f} cycles/visit")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
