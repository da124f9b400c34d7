#!/usr/bin/env python
"""Size the v5 design space: sub-cluster (32-row) visits vs 128-row visits.

The megakernel's per-sweep cost is dominated by (rows, T) VPU quadratic
work per visited cluster.  Finer clusters (rows=32) cut the vector work
4x per visit IF the per-visit fixed costs (scalar cond, min-reduce,
payload readback) don't eat the gain.  Two payload schemes:

  * 'mxu'   — per-visit one-hot (8,rows)@(rows,T) dot (current v4)
  * 'defer' — pack (t | slot-in-visit) and ALSO carry the winning
    cluster id (1,T) via 2 cheap ops; payload is read back ONCE per
    bounce (cost not modelled here — measured separately as 'gather').

Run ON TPU:  python tools/microbench_v5.py
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


def cycles(dt_s):
    return dt_s * CLOCK_GHZ * 1e9


def _min_rows(x, rows):
    m = x
    s = rows // 2
    while s >= 8:
        m = jnp.minimum(m[:s, :], m[s:2 * s, :])
        s //= 2
    return jnp.min(m, axis=0, keepdims=True)


def visit_kernel(x_ref, sphT_ref, sph8_ref, o_ref, *, iters, rows, payload):
    """Replicates the v4 visit body (VPU quadratic + packed key) at a
    configurable row count."""
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
    key_mask = ~jnp.int32(rows - 1) if payload == "mxu" else ~jnp.int32(511)

    def visit(c, carry):
        krun, pay, cidx = carry
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
        if payload == "mxu":
            impf = imp_b.astype(jnp.float32)
            onehot = (key == kmin).astype(jnp.float32) * impf
            blk8 = sph8_ref[pl.ds(0, 1), :, :].reshape(8, rows)
            pay_c = jax.lax.dot_general(
                blk8, onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            pay = pay * (1.0 - impf) + pay_c
        else:
            cidx = jnp.where(imp_b, c, cidx)
        krun = jnp.minimum(krun, kmin)
        return krun, pay, cidx

    krun = jnp.full((1, T), jnp.int32(0x7F000000))
    pay = jnp.zeros((8, T), jnp.float32)
    cidx = jnp.zeros((1, T), jnp.int32)
    krun, pay, cidx = jax.lax.fori_loop(0, iters, visit, (krun, pay, cidx))
    o_ref[0, :, :] = (pay + krun.astype(jnp.float32)
                      + cidx.astype(jnp.float32))


def bench_visit(rows, payload, iters=256, grid=16):
    f = pl.pallas_call(
        functools.partial(visit_kernel, iters=iters, rows=rows,
                          payload=payload),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, rows, 8), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, rows), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, T), jnp.float32),
    )
    sphT = jnp.ones((1, rows, 8), jnp.float32) * 0.1
    sph8 = jnp.ones((1, 8, rows), jnp.float32) * 0.2
    fn = jax.jit(lambda x: jnp.sum(f(x, sphT, sph8)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    return dt, cycles(dt) / (grid * iters)


def gather_kernel(x_ref, tbl_ref, o_ref, *, iters, chunks):
    """Per-bounce deferred payload: per-lane dynamic_gather of 8 fields
    from a (8, chunks*128) slot table, chunk-selected."""
    salt = x_ref[0, 0]
    lid = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def body(i, acc):
        slot = (lid * 37 + i) % (chunks * 128)
        ch = slot // 128
        off = slot - ch * 128
        out = [jnp.zeros((1, T), jnp.float32) for _ in range(8)]
        for c in range(chunks):
            sel = (ch == c).astype(jnp.float32)
            for fld in range(8):
                # per-lane gather from a 128-wide row chunk (the measured
                # Mosaic dynamic_gather pattern from pallas_traversal.py)
                row = (tbl_ref[fld:fld + 1, c * 128:(c + 1) * 128]
                       + salt * 0.0)                       # (1, 128)
                gathered = jnp.take_along_axis(row, off, axis=1)  # (1, T)
                out[fld] = out[fld] + gathered * sel
        return acc + sum(out)

    acc = jnp.zeros((1, T), jnp.float32)
    acc = jax.lax.fori_loop(0, iters, body, acc)
    o_ref[0, :, :] = acc


def bench_gather(chunks, iters=64, grid=16):
    f = pl.pallas_call(
        functools.partial(gather_kernel, iters=iters, chunks=chunks),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, chunks * 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 1, T), jnp.float32),
    )
    tbl = jnp.ones((8, chunks * 128), jnp.float32)
    fn = jax.jit(lambda x: jnp.sum(f(x, tbl)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    return dt, cycles(dt) / (grid * iters)


def main():
    log(f"devices: {jax.devices()}")
    out = {"T": T}
    for rows, payload in [(128, "mxu"), (32, "mxu"), (32, "defer"),
                          (128, "defer"), (64, "mxu"), (64, "defer")]:
        name = f"visit_r{rows}_{payload}"
        try:
            dt, per = bench_visit(rows, payload)
            out[name + "_cycles"] = round(per, 1)
            log(f"{name}: {dt*1e3:.2f} ms -> {per:.0f} cycles/visit")
        except Exception as e:
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"{name} FAILED: {str(e)[:300]}")
    for chunks in (4, 1):
        try:
            dt, per = bench_gather(chunks)
            out[f"paygather_c{chunks}_cycles"] = round(per, 1)
            log(f"paygather chunks={chunks}: {dt*1e3:.2f} ms "
                f"-> {per:.0f} cycles/bounce")
        except Exception as e:
            out[f"paygather_c{chunks}_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"paygather c{chunks} FAILED: {str(e)[:300]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
