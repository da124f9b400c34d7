#!/usr/bin/env python
"""TPU microbenchmarks that size the megakernel design space.

Answers, with measured numbers (written to docs/MICROBENCH.json):
  1. VPU issue rate: vreg-ops/cycle for independent fma streams vs a
     dependent chain (how much ILP headroom the visit loop has).
  2. Mosaic dot_general viability + cost for the v4 kernel's shapes:
     (128,8)@(8,T) pair-term dots and (8,128)@(128,T) one-hot payload.
  3. Sublane min-reduce (128,T)->(1,T) cost, f32 and int32.
  4. A full "v4 visit" prototype: MXU pair terms + quadratic + packed
     (t|lane) key + min-reduce + one-hot payload, per-visit cycles.

Run ON TPU:  python tools/microbench_tpu.py
"""
import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from raytracers_tpu.utils.timing import bench_salted  # noqa: E402

CLOCK_GHZ = 0.94  # v5e TensorCore clock (approx)
T = 256
LANE = 128
VREGS = (LANE * T) // (8 * 128)   # vregs touched per (128,T) op


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cycles(dt_s):
    return dt_s * CLOCK_GHZ * 1e9


# ---------------------------------------------------------------- 1. VPU fma
def fma_kernel(x_ref, o_ref, *, streams, iters):
    base = x_ref[0, 0]
    accs = [jnp.full((LANE, T), base + u) for u in range(streams)]
    m = jnp.full((LANE, T), base * 0.5 + 0.9999)
    d = jnp.full((LANE, T), base + 1e-7)

    def body(i, accs):
        return tuple(a * m + d for a in accs)

    accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
    o_ref[0, :, :] = sum(accs)


def bench_fma(streams, iters, grid=64):
    f = pl.pallas_call(
        functools.partial(fma_kernel, streams=streams, iters=iters),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, LANE, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, LANE, T), jnp.float32),
    )
    fn = jax.jit(lambda x: jnp.sum(f(x)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    total_vreg_fmas = grid * iters * streams * VREGS
    per_cycle = total_vreg_fmas / cycles(dt)
    return dt, per_cycle


# ---------------------------------------------------------------- 2. dots
def dot_kernel(x_ref, a_ref, b_ref, o_ref, *, iters, kind):
    acc = jnp.zeros((8, T) if kind == "payload" else (LANE, T), jnp.float32)
    salt = x_ref[0, 0]

    def body(i, acc):
        s = salt + jnp.float32(i)
        if kind == "pair":            # (128,8)@(8,T)
            lhs = a_ref[:, :] + s     # (128,8) VPU cost negligible (16 vregs)
            r = jax.lax.dot_general(lhs, b_ref[:, :],
                                    (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        elif kind == "pairT":         # (8,128) contract dim0 x (8,T)
            lhs = a_ref[:, :] + s     # (8,128)
            r = jax.lax.dot_general(lhs, b_ref[:, :],
                                    (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        else:                         # payload: (8,128)@(128,T)
            lhs = a_ref[:, :] + s     # (8,128)
            r = jax.lax.dot_general(lhs, b_ref[:, :],
                                    (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        return acc + r

    o_ref[0, :, :] = jax.lax.fori_loop(0, iters, body, acc)


def bench_dot(kind, iters=512, grid=16):
    if kind == "pair":
        a_shape, b_shape = (LANE, 8), (8, T)
    elif kind == "pairT":
        a_shape, b_shape = (8, LANE), (8, T)
    else:
        a_shape, b_shape = (8, LANE), (LANE, T)
    out_shape = (8, T) if kind == "payload" else (LANE, T)
    f = pl.pallas_call(
        functools.partial(dot_kernel, iters=iters, kind=kind),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(a_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(b_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid,) + out_shape, jnp.float32),
    )
    a = jnp.ones(a_shape, jnp.float32) * 0.5
    b = jnp.ones(b_shape, jnp.float32) * 0.25
    fn = jax.jit(lambda x: jnp.sum(f(x, a, b)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    per_dot = cycles(dt) / (grid * iters)
    return dt, per_dot


# ---------------------------------------------------------------- 3. reduce
def reduce_kernel(x_ref, o_ref, *, iters, dtype):
    base = x_ref[0, 0]
    if dtype == "int32":
        v0 = jnp.full((LANE, T), 7, jnp.int32)
        acc = jnp.zeros((1, T), jnp.int32)
    else:
        v0 = jnp.full((LANE, T), base)
        acc = jnp.zeros((1, T), jnp.float32)

    def body(i, carry):
        acc, v = carry
        r = jnp.min(v, axis=0, keepdims=True)
        return acc + r, v + v[0:1, :] * 0 + (acc[0, 0] * 0 + 1)

    acc, _ = jax.lax.fori_loop(0, iters, body, (acc, v0))
    o_ref[0, :, :] = acc


def bench_reduce(dtype, iters=512, grid=16):
    f = pl.pallas_call(
        functools.partial(reduce_kernel, iters=iters, dtype=dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (grid, 1, T), jnp.int32 if dtype == "int32" else jnp.float32),
    )
    fn = jax.jit(lambda x: jnp.sum(f(x)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    per_red = cycles(dt) / (grid * iters)
    return dt, per_red


# ------------------------------------------------------- 4. v4 visit proto
def visit_kernel(x_ref, sphT_ref, sph8_ref, o_ref, *, iters):
    """One v4-style cluster visit per iteration: 2 pair dots + quadratic
    + packed key + min-reduce + one-hot payload readback."""
    salt = x_ref[0, 0]
    # fake per-ray state (1, T)
    lid = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(jnp.float32)
    ox = lid * 1e-3 + salt
    oy = lid * 2e-3
    oz = jnp.full((1, T), 30.0)
    dx = lid * 1e-4 + 0.1
    dy = lid * -1e-4 + 0.2
    dz = jnp.full((1, T), -1.0)
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    p = ox * dx + oy * dy + oz * dz
    m2 = ox * ox + oy * oy + oz * oz
    pc = p * p - a * m2
    za = jnp.zeros((1, T), jnp.float32)
    gq = jnp.concatenate([dx, dy, dz, za, za, za, za, za], axis=0)
    gl = jnp.concatenate([2 * a * ox - 2 * p * dx, 2 * a * oy - 2 * p * dy,
                          2 * a * oz - 2 * p * dz, za, za, za, za, -a],
                         axis=0)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (LANE, T), 0)
    eps = jnp.float32(0.1)
    BIGF = jnp.float32(1e9)
    hi = jax.lax.dot_general  # alias

    def visit(i, carry):
        krun, pay = carry
        lhsT = sphT_ref[:, :] + (salt * jnp.float32(i))     # (128,8)
        q = hi(lhsT, gq, (((1,), (0,)), ((), ())),
               precision=jax.lax.Precision.HIGHEST,
               preferred_element_type=jnp.float32)           # (128,T)
        ll = hi(lhsT, gl, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (128,T)
        disc = q * q + ll + pc
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        t0 = (q - p - sq) * inv_a
        t1 = (q - p + sq) * inv_a
        use0 = t0 > eps
        t = jnp.where(use0, t0, t1)
        valid = pos & (t > eps)
        tv = jnp.where(valid, t, BIGF)
        bits = jax.lax.bitcast_convert_type(tv, jnp.int32)
        key = (bits & ~jnp.int32(0x7F)) | sub_ids
        kmin = jnp.min(key, axis=0, keepdims=True)           # (1,T)
        improved = kmin < krun
        onehot = (key == kmin).astype(jnp.float32)           # (128,T)
        pc8 = hi(sph8_ref[:, :], onehot, (((1,), (0,)), ((), ())),
                 precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)          # (8,T)
        imp8 = jnp.broadcast_to(improved, (8, T))
        pay = jnp.where(imp8, pc8, pay)
        krun = jnp.where(improved, kmin, krun)
        return krun, pay

    krun = jnp.full((1, T), jnp.int32(0x7F000000))
    pay = jnp.zeros((8, T), jnp.float32)
    krun, pay = jax.lax.fori_loop(0, iters, visit, (krun, pay))
    o_ref[0, :, :] = pay + krun.astype(jnp.float32)


def bench_visit(iters=256, grid=16):
    f = pl.pallas_call(
        functools.partial(visit_kernel, iters=iters),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((LANE, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, T), jnp.float32),
    )
    sphT = jnp.ones((LANE, 8), jnp.float32) * 0.1
    sph8 = jnp.ones((8, LANE), jnp.float32) * 0.2
    fn = jax.jit(lambda x: jnp.sum(f(x, sphT, sph8)))
    dt = bench_salted(fn, lambda k: (jnp.float32([[1e-6 * k]]),),
                      warmup=2, runs=10)
    per_visit = cycles(dt) / (grid * iters)
    return dt, per_visit


def main():
    log(f"devices: {jax.devices()}")
    out = {"T": T, "clock_ghz": CLOCK_GHZ}

    for streams, iters, name in [(8, 256, "fma_ilp8"), (4, 512, "fma_ilp4"),
                                 (1, 2048, "fma_chain")]:
        try:
            dt, rate = bench_fma(streams, iters)
            out[name + "_vregops_per_cycle"] = round(rate, 3)
            log(f"fma streams={streams}: {dt*1e3:.2f} ms "
                f"-> {rate:.2f} vreg-fma/cycle")
        except Exception as e:
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"fma streams={streams} FAILED: {e}")

    for kind in ["pair", "pairT", "payload"]:
        try:
            dt, per = bench_dot(kind)
            out[f"dot_{kind}_cycles"] = round(per, 1)
            log(f"dot {kind}: {dt*1e3:.2f} ms -> {per:.0f} cycles/dot")
        except Exception as e:
            out[f"dot_{kind}_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"dot {kind} FAILED: {str(e)[:300]}")

    for dtype in ["f32", "int32"]:
        try:
            dt, per = bench_reduce(dtype)
            out[f"reduce_{dtype}_cycles"] = round(per, 1)
            log(f"min-reduce {dtype}: {dt*1e3:.2f} ms -> {per:.0f} cyc")
        except Exception as e:
            out[f"reduce_{dtype}_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"reduce {dtype} FAILED: {str(e)[:300]}")

    try:
        dt, per = bench_visit()
        out["visit_v4_cycles"] = round(per, 1)
        out["visit_v4_us"] = round(per / CLOCK_GHZ / 1e3, 3)
        log(f"v4 visit prototype: {dt*1e3:.2f} ms -> {per:.0f} cycles "
            f"({per/CLOCK_GHZ/1e3:.2f} us) per visit of 128x{T}")
    except Exception as e:
        out["visit_v4_error"] = f"{type(e).__name__}: {e}"[:600]
        log(f"v4 visit FAILED: {str(e)[:600]}")

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "MICROBENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
