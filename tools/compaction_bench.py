"""Measure compaction-permutation strategies on the real chip.

The two-phase renderer pays ~25 ms (of 89 ms total) in a 10-operand
``lax.sort`` that packs survivors to the front.  A full sort is overkill:
compaction is a stable BINARY PARTITION, computable as cumsum -> dest
index -> one int32 scatter (building the permutation) -> gathers.  The
open question is gather cost: round-1 measured ~7.4 ms per 1e6-element
random f32 gather (latency-bound), but ONE row-gather over a stacked
(R, 10) array moves the same state with contiguous 40-byte rows.

Usage:  python tools/compaction_bench.py [R]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from raytracers_tpu.utils.timing import bench_salted  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_OPS = 9  # state arrays riding the permutation (o, d, attenuation)

key = jax.random.PRNGKey(0)
state = [jax.random.uniform(jax.random.fold_in(key, i), (R,), jnp.float32)
         for i in range(N_OPS)]
alive = (jax.random.uniform(jax.random.fold_in(key, 99), (R,)) < 0.25)


def checksum(arrs):
    return sum(jnp.sum(a[::4097]) for a in arrs if a.dtype == jnp.float32)


@jax.jit
def via_sort(alive, *state):
    dead = (~alive).astype(jnp.int32)
    k = (dead << 30) | jnp.arange(R, dtype=jnp.int32)
    out = jax.lax.sort([k] + list(state), dimension=0, num_keys=1)
    return checksum(out[1:])


@jax.jit
def via_partition_gathers(alive, *state):
    # dest[i] = rank among live (live) / n_live + rank among dead (dead)
    live_i = alive.astype(jnp.int32)
    live_rank = jnp.cumsum(live_i) - live_i
    n_live = live_rank[-1] + live_i[-1]
    dead_rank = jnp.arange(R, dtype=jnp.int32) - live_rank
    dest = jnp.where(alive, live_rank, n_live + dead_rank)
    perm = jnp.zeros((R,), jnp.int32).at[dest].set(
        jnp.arange(R, dtype=jnp.int32))
    out = [s[perm] for s in state]
    return checksum(out)


@jax.jit
def via_partition_rowgather(alive, *state):
    live_i = alive.astype(jnp.int32)
    live_rank = jnp.cumsum(live_i) - live_i
    n_live = live_rank[-1] + live_i[-1]
    dead_rank = jnp.arange(R, dtype=jnp.int32) - live_rank
    dest = jnp.where(alive, live_rank, n_live + dead_rank)
    perm = jnp.zeros((R,), jnp.int32).at[dest].set(
        jnp.arange(R, dtype=jnp.int32))
    stacked = jnp.stack(state, axis=1)          # (R, N_OPS) contiguous rows
    rows = jnp.take(stacked, perm, axis=0)
    return checksum([rows[:, i] for i in range(N_OPS)])


@jax.jit
def via_keysort_rowgather(alive, *state):
    dead = (~alive).astype(jnp.int32)
    k = (dead << 30) | jnp.arange(R, dtype=jnp.int32)
    ks = jax.lax.sort([k], dimension=0, num_keys=1)[0]
    perm = ks & ((1 << 30) - 1)
    stacked = jnp.stack(state, axis=1)
    rows = jnp.take(stacked, perm, axis=0)
    return checksum([rows[:, i] for i in range(N_OPS)])


def salt(k):
    return (alive,) + tuple(s + np.float32(k) * np.float32(1e-30)
                            for s in state)


for name, fn in [("10-op lax.sort (current)", via_sort),
                 ("cumsum+scatter, 9 elem gathers", via_partition_gathers),
                 ("cumsum+scatter, 1 row gather", via_partition_rowgather),
                 ("1-op keysort, 1 row gather", via_keysort_rowgather)]:
    t0 = time.perf_counter()
    ms = bench_salted(fn, salt, warmup=2, runs=8) * 1e3
    print(f"{name:36s} {ms:7.2f} ms   (incl-compile wall "
          f"{time.perf_counter() - t0:.0f}s)", flush=True)
