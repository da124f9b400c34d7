#!/usr/bin/env python
"""Does the boundary-sort cost depend on key width?

The compaction boundaries sort (key + 10 f32 payloads) at 1e6 rows with
key = (dead << 30) | pixel_id.  If XLA:TPU's sort were radix-like, a
1-bit key with is_stable=True (stability supplies the pixel-id order)
would be much cheaper; if it is a comparison network, width should not
matter.  Run ON TPU.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
N = 1_000_000
key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 2,
                         dtype=jnp.int32)
idx = jnp.arange(N, dtype=jnp.int32)
pays = [jax.random.normal(jax.random.PRNGKey(i), (N,), jnp.float32)
        for i in range(1, 11)]


def run(label, fn):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(key))
    ms = bench_salted(jfn, lambda k: ((key + k) % 2,), warmup=1,
                      runs=6) * 1e3
    print(f"{label}: {ms:6.2f} ms", flush=True)


run("31-bit key (dead<<30|idx), 10 payloads, unstable",
    lambda kk: sum(jnp.sum(o[::511]) for o in jax.lax.sort(
        [(kk << 30) | idx] + pays, dimension=0, num_keys=1)))
run(" 1-bit key, stable, 10 payloads + idx",
    lambda kk: sum(jnp.sum(o[::511]) for o in jax.lax.sort(
        [kk] + pays + [idx], dimension=0, num_keys=1, is_stable=True)))
run(" 1-bit key, stable, 10 payloads (no idx)",
    lambda kk: sum(jnp.sum(o[::511]) for o in jax.lax.sort(
        [kk] + pays, dimension=0, num_keys=1, is_stable=True)))
run("20-bit key (idx only; the unpermute), 4 payloads",
    lambda kk: sum(jnp.sum(o[::511]) for o in jax.lax.sort(
        [idx ^ kk] + pays[:4], dimension=0, num_keys=1)))

# --- segmented sorts: rays only move within their segment, so the
# boundary can sort (S, N/S) rows along axis 1 instead of one 1e6 row ---
for S in (4, 16, 64):
    key2 = key.reshape(S, N // S)
    pays2 = [p.reshape(S, N // S) for p in pays]

    def seg(kk, key2=key2, pays2=pays2):
        out = jax.lax.sort([kk] + pays2, dimension=1, num_keys=1)
        return sum(jnp.sum(o[:, ::511]) for o in out)

    jfn = jax.jit(seg)
    jax.block_until_ready(jfn(key2))
    ms = bench_salted(jfn, lambda k, key2=key2: ((key2 + k) % 2,),
                      warmup=1, runs=6) * 1e3
    print(f"segmented ({S} x {N//S}), 10 payloads: {ms:6.2f} ms",
          flush=True)
