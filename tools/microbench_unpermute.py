#!/usr/bin/env python
"""Size the twophase boundary: final result scatter vs sort-unpermute.

The phase-2 -> image hand-off currently scatters survivors' packed
pixels over the base image (pallas_kernel.py render_pallas_twophase).
The backward replay already learned that a 1M-row scatter costs far
more than re-sorting by the unique ray id; this measures the same
choice for the forward boundary shapes (1 int32 result operand, and
the 3-float variant used by render_pallas_record_twophase).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
Rp = 1_024_000
rng = np.random.default_rng(0)
perm = rng.permutation(Rp).astype(np.int32)
live = (rng.random(Rp) < 0.10)
key_sorted = jnp.asarray(np.where(live, 0, 1 << 30).astype(np.int32)
                         | perm)
out_sorted = jnp.asarray(rng.integers(0, 1 << 24, Rp, dtype=np.int32))
base_pix = jnp.asarray(rng.integers(0, 1 << 24, Rp, dtype=np.int32))
f1, f2, f3 = (jnp.asarray(rng.random(Rp, dtype=np.float32))
              for _ in range(3))


@jax.jit
def scatter_int(key_sorted, out_sorted, base_pix):
    act = (key_sorted >> 30) == 0
    idx = key_sorted & ((1 << 30) - 1)
    idx_eff = jnp.where(act, idx, Rp)
    return jnp.sum(base_pix.at[idx_eff].set(out_sorted, mode="drop"))


@jax.jit
def sortback_int(key_sorted, out_sorted, base_pix):
    idx = key_sorted & ((1 << 30) - 1)
    act = ((key_sorted >> 30) == 0).astype(jnp.int32)
    _, act_o, out_o = jax.lax.sort([idx, act, out_sorted], dimension=0,
                                   num_keys=1)
    return jnp.sum(jnp.where(act_o == 1, out_o, base_pix))


@jax.jit
def scatter_f3(key_sorted, a, b, c, base_pix):
    act = (key_sorted >> 30) == 0
    idx = key_sorted & ((1 << 30) - 1)
    idx_eff = jnp.where(act, idx, Rp)
    bf = base_pix.astype(jnp.float32)
    return sum(jnp.sum(bf.at[idx_eff].set(x, mode="drop"))
               for x in (a, b, c))


@jax.jit
def sortback_f3(key_sorted, a, b, c, base_pix):
    idx = key_sorted & ((1 << 30) - 1)
    act = ((key_sorted >> 30) == 0).astype(jnp.int32)
    _, act_o, ao, bo, co = jax.lax.sort([idx, act, a, b, c], dimension=0,
                                        num_keys=1)
    bf = base_pix.astype(jnp.float32)
    m = act_o == 1
    return sum(jnp.sum(jnp.where(m, x, bf)) for x in (ao, bo, co))


# equivalence check first
x = jax.device_get(scatter_int(key_sorted, out_sorted, base_pix))
y = jax.device_get(sortback_int(key_sorted, out_sorted, base_pix))
assert x == y, (x, y)

for name, fn, args in [
        ("scatter_int", scatter_int, (out_sorted, base_pix)),
        ("sortback_int", sortback_int, (out_sorted, base_pix)),
        ("scatter_f3", scatter_f3, (f1, f2, f3, base_pix)),
        ("sortback_f3", sortback_f3, (f1, f2, f3, base_pix))]:
    def salted(k, fn=fn, args=args):
        # bit-distinct inputs defeat the remote result cache; +k on the
        # payload operands leaves the permutation structure unchanged
        if args[0].dtype == jnp.int32:
            return (key_sorted, args[0] + jnp.int32(k), args[1])
        return ((key_sorted,)
                + tuple(a + jnp.float32(k) * 1e-30 for a in args[:-1])
                + (args[-1],))
    jax.device_get(fn(*salted(0)))
    dt = bench_salted(fn, salted, warmup=1, runs=10)
    print(f"{name:13s} {dt*1e3:7.2f} ms", flush=True)
