#!/usr/bin/env python
"""Time build_bvh at 1M spheres (leaf 8/128) — A/B for the fused
Morton multi-operand sort vs the argsort+gathers formulation."""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from raytracers_tpu import scenes
from raytracers_tpu.bvh.lbvh import build_bvh
from raytracers_tpu.utils.timing import bench_salted

print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
soup = scenes.random_spheres(1_000_000, seed=0)


def salted(k):
    return (soup._replace(center=soup.center + jnp.float32(k) * 1e-30),)


for leaf in [128, 8]:
    fn = jax.jit(lambda s, leaf=leaf: sum(
        jnp.sum(x) for x in jax.tree.leaves(build_bvh(s, leaf_size=leaf))
        if jnp.issubdtype(x.dtype, jnp.floating)))
    dt = bench_salted(fn, salted, warmup=1, runs=5)
    print(f"build_bvh 1M leaf={leaf}: {dt*1e3:.1f} ms", flush=True)
