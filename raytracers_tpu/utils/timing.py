"""Benchmark timing: the reference driver's protocol, device-synchronised.

The reference times each phase over N runs with a device sync between
(futhark/main.c:88-124).  Here the sync is ``jax.block_until_ready`` on the
phase's outputs; each timed function is warmed up first so compile time is
excluded (criterion/JMH-style, cf. rust/benches/ray.rs, scala Bench.scala).
"""
from __future__ import annotations

import time
from typing import Callable

import jax


def bench_fn(fn: Callable, *args, warmup: int = 2, runs: int = 10) -> float:
    """Average seconds per call of ``fn(*args)``, fully synchronised."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(runs):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / runs


def bench_salted(fn: Callable, make_args: Callable[[int], tuple],
                 warmup: int = 2, runs: int = 10) -> float:
    """Robust timing for hostile runtimes: salted inputs + queue drain.

    Two failure modes of naive ``block_until_ready`` loops were observed on
    the tunneled TPU stack:
      1. repeated identical (executable, input) calls can be served from a
         result cache — every call must get bit-distinct inputs
         (``make_args(k)``; a +k*1e-30 f32 nudge is value-identical), and
      2. ``block_until_ready`` can ack before device execution finishes
         (async dispatch through the relay) — so ``fn`` should return a
         SMALL array (e.g. a checksum) and the loop is closed with a
         ``device_get`` that forces a full queue drain before the clock
         stops.

    Dispatches execute sequentially on-device, so total/runs is the true
    average execution time (+ amortised dispatch overhead).
    """
    for k in range(warmup):
        jax.device_get(fn(*make_args(-1 - k)))
    t0 = time.perf_counter()
    last = None
    for k in range(runs):
        last = fn(*make_args(k))
    jax.device_get(last)
    return (time.perf_counter() - t0) / runs


def bench_batched(make_sum_fn, runs: int = 3, k: int = 16) -> float:
    """Per-evaluation seconds for sub-dispatch-floor workloads.

    The tunneled TPU runtime has a ~6-9 ms fixed round-trip per dispatch
    (measured: a 400-element kernel 'costs' the same as an empty call), so
    fast phases like small BVH builds cannot be timed call-per-call.
    ``make_sum_fn(k)`` must return a jittable ``() -> scalar`` that
    evaluates the workload on k DIFFERENT (salted) inputs sequentially
    inside ONE jit call (e.g. a lax.scan over salts); the dispatch floor
    then amortises k-fold.
    """
    import jax.numpy as jnp
    fn = jax.jit(make_sum_fn(k))   # fn(seed scalar) -> scalar checksum
    jax.device_get(fn(jnp.float32(-1.0)))   # compile + warm
    jax.device_get(fn(jnp.float32(-2.0)))
    t0 = time.perf_counter()
    last = None
    for r in range(runs):
        # distinct seed per run: the runtime memoises repeated identical
        # (executable, input) calls (docs/PERF_NOTES.md timing traps)
        last = fn(jnp.float32(r))
    jax.device_get(last)
    return (time.perf_counter() - t0) / runs / k


class PhaseTimer:
    """Collects named phase timings (seconds); renders a metrics dict."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    def measure(self, name: str, fn: Callable, *args, warmup: int = 2,
                runs: int = 10) -> float:
        dt = bench_fn(fn, *args, warmup=warmup, runs=runs)
        self.phases[name] = dt
        return dt

    def report(self) -> dict:
        return dict(self.phases)
