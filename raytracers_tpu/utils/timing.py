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
