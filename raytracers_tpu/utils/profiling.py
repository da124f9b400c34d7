"""Tracing / profiling / metrics (SURVEY.md §5).

The reference has only wall-clock phase timers (futhark/main.c:88-124).
Here: structured per-phase metrics with derived rays/s, JSON dumping, and a
``jax.profiler`` trace context for TPU timeline capture.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Structured render metrics: phase ms + derived throughput."""

    def __init__(self, width: int, height: int, scene: str):
        self.data = {"width": width, "height": height, "scene": scene,
                     "platform": jax.devices()[0].platform,
                     "n_devices": len(jax.devices())}

    def phase(self, name: str, seconds: float):
        self.data[f"{name}_ms"] = seconds * 1e3
        if name == "render":
            rays = self.data["width"] * self.data["height"]
            self.data["mrays_per_s"] = rays / seconds / 1e6
            self.data["mrays_per_s_per_chip"] = (
                self.data["mrays_per_s"] / self.data["n_devices"])
        return self

    def dump(self, path: str | None = None):
        if path:
            with open(path, "w") as f:
                json.dump(self.data, f, indent=2)
        else:
            json.dump(self.data, sys.stderr, indent=2)
            sys.stderr.write("\n")
        return self.data


@contextlib.contextmanager
def timed(label: str, sink=None):
    """Wall-clock phase timer with device sync, reference-driver style."""
    t0 = time.perf_counter()
    yield
    # callers are expected to block_until_ready inside; this is a fallback
    dt = time.perf_counter() - t0
    msg = f"{label} in {dt:f}s."
    print(msg, file=sys.stderr)
    if sink is not None:
        sink(label, dt)

def device_kernel_ms(log_dir: str) -> dict:
    """Parse a captured trace: device-side kernel name -> total ms.

    Used by bench.py --trace to report DEVICE execution time separately
    from the host dispatch round-trip (~6-9 ms through the tunnel)."""
    import collections
    import glob
    import gzip
    import json
    out = collections.Counter()
    for path in glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(path) as f:
            data = json.load(f)
        pids = {e["pid"]: e["args"].get("name") for e in
                data.get("traceEvents", [])
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev_pids = {p for p, n in pids.items()
                    if n and "TPU" in str(n)}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                out[e.get("name", "?")] += e.get("dur", 0) / 1e3
    return dict(out)


# ---- shared roofline model (docs/PERF_NOTES.md; docs/MICROBENCH.json) ----

OPS_PER_SLOT = 25.0      # VPU wide-ops per sphere-row slot-test
CULL_OPS_PER_ROW = 20.0  # slab ops per cull row


def vpu_ceiling_lane_ops(microbench: dict) -> float:
    """Lane-ops/s at the microbenched issue rate (the fma probe's best
    ILP figure x 1024 lanes x the measured clock).  Real kernels can
    exceed it — values near/above 1.0 of this ceiling mean the visit
    math IS the wall."""
    return (microbench["fma_ilp4_vregops_per_cycle"] * 1024
            * microbench["clock_ghz"] * 1e9)
