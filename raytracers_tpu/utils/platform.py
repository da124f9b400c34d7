"""Robust accelerator probe.

``jax.devices()`` RAISES when the TPU plugin is present but the chip is
unavailable (held by another process, tunnel down).  User-facing entry
points should degrade to CPU instead of crashing — the reference's
drivers never die on backend selection either (FUTHARK_BACKEND picks a
fallback, futhark/README.md).
"""
from __future__ import annotations


def probe_tpu() -> bool:
    """True iff a TPU backend is attached and initialises.

    On failure the process is switched to the CPU platform (safe to call
    before any computation; callers should invoke this before creating
    arrays)."""
    import sys

    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception as e:
        # RuntimeError for a held chip; plugin-specific/OS errors for a
        # dead tunnel — degrade to CPU for any of them.  Loud on stderr
        # (stdout carries the reference-identical phase lines) so a
        # dropped tunnel can't silently record CPU timings as TPU ones;
        # bench.py additionally records the resolved platform in
        # bench_details.json.
        print(f"probe_tpu: TPU unavailable ({type(e).__name__}: {e}); "
              f"falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return False
