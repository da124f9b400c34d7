"""Multi-host initialisation (SURVEY.md §2.4: the reference is single-node;
this is the TPU-native scale-out axis).

Call :func:`init` once per process before any other JAX use on a multi-host
pod slice; afterwards ``jax.devices()`` spans the full slice and the same
``shard_map`` code in parallel/mesh.py shards globally (rays split across
all hosts' chips, scene/BVH replicated, gradient psum over ICI).
"""
from __future__ import annotations

import jax


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> dict:
    """Initialise jax.distributed (no-op on a single process).

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env vars).  Returns a summary dict.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def scaling_efficiency(single_chip_rays_per_s: float,
                       n_chip_rays_per_s: float, n_chips: int) -> float:
    """Scaling efficiency metric from BASELINE.json (target ≥0.85)."""
    return n_chip_rays_per_s / (single_chip_rays_per_s * n_chips)
