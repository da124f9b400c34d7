"""raytracers_tpu — a TPU-native differentiable sphere ray tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``athas/raytracers`` reference suite (Whitted-style sphere tracing with mirror
reflections, LBVH acceleration, two benchmark scenes), re-designed TPU-first:
SoA arrays, masked lock-step bounce loops, matmul-formulated intersection,
Pallas megakernels, and ``shard_map`` multi-chip distribution.
"""
from . import vec, geometry, scenes, image
from .geometry import Spheres, Camera, camera
from .scenes import rgbbox, irreg, random_spheres, Scene

__version__ = "0.4.0"
