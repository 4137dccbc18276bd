"""embodiedscan_tpu: a TPU-native (JAX/XLA/Pallas) 3D scene-understanding framework.

Re-implements the capabilities of OpenRobotLab/EmbodiedScan (multi-view and
continuous 9-DoF 3D detection, 3D visual grounding, semantic occupancy) with a
TPU-first architecture: static shapes, batched/vmapped compute, a fixed-capacity
sparse voxel engine, pjit/shard_map parallelism over device meshes, and
Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
