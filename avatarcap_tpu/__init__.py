"""AvatarCap-TPU: a TPU-native (JAX/XLA/Pallas) monocular human volumetric capture framework.

Re-implements the capabilities of lizhe00/AvatarCap (ECCV 2022) with a
TPU-first architecture: functional JAX models, static-shape device-side
geometry kernels (KNN, marching cubes, rasterization), and pjit/shard_map
scaling over device meshes.
"""

__version__ = "0.1.0"
