"""TPU-native 3D Gaussian Splatting with monocular depth initialization.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
deivse/3dgs_monocular_depth_init (see SURVEY.md): dense-depth-based 3DGS
initialization, a differentiable tile rasterizer, densification strategies,
and the full training/eval stack — built for TPU (MXU matmuls, static
shapes, pjit/shard_map parallelism) rather than translated from CUDA.
"""

__version__ = "0.1.0"
