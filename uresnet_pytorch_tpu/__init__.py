"""uresnet_pytorch_tpu — TPU-native LArTPC semantic segmentation framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
PyTorch reference (Temigo/uresnet_pytorch, see SURVEY.md):

  * dense 2D/3D U-ResNet (pure XLA convolutions)
  * submanifold-sparse U-ResNet (sorted-rulebook + gather-GEMM-scatter,
    Pallas kernels on the hot path)
  * LArCV-schema HDF5 event loader with threaded prefetch
  * class-weighted per-voxel softmax cross-entropy loss
  * data-parallel multi-chip training (jax.sharding Mesh, psum over ICI)
  * train / inference / iotest CLI, checkpointing, PyTorch weight import

Reference parity notes cite the expected public-repo paths from SURVEY.md §2
(the reference mount was empty this round; see SURVEY.md §0).
"""

__version__ = "0.1.0"

from uresnet_pytorch_tpu.config import URESNetConfig  # noqa: F401
