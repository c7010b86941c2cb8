"""Device-side ops: voxelization, coordinate keys, sparse rulebooks,
gather-GEMM-scatter convolutions (XLA and Pallas backends)."""
