"""Pallas TPU kernels for the tile engine's hot ops."""
