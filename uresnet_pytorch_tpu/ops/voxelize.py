"""On-device voxelization: padded sparse blob <-> dense volume.

The reference's dense path materialises the full spatial_size^dim volume on
the host inside its larcv_dense loader (SURVEY.md §2.8 "voxelization"). Here
it is a single XLA scatter on device — the host ships only the O(N) sparse
arrays (BASELINE.json north star: "voxelization ... run[s] on-device").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial


def _flat_indices(coords: jnp.ndarray, valid: jnp.ndarray, spatial_size: int) -> jnp.ndarray:
    """(B, V, dim) int coords -> (B, V) flattened cell index; invalid rows -> 0."""
    dim = coords.shape[-1]
    flat = coords[..., 0].astype(jnp.int32)
    for d in range(1, dim):
        flat = flat * spatial_size + coords[..., d]
    return jnp.where(valid, flat, 0)


def valid_mask(n_voxels: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """(B,) counts -> (B, V) row-validity mask."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_voxels.shape[0], capacity), 1)
    return rows < n_voxels[:, None]


def voxelize(coords: jnp.ndarray, values: jnp.ndarray, n_voxels: jnp.ndarray,
             spatial_size: int) -> jnp.ndarray:
    """Scatter sparse (B, V) values into a dense (B, S, ..., S, 1) volume.

    Padding rows carry value 0 and coord 0, so an add-scatter leaves the
    volume exact (input coordinates are unique per event by loader contract).
    """
    B, V, dim = coords.shape
    mask = valid_mask(n_voxels, V)
    flat = _flat_indices(coords, mask, spatial_size)
    vals = jnp.where(mask, values, 0.0)
    n_cells = spatial_size ** dim
    vol = jnp.zeros((B, n_cells), vals.dtype)
    vol = jax.vmap(lambda v, f, x: v.at[f].add(x))(vol, flat, vals)
    return vol.reshape((B,) + (spatial_size,) * dim + (1,))


def gather_voxels(volume: jnp.ndarray, coords: jnp.ndarray, n_voxels: jnp.ndarray,
                  spatial_size: int) -> jnp.ndarray:
    """Gather per-voxel rows from a dense (B, S..., C) volume at sparse coords.

    Returns (B, V, C); rows beyond n_voxels read cell 0 (mask downstream).
    """
    B, V, dim = coords.shape
    C = volume.shape[-1]
    mask = valid_mask(n_voxels, V)
    flat = _flat_indices(coords, mask, spatial_size)
    vol = volume.reshape(B, -1, C)
    return jax.vmap(lambda v, f: v[f])(vol, flat)
