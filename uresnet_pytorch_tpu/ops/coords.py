"""Voxel-coordinate keys: pack integer coords into sortable int32 scalars.

This replaces SparseConvNet's C++ hash maps (SCN/Metadata, SURVEY.md §2.11)
with the TPU-native formulation: coordinates become packed integer keys, the
active set is a *sorted* key array, and lookups are vectorized binary
searches — static shapes, no pointer chasing (design per SURVEY.md §7 and the
sort/merge sparse-conv mapping of PointAcc, arXiv:2110.07600).

Keys are per-event (batch handled by vmap), so for dim*axis_bits <= 30 an
int32 holds the key with INT32_MAX reserved as the invalid/padding sentinel
(3D up to 1024^3, 2D up to 32768^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.int32(np.iinfo(np.int32).max)


def check_key_capacity(spatial_size: int, data_dim: int) -> int:
    bits = max(1, int(np.ceil(np.log2(spatial_size))))
    if data_dim * bits > 30:
        raise ValueError(
            f"coordinate key needs {data_dim * bits} bits > 30; reduce "
            f"spatial_size (per-axis bits={bits}, dim={data_dim})")
    return bits


def encode(coords: jnp.ndarray, valid: jnp.ndarray, spatial_size: int) -> jnp.ndarray:
    """(..., dim) int coords + (...) bool valid -> (...) int32 keys.

    Out-of-bounds coordinates and invalid rows map to SENTINEL.
    """
    dim = coords.shape[-1]
    bits = check_key_capacity(spatial_size, dim)
    in_bounds = jnp.all((coords >= 0) & (coords < spatial_size), axis=-1)
    key = coords[..., 0].astype(jnp.int32)
    for d in range(1, dim):
        key = (key << bits) | coords[..., d].astype(jnp.int32)
    return jnp.where(valid & in_bounds, key, SENTINEL)


def decode(keys: jnp.ndarray, spatial_size: int, data_dim: int) -> jnp.ndarray:
    """(...) int32 keys -> (..., dim) int32 coords (sentinel rows -> 0...)."""
    bits = check_key_capacity(spatial_size, data_dim)
    mask = (1 << bits) - 1
    valid = keys != SENTINEL
    k = jnp.where(valid, keys, 0)
    cs = []
    for d in reversed(range(data_dim)):
        cs.append(k & mask)
        k = k >> bits
    return jnp.stack(list(reversed(cs)), axis=-1)


def parent_key(keys: jnp.ndarray, spatial_size: int, data_dim: int) -> jnp.ndarray:
    """Key of the stride-2 coarse cell containing each site (sentinel-safe).

    With per-axis bit packing, halving every axis is a per-field shift; done
    via decode -> >>1 -> encode to stay obviously correct.
    """
    coords = decode(keys, spatial_size, data_dim)
    valid = keys != SENTINEL
    return encode(coords >> 1, valid, max(1, spatial_size // 2))


def lookup(sorted_keys: jnp.ndarray, queries: jnp.ndarray):
    """Resolve query keys against a sorted (sentinel-padded) key array.

    Returns (idx, found): idx in [0, V) (garbage where not found), found bool.

    method='sort': the default binary-search lowering is a log(V)-trip while
    loop of full-array gathers — measured as ~65% of an entire forward step
    on TPU (profile_step.py). TPU sorts are fast, and our query arrays are
    themselves near-sorted (neighbor keys of sorted keys), so the
    concatenate-and-sort lowering wins by >10x.
    """
    V = sorted_keys.shape[0]
    idx = jnp.searchsorted(sorted_keys, queries, method="sort")
    idx_c = jnp.clip(idx, 0, V - 1)
    found = (sorted_keys[idx_c] == queries) & (queries != SENTINEL)
    return idx_c, found
