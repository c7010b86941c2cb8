"""Sparse coordinate graph: TPU-native replacement for SparseConvNet's
metadata + rulebooks (SURVEY.md §2.11).

SCN builds per-layer hash maps and (in_row, out_row) pair lists in C++
(SCN/Metadata, SURVEY.md §2.11). TPUs want static shapes and vectorized
lookups, so the whole structure becomes arrays (design: SURVEY.md §7;
sort/merge mapping per PointAcc arXiv:2110.07600):

  * each resolution level's active set = a SORTED int32 key array of static
    capacity, sentinel-padded (the "hash map" is binary search),
  * submanifold rules = for each of the 3^d offsets, the neighbor's row
    index in the same key array (+ validity) — output sites ≡ input sites,
    the defining submanifold property (arXiv:1711.10275 §3),
  * stride-2 conv rules = for each fine site, the row of its coarse parent
    cell and which of the 2^d corners it occupies. Per corner the
    fine→coarse map is injective (two distinct fine sites in the same cell
    differ in some low bit), so scatter-adds are collision-free — no
    atomics needed anywhere on this design.
  * deconv reuses the same link transposed, restoring EXACTLY the encoder's
    finer coordinate set (required for skip concats, SURVEY.md §2.11).

Everything here is per-event and vmapped over the batch; capacities come
from URESNetConfig.level_capacity. Overflow policy (SURVEY.md §7 hard part
1): coarse sites beyond capacity are dropped and counted in `overflow`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.ops.coords import SENTINEL, decode, encode, lookup


class SparseLevel(NamedTuple):
    """One resolution level's active set + submanifold rulebook."""
    keys: jnp.ndarray      # (B, V) int32, sorted ascending, SENTINEL padding
    num: jnp.ndarray       # (B,) int32 active count
    nbr_idx: jnp.ndarray   # (B, K, V) int32 neighbor row per kernel offset
    nbr_ok: jnp.ndarray    # (B, K, V) bool


class DownLink(NamedTuple):
    """Stride-2 correspondence between level l (fine) and l+1 (coarse)."""
    parent: jnp.ndarray    # (B, Vf) int32 row in coarse level; == Vc when dropped
    offset: jnp.ndarray    # (B, Vf) int32 corner id in [0, 2^d)
    overflow: jnp.ndarray  # (B,) int32 coarse sites dropped for capacity


class SparseGraph(NamedTuple):
    levels: Tuple[SparseLevel, ...]
    links: Tuple[DownLink, ...]
    feats0: jnp.ndarray        # (B, V0, 1) merged input features, level-0 order
    row_of_input: jnp.ndarray  # (B, Vin) int32: blob row -> level-0 row
    input_valid: jnp.ndarray   # (B, Vin) bool


def kernel_offsets(data_dim: int, kernel_size: int = 3) -> np.ndarray:
    """Static (K, dim) offset table, SCN-style raster order (offset
    enumeration order matters for torch-weight import, SURVEY.md §7 hard
    part 5: last axis fastest, -1..1)."""
    r = kernel_size // 2
    grids = np.meshgrid(*([np.arange(-r, r + 1)] * data_dim), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1).astype(np.int32)


# ---------------------------------------------------------------------------
# per-event builders (vmap over batch at the call sites below)
# ---------------------------------------------------------------------------

def _dedup_sorted(skeys: jnp.ndarray, cap_out: int):
    """Sorted keys -> (segment id per sorted row (cap_out = dropped),
    unique sorted keys of capacity cap_out, n_unique, n_dropped)."""
    V = skeys.shape[0]
    valid = skeys != SENTINEL
    prev = jnp.concatenate([jnp.full((1,), SENTINEL, skeys.dtype), skeys[:-1]])
    first = (skeys != prev) & valid
    seg = jnp.cumsum(first) - 1                      # id among uniques
    n_unique = jnp.sum(first)
    seg = jnp.where(valid & (seg < cap_out), seg, cap_out)
    uniq = jnp.full((cap_out,), SENTINEL, skeys.dtype)
    uniq = uniq.at[seg].min(skeys, mode="drop")
    n_kept = jnp.minimum(n_unique, cap_out)
    return seg, uniq, n_kept, n_unique - n_kept


def build_input_level(coords: jnp.ndarray, values: jnp.ndarray, n: jnp.ndarray,
                      spatial_size: int, cap: int, merge_mode: str):
    """InputLayer equivalent (SCN scn.InputLayer, SURVEY.md §2.11 IO rules):
    encode coords, sort, dedupe with the configured duplicate-merge mode.

    Per event: coords (Vin, dim), values (Vin,), n scalar.
    Returns (keys (cap,), num, feats (cap,), row_of_input (Vin,), rep (cap,)).
    `rep` = original blob row representing each level-0 row (first occurrence
    in input order; carries labels/weights). `row_of_input` inverts it.
    """
    Vin = coords.shape[0]
    rows = jnp.arange(Vin)
    valid = rows < n
    keys = encode(coords, valid, spatial_size)
    order = jnp.argsort(keys, stable=True)
    skeys = keys[order]
    svals = values[order]
    seg, uniq, num, _ = _dedup_sorted(skeys, cap)

    ssum = jnp.zeros((cap,), values.dtype).at[seg].add(svals, mode="drop")
    if merge_mode == "sum":
        feats = ssum
    elif merge_mode == "mean":
        cnt = jnp.zeros((cap,), jnp.float32).at[seg].add(1.0, mode="drop")
        feats = ssum / jnp.maximum(cnt, 1.0)
    elif merge_mode == "max":
        feats = jnp.full((cap,), -jnp.inf, values.dtype).at[seg].max(
            svals, mode="drop")
        feats = jnp.where(jnp.isfinite(feats), feats, 0.0)
    elif merge_mode == "last":
        # stable sort keeps input order within a segment: take max position
        pos_last = jnp.zeros((cap,), jnp.int32).at[seg].max(
            jnp.arange(Vin, dtype=jnp.int32), mode="drop")
        feats = svals[pos_last]
    else:
        raise ValueError(merge_mode)

    # representative original row per level-0 row (stable => min original idx)
    rep = jnp.full((cap,), Vin, jnp.int32).at[seg].min(
        order.astype(jnp.int32), mode="drop")
    rep = jnp.where(rep == Vin, 0, rep)
    # blob row -> level-0 row (cap for invalid rows)
    row_of_input = jnp.full((Vin,), cap, jnp.int32).at[order].set(
        seg.astype(jnp.int32))
    return uniq, num, feats, row_of_input, rep


def submanifold_rules(keys: jnp.ndarray, spatial_size: int, data_dim: int,
                      kernel_size: int = 3):
    """Per-offset neighbor rows via binary search on the sorted key array
    (SCN getSubmanifoldRuleBook, SURVEY.md §2.11)."""
    offsets = kernel_offsets(data_dim, kernel_size)
    coords = decode(keys, spatial_size, data_dim)
    valid = keys != SENTINEL
    idxs, oks = [], []
    center = (len(offsets) - 1) // 2
    V = keys.shape[0]
    identity = jnp.arange(V, dtype=jnp.int32)
    for k, off in enumerate(offsets):
        if k == center:  # center offset pairs each site with itself
            idxs.append(identity)
            oks.append(valid)
            continue
        nkey = encode(coords + jnp.asarray(off), valid, spatial_size)
        idx, ok = lookup(keys, nkey)
        idxs.append(idx.astype(jnp.int32))
        oks.append(ok)
    return jnp.stack(idxs), jnp.stack(oks)


def downsample_link(keys_f: jnp.ndarray, spatial_size: int, data_dim: int,
                    cap_c: int):
    """Stride-2 convolution rules (SCN ConvolutionRules, SURVEY.md §2.11):
    coarse active set = unique parent cells; per fine site its coarse row
    and corner id."""
    Vf = keys_f.shape[0]
    coords = decode(keys_f, spatial_size, data_dim)
    valid = keys_f != SENTINEL
    pkey = encode(coords >> 1, valid, max(1, spatial_size // 2))
    porder = jnp.argsort(pkey, stable=True)
    spk = pkey[porder]
    seg, uniq, num_c, dropped = _dedup_sorted(spk, cap_c)
    parent = jnp.full((Vf,), cap_c, jnp.int32).at[porder].set(
        seg.astype(jnp.int32))
    corner = jnp.zeros((Vf,), jnp.int32)
    for d in range(data_dim):
        corner = (corner << 1) | (coords[..., d] & 1)
    corner = jnp.where(valid, corner, 0)
    return uniq, num_c, parent, corner, dropped


# ---------------------------------------------------------------------------
# full batched graph
# ---------------------------------------------------------------------------

def build_graph(coords: jnp.ndarray, values: jnp.ndarray, n_voxels: jnp.ndarray,
                cfg: URESNetConfig) -> SparseGraph:
    """Padded blob arrays -> full multi-level SparseGraph (batched).

    This is the per-batch "rulebook rebuild" of the reference
    (SURVEY.md §3.1 hot loop) — one jitted, static-shape program.
    """
    S = cfg.spatial_size
    dim = cfg.data_dim
    nlev = cfg.uresnet_num_strides

    cap0 = cfg.level_capacity(0)
    keys0, num0, feats0, row_of_input, rep = jax.vmap(
        lambda c, v, n: build_input_level(c, v, n, S, cap0,
                                          cfg.input_merge_mode)
    )(coords, values, n_voxels)

    rows = jax.lax.broadcasted_iota(jnp.int32, coords.shape[:2], 1)
    input_valid = rows < n_voxels[:, None]

    levels = []
    links = []
    keys, num = keys0, num0
    for l in range(nlev):
        S_l = cfg.level_spatial_size(l)
        nbr_idx, nbr_ok = jax.vmap(
            lambda k: submanifold_rules(k, S_l, dim))(keys)
        levels.append(SparseLevel(keys, num, nbr_idx, nbr_ok))
        if l < nlev - 1:
            cap_c = cfg.level_capacity(l + 1)
            keys_c, num_c, parent, corner, dropped = jax.vmap(
                lambda k: downsample_link(k, S_l, dim, cap_c))(keys)
            links.append(DownLink(parent, corner, dropped))
            keys, num = keys_c, num_c

    return SparseGraph(tuple(levels), tuple(links), feats0[..., None],
                       row_of_input, input_valid), rep


def gather_rows(batched: jnp.ndarray, idx: jnp.ndarray,
                fill: float = 0.0) -> jnp.ndarray:
    """(B, V, ...) values gathered at (B, R) row indices; out-of-range -> fill."""
    return jax.vmap(
        lambda x, i: jnp.take(x, i, axis=0, mode="fill", fill_value=fill)
    )(batched, idx)
