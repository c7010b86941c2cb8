"""Tiled-dense sparse representation — the TPU performance engine.

Why this exists: SparseConvNet's gather-GEMM-scatter (SURVEY.md §2.12-2.13)
assumes cheap random row access, which GPUs have and TPUs do not — measured
XLA row-gathers run at ~14 ns/row (latency-bound), and the hardware
`tpu.dynamic_gather` only shuffles within an 8-sublane register. The
TPU-native formulation regularizes the sparsity instead:

  * active sites bucket into t^3 spatial tiles (t=8 default); only ACTIVE
    tiles are stored: (T, t, t, t, C) dense blocks + per-cell occupancy
    masks. LArTPC occupancy within active tiles is ~1-3%, giving a bounded
    FLOP inflation in exchange for fully regular memory access.
  * tile-level adjacency (6 face neighbors) replaces the per-voxel rulebook:
    lookups drop from O(V) rows to O(T) = O(V/12), and the gathered rows are
    kB-sized faces that run at HBM bandwidth, not latency.
  * submanifold convs become dense per-tile convs (after a 3-pass face halo
    exchange) with outputs masked by occupancy — exactly SCN semantics
    (inactive sites contribute zero and produce no output).
  * space-to-depth folding (2x per axis) turns the small-channel 3^d conv
    into 2^d GEMM taps with 8*C-wide contractions/outputs, saturating the
    128-lane MXU (ops/tile_conv.py).

Same key/sort/searchsorted machinery as ops/sparse_graph.py, applied at tile
granularity. The row-level gather engine (ops/sparse_graph.py +
ops/sparse_conv.py) remains the correctness oracle; both engines share the
same parameter layout so checkpoints are interchangeable.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.ops.coords import SENTINEL, decode, encode, lookup
from uresnet_pytorch_tpu.ops.sparse_graph import _dedup_sorted

# face offset order: -x, +x, -y, +y, -z, +z
FACE_OFFSETS = np.array([[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0],
                         [0, 0, -1], [0, 0, 1]], np.int32)


class TileLevel(NamedTuple):
    keys: jnp.ndarray      # (B, T) int32 sorted tile keys (grid G = S_l/t_l)
    num: jnp.ndarray       # (B,) active tile count
    face_nbr: jnp.ndarray  # (B, 2*dim, T) neighbor tile row; T if absent
    face_ok: jnp.ndarray   # (B, 2*dim, T) bool
    occ: jnp.ndarray       # (B, T, t^dim) bool active-cell mask


class TileDownLink(NamedTuple):
    parent: jnp.ndarray    # (B, Tf) coarse tile row; Tc when dropped
    octant: jnp.ndarray    # (B, Tf) corner id in [0, 2^dim)
    overflow: jnp.ndarray  # (B,)


class TileGraph(NamedTuple):
    levels: Tuple[TileLevel, ...]
    links: Tuple[TileDownLink, ...]
    feats0: jnp.ndarray       # (B, T0, t^dim, 1) merged input values
    vox_tile: jnp.ndarray     # (B, Vin) blob row -> tile row (T0 if invalid)
    vox_cell: jnp.ndarray     # (B, Vin) cell index inside the tile
    input_valid: jnp.ndarray  # (B, Vin) bool


def tile_size_at(cfg: URESNetConfig, level: int) -> int:
    return min(cfg.tile_size, cfg.level_spatial_size(level))


def tile_capacity_at(cfg: URESNetConfig, level: int) -> int:
    t = tile_size_at(cfg, level)
    cells = t ** cfg.data_dim
    cap = max(cfg.min_tiles,
              int(np.ceil(cfg.level_capacity(level) / cfg.tile_occupancy)))
    grid_tiles = (cfg.level_spatial_size(level) // t) ** cfg.data_dim
    return max(8, min(cap, grid_tiles))


def _sort_unique(keys: jnp.ndarray, cap: int):
    """Unsorted (possibly duplicate, sentinel-padded) keys -> (sorted unique
    (cap,), count)."""
    skeys = jnp.sort(keys)
    _, uniq, num, _ = _dedup_sorted(skeys, cap)
    return uniq, num


def close_tile_keys(active_keys: jnp.ndarray, grid: int, dim: int,
                    cap_out: int):
    """Relay closure for the 3-pass face halo (ops/tile_conv.halo_extend).

    The halo exchanges only faces, passing x then y then z; data between
    DIAGONALLY adjacent active tiles flows through intermediate tiles — which
    may not be active. For every active pair (A, A+δ) this adds the relay
    tiles A+(δx,0,0) and A+(δx,δy,0) (the pass-order prefix projections of
    δ), guaranteeing the path exists. Relays carry zero occupancy/features;
    they only forward halo data.

    Returns (closed sorted keys (cap_out,), count). Overflow beyond cap_out
    drops the largest keys (count is clamped; see SURVEY.md §7 hard part 1).
    """
    coords = decode(active_keys, grid, dim)
    valid = active_keys != SENTINEL
    cands = [active_keys]
    offsets = [tuple(o) for o in
               np.stack(np.meshgrid(*([np.arange(-1, 2)] * dim),
                                    indexing="ij"), -1).reshape(-1, dim)]
    for off in offsets:
        nz = sum(1 for o in off if o)
        if nz <= 1:
            continue  # center/axis-aligned: direct face path
        nkey = encode(coords + jnp.asarray(off, jnp.int32), valid, grid)
        _, pair = lookup(active_keys, nkey)
        relays = set()
        p1 = (off[0],) + (0,) * (dim - 1)
        relays.add(p1)
        if dim == 3:
            relays.add((off[0], off[1], 0))
        for p in relays:
            if not any(p) or p == off:
                continue
            cands.append(encode(coords + jnp.asarray(p, jnp.int32),
                                valid & pair, grid))
    allk = jnp.sort(jnp.concatenate(cands))
    _, closed, num, _ = _dedup_sorted(allk, cap_out)
    return closed, num


def _cell_index(coords: jnp.ndarray, t: int, dim: int) -> jnp.ndarray:
    """Raster cell id within a tile from full-res coords."""
    cell = coords[..., 0] & (t - 1)
    for d in range(1, dim):
        cell = cell * t + (coords[..., d] & (t - 1))
    return cell


def _shift_bits(t: int) -> int:
    return int(np.log2(t))


def build_tile_input(coords, values, n, spatial_size: int, t: int, Tcap: int,
                     merge_mode: str):
    """Per event: bucket voxels into tiles (closure-extended for the face
    halo); merge duplicate voxels per cell.

    Returns (tile_keys (Tcap,), num, feats (Tcap, t^dim), occ (Tcap, t^dim),
    vox_tile (Vin,), vox_cell (Vin,))."""
    Vin, dim = coords.shape
    cells = t ** dim
    rows = jnp.arange(Vin)
    valid = rows < n
    G = spatial_size // t
    tcoords = coords >> _shift_bits(t)
    tkey = encode(tcoords, valid, G)
    active, _ = _sort_unique(tkey, Tcap)
    uniq, num = close_tile_keys(active, G, dim, Tcap)

    vt, vt_ok = lookup(uniq, tkey)
    vox_tile = jnp.where(vt_ok, vt, Tcap).astype(jnp.int32)
    vox_cell = jnp.where(valid, _cell_index(coords, t, dim), 0).astype(jnp.int32)

    flat = jnp.where(vox_tile < Tcap, vox_tile * cells + vox_cell, Tcap * cells)
    feats = jnp.zeros((Tcap * cells,), values.dtype)
    occ = jnp.zeros((Tcap * cells,), jnp.bool_)
    occ = occ.at[flat].set(valid, mode="drop")
    vals = jnp.where(valid, values, 0.0)
    fsum = feats.at[flat].add(vals, mode="drop")
    if merge_mode == "sum":
        feats = fsum
    elif merge_mode == "mean":
        cnt = jnp.zeros((Tcap * cells,), jnp.float32).at[flat].add(
            valid.astype(jnp.float32), mode="drop")
        feats = fsum / jnp.maximum(cnt, 1.0)
    elif merge_mode == "max":
        feats = jnp.full((Tcap * cells,), -jnp.inf, values.dtype).at[flat].max(
            jnp.where(valid, values, -jnp.inf), mode="drop")
        feats = jnp.where(jnp.isfinite(feats), feats, 0.0)
    elif merge_mode == "last":
        pos_last = jnp.zeros((Tcap * cells,), jnp.int32).at[flat].max(
            jnp.where(valid, rows, 0).astype(jnp.int32), mode="drop")
        feats = jnp.where(occ, values[pos_last], 0.0)
    else:
        raise ValueError(merge_mode)
    return (uniq, num, feats.reshape(Tcap, cells), occ.reshape(Tcap, cells),
            vox_tile, vox_cell)


def tile_face_rules(keys: jnp.ndarray, grid: int, dim: int):
    """±axis neighbor tile rows via binary search on sorted tile keys."""
    coords = decode(keys, grid, dim)
    valid = keys != SENTINEL
    idxs, oks = [], []
    for off in FACE_OFFSETS[: 2 * dim]:
        nkey = encode(coords + jnp.asarray(off[:dim]), valid, grid)
        idx, ok = lookup(keys, nkey)
        idxs.append(idx.astype(jnp.int32))
        oks.append(ok)
    return jnp.stack(idxs), jnp.stack(oks)


def _fold_occ_downsample(occ, t, dim):
    """(T, t^dim) occupancy -> (T, (t/2)^dim) coarse-cell occupancy (any)."""
    T = occ.shape[0]
    if dim == 3:
        o = occ.reshape(T, t // 2, 2, t // 2, 2, t // 2, 2)
        return o.any(axis=(2, 4, 6)).reshape(T, (t // 2) ** 3)
    o = occ.reshape(T, t // 2, 2, t // 2, 2)
    return o.any(axis=(2, 4)).reshape(T, (t // 2) ** 2)


def _scatter_blocks(blocks, parent, octant, ok, Tc: int, tc: int, dim: int):
    """Place per-fine-tile (th^dim) blocks into coarse tiles' corner regions.

    blocks (Tf, th^dim, C); coarse tile edge tc = 2*th. Per octant the
    fine->coarse map is injective (unique scatter indices)."""
    Tf, cells_h, C = blocks.shape
    th = tc // 2
    out = jnp.zeros((Tc + 1, tc ** dim, C), blocks.dtype)
    bl = blocks.reshape((Tf,) + (th,) * dim + (C,))
    for o in range(2 ** dim):
        obits = [(o >> (dim - 1 - d)) & 1 for d in range(dim)]
        m = ok & (octant == o)
        tgt = jnp.where(m, parent, Tc)
        masked = bl * m.reshape((Tf,) + (1,) * (dim + 1)).astype(bl.dtype)
        # embed the th^dim block into the tc^dim tile at this corner
        pad = [(0, 0)]
        for d in range(dim):
            pad.append((obits[d] * th, (1 - obits[d]) * th))
        pad.append((0, 0))
        embedded = jnp.pad(masked, pad).reshape(Tf, tc ** dim, C)
        out = out.at[tgt].add(embedded, mode="drop", unique_indices=True)
    return out[:Tc]


def build_tile_graph(coords, values, n_voxels, cfg: URESNetConfig) -> TileGraph:
    """Padded blob arrays -> batched TileGraph (the per-batch "rulebook
    rebuild" of the reference, SURVEY.md §3.1, at tile granularity)."""
    S, dim, nlev = cfg.spatial_size, cfg.data_dim, cfg.uresnet_num_strides

    t0 = tile_size_at(cfg, 0)
    T0 = tile_capacity_at(cfg, 0)
    keys0, num0, feats0, occ0, vox_tile, vox_cell = jax.vmap(
        lambda c, v, n: build_tile_input(c, v, n, S, t0, T0,
                                         cfg.input_merge_mode)
    )(coords, values, n_voxels)

    rows = jax.lax.broadcasted_iota(jnp.int32, coords.shape[:2], 1)
    input_valid = rows < n_voxels[:, None]

    levels, links = [], []
    keys, num, occ = keys0, num0, occ0
    for l in range(nlev):
        t_l = tile_size_at(cfg, l)
        G_l = cfg.level_spatial_size(l) // t_l
        fn, fok = jax.vmap(lambda k: tile_face_rules(k, G_l, dim))(keys)
        levels.append(TileLevel(keys, num, fn, fok, occ))
        if l < nlev - 1:
            t_c = tile_size_at(cfg, l + 1)
            Tc = tile_capacity_at(cfg, l + 1)
            if t_c == t_l:
                # coarse tile grid halves. Coarse actives = parents of
                # OCCUPIED fine tiles (relays contribute nothing), then
                # closure for the coarse level's own halo.
                def link_one(k, o):
                    fc = decode(k, G_l, dim)
                    valid = k != SENTINEL
                    occ_any = o.any(axis=-1)
                    pk_occ = encode(fc >> 1, valid & occ_any, G_l // 2)
                    active_c, _ = _sort_unique(pk_occ, Tc)
                    keys_c, num_c = close_tile_keys(active_c, G_l // 2,
                                                    dim, Tc)
                    pk_all = encode(fc >> 1, valid, G_l // 2)
                    pidx, pok = lookup(keys_c, pk_all)
                    parent = jnp.where(pok, pidx, Tc).astype(jnp.int32)
                    corner = jnp.zeros_like(parent)
                    for d in range(dim):
                        corner = (corner << 1) | (fc[..., d] & 1)
                    corner = jnp.where(valid, corner, 0)
                    return keys_c, num_c, parent, corner

                keys_c, num_c, parent, octant = jax.vmap(link_one)(keys, occ)
                dropped = jnp.zeros_like(num_c)
                occ_h = jax.vmap(
                    lambda o: _fold_occ_downsample(o, t_l, dim))(occ)
                occ_c = jax.vmap(
                    lambda b, p, oc, okk: _scatter_blocks(
                        b[..., None].astype(jnp.float32), p, oc,
                        okk, Tc, t_c, dim)[..., 0] > 0
                )(occ_h, parent, octant, parent < Tc)
            else:
                # tile edge shrank with the grid (t_c = t_l / 2): tile keys
                # are UNCHANGED (same spatial region), link is identity
                assert t_c * 2 == t_l, (t_c, t_l)
                if Tc != keys.shape[1]:
                    Tc = keys.shape[1]
                keys_c, num_c = keys, num
                parent = jnp.where(
                    keys != SENTINEL,
                    jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1), Tc)
                octant = jnp.zeros_like(parent)
                dropped = jnp.zeros_like(num)
                occ_c = jax.vmap(
                    lambda o: _fold_occ_downsample(o, t_l, dim))(occ)
            links.append(TileDownLink(parent, octant, dropped))
            keys, num, occ = keys_c, num_c, occ_c

    return TileGraph(tuple(levels), tuple(links), feats0[..., None],
                     vox_tile, vox_cell, input_valid)
