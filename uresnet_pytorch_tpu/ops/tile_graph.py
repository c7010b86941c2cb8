"""Tiled-dense sparse representation — the TPU performance engine.

Why this exists: SparseConvNet's gather-GEMM-scatter (SURVEY.md §2.12-2.13)
assumes cheap random row access, which GPUs have and TPUs do not — measured
XLA row-gathers run at ~0.4 µs/row regardless of row size. The TPU-native
formulation regularizes the sparsity:

  * active sites bucket into t^d spatial tiles stored as dense blocks with
    per-cell occupancy masks; convs become dense per-tile GEMMs (MXU).
  * the conv halo is a DIRECT 3^d-1 neighbor gather (ops/halo.py): every
    tile pulls face/edge/corner slabs straight from its diagonal neighbors,
    so the tile set contains only occupied tiles (no relay closure) and the
    whole halo is one kernel on TPU.
  * down/up-sample tile links are `GatherSpec`s: block-banded one-hot
    matmuls against dynamically-positioned source windows (MXU-speed
    permutation), plus a small EXACT correction list for out-of-window
    pairs. Sorted tile keys make link indices near-monotone, so windows
    stay narrow.

Same key/sort/searchsorted machinery as ops/sparse_graph.py, applied at tile
granularity. The row-gather engine remains the correctness oracle; both
engines share one parameter tree.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.ops.coords import (SENTINEL, compact_marked, decode,
                                             encode, lookup, lookup_monotone)
from uresnet_pytorch_tpu.ops.halo import (HALO_CORR_CAP, Halo26Spec,
                                          build_halo26)
from uresnet_pytorch_tpu.ops.sparse_graph import _dedup_sorted

LINK_BLOCK = 256                        # down/up tile links
CORR_CAP = 256                          # exact out-of-window pairs per spec


class GatherSpec(NamedTuple):
    """Row-permutation plan: out[i] = src[idx[i]] if ok[i] else 0, executed
    as block-banded one-hot matmuls + an exact correction list
    (ops/tile_conv.windowed_gather)."""
    idx: jnp.ndarray        # (B, N) int32 rows into src
    ok: jnp.ndarray         # (B, N) bool (True only for in-window rows)
    starts: jnp.ndarray     # (B, N/Bk) int32 window start per block
    corr_src: jnp.ndarray   # (B, P) int32
    corr_dst: jnp.ndarray   # (B, P) int32
    corr_ok: jnp.ndarray    # (B, P) bool
    overflow: jnp.ndarray   # (B,) int32 pairs beyond the correction capacity
    window: jnp.ndarray     # (win,) int8 zeros — static window size carrier


class TileLevel(NamedTuple):
    keys: jnp.ndarray              # (B, T) sorted tile keys, sentinel-padded
    num: jnp.ndarray               # (B,)
    occ: jnp.ndarray               # (B, T, t^d) bool active cells
    halo: Halo26Spec               # direct 3^d-1 neighbor maps (ops/halo.py)


class TileDownLink(NamedTuple):
    children: Tuple[GatherSpec, ...]  # 2^d specs: coarse row <- fine tile row
    parents: Tuple[GatherSpec, ...]   # 2^d specs: fine row <- CORNER-VIEW row
    #   (8*parent_rank + octant). Per-octant because fine-lex -> coarse-lex
    #   halving back-jumps where a trailing coordinate wraps, but restricted
    #   to one corner parity it is STRICTLY monotone — so each spec's
    #   windows stay narrow and the old 4096-entry structural correction
    #   list (whose size scaled with event structure) is gone. Gathering
    #   corner-view rows also deletes the decoder's octant one-hot
    #   contraction at equal total gather cost (same lanes moved).
    overflow: jnp.ndarray             # (B,)


class TileGraph(NamedTuple):
    levels: Tuple[TileLevel, ...]
    links: Tuple[TileDownLink, ...]
    feats0: jnp.ndarray       # (B, T0, t^d, 1)
    vox_tile: jnp.ndarray     # (B, Vin)
    vox_cell: jnp.ndarray     # (B, Vin)
    input_valid: jnp.ndarray  # (B, Vin)
    tile_spill: jnp.ndarray   # (B,) tiles dropped by capacity, all levels
    vox_spill: jnp.ndarray    # (B,) level-0 voxels whose tile was dropped


def graph_overflows(graph: "TileGraph") -> jnp.ndarray:
    """Total correction-list overflow across all gather specs (per batch).

    Non-zero means some out-of-window pairs were DROPPED (wrong halo values)
    — raise ops/halo.HALO_CORR_CAP (halo specs) / ops/tile_graph.CORR_CAP
    (link specs) or reduce batch/event size. Checked by tests and surfaced
    per step through TrainVal metrics."""
    tot = jnp.zeros((), jnp.int32)
    for lev in graph.levels:
        tot = tot + lev.halo.overflow.sum()
    for link in graph.links:
        for spec in link.children:
            tot = tot + spec.overflow.sum()
        for spec in link.parents:
            tot = tot + spec.overflow.sum()
        tot = tot + link.overflow.sum()
    return tot


def graph_spills(graph: "TileGraph") -> jnp.ndarray:
    """Tiles dropped because a level's tile capacity overflowed (summed
    over batch and levels). Non-zero means whole tiles of voxels got ZERO
    logits (drop-and-count spill policy, SURVEY.md §7 hard part 1) — raise
    `tile_occupancy`/`capacity_factor` headroom or reduce event density.
    `graph.vox_spill` counts the affected level-0 voxels directly."""
    return graph.tile_spill.sum()


def tile_size_at(cfg: URESNetConfig, level: int) -> int:
    t = cfg.tile_sizes[level] if cfg.tile_sizes is not None else cfg.tile_size
    return min(t, cfg.level_spatial_size(level))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tile_capacity_at(cfg: URESNetConfig, level: int) -> int:
    t = tile_size_at(cfg, level)
    if level > 0 and tile_size_at(cfg, level - 1) == 2 * t:
        # halving transition: spatial and t both halve, so the tile GRID is
        # unchanged and the level inherits the parent's tile set verbatim
        # (build_tile_graph's identity-link branch)
        return tile_capacity_at(cfg, level - 1)
    cap = max(cfg.min_tiles,
              int(np.ceil(cfg.level_capacity(level)
                          / cfg.tile_occupancy_at(level))))
    grid_tiles = (cfg.level_spatial_size(level) // t) ** cfg.data_dim
    cap = min(cap, grid_tiles)
    # block machinery wants capacities divisible by the largest block size
    return _round_up(max(8, cap), min(256, _round_up(cap, 8)))


# ---------------------------------------------------------------------------
# gather specs
# ---------------------------------------------------------------------------

def make_gather_spec(idx: jnp.ndarray, ok: jnp.ndarray, src_len: int,
                     block: int, corr_cap: int = None,
                     win_mult: int = 3) -> GatherSpec:
    """Plan a windowed permutation (per event; vmapped by callers).

    idx/ok (N,). Window per block of `block` outputs = win_mult*block source
    rows starting at the block's smallest valid index (clamped). win_mult
    must exceed the typical idx spread per block: 3 for near-monotone maps
    (faces), larger when idx is a scaled map (tile links expand indices by
    2^dim, so their spread per block is ~(2^dim * len_ratio) * block).
    corr_cap reads module-level CORR_CAP when None (late-bound so tests can
    monkeypatch it to force overflow)."""
    if corr_cap is None:
        corr_cap = CORR_CAP
    N = idx.shape[0]
    Bk = min(block, N)
    while N % Bk:
        Bk //= 2
    nb = N // Bk
    # cap the window at the (8-aligned) source length and clamp starts so
    # every window is inside [0, src_len) — consumers then need no row
    # padding (see ops/halo.py); a window covering the whole tail keeps
    # every idx < src_len in-band, so no pairs shift to the corrections
    win = min(win_mult * Bk, max(8, (src_len // 8) * 8))
    blocks = jnp.where(ok, idx, src_len + win).reshape(nb, Bk)
    starts = jnp.clip(jnp.min(blocks, axis=1), 0, max(src_len - win, 0))
    # 8-aligned so the Pallas kernel's dynamic window DMA satisfies the
    # sublane tiling constraint
    starts = ((starts // 8) * 8).astype(jnp.int32)
    local = idx - jnp.repeat(starts, Bk)
    inband = ok & (local >= 0) & (local < win)
    bad = ok & ~inband
    # scatter-free compaction of the out-of-window pairs (ops/halo.py
    # compact_marked rationale: XLA scatter was the graph build's top cost)
    fi, corr_ok, n_bad = compact_marked(bad, corr_cap)
    corr_src = jnp.where(corr_ok, jnp.take(idx, fi), 0).astype(jnp.int32)
    corr_dst = jnp.where(corr_ok, fi, 0).astype(jnp.int32)
    overflow = jnp.maximum(n_bad - corr_cap, 0).astype(jnp.int32)
    return GatherSpec(idx.astype(jnp.int32), inband, starts,
                      corr_src, corr_dst, corr_ok, overflow,
                      jnp.zeros((win,), jnp.int8))


# ---------------------------------------------------------------------------
# closure + per-event builders
# ---------------------------------------------------------------------------

def _sort_unique(keys: jnp.ndarray, cap: int):
    """Returns (unique sorted keys (cap,), n_kept, n_dropped). n_dropped
    counts uniques beyond capacity — silently losing them loses whole
    tiles of voxels, so callers must surface it (graph_spills)."""
    skeys = jnp.sort(keys)
    _, uniq, num, n_dropped = _dedup_sorted(skeys, cap)
    return uniq, num, n_dropped


def _cell_index(coords: jnp.ndarray, t: int, dim: int) -> jnp.ndarray:
    cell = coords[..., 0] & (t - 1)
    for d in range(1, dim):
        cell = cell * t + (coords[..., d] & (t - 1))
    return cell


def _shift_bits(t: int) -> int:
    return int(np.log2(t))


def build_tile_input(coords, values, n, spatial_size: int, t: int, Tcap: int,
                     merge_mode: str):
    """Per event: bucket voxels into occupied tiles; merge duplicates per
    cell. Returns (tile_keys, num, feats (Tcap, t^d), occ (Tcap, t^d),
    vox_tile (Vin,), vox_cell (Vin,))."""
    Vin, dim = coords.shape
    cells = t ** dim
    rows = jnp.arange(Vin)
    valid = rows < n
    G = spatial_size // t
    tcoords = coords >> _shift_bits(t)
    tkey = encode(tcoords, valid, G)
    uniq, num, n_spill = _sort_unique(tkey, Tcap)

    vt, vt_ok = lookup(uniq, tkey)
    vox_tile = jnp.where(vt_ok, vt, Tcap).astype(jnp.int32)
    vox_spill = jnp.sum(valid & ~vt_ok).astype(jnp.int32)
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
            vox_tile, vox_cell, n_spill, vox_spill)


@np.vectorize
def _fold_parent_cell(c, t, dim):
    # cell index -> parent (t/2-grid) cell index, per-axis halving
    out, th = 0, t // 2
    for d in range(dim):
        comp = (c // (t ** (dim - 1 - d))) % t
        out = out * th + comp // 2
    return out


def _fold_occ_downsample(occ, t, dim):
    # ONE small static matmul against the cell->parent-cell 0/1 fold matrix,
    # NOT a multi-axis reshape+reduce: the 8-D bool reshape forced a
    # pathological T(4,128) relayout + convert_reduce (profiled 39 ms/step
    # at bench scale); reduce_or itself lowers even worse (17 ms extra)
    T, cells = occ.shape
    hc = (t // 2) ** dim
    F = np.zeros((cells, hc), np.float32)
    F[np.arange(cells), _fold_parent_cell(np.arange(cells), t, dim)] = 1.0
    s = jnp.dot(occ.astype(jnp.float32), jnp.asarray(F),
                preferred_element_type=jnp.float32)
    return s > 0


def _down_link(keys_f, occ_any, grid_f: int, dim: int, Tc: int,
               cs: int = 1):
    """Per event: coarse keys (occupied parents), child gather specs
    (coarse <- fine, one per corner) and the parent spec
    (fine <- coarse corner view). `cs` scales every correction budget
    (URESNetConfig.corr_scale_at — 1 at the validated 512^3 shape)."""
    fc = decode(keys_f, grid_f, dim)
    valid = keys_f != SENTINEL
    grid_c = grid_f // 2
    pk_occ = encode(fc >> 1, valid & occ_any, grid_c)
    keys_c, num_c, n_spill = _sort_unique(pk_occ, Tc)

    cc = decode(keys_c, grid_c, dim)
    valid_c = keys_c != SENTINEL
    Tf = keys_f.shape[0]
    # ALL 2^dim corner lookups in one sort (each lookup call pays a
    # concat+sort; stacking queries amortizes it 8x)
    child_keys = jnp.stack([
        encode(cc * 2 + jnp.asarray(
            [(o >> (dim - 1 - d)) & 1 for d in range(dim)], jnp.int32),
            valid_c, grid_f)
        for o in range(2 ** dim)])                       # (2^dim, Tc)
    # corner queries of sorted coarse keys are monotone (coord doubling
    # preserves lexicographic key order) — rank-windowed lookup applies.
    # The insertion points of a block of coarse queries span ~(Tf/Tc)≈2.5x
    # block rows of keys_f, so the default win_mult=4 under-brackets dense
    # events, and the correction budget is shared by all 2^dim corner rows:
    # measured at bench scale (512^3, 1e5 vox, batch 8) the defaults
    # dropped up to 898 pairs/event — win_mult=8 + corr_cap=8192 measured
    # zero drops with wide margin
    cidx_all, cok_all, cdrop = lookup_monotone(keys_f, child_keys,
                                               win_mult=8,
                                               corr_cap=8192 * cs)
    children = []
    for o in range(2 ** dim):
        # child idx expands by the fine/coarse tile-count ratio (~2-3):
        # widen the window accordingly
        children.append(make_gather_spec(cidx_all[o].astype(jnp.int32),
                                         cok_all[o], Tf,
                                         LINK_BLOCK, win_mult=6,
                                         corr_cap=CORR_CAP * cs))
    # fine -> (parent, octant) for the decoder; parent keys of sorted fine
    # keys are non-decreasing per octant (coord halving back-jumps only
    # where a trailing coordinate wraps ACROSS parities)
    pidx, pok, pdrop = lookup_monotone(
        keys_c, encode(fc >> 1, valid, grid_c)[None], corr_cap=4096 * cs)
    pidx, pok = pidx[0], pok[0]
    corner = jnp.zeros((Tf,), jnp.int32)
    for d in range(dim):
        corner = (corner << 1) | (fc[..., d] & 1)
    corner = jnp.where(valid, corner, 0)
    # PER-OCTANT parent specs over the coarse CORNER VIEW (row = parent
    # rank * 2^dim + octant): restricted to one corner parity the fine-lex
    # -> coarse-lex map is strictly monotone, so windows bracket cleanly
    # and corrections return to the default budget — the old single spec
    # needed a 4096-entry exact correction list because octant interleaving
    # back-jumps broke its window model (and its windows had to carry whole
    # coarse tiles; the corner view moves the same lanes once).
    noct = 2 ** dim
    idx2 = (pidx.astype(jnp.int32) * noct + corner).astype(jnp.int32)
    parents = tuple(
        make_gather_spec(idx2, pok & (corner == o), Tc * noct,
                         LINK_BLOCK, corr_cap=1024 * cs, win_mult=4)
        for o in range(noct))
    return (keys_c, num_c, tuple(children), parents, n_spill,
            (cdrop + pdrop).astype(jnp.int32))


def build_tile_graph(coords, values, n_voxels, cfg: URESNetConfig) -> TileGraph:
    """Padded blob arrays -> batched TileGraph (the per-batch "rulebook
    rebuild" of the reference, SURVEY.md §3.1, at tile granularity)."""
    S, dim, nlev = cfg.spatial_size, cfg.data_dim, cfg.uresnet_num_strides

    t0 = tile_size_at(cfg, 0)
    T0 = tile_capacity_at(cfg, 0)
    (keys0, num0, feats0, occ0, vox_tile, vox_cell, spill0,
     vox_spill) = jax.vmap(
        lambda c, v, n: build_tile_input(c, v, n, S, t0, T0,
                                         cfg.input_merge_mode)
    )(coords, values, n_voxels)
    tile_spill = spill0.astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, coords.shape[:2], 1)
    input_valid = rows < n_voxels[:, None]

    levels, links = [], []
    keys, num, occ = keys0, num0, occ0
    for l in range(nlev):
        t_l = tile_size_at(cfg, l)
        G_l = cfg.level_spatial_size(l) // t_l
        cs_l = cfg.corr_scale_at(l)
        halo = jax.vmap(lambda k: build_halo26(
            k, G_l, dim, corr_cap=HALO_CORR_CAP * cs_l))(keys)
        levels.append(TileLevel(keys, num, occ, halo))
        if l < nlev - 1:
            t_c = tile_size_at(cfg, l + 1)
            Tc = tile_capacity_at(cfg, l + 1)
            # int sum > 0, NOT occ.any: XLA's reduce_or lowers poorly on
            # TPU (profiled 17 ms/step at bench scale; reduce-add is free)
            occ_any = jnp.sum(occ.astype(jnp.int32), axis=-1) > 0
            if t_c == t_l:
                if Tc > keys.shape[1]:
                    Tc = keys.shape[1]
                (keys_c, num_c, children, parents, spill_c,
                 lk_drop) = jax.vmap(
                    lambda k, oa: _down_link(k, oa, G_l, dim, Tc,
                                             cs=cs_l))(keys, occ_any)
                tile_spill = tile_spill + spill_c.astype(jnp.int32)
                occ_h = jax.vmap(
                    lambda o: _fold_occ_downsample(o, t_l, dim))(occ)
                # coarse occupancy: pull each corner's child occupancy.
                # bf16 carries 0/1 exactly AND dispatches to the Pallas
                # windowed-gather on TPU — the f32 XLA fallback's vmapped
                # dynamic-slice windows cost ~25 ms/step at bench scale
                from uresnet_pytorch_tpu.ops.tile_conv import assemble_children
                occ_c = assemble_children(
                    occ_h[..., None].astype(jnp.bfloat16), children, t_c,
                    dim)[..., 0] > 0
            else:
                # tile edge shrank with the grid: same tile rows, cells halve
                assert t_c * 2 == t_l, (t_c, t_l)
                Tc = keys.shape[1]
                keys_c, num_c = keys, num
                ident = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
                ok = keys != SENTINEL
                mk = lambda i, o: jax.vmap(
                    lambda ii, oo: make_gather_spec(ii, oo, Tc, LINK_BLOCK)
                )(i, o)
                children = (mk(ident, ok),)
                parents = (mk(ident, ok),)   # unused (identity movement)
                occ_c = jax.vmap(
                    lambda o: _fold_occ_downsample(o, t_l, dim))(occ)
                lk_drop = jnp.zeros_like(num_c)
            # lk_drop: link-lookup pairs the rank-windowed lookup dropped
            # (counted into the same overflow surface as spec corrections)
            links.append(TileDownLink(children, parents,
                                      lk_drop.astype(jnp.int32)))
            keys, num, occ = keys_c, num_c, occ_c

    return TileGraph(tuple(levels), tuple(links), feats0[..., None],
                     vox_tile, vox_cell, input_valid, tile_spill,
                     vox_spill.astype(jnp.int32))
