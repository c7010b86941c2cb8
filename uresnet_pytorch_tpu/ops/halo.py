"""Direct 26-neighbor tile halo: one gather step, no relay passes.

Replaces the 3-pass face halo (x->y->z with relay-tile closure) with a
single direct gather: every tile pulls the face/edge/corner slab it needs
from each of its 3^d-1 neighbors, located by one sorted-key lookup per
offset. Consequences:

  * NO relay closure — tile sets contain only occupied tiles, shrinking the
    padded tile capacity every level (relays carried zero occupancy and
    existed purely to forward halo data through the pass chain).
  * ONE kernel invocation per halo instead of 3 gathers + 3 growing
    concatenations (the measured dominant cost of a submanifold conv).
  * The transpose (backward) is the SAME gather with negated offsets: tile
    j's cotangent pulls slab contributions from idx[-delta][j] — offset
    symmetry means one spec serves both directions (ops/pallas/halo_fused
    runs both on TPU).

Replaces SparseConvNet's per-offset rulebook application (SURVEY.md
§2.11-2.13: gather-GEMM-scatter per 3^d offset) at tile granularity: the
offset rulebooks here are the (idx, ok) neighbor maps; windows + correction
lists make their application MXU-shaped (see ops/tile_graph.py rationale).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_pytorch_tpu.ops.coords import (SENTINEL, compact_marked, decode,
                                             encode, flat_cumsum, lookup,
                                             lookup_monotone,
                                             monotone_positions)

_flat_cumsum = flat_cumsum       # back-compat aliases (helpers moved to
#                                  ops/coords.py, shared with lookup_monotone)

import os

# defaults for the windowed execution (Pallas kernel); the XLA reference
# ignores windows and is exact by construction. Env overrides exist for
# benchmark sweeps only (benchmarks/run_all.py documents results).
HALO_BLOCK = int(os.environ.get("URESNET_HALO_BLOCK", 128))
#                      output rows per window block (kernel VMEM sizing)
# window rows = mult * block, anchored PER OFFSET: every offset's neighbor
# map is monotone (sorted keys + constant offset preserve order), so each
# offset's sources for a block of Bk rows span ~Bk rows + density jitter —
# 2x covers it; stragglers go through the correction/patch list
HALO_WIN_MULT = int(os.environ.get("URESNET_HALO_WIN_MULT", 2))
# exact out-of-window pairs per event (all offsets) — these become kernel
# patch rows, so the cap scales the one-hot K-dim; overflow beyond it is
# dropped-and-counted (surfaced in TrainVal metrics). Measured worst case
# on 512^3/1e5-voxel events at Bk=128/win=256: 180 pairs (the spread tail
# is structural slab-boundary jumps; bigger windows don't drain it)
HALO_CORR_CAP = int(os.environ.get("URESNET_HALO_CORR_CAP", 256))
# share one window START per leading-axis offset group (d0 in {-1,0,+1}):
# every offset in a group then has identical starts, letting the Pallas
# kernels fetch each group's contiguous lane range with ONE DMA — the
# kernels were DMA-ISSUE-bound at 3^d-1 window DMAs per grid step. The
# group spread (max-min of member starts) is absorbed by a taller window
# (HALO_GROUP_WIN_MULT x block); residual stragglers still ride the
# correction list, so this stays exact. 0 disables (per-offset windows).
# Group win_mult swept on-chip at 512^3/1e5 vox, batch 8: mult=3 -> 6.00
# ev/s vs mult=4 -> 5.66 (smaller window bytes win; corrections stay well
# under cap: max 149/256 used, zero overflow, benchmarks/run_all.py).
HALO_GROUP = int(os.environ.get("URESNET_HALO_GROUP", 1))
HALO_GROUP_WIN_MULT = int(os.environ.get("URESNET_HALO_GROUP_WIN_MULT", 3))
# Per-offset sub-window rebasing inside the (taller) group window: each
# offset's neighbor map is monotone, so its block sources span ~Bk rows —
# the group window's extra height only absorbs the BETWEEN-offset start
# spread. The conv kernels' one-hot dots therefore contract over a
# per-offset (HALO_WIN_MULT * block)-row slice of the group window,
# anchored at spec.rebase, instead of the full group window — gather MACs
# scale with the contraction depth (win=384 at bench scale made gathers
# ~45% of kernel MACs). Pairs outside the sub-window ride the correction
# list as usual, so this stays exact. 0 disables (sub-window = window).
HALO_REBASE = int(os.environ.get("URESNET_HALO_REBASE", 1))


@lru_cache(maxsize=None)
def halo_groups(dim: int) -> tuple:
    """Offset-index ranges [(k_start, k_end), ...) grouped by the leading
    offset coordinate d0. Offsets are lexicographic, so groups are
    contiguous in k AND in the packed slab-lane layout."""
    offs = halo_offsets(dim)
    groups = []
    start = 0
    for k in range(1, len(offs) + 1):
        if k == len(offs) or offs[k][0] != offs[start][0]:
            groups.append((start, k))
            start = k
    return tuple(groups)


@lru_cache(maxsize=None)
def halo_offsets(dim: int) -> tuple:
    """The 3^dim - 1 nonzero neighbor offsets, lexicographic. Negation
    reverses this order: offset index of -delta is (K-1-k)."""
    offs = [tuple(o) for o in
            np.stack(np.meshgrid(*([np.arange(-1, 2)] * dim),
                                 indexing="ij"), -1).reshape(-1, dim)
            if any(o)]
    return tuple(offs)


@lru_cache(maxsize=None)
def slab_cells(delta: tuple, t: int):
    """Static cell geometry for one neighbor offset.

    Returns (ext_cells, src_cells) int32 arrays of length S: ext_cells are
    positions in the (t+2)^dim halo-extended tile (row-major, last axis
    fastest) that offset `delta` fills; src_cells are the matching positions
    in the neighbor's t^dim tile. S = prod(t if d==0 else 1 for d in delta).
    """
    dim = len(delta)
    axes_ext, axes_src = [], []
    for d in delta:
        if d == -1:
            axes_ext.append(np.array([0]))
            axes_src.append(np.array([t - 1]))
        elif d == 1:
            axes_ext.append(np.array([t + 1]))
            axes_src.append(np.array([0]))
        else:
            axes_ext.append(np.arange(1, t + 1))
            axes_src.append(np.arange(t))
    eg = np.stack(np.meshgrid(*axes_ext, indexing="ij"), -1).reshape(-1, dim)
    sg = np.stack(np.meshgrid(*axes_src, indexing="ij"), -1).reshape(-1, dim)
    ext_cells = np.zeros(len(eg), np.int32)
    src_cells = np.zeros(len(sg), np.int32)
    for a in range(dim):
        ext_cells = ext_cells * (t + 2) + eg[:, a]
        src_cells = src_cells * t + sg[:, a]
    return ext_cells, src_cells


@lru_cache(maxsize=None)
def body_cells(t: int, dim: int) -> np.ndarray:
    """Ext positions of the tile's own t^dim cells (offset zero)."""
    g = np.stack(np.meshgrid(*([np.arange(1, t + 1)] * dim),
                             indexing="ij"), -1).reshape(-1, dim)
    cells = np.zeros(len(g), np.int32)
    for a in range(dim):
        cells = cells * (t + 2) + g[:, a]
    return cells


class Halo26Spec(NamedTuple):
    """Per-level neighbor maps + windowed-execution plan (batched: leading
    B axis added by vmap in tile_graph.build_tile_graph).

    lidx/hasp are the kernel-ready forms, precomputed ONCE per level at
    graph build (a level's spec feeds every conv of that level — deriving
    them per conv call was measured XLA glue)."""
    idx: jnp.ndarray       # (K, T) int32 neighbor row per offset
    ok: jnp.ndarray        # (K, T) bool neighbor exists
    starts: jnp.ndarray    # (K, nb) int32 per-offset window start per block
    inband: jnp.ndarray    # (K, T) bool ok AND within that offset's window
    corr_src: jnp.ndarray  # (P,) int32 source rows (out-of-window pairs)
    corr_dst: jnp.ndarray  # (P,) int32 dest rows
    corr_off: jnp.ndarray  # (P,) int32 offset index k
    corr_ok: jnp.ndarray   # (P,) bool
    overflow: jnp.ndarray  # () int32 pairs beyond the correction capacity
    window: jnp.ndarray    # (win,) int8 zeros — static window-size carrier
    lidx: jnp.ndarray      # (nb, K, Bk) int32 [window|patch]-local source
    #                        row per pair; -1 = no pair (one-hot zero row)
    hasp: jnp.ndarray      # (nb,) int32 1 where the block has patch dests
    lidx_hi: jnp.ndarray   # (nb, G*Bk, 1) int32 — the d0=-1 group's local
    #                        rows stacked (G = 3^(dim-1)): the v2 kernels
    #                        gather a whole +-1 group with ONE one-hot MXU
    #                        dot (its offsets share one window), so the
    #                        stacked layout is precomputed here once per
    #                        level instead of relayouted per grid step
    lidx_lo: jnp.ndarray   # (nb, G*Bk, 1) int32 — same for the d0=+1 group
    rebase: jnp.ndarray    # (K, nb) int32 per-offset sub-window row offset
    #                        within the group window (8-aligned; 0 when
    #                        rebasing is off/ungrouped). lidx stays
    #                        group-window-relative; in-band pairs satisfy
    #                        rebase <= lidx < rebase + subwin.
    subwin: jnp.ndarray    # (win_off,) int8 zeros — static sub-window-size
    #                        carrier (= window when rebasing is off)
    blive: jnp.ndarray     # (nb,) int32 1 where block n holds ANY live tile.
    #                        Tile keys are sorted with SENTINEL padding, so
    #                        live tiles are a PREFIX and blive[n] is just
    #                        valid[n*Bk]. The Pallas kernels skip dead
    #                        blocks' ext build + conv dots entirely and
    #                        write zeros — exact, because dead rows are
    #                        all-zero inputs (and re-masked downstream), so
    #                        their conv output is zero either way. This is
    #                        what makes static tile CAPACITY (the safety
    #                        headroom) nearly free in issued MACs: deep
    #                        levels run 2-3x more capacity than occupied
    #                        tiles (measured at 512^3/1e5 vox).


def build_halo26(keys: jnp.ndarray, grid: int, dim: int,
                 block: int = None, win_mult: int = None,
                 corr_cap: int = None) -> Halo26Spec:
    """Per event (vmapped by callers): neighbor maps for all 3^dim-1 offsets
    against the sorted tile-key array, plus the shared window plan.

    Late-bound defaults read the module constants so tests can monkeypatch
    them to force overflow."""
    grouped = HALO_GROUP and dim in (2, 3)
    if block is None:
        block = HALO_BLOCK
    if win_mult is None:
        # grouped windows absorb the within-group start spread, so their
        # default is taller; an EXPLICIT win_mult always wins (tests force
        # tiny windows to exercise the correction path)
        win_mult = HALO_GROUP_WIN_MULT if grouped else HALO_WIN_MULT
    if corr_cap is None:
        corr_cap = HALO_CORR_CAP
    offs = halo_offsets(dim)
    K = len(offs)
    T = keys.shape[0]
    coords = decode(keys, grid, dim)
    valid = keys != SENTINEL

    # all 3^d-1 neighbor maps via the rank-windowed lookup: each offset's
    # queries are sorted wherever valid (the codec is linear in coords), so
    # every block of queries searches only a small key window anchored at
    # its leader's rank — replaces the (K+1)T concat-sort, the graph
    # build's measured dominant cost (~146 ms/step at bench scale, L0)
    nkeys = jnp.stack([
        encode(coords + jnp.asarray(off, jnp.int32), valid, grid)
        for off in offs])                              # (K, T)
    # scratch budget scales with the spec's correction budget: at 768^3
    # the default 2048 dropped 1041 L0 pairs/batch (scale_audit) while the
    # spec-level corr sat at 438/1024 — the lookup, not the spec, was the
    # binding cap. corr_cap/HALO_CORR_CAP is exactly the caller's
    # corr_scale_at factor (1 at <=512^3: bit-identical programs).
    idx, ok, n_dropped = lookup_monotone(
        keys, nkeys, corr_cap=2048 * max(1, corr_cap // HALO_CORR_CAP))
    idx = idx.astype(jnp.int32)

    Bk = min(block, T)
    while T % Bk:
        Bk //= 2
    nb = T // Bk
    win = min(win_mult * Bk, max(8, ((T + 7) // 8) * 8))
    # per-offset window anchor: smallest valid neighbor row in the block
    # (each offset map is monotone, so its block sources are contiguous-ish)
    cand = jnp.where(ok, idx, T + win).reshape(K, nb, Bk)
    starts = jnp.min(cand, axis=2)                      # (K, nb)
    per_off = jnp.clip(starts, 0, max(T - win, 0))
    per_off = ((per_off // 8) * 8).astype(jnp.int32)   # per-offset anchors
    if grouped:
        # one shared start per d0 group: all member offsets get the group
        # min, so the kernel can DMA the group's contiguous lanes at once
        parts = [jnp.broadcast_to(
            jnp.min(starts[k0:k1], axis=0, keepdims=True),
            (k1 - k0, nb)) for (k0, k1) in halo_groups(dim)]
        starts = jnp.concatenate(parts, axis=0)
    # clamp so every window stays inside [0, T): any idx < T then has
    # local < win (the tail window covers [T-win, T)), and consumers need
    # NO row padding — the per-conv jnp.pad(x, (0, win)) copies were
    # ~100 ms/step of pure HBM traffic at bench scale. T and win are both
    # multiples of 8 (capacities round to 8+), so the clamp stays aligned.
    starts = jnp.clip(starts, 0, max(T - win, 0))
    starts = ((starts // 8) * 8).astype(jnp.int32)     # sublane-aligned DMA

    # per-offset sub-window rebasing (see HALO_REBASE): the conv kernels'
    # one-hot dots contract over win_off rows at starts + rebase instead
    # of the whole group window; out-of-sub-window pairs become corrections.
    # Only when the window is small relative to the level (T >= 2*win):
    # at small/deep levels the sorted-rank neighbor spread approaches T
    # itself, and narrowing there measured 232 correction-cap overflows at
    # bench scale (all at L4, T=512/win=384) for negligible MAC savings.
    if grouped and HALO_REBASE and T >= 2 * win:
        win_off = min(min(HALO_WIN_MULT, win_mult) * Bk, win)
        rebase = jnp.clip(per_off - starts, 0, win - win_off)
        rebase = ((rebase // 8) * 8).astype(jnp.int32)
    else:
        win_off = win
        rebase = jnp.zeros((K, nb), jnp.int32)

    local = idx - jnp.repeat(starts, Bk, axis=1)
    rb_rep = jnp.repeat(rebase, Bk, axis=1)
    inband = ok & (local >= rb_rep) & (local < rb_rep + win_off)
    bad = (ok & ~inband).reshape(-1)                    # (K*T,)
    # scatter-free compaction (see compact_marked): positions of the first
    # corr_cap out-of-window pairs in (K, T)-flat order
    fi, corr_ok, n_bad = compact_marked(bad, corr_cap)
    flat_idx = idx.reshape(-1)
    corr_src = jnp.where(corr_ok, jnp.take(flat_idx, fi), 0)
    corr_dst = jnp.where(corr_ok, fi % T, 0).astype(jnp.int32)
    corr_off = jnp.where(corr_ok, fi // T, 0).astype(jnp.int32)
    # n_dropped: neighbor pairs the windowed lookup could not resolve
    # within its own correction budget — same drop-and-count contract
    overflow = (jnp.maximum(n_bad - corr_cap, 0) + n_dropped).astype(jnp.int32)

    # kernel-ready local indices: window-local where inband; patch slot
    # (win + p) where the pair rides the correction list; -1 otherwise
    local2 = local.reshape(K, T)
    if corr_cap:
        lidx_flat = jnp.where(inband, local2, -1).reshape(-1)
        tgt = jnp.where(corr_ok, fi, K * T)
        lidx = lidx_flat.at[tgt].set(
            win + jnp.arange(corr_cap, dtype=jnp.int32),
            mode="drop").reshape(K, T)
        blk = jnp.where(corr_ok, corr_dst // Bk, nb)
        hasp = jnp.zeros((nb,), jnp.int32).at[blk].set(1, mode="drop")
    else:
        lidx = jnp.where(inband, local2, -1)
        hasp = jnp.zeros((nb,), jnp.int32)
    lidx = jnp.transpose(lidx.reshape(K, nb, Bk), (1, 0, 2))
    G = 3 ** (dim - 1)
    lidx_hi = lidx[:, :G].reshape(nb, G * Bk, 1)
    lidx_lo = lidx[:, K - G:].reshape(nb, G * Bk, 1)
    blive = valid.reshape(nb, Bk)[:, 0].astype(jnp.int32)
    return Halo26Spec(idx, ok, starts, inband, corr_src, corr_dst, corr_off,
                      corr_ok, overflow, jnp.zeros((win,), jnp.int8),
                      lidx, hasp, lidx_hi, lidx_lo, rebase,
                      jnp.zeros((win_off,), jnp.int8), blive)


# ---------------------------------------------------------------------------
# execution: XLA reference (exact, oracle/CPU) + dispatch with custom VJP
# ---------------------------------------------------------------------------

# None = auto (Pallas kernel on TPU, XLA elsewhere); tests can force a path.
USE_PALLAS = None


def _ext_cells(t: int, dim: int) -> int:
    return (t + 2) ** dim


def halo26_extend_xla(x: jnp.ndarray, spec: Halo26Spec, t: int,
                      dim: int) -> jnp.ndarray:
    """Exact reference: (B, T, t^dim, C) -> (B, T, (t+2)^dim, C).

    Row-gather per offset; ignores the window plan entirely (windows +
    corrections are an execution strategy of the Pallas kernel, validated
    against this)."""
    B, T, cells, C = x.shape
    offs = halo_offsets(dim)
    ext = jnp.zeros((B, T, _ext_cells(t, dim), C), x.dtype)
    ext = ext.at[:, :, body_cells(t, dim), :].set(x)
    for k, off in enumerate(offs):
        ecells, scells = slab_cells(off, t)
        rows = jnp.where(spec.ok[:, k], spec.idx[:, k], T)
        slab = jax.vmap(
            lambda xx, rr: jnp.take(xx, rr, axis=0, mode="fill",
                                    fill_value=0))(
            x[:, :, scells, :].reshape(B, T, -1), rows)
        ext = ext.at[:, :, ecells, :].set(
            slab.reshape(B, T, len(ecells), C))
    return ext


def halo26_transpose_xla(g: jnp.ndarray, spec: Halo26Spec, t: int,
                         dim: int) -> jnp.ndarray:
    """Exact transpose of halo26_extend_xla: (B, T, (t+2)^dim, C) cotangent
    -> (B, T, t^dim, C). Offset symmetry: tile j's slab-k cotangent comes
    from row idx[K-1-k][j] (its -delta neighbor)."""
    B, T, ecells_n, C = g.shape
    offs = halo_offsets(dim)
    K = len(offs)
    d_x = g[:, :, body_cells(t, dim), :]
    for k, off in enumerate(offs):
        ecells, scells = slab_cells(off, t)
        rk = K - 1 - k
        rows = jnp.where(spec.ok[:, rk], spec.idx[:, rk], T)
        slab = jax.vmap(
            lambda gg, rr: jnp.take(gg, rr, axis=0, mode="fill",
                                    fill_value=0))(
            g[:, :, ecells, :].reshape(B, T, -1), rows)
        d_x = d_x.at[:, :, scells, :].add(
            slab.reshape(B, T, len(ecells), C).astype(d_x.dtype))
    return d_x


def _halo_fwd_impl(x, spec, t, dim):
    use = USE_PALLAS
    if use is None:
        # auto: the Pallas one-hot gather is bit-exact for bf16 but rounds
        # f32 values through the MXU's bf16 passes (~0.4% rel) — keep f32
        # on the exact XLA path unless a caller forces the kernel
        use = (jax.default_backend() == "tpu"
               and x.dtype == jnp.bfloat16)
    if use:
        from uresnet_pytorch_tpu.ops.pallas.halo_fused import halo26_fwd
        return halo26_fwd(x, spec, t, dim)
    return halo26_extend_xla(x, spec, t, dim)


def _halo_bwd_impl(g, spec, t, dim):
    use = USE_PALLAS
    if use is None:
        use = (jax.default_backend() == "tpu"
               and g.dtype == jnp.bfloat16)
    if use:
        from uresnet_pytorch_tpu.ops.pallas.halo_fused import halo26_bwd
        return halo26_bwd(g, spec, t, dim)
    return halo26_transpose_xla(g, spec, t, dim)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def halo26_extend(x: jnp.ndarray, spec: Halo26Spec, t: int,
                  dim: int) -> jnp.ndarray:
    """(B, T, t^dim, C) -> (B, T, (t+2)^dim, C) halo-extended tiles.

    Exact (bit-for-bit row movement) on every auto-dispatched path: the
    TPU Pallas kernel handles bf16 (one-hot MXU gathers move bf16 rows
    bit-exactly; pinned by tests/test_tpu_gated.py); f32 and CPU run the
    XLA row-gather reference. Forcing USE_PALLAS=True with f32 inputs on
    TPU rounds values to bf16 (~0.4% rel) — test-only. Backward is the
    negated-offset gather (see module docstring)."""
    return _halo_fwd_impl(x, spec, t, dim)


def _h26_fwd(x, spec, t, dim):
    return _halo_fwd_impl(x, spec, t, dim), spec


def _h26_bwd(t, dim, spec, g):
    d_spec = jax.tree_util.tree_map(
        lambda v: np.zeros(v.shape, jax.dtypes.float0), spec)
    return _halo_bwd_impl(g, spec, t, dim), d_spec


halo26_extend.defvjp(_h26_fwd, _h26_bwd)
