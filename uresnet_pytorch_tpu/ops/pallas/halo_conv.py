"""Pallas kernel: fused halo-gather + submanifold 3^d convolution.

Round 2 ran the halo as one Pallas kernel but left the conv to XLA; the
measured step profile showed ~460 ms of XLA glue per step (slab-lane
preslice concat, flat->conv-layout reshape, output slices) around ~290 ms
of kernels — the conv itself was nearly free. This kernel keeps the
halo-extended tile block **in VMEM** and runs the convolution there,
emitting conv-ready flat output in one HBM pass:

  1. Same window-DMA + one-hot MXU gather machinery as halo_fused.py
     (per-offset monotone windows, persistent patch rows, per-block-gated
     corrections), but the halo-extended block lands in a VMEM scratch
     instead of HBM.
  2. The 3^d conv runs as **banded Toeplitz dots**: per output row-group
     (o0[, o1]), 3 MXU dots (one per d0 block from `toeplitz_weights`)
     of contiguous ext lane slices, outputs landing in contiguous t*Cout
     lane ranges of the flat tile row. No reshapes anywhere.
  3. The band overcomputes ~2x in FLOPs (each output reads a 3-wide band
     of the last axis out of the (t+2)-wide rows). The r3 "row-group"
     widening to t flat dots (4x overcompute, 8x weight block) measured
     10% SLOWER on-chip and was reverted — see `toeplitz_weights`.

Backward: the adjoint of (global 3^d stencil restricted to the active
tile set) is the same stencil with flipped weights on the same set, so
**d_x runs through this same kernel** with `flip_weights(w)` and the
unchanged Halo26Spec. d_W runs as a second ext-free kernel (`halo_conv_dw`)
that rebuilds the ext block in VMEM per grid step and accumulates
ext_slice^T @ g into one revisited f32 block — the banded-Toeplitz
cotangent — mapped to d_w by the linear transpose of `toeplitz_weights`.
(The earlier XLA path, `_dw_recompute`, materialized the full halo-extended
array in HBM — 932 MB per level-0 conv at batch 4 — and is kept only as
the correctness oracle.)

Replaces SparseConvNet's fused CUDA gather-GEMM-scatter (SURVEY.md §2.13,
expected SCN/CUDA/*.cu) as one TPU kernel.

Precision: in-kernel dots accumulate in f32 on the MXU from bf16 operands
(same as XLA's conv emitter), but the accumulation ORDER differs from
lax.conv, so fused-vs-oracle agreement is to bf16 rounding, not bitwise
(tests pin tolerances; f32 mode agrees to ~1e-6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uresnet_pytorch_tpu.ops.halo import halo_offsets
from uresnet_pytorch_tpu.ops.pallas.halo_fused import (
    _SCRATCH_BUDGET, _VMEM_LIMIT, _grouped_now, _has_patch,
    _issue_window_dmas, _lane_layout, _local_idx, _plans, _preslice,
    _round_up, _runs, _with_patch_rows)


def flip_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3^d, Cin, Cout) -> (3^d, Cout, Cin): the adjoint stencil.

    Reversing the lexicographic offset enumeration negates every offset
    (including the center), and the per-offset (Cin, Cout) slice
    transposes."""
    return jnp.transpose(w[::-1], (0, 2, 1))


@functools.lru_cache(maxsize=None)
def _toeplitz_band(t: int) -> np.ndarray:
    """Static band selector M[dx, x, o] = 1 iff x == o + dx (x in [0,t+2),
    o in [0,t), dx in [0,3)) — the 3 live diagonals of the x-axis
    Toeplitz block."""
    e = t + 2
    M = np.zeros((3, e, t), np.float32)
    for o in range(t):
        for dx in range(3):
            M[dx, o + dx, o] = 1.0
    return M


def toeplitz_weights(w: jnp.ndarray, t: int, dim: int,
                     dtype=None) -> jnp.ndarray:
    """(3^dim, Cin, Cout) offset stack -> (3, 3*(t+2)^(dim-2 or 0)*...
    banded blocks: dim=3 (3, 3*(t+2)*Cin, t*Cout), dim=2 (3, (t+2)*Cin,
    t*Cout).

    Block d0 maps the ext-scratch lane slice of row-group (o0+d0) onto the
    t output x-positions: rows indexed by (d1, a2, ci) for dim=3 (by
    (a1, ci) for dim=2), cols by (o_last, co); entry = w[d0, d1, a2-o, ...]
    on the 3 live diagonals, 0 elsewhere (~2x band overcompute). The
    single-flat row-group variant (r3 commit "Fewer-but-bigger kernel
    ops") widened this to (3*(t+2)^2*Cin, t^2*Cout) — t dots/grid-step at
    4x overcompute — and measured 10% SLOWER end-to-end on-chip (6.556 ->
    5.90 ev/s at bench scale): the band doubled the conv FLOPs and the 8x
    weight block shrank the Cin chunk budget at the deep levels. This is
    the measured-good structure; don't re-widen without an on-chip number.

    ONE einsum against a static band mask — the original per-diagonal
    .at[].set loop emitted 3^dim*t tiny device ops PER CONV (~4000/step
    at bench scale, ~40% of the measured step time)."""
    K, Cin, Cout = w.shape
    assert K == 3 ** dim
    if dtype is None:
        dtype = w.dtype
    e = t + 2
    M = jnp.asarray(_toeplitz_band(t), dtype=jnp.float32)
    wf = w.astype(jnp.float32)
    if dim == 3:
        w3 = wf.reshape(3, 3, 3, Cin, Cout)
        # wt[d0, d1, x, ci, o, co] = w3[d0, d1, x - o] on the band
        wt = jnp.einsum("dxo,abdcf->abxcof", M, w3)
        return wt.reshape(3, 3 * e * Cin, t * Cout).astype(dtype)
    if dim == 2:
        w2 = wf.reshape(3, 3, Cin, Cout)
        wt = jnp.einsum("dxo,adcf->axcof", M, w2)
        return wt.reshape(3, e * Cin, t * Cout).astype(dtype)
    raise ValueError(dim)


def _stacked_now() -> bool:
    """Stacked +-1-group one-hot gathers (2 big dots) vs per-offset dots
    (2*G small ones) — env toggle; per-offset measured FASTER on-chip
    (6.081 vs 5.98 ev/s at bench scale, r4 A/B), so it is the default."""
    import os
    return os.environ.get("URESNET_STACKED_GATHER", "0") == "1"


def _out_groups(t: int, dim: int):
    """Static (ext_lane_cell_offset_of_group_row0, out_lane_cell_offset)
    per output row-group; lane offsets in CELL units (x C / Cout later).

    dim=3: groups are (o0, o1); slice d0 starts at ext cell
    ((o0+d0)*(t+2) + o1) * (t+2) and spans 3*(t+2) cells; output group
    starts at out cell (o0*t + o1) * t, spanning t cells.
    dim=2: groups are o0; slice d0 starts at (o0+d0)*(t+2), spans (t+2)."""
    e = t + 2
    groups = []
    if dim == 3:
        for o0 in range(t):
            for o1 in range(t):
                ext0 = [((o0 + d0) * e + o1) * e for d0 in range(3)]
                groups.append((tuple(ext0), (o0 * t + o1) * t))
        span = 3 * e
    else:
        for o0 in range(t):
            ext0 = [(o0 + d0) * e for d0 in range(3)]
            groups.append((tuple(ext0), o0 * t))
        span = e
    return groups, span


# ---------------------------------------------------------------------------
# v2 window layout: planes-from-flat + slim group-0 pack
#
# The d0=-1 group's source cells all lie in the neighbor tile's x=t-1 plane
# and the d0=+1 group's in its x=0 plane — both CONTIGUOUS lane ranges of
# the plain flat (cells*C) row. So those two groups' window DMAs can read
# the flat activation array directly, and only the 8 (dim=3) d0=0 offsets
# need a packed preslice (t=4/C=16: 1536 lanes vs 4096 for the full v1
# pack). Cuts the per-conv XLA preslice pass ~2.7x and the window DMA
# bytes ~2x. Requires group-equal starts (HALO_GROUP) and 128-aligned
# plane lane ranges (t^2*C % 128 == 0); callers fall back to v1 otherwise.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _plane_plan(delta: tuple, t: int):
    """Joint (plane_pos, run_len, ext_cell) runs for a +-1-group offset:
    res columns are the neighbor's full x-plane (t^2 cells, lex (y,z));
    write runs wherever BOTH the plane position and the ext cell advance
    consecutively."""
    from uresnet_pytorch_tpu.ops.halo import slab_cells
    ecells, scells = slab_cells(delta, t)
    x0 = (t - 1) if delta[0] == -1 else 0
    rel = scells - x0 * t * t
    plan = []
    r0 = 0
    for i in range(1, len(rel) + 1):
        if (i == len(rel) or rel[i] != rel[i - 1] + 1
                or ecells[i] != ecells[i - 1] + 1):
            plan.append((int(rel[r0]), i - r0, int(ecells[r0])))
            r0 = i
    return tuple(plan)


@functools.lru_cache(maxsize=None)
def _pack0_cells(t: int, dim: int):
    """Group-0 (d0=0) slab pack: per-offset pack cell offsets (dense, no
    per-slab alignment — the whole pack is ONE DMA; dots slice at C
    granularity) + total pack cells + the preslice run plan."""
    from uresnet_pytorch_tpu.ops.halo import halo_groups, halo_offsets
    from uresnet_pytorch_tpu.ops.halo import slab_cells
    offs = halo_offsets(dim)
    (g0, g1), (m0, m1) = halo_groups(dim)[0], halo_groups(dim)[1]
    pack_off = {}
    runs = []
    pk = 0
    for k in range(m0, m1):
        cells = slab_cells(offs[k], t)[1]
        pack_off[k] = pk
        for (v, ln, p) in _runs(cells):
            runs.append((v, ln, pk + p))
        pk += len(cells)
    return pack_off, pk, tuple(runs)


def _v2_layout(t: int, dim: int, C: int):
    """(seg0_lanes, seg1_lanes, planes_v2) or None when v2 is unavailable
    (alignment or dim)."""
    if dim != 3:
        return None
    pc = t * t
    if (pc * C) % 128 or ((t - 1) * pc * C) % 128:
        return None
    _, pk0, _ = _pack0_cells(t, dim)
    seg0 = pc * C
    seg1 = _round_up(pk0 * C, 128)
    return seg0, seg1, 2 * seg0 + seg1


@functools.lru_cache(maxsize=None)
def _pack0_select_idx(C: int, t: int, dim: int):
    """Per-pack-column source lane (or -1 for padding columns) for the
    group-0 pack selection: column j of the pack reads input lane idx[j].
    Only this (w,) vector is baked into the program; `_preslice0` expands
    it to the one-hot matrix in-trace with an iota compare (embedding the
    expanded matrix as an HLO constant measured 100s of MB at deep-level C
    and overflowed the remote-compile request size)."""
    _, pk0, runs = _pack0_cells(t, dim)
    used = pk0 * C
    w = _round_up(used, 128)
    idx = np.full((w,), -1, np.int32)
    col = 0
    for (v, ln, _) in runs:
        n = ln * C
        idx[col:col + n] = np.arange(v * C, v * C + n)
        col += n
    assert col == used
    return idx


def _preslice0_kernel(C, used, w, runs, bl_ref, x_ref, out_ref):
    """Liveness-gated pack: out rows are the ~56 static lane runs of the
    flat row, VMEM-to-VMEM. Dead blocks write zeros (xs0 windows can cover
    dead rows near the clamped tail; bf16 garbage there could be NaN and
    0*NaN poisons the one-hot dots)."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    live = bl_ref[b, n] != 0

    @pl.when(live)
    def _():
        xb = x_ref[0]
        for (v, ln, p) in runs:
            out_ref[0, :, p * C:(p + ln) * C] = xb[:, v * C:(v + ln) * C]
        if w > used:
            out_ref[0, :, used:w] = jnp.zeros((xb.shape[0], w - used),
                                              out_ref.dtype)

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)


def _preslice0_pallas(flat, C, t, dim, spec, interpret=False):
    """Pallas lowering of `_preslice0` for spec-shaped inputs (T rows
    matching spec's block structure): a pure lane repack per row block,
    gated on spec.blive. Replaces the XLA 'dot' lowering on TPU — the
    one-hot selection matmul ran at capacity rows on the MXU (measured
    177 ms/step across all convs at bench scale, batch 8) and its {1,2,0}
    output layout forced relayout copies around every Pallas conv; this
    kernel is HBM-bound, skips dead blocks, and emits the row-major
    layout the conv kernels consume directly."""
    _, pk0, runs = _pack0_cells(t, dim)
    used = pk0 * C
    w = _round_up(used, 128)
    B, T, lanes_p = flat.shape
    nb = spec.starts.shape[2]
    Bk = T // nb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, Bk, lanes_p),
                               lambda b, n, bl: (b, n, 0))],
        out_specs=pl.BlockSpec((1, Bk, w), lambda b, n, bl: (b, n, 0)),
    )
    return pl.pallas_call(
        functools.partial(_preslice0_kernel, C, used, w, tuple(runs)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, w), flat.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(spec.blive, flat)


def _preslice0_x(flat, C, t, dim, spec, interpret=False):
    """xs0/gs0 entry point: the gated Pallas repack on TPU (or when the
    caller runs kernels in interpret mode), the XLA lowerings elsewhere.
    URESNET_PRESLICE=dot/concat/take forces an XLA lowering for A/B."""
    import os
    if "URESNET_PRESLICE" not in os.environ and (
            interpret or jax.default_backend() == "tpu"):
        return _preslice0_pallas(flat, C, t, dim, spec,
                                 interpret=interpret)
    return _preslice0(flat, C, t, dim)


def _preslice0(flat, C, t, dim):
    """(B, T, cells*C...) -> (B, T, seg1_lanes): the d0=0 offsets' slab
    runs, densely packed, zero-padded to the 128-aligned segment width.

    XLA lowerings (used for patch rows — P rows, no block structure — and
    as the CPU/A-B path for xs0; the TPU xs0 default is the gated Pallas
    repack, `_preslice0_pallas`). URESNET_PRESLICE selects: 'dot'
    (historical TPU default; the 56-fusion concat pass was 257 ms/step
    before it, the one-hot MXU matmul 177 ms/step before the Pallas
    repack) / 'concat' (CPU default) / 'take' (one static cell-axis
    gather)."""
    import os
    _, pk0, runs = _pack0_cells(t, dim)
    used = pk0 * C
    w = _round_up(used, 128)
    B, T = flat.shape[:2]
    # default: 'dot' on TPU (measured 7.621 vs 6.938 ev/s at bench scale,
    # 2026-08-19 on-chip — benchmarks/results.json is the number of
    # record), 'concat' elsewhere (CPU matmuls this large are slower than
    # slicing and the suite's oracles run on CPU)
    mode = os.environ.get(
        "URESNET_PRESLICE",
        "dot" if jax.default_backend() == "tpu" else "concat")
    if mode == "dot":
        cells = t ** dim
        # one-hot selection matmul on the MXU: exact for bf16 inputs at
        # default precision (each output lane is x*1 plus zeros in the f32
        # accumulator). f32 inputs need Precision.HIGHEST: the default MXU
        # precision rounds f32 operands to bf16 (ADVICE r4: verified
        # on-chip — default-precision dot output was bit-identical to
        # bf16-rounding the concat output, ~4e-3 rel err; HIGHEST is
        # bit-exact). S is expanded in-trace (tiny idx constant + iota
        # compare) — cheap VPU work next to the dot, and hoistable as a
        # loop invariant.
        idx = jnp.asarray(_pack0_select_idx(C, t, dim))
        rows = jax.lax.broadcasted_iota(jnp.int32, (cells * C, w), 0)
        S = (rows == idx[None, :]).astype(flat.dtype)
        prec = (None if flat.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        return jax.lax.dot_general(
            flat[:, :, :cells * C], S, (((2,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32).astype(flat.dtype)
    if mode == "take":
        cells = t ** dim
        idx = np.concatenate(
            [np.arange(v, v + ln) for (v, ln, _) in runs])
        x4 = flat[:, :, :cells * C].reshape(B, T, cells, C)
        out = jnp.take(x4, jnp.asarray(idx), axis=2).reshape(B, T, used)
        if w > used:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, w - used)))
        return out
    segs = [flat[:, :, v * C:(v + ln) * C] for (v, ln, _) in runs]
    if w > used:
        segs.append(jnp.zeros((B, T, w - used), flat.dtype))
    return jnp.concatenate(segs, axis=-1)


def _patch_rows_v2(xf, spec, t, dim, C):
    """(B, P, planes_v2): correction-source rows arranged in the v2 window
    lane layout [hi plane | group-0 pack | lo plane] — tiny (P rows)."""
    B, T = xf.shape[:2]
    P = spec.corr_src.shape[1]
    pc = t * t
    if not P:   # pallas dislikes zero-size operands; 1 unused row
        return jnp.zeros((B, 1, _v2_layout(t, dim, C)[2]), xf.dtype)
    rows = jnp.where(spec.corr_ok, spec.corr_src, T)
    pr = jax.vmap(lambda xx, rr: jnp.take(xx, rr, axis=0, mode="fill",
                                          fill_value=0))(xf, rows)
    seg0 = pr[:, :, (t - 1) * pc * C:t ** dim * C]
    seg1 = _preslice0(pr, C, t, dim)
    seg2 = pr[:, :, 0:pc * C]
    return jnp.concatenate([seg0, seg1, seg2], axis=-1)


def _build_ext_v2(t, dim, C, win, wo, P, b, n, starts_ref, hasp_ref,
                  reb_ref, bl_ref, lidx_ref, lhi_ref, llo_ref, xblk_ref,
                  xf_ref, xs0_ref, patch_ref, win_scr, patch_scr, ext_scr,
                  sems, psem):
    """Stage 1 of the v2 kernels: fill ext_scr (Bk, ecells*C) with the
    halo-extended block — three group window DMAs + one-hot MXU gathers +
    gated patch-row corrections. Shared by the forward conv kernel and the
    d_W kernel (identical ext semantics by construction).

    The d0=-1 / d0=+1 groups each gather with ONE stacked one-hot dot
    ((G*Bk, win) x (win, plane)) — their G=3^(dim-1) offsets share a
    window and a source plane, and the kernels were measured per-op-
    sequencing-bound (~170 ops/grid-step), so 2 big dots replace 2*G
    small ones. The d0=0 offsets keep per-offset dots: stacking them
    against the full pack would multiply gather FLOPs by G.

    Window DMAs are DOUBLE-BUFFERED across grid steps: win_scr is
    (2, win, planes_v2); step (b, n) issues block n+1's three group copies
    into slot (n+1)%2 before computing from slot n%2 (whose copies were
    issued at step n-1), hiding the window-fetch latency behind the one-hot
    and conv dots — the kernels were measured DMA-latency-bound with the
    synchronous issue-then-wait flow. Patch rows are per-b persistent and
    live in their own scratch, refreshed synchronously at n == 0."""
    (_, _, _, slab_len, ext_plan, _, body_plan, _) = _plans(t, dim)
    offs = halo_offsets(dim)
    K = len(offs)
    G = 3 ** (dim - 1)          # offsets per +-1 group
    pc = t * t
    pack_off, pk0, _ = _pack0_cells(t, dim)
    seg0_l, seg1_l, planes_v2 = _v2_layout(t, dim, C)
    seg2_b = seg0_l + seg1_l
    dt = ext_scr.dtype
    Bk = ext_scr.shape[0]
    lanes = (t ** dim) * C
    nb = pl.num_programs(1)

    def win_dmas(nn, slot):
        """The three group window copies for block nn into buffer `slot` —
        reconstructed identically at issue and wait time (the descriptor
        carries the transfer size; the semaphore carries completion)."""
        st0 = pl.multiple_of(starts_ref[b, 0, nn], 8)
        d0 = pltpu.make_async_copy(
            xf_ref.at[b, pl.ds(st0, win), (t - 1) * pc * C:lanes],
            win_scr.at[slot, pl.ds(0, win), 0:seg0_l], sems.at[slot, 0])
        st1 = pl.multiple_of(starts_ref[b, G, nn], 8)
        d1 = pltpu.make_async_copy(
            xs0_ref.at[b, pl.ds(st1, win), 0:seg1_l],
            win_scr.at[slot, pl.ds(0, win), seg0_l:seg2_b],
            sems.at[slot, 1])
        st2 = pl.multiple_of(starts_ref[b, K - G, nn], 8)
        d2 = pltpu.make_async_copy(
            xf_ref.at[b, pl.ds(st2, win), 0:pc * C],
            win_scr.at[slot, pl.ds(0, win), seg2_b:seg2_b + seg0_l],
            sems.at[slot, 2])
        return d0, d1, d2

    slot = jax.lax.rem(n, 2)

    @pl.when(n == 0)
    def _():
        # fresh event row: nothing in flight — issue block 0 synchronously
        # (waited below) and refresh the per-b patch rows
        for d in win_dmas(0, 0):
            d.start()
        if P:
            pd = pltpu.make_async_copy(patch_ref.at[b], patch_scr, psem)
            pd.start()
            pd.wait()

    @pl.when(n + 1 < nb)
    def _():
        # prefetch block n+1's windows into the other buffer; its last
        # reader was step n-1, already complete (grid steps are sequential).
        # Skip when block n+1 is dead (beyond the live-tile prefix): step
        # n+1's whole body is then predicated off, so nothing waits on these
        # — issue and wait stay consistent because blive is a prefix mask.
        @pl.when(bl_ref[b, n + 1] != 0)
        def _():
            for d in win_dmas(n + 1, jax.lax.rem(n + 1, 2)):
                d.start()

    xb = xblk_ref[0]                                   # (Bk, cells*C)
    for (c0, ln, e0) in body_plan:
        ext_scr[:, e0 * C:(e0 + ln) * C] = xb[:, c0 * C:(c0 + ln) * C]

    def col_range(k):
        if k < G:
            return 0, seg0_l, _plane_plan(offs[k], t)
        if k >= K - G:
            return seg2_b, seg0_l, _plane_plan(offs[k], t)
        return seg0_l + pack_off[k] * C, slab_len[k] * C, ext_plan[k]

    cur = win_dmas(n, slot)
    posG = jax.lax.broadcasted_iota(jnp.int32, (G * Bk, win), 1)
    pos_o = jax.lax.broadcasted_iota(jnp.int32, (Bk, wo), 1)
    stacked = _stacked_now()

    def write_group(res, ks, k0):
        for k in ks:
            _, _, plan = col_range(k)
            r0 = (k - k0) * Bk
            for (sp, ln, e0) in plan:
                ext_scr[:, e0 * C:(e0 + ln) * C] = \
                    res[r0:r0 + Bk, sp * C:(sp + ln) * C]

    def per_offset(ks):
        # narrow rebased dots: each offset's in-band locals lie in
        # [rebase, rebase + wo) of the group window (spec.rebase), so the
        # one-hot contraction runs over wo rows, not the full win — gather
        # MACs scale with contraction depth (win was 3*Bk at bench scale)
        for k in ks:
            o, w, plan = col_range(k)
            rb = pl.multiple_of(reb_ref[b, k, n], 8)
            local = lidx_ref[0, 0, k, :].reshape(Bk, 1)    # -1 = no pair
            oh = (local == pos_o + rb).astype(dt)
            res = jnp.dot(oh, win_scr[slot, pl.ds(rb, wo), o:o + w],
                          preferred_element_type=jnp.float32).astype(dt)
            for (sp, ln, e0) in plan:
                ext_scr[:, e0 * C:(e0 + ln) * C] = \
                    res[:, sp * C:(sp + ln) * C]

    # d0=-1 group: ONE stacked one-hot dot over the shared hi plane
    # (same FLOPs as per-offset — every member dot reads the full plane —
    # but 1 op issue instead of G; toggled for on-chip A/B measurement)
    cur[0].wait()
    if stacked:
        oh_hi = (lhi_ref[0, 0] == posG).astype(dt)          # (G*Bk, win)
        res_hi = jnp.dot(oh_hi, win_scr[slot, pl.ds(0, win), 0:seg0_l],
                         preferred_element_type=jnp.float32).astype(dt)
        write_group(res_hi, range(G), 0)
    else:
        per_offset(range(G))

    # d0=0 offsets: per-offset dots against the slim pack
    cur[1].wait()
    per_offset(range(G, K - G))

    # d0=+1 group: ONE stacked dot over the shared lo plane
    cur[2].wait()
    if stacked:
        oh_lo = (llo_ref[0, 0] == posG).astype(dt)
        res_lo = jnp.dot(oh_lo, win_scr[slot, pl.ds(0, win),
                                        seg2_b:seg2_b + seg0_l],
                         preferred_element_type=jnp.float32).astype(dt)
        write_group(res_lo, range(K - G, K), K - G)
    else:
        per_offset(range(K - G, K))

    if P:
        @pl.when(hasp_ref[b, n] != 0)
        def _():
            posp = jax.lax.broadcasted_iota(jnp.int32, (Bk, P), 1) + win
            posGp = jax.lax.broadcasted_iota(
                jnp.int32, (G * Bk, P), 1) + win
            ohp_hi = (lhi_ref[0, 0] == posGp).astype(dt)
            add_hi = jnp.dot(ohp_hi, patch_scr[pl.ds(0, P), 0:seg0_l],
                             preferred_element_type=jnp.float32).astype(dt)
            for k in range(G):
                _, _, plan = col_range(k)
                r0 = k * Bk
                for (sp, ln, e0) in plan:
                    ext_scr[:, e0 * C:(e0 + ln) * C] = (
                        ext_scr[:, e0 * C:(e0 + ln) * C]
                        + add_hi[r0:r0 + Bk, sp * C:(sp + ln) * C])
            for k in range(G, K - G):
                o, w, plan = col_range(k)
                local = lidx_ref[0, 0, k, :].reshape(Bk, 1)
                ohp = (local == posp).astype(dt)
                resp = jnp.dot(ohp, patch_scr[pl.ds(0, P), o:o + w],
                               preferred_element_type=jnp.float32).astype(dt)
                for (sp, ln, e0) in plan:
                    ext_scr[:, e0 * C:(e0 + ln) * C] = (
                        ext_scr[:, e0 * C:(e0 + ln) * C]
                        + resp[:, sp * C:(sp + ln) * C])
            ohp_lo = (llo_ref[0, 0] == posGp).astype(dt)
            add_lo = jnp.dot(ohp_lo,
                             patch_scr[pl.ds(0, P), seg2_b:seg2_b + seg0_l],
                             preferred_element_type=jnp.float32).astype(dt)
            for k in range(K - G, K):
                _, _, plan = col_range(k)
                r0 = (k - (K - G)) * Bk
                for (sp, ln, e0) in plan:
                    ext_scr[:, e0 * C:(e0 + ln) * C] = (
                        ext_scr[:, e0 * C:(e0 + ln) * C]
                        + add_lo[r0:r0 + Bk, sp * C:(sp + ln) * C])


def _conv_stage(t, dim, C, Cout, ext_scr, wt_ref, out_ref):
    """Stage 2: per-(o0[, o1])-group banded Toeplitz dots from ext_scr ->
    out_ref (flat): 3 dots per group (one per d0 block), writes a
    contiguous t*Cout lane range. The measured-good structure — see
    `toeplitz_weights`."""
    dt = out_ref.dtype
    groups, span = _out_groups(t, dim)
    Kl = span * C
    No = t * Cout
    for (ext0s, oc) in groups:
        acc = None
        for dd in range(3):
            s = ext_scr[:, ext0s[dd] * C:ext0s[dd] * C + Kl]
            prod = jnp.dot(s, wt_ref[dd],
                           preferred_element_type=jnp.float32)
            acc = prod if acc is None else acc + prod
        out_ref[0, :, oc * Cout:oc * Cout + No] = acc.astype(dt)


def _conv_stage_bn(t, dim, C, Cout, alpha, ext_scr, wt_ref, ab_ref,
                   mask_ref, emat_ref, out_ref):
    """Stage 2 with the FOLLOWING BNAct folded in (inference only):
    out = mask * leaky_{alpha}(conv * a + b). The affine/activation applies
    to the still-f32 MXU accumulator in VMEM, deleting the separate
    elementwise HBM pass the model otherwise pays per conv->BN pair. The
    per-cell mask expands to out lanes with ONE one-hot dot (emat_ref)."""
    dt = out_ref.dtype
    groups, span = _out_groups(t, dim)
    Kl = span * C
    No = t * Cout
    m_exp = jnp.dot(mask_ref[0], emat_ref[...],
                    preferred_element_type=jnp.float32)   # (Bk, olanes_p)
    for (ext0s, oc) in groups:
        acc = None
        for dd in range(3):
            s = ext_scr[:, ext0s[dd] * C:ext0s[dd] * C + Kl]
            prod = jnp.dot(s, wt_ref[dd],
                           preferred_element_type=jnp.float32)
            acc = prod if acc is None else acc + prod
        sl0 = oc * Cout
        z = acc * ab_ref[0, sl0:sl0 + No] + ab_ref[1, sl0:sl0 + No]
        z = jnp.maximum(z, alpha * z)
        z = z * m_exp[:, sl0:sl0 + No]
        out_ref[0, :, sl0:sl0 + No] = z.astype(dt)


def _dw_stage(t, dim, C, Cout, ext_scr, g_ref, out_ref):
    """Weight-gradient stage: out_ref[dd] += sum over output row-groups of
    ext_slice(dd)^T @ g_group, the exact adjoint of `_conv_stage` w.r.t.
    the banded Toeplitz weights (f32 accumulation; out block revisited
    across the whole grid, flushed to HBM once at the end). Callers zero
    out_ref at grid step (0, 0) UNCONDITIONALLY — the init must run even
    when that block is liveness-gated off."""
    groups, span = _out_groups(t, dim)
    Kl = span * C
    No = t * Cout

    gb = g_ref[0]                                      # (Bk, olanes_p)
    for dd in range(3):
        acc = None
        for (ext0s, oc) in groups:
            s = ext_scr[:, ext0s[dd] * C:ext0s[dd] * C + Kl]
            ggrp = gb[:, oc * Cout:oc * Cout + No]
            prod = jax.lax.dot_general(
                s, ggrp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (Kl, No)
            acc = prod if acc is None else acc + prod
        out_ref[dd, 0:Kl, 0:No] += acc


def _fused_kernel_v2(t, dim, C, Cout, win, wo, P, Tsrc, Bk,
                     starts_ref, hasp_ref, reb_ref, bl_ref, lidx_ref,
                     lhi_ref, llo_ref, xblk_ref, xf_ref, xs0_ref, patch_ref,
                     wt_ref, out_ref, win_scr, patch_scr, ext_scr, sems,
                     psem):
    b = pl.program_id(0)
    n = pl.program_id(1)
    live = bl_ref[b, n] != 0

    @pl.when(live)
    def _():
        _build_ext_v2(t, dim, C, win, wo, P, b, n, starts_ref, hasp_ref,
                      reb_ref, bl_ref, lidx_ref, lhi_ref, llo_ref, xblk_ref,
                      xf_ref, xs0_ref, patch_ref, win_scr, patch_scr,
                      ext_scr, sems, psem)
        _conv_stage(t, dim, C, Cout, ext_scr, wt_ref, out_ref)

    # dead block (all tiles beyond the live prefix): inputs are all-zero,
    # so conv output is zero — write it directly, skipping DMAs + dots
    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)


def _fused_kernel_v2_bn(t, dim, C, Cout, win, wo, P, Tsrc, Bk, alpha,
                        starts_ref, hasp_ref, reb_ref, bl_ref, lidx_ref,
                        lhi_ref, llo_ref, xblk_ref, xf_ref, xs0_ref,
                        patch_ref, wt_ref, ab_ref, mask_ref, emat_ref,
                        out_ref, win_scr, patch_scr, ext_scr, sems, psem):
    b = pl.program_id(0)
    n = pl.program_id(1)
    live = bl_ref[b, n] != 0

    @pl.when(live)
    def _():
        _build_ext_v2(t, dim, C, win, wo, P, b, n, starts_ref, hasp_ref,
                      reb_ref, bl_ref, lidx_ref, lhi_ref, llo_ref, xblk_ref,
                      xf_ref, xs0_ref, patch_ref, win_scr, patch_scr,
                      ext_scr, sems, psem)
        _conv_stage_bn(t, dim, C, Cout, alpha, ext_scr, wt_ref, ab_ref,
                       mask_ref, emat_ref, out_ref)

    # dead block: the epilogue's occupancy mask is all-zero there, so the
    # fused result is zero regardless of the affine — write it directly
    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)


def _dw_kernel_v2(t, dim, C, Cout, win, wo, P, Tsrc, Bk,
                  starts_ref, hasp_ref, reb_ref, bl_ref, lidx_ref, lhi_ref,
                  llo_ref, xblk_ref, xf_ref, xs0_ref, patch_ref, g_ref,
                  out_ref, win_scr, patch_scr, ext_scr, sems, psem):
    b = pl.program_id(0)
    n = pl.program_id(1)

    # accumulator init must NOT be liveness-gated (block (0,0) can be dead
    # for zero-voxel padding events)
    @pl.when(jnp.logical_and(b == 0, n == 0))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(bl_ref[b, n] != 0)
    def _():
        _build_ext_v2(t, dim, C, win, wo, P, b, n, starts_ref, hasp_ref,
                      reb_ref, bl_ref, lidx_ref, lhi_ref, llo_ref, xblk_ref,
                      xf_ref, xs0_ref, patch_ref, win_scr, patch_scr,
                      ext_scr, sems, psem)
        _dw_stage(t, dim, C, Cout, ext_scr, g_ref, out_ref)


def _bwd_kernel_v2(t, dim, Cg, Cx, win, wo, P, Tsrc, Bk,
                   starts_ref, hasp_ref, reb_ref, bl_ref, lidx_ref, lhi_ref,
                   llo_ref, gblk_ref, gf_ref, gs0_ref, patchg_ref, wt_ref,
                   x_ref, dx_ref, dwt_ref, win_scr, patch_scr, ext_scr,
                   sems, psem):
    """COMBINED backward: ONE ext(g) build feeds both the d_x conv (flipped
    stencil, `_conv_stage`) and the weight-gradient contraction
    (`_dw_stage` with x as the cotangent) — the separate-kernel backward
    paid the ext build twice per conv. Identity: d_W[delta] =
    sum_q x[q] (x) ext(g)[q - delta], i.e. the dw adjoint of the FLIPPED
    parameterization; the wrapper maps it back with flip_weights (a
    self-adjoint permutation-transpose)."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    live = bl_ref[b, n] != 0

    @pl.when(jnp.logical_and(b == 0, n == 0))
    def _():
        dwt_ref[...] = jnp.zeros(dwt_ref.shape, dwt_ref.dtype)

    @pl.when(live)
    def _():
        _build_ext_v2(t, dim, Cg, win, wo, P, b, n, starts_ref, hasp_ref,
                      reb_ref, bl_ref, lidx_ref, lhi_ref, llo_ref, gblk_ref,
                      gf_ref, gs0_ref, patchg_ref, win_scr, patch_scr,
                      ext_scr, sems, psem)
        _conv_stage(t, dim, Cg, Cx, ext_scr, wt_ref, dx_ref)
        _dw_stage(t, dim, Cg, Cx, ext_scr, x_ref, dwt_ref)

    @pl.when(jnp.logical_not(live))
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)


def _build_ext_v1(grouped, t, dim, C, win, wo, P, Tsrc, b, n, starts_ref,
                  hasp_ref, reb_ref, lidx_ref, xblk_ref, xs_ref, win_scr,
                  ext_scr, sems):
    """Stage 1 of the v1 kernels (packed preslice layout) — see
    `_build_ext_v2`."""
    (_, _, _, _, ext_plan, _, body_plan, _) = _plans(t, dim)
    lane_off, lane_w, _ = _lane_layout(t, dim, C)
    K = len(halo_offsets(dim))
    dt = ext_scr.dtype
    Bk = ext_scr.shape[0]

    # ---- stage 1: build the halo-extended block in ext_scr ----
    # one DMA per d0 group when the spec carries group-equal starts
    # (ops/halo.py HALO_GROUP): the kernel was DMA-issue-bound at 3^d-1
    # window issues per grid step
    dmas = _issue_window_dmas(grouped, t, dim, C, win, b, n, starts_ref,
                              xs_ref, win_scr, sems)
    if P:
        @pl.when(n == 0)
        def _():
            pd = pltpu.make_async_copy(
                xs_ref.at[b, pl.ds(Tsrc, P), :],
                win_scr.at[pl.ds(win, P), :], sems.at[K])
            pd.start()
            pd.wait()

    xb = xblk_ref[0]                                   # (Bk, cells*C)
    for (c0, ln, e0) in body_plan:
        ext_scr[:, e0 * C:(e0 + ln) * C] = xb[:, c0 * C:(c0 + ln) * C]

    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, wo), 1)
    for k in range(K):
        if k in dmas:   # group head (grouped) or every k (ungrouped)
            dmas[k].wait()
        rb = pl.multiple_of(reb_ref[b, k, n], 8)
        local = lidx_ref[0, 0, k, :].reshape(Bk, 1)    # -1 where no pair
        oh = (local == pos + rb).astype(dt)
        o, w = lane_off[k], lane_w[k]
        res = jnp.dot(oh, win_scr[pl.ds(rb, wo), o:o + w],
                      preferred_element_type=jnp.float32).astype(dt)
        for (sp, ln, e0) in ext_plan[k]:
            ext_scr[:, e0 * C:(e0 + ln) * C] = res[:, sp * C:(sp + ln) * C]

    if P:
        @pl.when(hasp_ref[b, n] != 0)
        def _():
            posp = jax.lax.broadcasted_iota(jnp.int32, (Bk, P), 1) + win
            for k in range(K):
                local = lidx_ref[0, 0, k, :].reshape(Bk, 1)
                ohp = (local == posp).astype(dt)
                o, w = lane_off[k], lane_w[k]
                resp = jnp.dot(ohp, win_scr[pl.ds(win, P), o:o + w],
                               preferred_element_type=jnp.float32).astype(dt)
                for (sp, ln, e0) in ext_plan[k]:
                    ext_scr[:, e0 * C:(e0 + ln) * C] = (
                        ext_scr[:, e0 * C:(e0 + ln) * C]
                        + resp[:, sp * C:(sp + ln) * C])


def _fused_kernel(grouped, t, dim, C, Cout, win, wo, P, Tsrc, Bk,
                  starts_ref, hasp_ref, reb_ref, bl_ref, lidx_ref, xblk_ref,
                  xs_ref, wt_ref, out_ref, win_scr, ext_scr, sems):
    b = pl.program_id(0)
    n = pl.program_id(1)
    live = bl_ref[b, n] != 0

    @pl.when(live)
    def _():
        _build_ext_v1(grouped, t, dim, C, win, wo, P, Tsrc, b, n,
                      starts_ref, hasp_ref, reb_ref, lidx_ref, xblk_ref,
                      xs_ref, win_scr, ext_scr, sems)
        _conv_stage(t, dim, C, Cout, ext_scr, wt_ref, out_ref)

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)


def _dw_kernel_v1(grouped, t, dim, C, Cout, win, wo, P, Tsrc, Bk,
                  starts_ref, hasp_ref, reb_ref, bl_ref, lidx_ref, xblk_ref,
                  xs_ref, g_ref, out_ref, win_scr, ext_scr, sems):
    b = pl.program_id(0)
    n = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, n == 0))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(bl_ref[b, n] != 0)
    def _():
        _build_ext_v1(grouped, t, dim, C, win, wo, P, Tsrc, b, n,
                      starts_ref, hasp_ref, reb_ref, lidx_ref, xblk_ref,
                      xs_ref, win_scr, ext_scr, sems)
        _dw_stage(t, dim, C, Cout, ext_scr, g_ref, out_ref)


def halo_conv_fwd(x: jnp.ndarray, wt: jnp.ndarray, spec, t: int, dim: int,
                  interpret: bool = False) -> jnp.ndarray:
    """x (B, T, t^dim, Cin), wt from toeplitz_weights ->
    (B, T, t^dim, Cout): halo-extend + 3^dim submanifold conv, fused.

    Cin is NOT chunked here (fused_halo_conv handles chunking by summing
    per-chunk outputs); callers must keep the VMEM footprint in budget."""
    B, T, cells, C = x.shape
    ecells = (t + 2) ** dim
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    P = spec.corr_src.shape[1]
    Cout = wt.shape[-1] // t
    nb = spec.starts.shape[2]
    Bk = T // nb
    lanes = cells * C
    olanes = cells * Cout
    lanes_p = _round_up(lanes, 128)
    olanes_p = _round_up(olanes, 128)
    _, _, planes_p = _lane_layout(t, dim, C)
    elanes_p = _round_up(ecells * C, 128)

    xf = jnp.pad(x.reshape(B, T, lanes),
                 ((0, 0), (0, 0), (0, lanes_p - lanes)))
    lidx = spec.lidx                  # precomputed at graph build
    hasp = spec.hasp
    grouped = _grouped_now(dim)
    v2 = _v2_layout(t, dim, C) if grouped else None

    if v2 is not None:
        # v2: +-1 groups window-DMA the FLAT rows (their sources are the
        # x=t-1 / x=0 plane, a contiguous aligned lane range); only the
        # d0=0 offsets get a (slim) preslice pack. See block comment above.
        seg0_l, seg1_l, planes_v2 = v2
        patch = _patch_rows_v2(xf, spec, t, dim, C)
        # spec starts are clamped to [0, T - win] at build time: window DMAs
        # never cross the row end, so the flat array serves as its own
        # window source (the old jnp.pad(xf, (0, win)) full-array copies
        # were ~100 ms/step of pure HBM traffic at bench scale)
        xs0 = _preslice0_x(xf, C, t, dim, spec,
                           interpret=interpret)
        Gk = spec.lidx_hi.shape[2]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                             lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, 1, Gk, 1),
                             lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, 1, Gk, 1),
                             lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, Bk, lanes_p),
                             lambda b, n, st, hp, rb, bl: (b, n, 0)),
                pl.BlockSpec(memory_space=pl.ANY),   # xf (row windows)
                pl.BlockSpec(memory_space=pl.ANY),   # xs0
                pl.BlockSpec(memory_space=pl.ANY),   # patch rows
                pl.BlockSpec(wt.shape, lambda b, n, st, hp, rb, bl: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Bk, olanes_p),
                                   lambda b, n, st, hp, rb, bl: (b, n, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, win, planes_v2), x.dtype),
                pltpu.VMEM((max(P, 1), planes_v2), x.dtype),
                pltpu.VMEM((Bk, elanes_p), x.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fused_kernel_v2, t, dim, C, Cout, win, wo,
                              P, T, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, olanes_p), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(spec.starts, hasp, spec.rebase, spec.blive, lidx, spec.lidx_hi, spec.lidx_lo, xf, xf,
          xs0, patch, wt.astype(x.dtype))
        return out[:, :, :olanes].reshape(B, T, cells, Cout)

    xs = _preslice(xf, C, t, dim, 1)
    xs = _with_patch_rows(xs, spec, win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, Bk, lanes_p), lambda b, n, st, hp, rb, bl: (b, n, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wt.shape, lambda b, n, st, hp, rb, bl: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bk, olanes_p),
                               lambda b, n, st, hp, rb, bl: (b, n, 0)),
        scratch_shapes=[
            pltpu.VMEM((win + P, planes_p), x.dtype),
            pltpu.VMEM((Bk, elanes_p), x.dtype),
            pltpu.SemaphoreType.DMA((len(halo_offsets(dim)) + 1,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fused_kernel, grouped, t, dim, C,
                          Cout, win, wo, P, T, Bk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, olanes_p), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(spec.starts, hasp, spec.rebase, spec.blive, lidx, xf, xs, wt.astype(x.dtype))
    return out[:, :, :olanes].reshape(B, T, cells, Cout)


@functools.lru_cache(maxsize=None)
def _expand_mat(cells: int, Cout: int, mlanes_p: int, olanes_p: int):
    """(mlanes_p, olanes_p) one-hot: lane c of the cell-mask broadcasts to
    out lanes [c*Cout, (c+1)*Cout)."""
    E = np.zeros((mlanes_p, olanes_p), np.float32)
    for c in range(cells):
        E[c, c * Cout:(c + 1) * Cout] = 1.0
    return E


def fused_halo_conv_bn_act(x, w, a, b, mask, alpha, spec, t: int, dim: int,
                           interpret: bool = False, flat_out: bool = False):
    """Inference-only megafusion: mask * leaky_{alpha}(conv(x) * a + b) in
    ONE kernel — the following BNAct's folded affine, activation and
    submanifold re-masking apply to the f32 accumulator in VMEM instead of
    a separate elementwise HBM pass per conv->BN pair. An identity affine
    (a=1, b=0, alpha=1) turns this into conv + fused occupancy masking.

    x (B,T,cells,Cin) — or already-flat (B,T,lanes_p) from a previous
    call's flat_out=True (pad lanes may hold garbage; the kernel never
    reads them). w (3^dim,Cin,Cout), a/b (Cout,), mask (B,T,cells) bool.
    flat_out=True returns the raw padded (B,T,olanes_p) row so the NEXT
    fused conv can consume it without a slice+pad HBM round trip.
    Returns None when the v2 layout is unavailable or Cin would need
    chunking (the epilogue is nonlinear, so per-chunk sums can't fold) —
    callers fall back to the unfused pipeline."""
    B, T = x.shape[:2]
    cells = t ** dim
    C = w.shape[1]
    Cout = w.shape[-1]
    ecells = (t + 2) ** dim
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    P = spec.corr_src.shape[1]
    nb = spec.starts.shape[2]
    Bk = T // nb
    itemsize = np.dtype(x.dtype).itemsize
    per_c = _per_c_bytes(t, dim, Cout, win, P, Bk, itemsize)
    grouped = _grouped_now(dim)
    v2 = _v2_layout(t, dim, C) if grouped else None
    if v2 is None or C > max(8, _SCRATCH_BUDGET // per_c):
        return None
    seg0_l, seg1_l, planes_v2 = v2
    lanes = cells * C
    olanes = cells * Cout
    lanes_p = _round_up(lanes, 128)
    olanes_p = _round_up(olanes, 128)
    mlanes_p = _round_up(cells, 128)
    elanes_p = _round_up(ecells * C, 128)

    wt = toeplitz_weights(w, t, dim, x.dtype)
    if x.ndim == 3:
        assert x.shape[-1] == lanes_p, (x.shape, lanes_p)
        xf = x
    else:
        xf = jnp.pad(x.reshape(B, T, lanes),
                     ((0, 0), (0, 0), (0, lanes_p - lanes)))
    patch = _patch_rows_v2(xf, spec, t, dim, C)
    xs0 = _preslice0_x(xf, C, t, dim, spec, interpret=interpret)
    lidx = spec.lidx
    hasp = spec.hasp
    ab = jnp.stack([jnp.tile(a.astype(jnp.float32), cells),
                    jnp.tile(b.astype(jnp.float32), cells)])
    ab = jnp.pad(ab, ((0, 0), (0, olanes_p - olanes)))
    mk = jnp.pad(mask.astype(x.dtype),
                 ((0, 0), (0, 0), (0, mlanes_p - cells)))
    emat = jnp.asarray(_expand_mat(cells, Cout, mlanes_p, olanes_p),
                       dtype=x.dtype)
    Gk = spec.lidx_hi.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Gk, 1),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Gk, 1),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, Bk, lanes_p),
                         lambda b, n, st, hp, rb, bl: (b, n, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # xf (row windows)
            pl.BlockSpec(memory_space=pl.ANY),   # xs0
            pl.BlockSpec(memory_space=pl.ANY),   # patch rows
            pl.BlockSpec(wt.shape, lambda b, n, st, hp, rb, bl: (0, 0, 0)),
            pl.BlockSpec((2, olanes_p), lambda b, n, st, hp, rb, bl: (0, 0)),
            pl.BlockSpec((1, Bk, mlanes_p),
                         lambda b, n, st, hp, rb, bl: (b, n, 0)),
            pl.BlockSpec((mlanes_p, olanes_p),
                         lambda b, n, st, hp, rb, bl: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bk, olanes_p),
                               lambda b, n, st, hp, rb, bl: (b, n, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win, planes_v2), x.dtype),
            pltpu.VMEM((max(P, 1), planes_v2), x.dtype),
            pltpu.VMEM((Bk, elanes_p), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fused_kernel_v2_bn, t, dim, C, Cout, win, wo,
                          P, T, Bk, float(alpha)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, olanes_p), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(spec.starts, hasp, spec.rebase, spec.blive, lidx, spec.lidx_hi, spec.lidx_lo, xf, xf, xs0,
      patch, wt.astype(x.dtype), ab, mk, emat)
    if flat_out:
        return out
    return out[:, :, :olanes].reshape(B, T, cells, Cout)


def halo_conv_dw(x: jnp.ndarray, g: jnp.ndarray, spec, t: int, dim: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of the fused halo conv WITHOUT materializing the
    halo-extended array in HBM: x (B, T, t^dim, Cin), g (B, T, t^dim, Cout)
    -> banded cotangent blocks (3, span*Cin, t*Cout) f32 (span from
    `_out_groups`).

    Same stage-1 ext build as the forward (window DMAs + one-hot gathers +
    patch corrections, in VMEM); the contraction accumulates into one
    revisited f32 output block across the whole grid. Map to d_w with
    `toeplitz_adjoint` (the linear transpose of `toeplitz_weights`)."""
    B, T, cells, C = x.shape
    Cout = g.shape[-1]
    ecells = (t + 2) ** dim
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    P = spec.corr_src.shape[1]
    nb = spec.starts.shape[2]
    Bk = T // nb
    lanes = cells * C
    olanes = cells * Cout
    lanes_p = _round_up(lanes, 128)
    olanes_p = _round_up(olanes, 128)
    _, _, planes_p = _lane_layout(t, dim, C)
    elanes_p = _round_up(ecells * C, 128)
    _, span = _out_groups(t, dim)
    Kl = span * C
    No = t * Cout
    Kl_p = _round_up(Kl, 8)
    No_p = _round_up(No, 128)

    xf = jnp.pad(x.reshape(B, T, lanes),
                 ((0, 0), (0, 0), (0, lanes_p - lanes)))
    gf = jnp.pad(g.astype(x.dtype).reshape(B, T, olanes),
                 ((0, 0), (0, 0), (0, olanes_p - olanes)))
    lidx = spec.lidx
    hasp = spec.hasp
    grouped = _grouped_now(dim)
    v2 = _v2_layout(t, dim, C) if grouped else None
    out_spec = pl.BlockSpec((3, Kl_p, No_p), lambda b, n, st, hp, rb, bl: (0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((3, Kl_p, No_p), jnp.float32)

    if v2 is not None:
        seg0_l, seg1_l, planes_v2 = v2
        patch = _patch_rows_v2(xf, spec, t, dim, C)
        # no row padding: spec starts clamped to [0, T - win] at build time
        xs0 = _preslice0_x(xf, C, t, dim, spec,
                           interpret=interpret)
        Gk = spec.lidx_hi.shape[2]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                             lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, 1, Gk, 1),
                             lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, 1, Gk, 1),
                             lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, Bk, lanes_p),
                             lambda b, n, st, hp, rb, bl: (b, n, 0)),
                pl.BlockSpec(memory_space=pl.ANY),   # xf (row windows)
                pl.BlockSpec(memory_space=pl.ANY),   # xs0
                pl.BlockSpec(memory_space=pl.ANY),   # patch rows
                pl.BlockSpec((1, Bk, olanes_p),
                             lambda b, n, st, hp, rb, bl: (b, n, 0)),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((2, win, planes_v2), x.dtype),
                pltpu.VMEM((max(P, 1), planes_v2), x.dtype),
                pltpu.VMEM((Bk, elanes_p), x.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA,
            ],
        )
        dwt = pl.pallas_call(
            functools.partial(_dw_kernel_v2, t, dim, C, Cout, win, wo,
                              P, T, Bk),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(spec.starts, hasp, spec.rebase, spec.blive, lidx, spec.lidx_hi, spec.lidx_lo, xf, xf,
          xs0, patch, gf)
        return dwt[:, :Kl, :No]

    xs = _preslice(xf, C, t, dim, 1)
    xs = _with_patch_rows(xs, spec, win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, Bk, lanes_p), lambda b, n, st, hp, rb, bl: (b, n, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Bk, olanes_p), lambda b, n, st, hp, rb, bl: (b, n, 0)),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((win + P, planes_p), x.dtype),
            pltpu.VMEM((Bk, elanes_p), x.dtype),
            pltpu.SemaphoreType.DMA((len(halo_offsets(dim)) + 1,)),
        ],
    )
    dwt = pl.pallas_call(
        functools.partial(_dw_kernel_v1, grouped, t, dim, C, Cout, win,
                          wo, P, T, Bk),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(spec.starts, hasp, spec.rebase, spec.blive, lidx, xf, xs, gf)
    return dwt[:, :Kl, :No]


def halo_conv_bwd(g: jnp.ndarray, x: jnp.ndarray, wt: jnp.ndarray,
                  spec, t: int, dim: int, interpret: bool = False):
    """Combined backward on the v2 layout: g (B, T, t^dim, Cg) cotangent,
    x (B, T, t^dim, Cx) saved input, wt = toeplitz_weights(flip_weights(w))
    -> (d_x (B, T, t^dim, Cx), dwt_flip (3*(t+2)^(dim-1)*Cg,
    t^(dim-1)*Cx) f32). One ext(g) build serves both outputs (see
    `_bwd_kernel_v2`). Returns None when v2 is unavailable — callers fall
    back to the two-kernel path."""
    B, T, cells, Cg = g.shape
    Cx = x.shape[-1]
    ecells = (t + 2) ** dim
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    P = spec.corr_src.shape[1]
    nb = spec.starts.shape[2]
    Bk = T // nb
    grouped = _grouped_now(dim)
    v2 = _v2_layout(t, dim, Cg) if grouped else None
    if v2 is None:
        return None
    seg0_l, seg1_l, planes_v2 = v2
    glanes = cells * Cg
    xlanes = cells * Cx
    glanes_p = _round_up(glanes, 128)
    xlanes_p = _round_up(xlanes, 128)
    elanes_p = _round_up(ecells * Cg, 128)
    _, span = _out_groups(t, dim)
    Kl = span * Cg
    No = t * Cx
    Kl_p = _round_up(Kl, 8)
    No_p = _round_up(No, 128)

    gf = jnp.pad(g.reshape(B, T, glanes),
                 ((0, 0), (0, 0), (0, glanes_p - glanes)))
    xf = jnp.pad(x.astype(g.dtype).reshape(B, T, xlanes),
                 ((0, 0), (0, 0), (0, xlanes_p - xlanes)))
    patch = _patch_rows_v2(gf, spec, t, dim, Cg)
    gs0 = _preslice0_x(gf, Cg, t, dim, spec, interpret=interpret)
    lidx = spec.lidx
    hasp = spec.hasp
    Gk = spec.lidx_hi.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Gk, 1),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Gk, 1),
                         lambda b, n, st, hp, rb, bl: (b, n, 0, 0)),
            pl.BlockSpec((1, Bk, glanes_p),
                         lambda b, n, st, hp, rb, bl: (b, n, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # gf (row windows)
            pl.BlockSpec(memory_space=pl.ANY),   # gs0
            pl.BlockSpec(memory_space=pl.ANY),   # patch rows
            pl.BlockSpec(wt.shape, lambda b, n, st, hp, rb, bl: (0, 0, 0)),
            pl.BlockSpec((1, Bk, xlanes_p),
                         lambda b, n, st, hp, rb, bl: (b, n, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, Bk, xlanes_p),
                         lambda b, n, st, hp, rb, bl: (b, n, 0)),
            pl.BlockSpec((3, Kl_p, No_p), lambda b, n, st, hp, rb, bl: (0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win, planes_v2), g.dtype),
            pltpu.VMEM((max(P, 1), planes_v2), g.dtype),
            pltpu.VMEM((Bk, elanes_p), g.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    d_x, dwt = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, t, dim, Cg, Cx, win, wo, P,
                          T, Bk),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, T, xlanes_p), g.dtype),
                   jax.ShapeDtypeStruct((3, Kl_p, No_p), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(spec.starts, hasp, spec.rebase, spec.blive, lidx, spec.lidx_hi, spec.lidx_lo, gf, gf, gs0,
      patch, wt.astype(g.dtype), xf)
    return (d_x[:, :, :xlanes].reshape(B, T, cells, Cx),
            dwt[:, :Kl, :No])


def _bwd_impl(x, w, g, spec, t, dim, interpret=False):
    """Combined d_x + d_w backward, chunked over the COTANGENT channels Cg
    (the conv contracts Cg for d_x -> per-chunk d_x SUM; per-chunk dwt rows
    map to disjoint Cout rows of d_wf -> concat). Falls back to the
    separate d_x/d_W kernels when the v2 layout is unavailable."""
    B, T, cells, Cx = x.shape
    Cg = g.shape[-1]
    itemsize = np.dtype(g.dtype).itemsize
    Bk = T // spec.starts.shape[2]
    P = spec.corr_src.shape[1]
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    # per-Cg VMEM: shared ext machinery + flipped weight block + the f32
    # dwt block rows (4 bytes) + the extra x input block
    span = 3 * (t + 2) if dim == 3 else (t + 2)
    per_c = (_per_c_bytes(t, dim, Cx, win, P, Bk, itemsize)
             + 3 * span * t * Cx * 4)
    max_c = max(8, _SCRATCH_BUDGET // per_c)
    wf = flip_weights(w)                       # (3^dim, Cg, Cx)
    grouped = _grouped_now(dim)
    if (_v2_layout(t, dim, min(Cg, max_c)) if grouped else None) is None:
        d_x = _fused_impl(g, wf.astype(g.dtype), spec, t, dim,
                          interpret=interpret)
        d_w = _dw_impl(x, g, spec, t, dim, interpret=interpret)
        return d_x, d_w
    if Cg <= max_c:
        chunks = [(0, Cg)]
    else:
        nchunks = -(-Cg // max_c)
        cc = -(-Cg // nchunks)
        if Cg % 8 == 0:
            cc = _round_up(cc, 8)
        chunks = [(o, min(cc, Cg - o)) for o in range(0, Cg, cc)]
    d_x_acc = None
    dwf_parts = []
    for (o, cc) in chunks:
        wt = toeplitz_weights(wf[:, o:o + cc, :], t, dim, g.dtype)
        res = halo_conv_bwd(g[..., o:o + cc], x, wt, spec, t, dim,
                            interpret=interpret)
        if res is None:     # alignment lost on a tail chunk: fall back
            d_x = _fused_impl(g, wf.astype(g.dtype), spec, t, dim,
                              interpret=interpret)
            d_w = _dw_impl(x, g, spec, t, dim, interpret=interpret)
            return d_x, d_w
        d_x_p, dwt = res
        d_x_acc = (d_x_p.astype(jnp.float32) if d_x_acc is None
                   else d_x_acc + d_x_p)
        dwf_parts.append(toeplitz_adjoint(dwt, t, dim, cc, Cx))
    d_wf = (dwf_parts[0] if len(dwf_parts) == 1
            else jnp.concatenate(dwf_parts, axis=1))
    # adjoint of w -> flip_weights(w) is flip_weights itself
    d_w = flip_weights(d_wf)
    return d_x_acc.astype(x.dtype), d_w


def toeplitz_adjoint(d_wt: jnp.ndarray, t: int, dim: int, Cin: int,
                     Cout: int) -> jnp.ndarray:
    """Banded cotangent blocks (3, span*Cin, t*Cout) -> d_w
    (3^dim, Cin, Cout): the linear transpose of `toeplitz_weights`
    (exact — the band build is linear in w)."""
    f = lambda w: toeplitz_weights(w, t, dim, jnp.float32)
    ex = jax.ShapeDtypeStruct((3 ** dim, Cin, Cout), jnp.float32)
    (d_w,) = jax.linear_transpose(f, ex)(d_wt.astype(jnp.float32))
    return d_w


def _per_c_bytes(t, dim, Cout, win, P, Bk, itemsize):
    """Estimated VMEM bytes per input channel for chunk sizing."""
    packl = -(-_lane_layout(t, dim, 32)[2] // 32)
    ecells = (t + 2) ** dim
    cells = t ** dim
    span = 3 * (t + 2) if dim == 3 else (t + 2)  # band rows per Cin/block
    return ((2 * win + P) * packl        # window scratch (double-buffered)
            + Bk * ecells                # ext scratch
            + 2 * Bk * cells             # in blocks (double-buffered)
            + 3 * span * t * Cout        # banded weight blocks
            ) * itemsize


def _fused_impl(x, w, spec, t, dim, interpret=False):
    """Chunk Cin when the VMEM estimate exceeds budget; per-chunk outputs
    SUM (the conv contracts over Cin)."""
    B, T, cells, C = x.shape
    Cout = w.shape[-1]
    itemsize = np.dtype(x.dtype).itemsize
    Bk = T // spec.starts.shape[2]
    P = spec.corr_src.shape[1]
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    per_c = _per_c_bytes(t, dim, Cout, win, P, Bk, itemsize)
    max_c = max(8, _SCRATCH_BUDGET // per_c)
    if C <= max_c:
        wt = toeplitz_weights(w, t, dim, x.dtype)
        return halo_conv_fwd(x, wt, spec, t, dim, interpret=interpret)
    nchunks = -(-C // max_c)
    cc = -(-C // nchunks)
    if C % 8 == 0:
        cc = _round_up(cc, 8)   # keep chunks v2-eligible (lane alignment)
    acc = None
    w3 = w.reshape(3 ** dim, C, Cout)
    for o in range(0, C, cc):
        wt = toeplitz_weights(w3[:, o:o + cc, :], t, dim, x.dtype)
        part = halo_conv_fwd(x[..., o:o + cc], wt, spec, t, dim,
                             interpret=interpret).astype(jnp.float32)
        acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def _dw_impl(x, g, spec, t, dim, interpret=False):
    """d_w via the ext-free Pallas kernel, Cin-chunked like `_fused_impl`
    (per-chunk banded cotangents map to disjoint Cin rows of d_w)."""
    B, T, cells, C = x.shape
    Cout = g.shape[-1]
    itemsize = np.dtype(x.dtype).itemsize
    Bk = T // spec.starts.shape[2]
    P = spec.corr_src.shape[1]
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    per_c = _per_c_bytes(t, dim, Cout, win, P, Bk, itemsize)
    max_c = max(8, _SCRATCH_BUDGET // per_c)
    if C <= max_c:
        dwt = halo_conv_dw(x, g, spec, t, dim, interpret=interpret)
        return toeplitz_adjoint(dwt, t, dim, C, Cout)
    nchunks = -(-C // max_c)
    cc = -(-C // nchunks)
    if C % 8 == 0:
        cc = _round_up(cc, 8)   # keep chunks v2-eligible (lane alignment)
    parts = []
    for o in range(0, C, cc):
        xc = x[..., o:o + cc]
        dwt = halo_conv_dw(xc, g, spec, t, dim, interpret=interpret)
        parts.append(toeplitz_adjoint(dwt, t, dim, xc.shape[-1], Cout))
    return jnp.concatenate(parts, axis=1)


def _dw_recompute(x, g, spec, t, dim):
    """d_W[delta] = ext(x)[., p+delta]^T @ g[., p] over all tiles/cells.

    Recomputes the halo-extended block via the exact halo26_extend op
    (Pallas on TPU) and contracts with 3^dim static slices — the standard
    weight-grad FLOPs, one GEMM per offset."""
    from uresnet_pytorch_tpu.ops.halo import halo26_extend
    B, T, cells, C = x.shape
    Cout = g.shape[-1]
    e = t + 2
    ext = halo26_extend(x, spec, t, dim)
    ext = ext.reshape((B * T,) + (e,) * dim + (C,))
    gf = g.reshape(B * T * cells, Cout)
    dws = []
    for k in range(3 ** dim):
        tmp, dg = k, []
        for _ in range(dim):
            dg.append(tmp % 3)
            tmp //= 3
        dg = dg[::-1]
        idx = (slice(None),) + tuple(
            slice(d, d + t) for d in dg) + (slice(None),)
        slab = ext[idx].reshape(B * T * cells, C)
        dws.append(jnp.einsum("nc,nd->cd", slab.astype(jnp.float32),
                              gf.astype(jnp.float32)))
    return jnp.stack(dws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_halo_conv(x: jnp.ndarray, w: jnp.ndarray, spec, t: int,
                    dim: int) -> jnp.ndarray:
    """Fused submanifold conv on halo'd tiles: x (B,T,t^dim,Cin),
    w (3^dim,Cin,Cout) -> (B,T,t^dim,Cout). TPU-only (dispatchers fall
    back to halo26_extend + lax.conv elsewhere)."""
    return _fused_impl(x, w.astype(x.dtype), spec, t, dim)


def _fhc_fwd(x, w, spec, t, dim):
    return fused_halo_conv(x, w, spec, t, dim), (x, w, spec)


def _fhc_bwd(t, dim, res, g):
    x, w, spec = res
    # COMBINED kernel: one ext(g) build feeds the adjoint data path (same
    # fused conv, flipped stencil) AND the weight-grad contraction (x as
    # the dw cotangent) — the separate-kernel path built ext twice. Falls
    # back to the two-kernel path off the v2 layout.
    d_x, d_w = _bwd_impl(x, w, g, spec, t, dim)
    d_spec = jax.tree_util.tree_map(
        lambda v: np.zeros(v.shape, jax.dtypes.float0), spec)
    return d_x, d_w.astype(w.dtype), d_spec


fused_halo_conv.defvjp(_fhc_fwd, _fhc_bwd)
