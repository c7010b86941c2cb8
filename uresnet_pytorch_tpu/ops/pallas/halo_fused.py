"""Pallas kernel: direct 26-neighbor tile halo in one HBM pass.

Replaces the 3-gather + 3-concat halo pipeline (and its XLA reference,
ops/halo.py) on TPU. The wrapper first PRE-SLICES the source into its slab
lanes: XS[:, :, pk_k*C:(pk_k+S_k)*C] holds the face/edge/corner source
cells of offset k (one fused lane-concat pass in XLA, everything flat and
lane-dense — C-minor materializations get lane-padded up to 8x by XLA's
layouts and must never touch HBM). Then, per grid step (event b, tile
block n):

  1. 3^d-1 window DMAs, one per offset, each (win x S_k*C): offset k's
     window reads XS rows [starts[k,n], +win) at its own lane range.
     Every offset's neighbor map is MONOTONE (sorted keys + constant
     offset), so a ~2x block window per offset covers its sources — far
     cheaper than one shared window spanning every offset's shift, since
     one-hot gather FLOPs scale with window height.
  2. Out-of-window stragglers ride PATCH ROWS: the correction list's
     source rows are appended to XS; one extra DMA brings all P of them,
     and their one-hot index is win + patch_slot.
  3. One (Bk, win+P) x (win+P, S_k*C) one-hot matmul per offset (MXU)
     gathers each neighbor slab; results are written straight into the
     lex-ordered halo-extended output block — conv-ready, flat.
  4. The tile's own cells stream in as a regular blocked operand.

The backward kernel is the SAME machinery with offsets negated (gather =
scatter transpose under offset symmetry, see ops/halo.py): slab k's window
reads the cotangent's slab-k lanes at the NEGATED offset's starts, and the
result ACCUMULATES into the source block.

Precision note (measured on-chip): the MXU computes f32 dots via bf16
passes, so a one-hot "gather" of f32 values rounds them to bf16 (~0.4%
rel). The model's activations are bf16, for which row movement is
bit-exact; feed the kernel f32 only where bf16 rounding is acceptable
(tests/test_tpu_gated.py pins the bf16-exactness contract).

This is the TPU-native replacement for SparseConvNet's fused CUDA
gather-GEMM-scatter hot path (SURVEY.md §2.13, expected SCN/CUDA/*.cu).
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uresnet_pytorch_tpu.ops.halo import (
    body_cells, halo_groups, halo_offsets, slab_cells)


def _runs(seq):
    """Ascending int sequence -> [(start_value, run_len, seq_pos), ...] of
    maximal consecutive runs."""
    out = []
    r0 = 0
    for i in range(1, len(seq) + 1):
        if i == len(seq) or seq[i] != seq[i - 1] + 1:
            out.append((int(seq[r0]), i - r0, r0))
            r0 = i
    return out


@lru_cache(maxsize=None)
def _plans(t: int, dim: int):
    """Static geometry plans, in CELL units (scaled by C at trace time).

    pack_plan: (src_cell, n_cells, packed_cell) — x -> slab-lane preslice
    epack_plan: (ext_cell, n_cells, packed_cell) — g -> slab-lane preslice
    slab_start[k]/slab_len[k]: packed-cell offset/size of offset k's slab
    ext_plan[k]: (slab_pos, n_cells, ext_cell) — dot result -> ext block
    src_plan[k]: (slab_pos, n_cells, src_cell) — dot result -> d_x block
    body_plan: (body_cell, n_cells, ext_cell)
    packc: total packed cells
    """
    offs = halo_offsets(dim)
    pack_plan, epack_plan = [], []
    slab_start, slab_len, ext_plan, src_plan = [], [], [], []
    pk = 0
    for off in offs:
        ecells, scells = slab_cells(off, t)
        slab_start.append(pk)
        slab_len.append(len(scells))
        for (v, n, p) in _runs(scells):
            pack_plan.append((v, n, pk + p))
        for (v, n, p) in _runs(ecells):
            epack_plan.append((v, n, pk + p))
        ext_plan.append([(p, n, v) for (v, n, p) in _runs(ecells)])
        src_plan.append([(p, n, v) for (v, n, p) in _runs(scells)])
        pk += len(scells)
    bcells = body_cells(t, dim)
    body_plan = [(p, n, v) for (v, n, p) in _runs(bcells)]
    return (pack_plan, epack_plan, tuple(slab_start), tuple(slab_len),
            ext_plan, src_plan, body_plan, pk)


def _issue_window_dmas(grouped, t, dim, C, win, b, n, starts_ref, src_ref,
                       win_scr, sems, negate=False):
    """Start the window DMAs; returns {offset k: dma to wait on before k's
    dot}. grouped=True (spec built with group-equal starts): ONE DMA per
    d0 group over its contiguous lane span — the kernels are DMA-ISSUE
    bound at 3^d-1 issues per grid step, and grouping cuts that to dim.
    negate=True reads each offset's rows at the NEGATED offset's starts
    (backward); negation maps whole d0 groups onto each other, so the
    grouped path stays one DMA per group."""
    lane_off, lane_w, _ = _lane_layout(t, dim, C)
    K = len(halo_offsets(dim))
    dmas = {}
    if grouped:
        for gi, (k0, k1) in enumerate(halo_groups(dim)):
            o = lane_off[k0]
            w = lane_off[k1 - 1] + lane_w[k1 - 1] - o
            ks = (K - 1 - k0) if negate else k0
            stk = pl.multiple_of(starts_ref[b, ks, n], 8)
            d = pltpu.make_async_copy(
                src_ref.at[b, pl.ds(stk, win), o:o + w],
                win_scr.at[pl.ds(0, win), o:o + w], sems.at[gi])
            d.start()
            dmas[k0] = d
    else:
        for k in range(K):
            o, w = lane_off[k], lane_w[k]
            ks = (K - 1 - k) if negate else k
            stk = pl.multiple_of(starts_ref[b, ks, n], 8)
            d = pltpu.make_async_copy(
                src_ref.at[b, pl.ds(stk, win), o:o + w],
                win_scr.at[pl.ds(0, win), o:o + w], sems.at[k])
            d.start()
            dmas[k] = d
    return dmas


def _fwd_kernel(grouped, t, dim, C, win, P, Tsrc, Bk, starts_ref, hasp_ref,
                bl_ref, lidx_ref, xblk_ref, xs_ref, out_ref, win_scr, sems):
    b = pl.program_id(0)
    n = pl.program_id(1)

    @pl.when(bl_ref[b, n] != 0)
    def _():
        _fwd_body(grouped, t, dim, C, win, P, Tsrc, Bk, b, n, starts_ref,
                  hasp_ref, lidx_ref, xblk_ref, xs_ref, out_ref, win_scr,
                  sems)

    # dead block (beyond the sorted live-tile prefix): all-zero inputs, so
    # the halo-extended block is zero — write it without DMAs or dots
    @pl.when(bl_ref[b, n] == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)


def _fwd_body(grouped, t, dim, C, win, P, Tsrc, Bk, b, n, starts_ref,
              hasp_ref, lidx_ref, xblk_ref, xs_ref, out_ref, win_scr, sems):
    (_, _, slab_start, slab_len, ext_plan, _, body_plan, packc) = \
        _plans(t, dim)
    lane_off, lane_w, _ = _lane_layout(t, dim, C)
    K = len(halo_offsets(dim))
    dt = out_ref.dtype
    W = win + P

    dmas = _issue_window_dmas(grouped, t, dim, C, win, b, n, starts_ref,
                              xs_ref, win_scr, sems)
    if P:
        # patch rows live in the scratch tail PERSISTENTLY for the whole
        # event: the TPU grid iterates n innermost, so fetch once at n == 0
        # (window DMAs only ever write rows [0, win))
        @pl.when(n == 0)
        def _():
            pd = pltpu.make_async_copy(
                xs_ref.at[b, pl.ds(Tsrc, P), :],
                win_scr.at[pl.ds(win, P), :], sems.at[K])
            pd.start()
            pd.wait()

    # body placement happens while the DMAs are in flight
    xb = xblk_ref[0]                                   # (Bk, cells*C)
    for (c0, ln, e0) in body_plan:
        out_ref[0, :, e0 * C:(e0 + ln) * C] = xb[:, c0 * C:(c0 + ln) * C]

    # window dots: K = win only; patch pairs (rare: a handful of blocks per
    # event) are handled by a second, per-block-gated dot below so the
    # common case never pays their K-rows
    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, win), 1)
    for k in range(K):
        if k in dmas:   # group head (grouped) or every k (ungrouped)
            dmas[k].wait()
        local = lidx_ref[0, 0, k, :].reshape(Bk, 1)    # -1 where no pair
        oh = (local == pos).astype(dt)
        o, w = lane_off[k], lane_w[k]
        res = jnp.dot(oh, win_scr[pl.ds(0, win), o:o + w],
                      preferred_element_type=jnp.float32).astype(dt)
        for (sp, ln, e0) in ext_plan[k]:
            out_ref[0, :, e0 * C:(e0 + ln) * C] = res[:, sp * C:(sp + ln) * C]

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
                    out_ref[0, :, e0 * C:(e0 + ln) * C] = (
                        out_ref[0, :, e0 * C:(e0 + ln) * C]
                        + resp[:, sp * C:(sp + ln) * C])


def _bwd_kernel(grouped, t, dim, C, win, P, Tsrc, Bk, starts_ref, hasp_ref,
                bl_ref, lidx_ref, gblk_ref, gs_ref, out_ref, win_scr, acc,
                sems):
    """Transpose: d_x block = body cotangent + per-offset slab cotangents
    gathered from the NEGATED offset's neighbor rows."""
    b = pl.program_id(0)
    n = pl.program_id(1)

    @pl.when(bl_ref[b, n] != 0)
    def _():
        _bwd_body(grouped, t, dim, C, win, P, Tsrc, Bk, b, n, starts_ref,
                  hasp_ref, lidx_ref, gblk_ref, gs_ref, out_ref, win_scr,
                  acc, sems)

    @pl.when(bl_ref[b, n] == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)


def _bwd_body(grouped, t, dim, C, win, P, Tsrc, Bk, b, n, starts_ref,
              hasp_ref, lidx_ref, gblk_ref, gs_ref, out_ref, win_scr, acc,
              sems):
    (_, _, slab_start, slab_len, _, src_plan, body_plan, packc) = \
        _plans(t, dim)
    lane_off, lane_w, _ = _lane_layout(t, dim, C)
    K = len(halo_offsets(dim))
    dt = out_ref.dtype
    W = win + P

    # slab k's cotangent lanes, windowed at the NEGATED offset's starts
    dmas = _issue_window_dmas(grouped, t, dim, C, win, b, n, starts_ref,
                              gs_ref, win_scr, sems, negate=True)
    if P:
        @pl.when(n == 0)
        def _():
            pd = pltpu.make_async_copy(
                gs_ref.at[b, pl.ds(Tsrc, P), :],
                win_scr.at[pl.ds(win, P), :], sems.at[K])
            pd.start()
            pd.wait()

    # init accumulator with the body cotangent
    gb = gblk_ref[0]                                   # (Bk, ecells*C)
    for (c0, ln, e0) in body_plan:
        acc[:, c0 * C:(c0 + ln) * C] = gb[:, e0 * C:(e0 + ln) * C]

    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, win), 1)
    for k in range(K):
        if k in dmas:
            dmas[k].wait()
        rk = K - 1 - k
        local = lidx_ref[0, 0, rk, :].reshape(Bk, 1)
        oh = (local == pos).astype(dt)
        o, w = lane_off[k], lane_w[k]
        res = jnp.dot(oh, win_scr[pl.ds(0, win), o:o + w],
                      preferred_element_type=jnp.float32).astype(dt)
        for (sp, ln, v) in src_plan[k]:
            acc[:, v * C:(v + ln) * C] = (
                acc[:, v * C:(v + ln) * C] + res[:, sp * C:(sp + ln) * C])
    if P:
        @pl.when(hasp_ref[b, n] != 0)
        def _():
            posp = jax.lax.broadcasted_iota(jnp.int32, (Bk, P), 1) + win
            for k in range(K):
                rk = K - 1 - k
                local = lidx_ref[0, 0, rk, :].reshape(Bk, 1)
                ohp = (local == posp).astype(dt)
                o, w = lane_off[k], lane_w[k]
                resp = jnp.dot(ohp, win_scr[pl.ds(win, P), o:o + w],
                               preferred_element_type=jnp.float32).astype(dt)
                for (sp, ln, v) in src_plan[k]:
                    acc[:, v * C:(v + ln) * C] = (
                        acc[:, v * C:(v + ln) * C]
                        + resp[:, sp * C:(sp + ln) * C])
    out_ref[0] = acc[:, :]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _lane_layout(t: int, dim: int, C: int):
    """Per-offset lane offsets/widths in the packed buffer, each 128-aligned
    (Mosaic DMA lane slices must align to the lane tiling). Pad lanes hold
    zeros, so dots over the padded width stay exact."""
    offs = halo_offsets(dim)
    lane_off, lane_w = [], []
    pos = 0
    for off in offs:
        S = len(slab_cells(off, t)[0])
        w = _round_up(S * C, 128)
        lane_off.append(pos)
        lane_w.append(w)
        pos += w
    return lane_off, lane_w, pos


def _local_idx(spec, win):
    """(B, nb, K, Bk) int32: [window|patch]-local source row per offset
    pair, -1 where no pair (kernel one-hot yields a zero row). Correction
    pairs resolve to win + patch_slot."""
    B, K, T = spec.idx.shape
    nb = spec.starts.shape[2]
    Bk = T // nb
    P = spec.corr_src.shape[1]
    local = spec.idx - jnp.repeat(spec.starts, Bk, axis=2)
    if P:
        slot = jnp.arange(P, dtype=jnp.int32)
        flat_pos = jnp.where(spec.corr_ok,
                             spec.corr_off * T + spec.corr_dst, K * T)
        patch_of = jax.vmap(
            lambda fp: jnp.full((K * T,), -1, jnp.int32)
            .at[fp].set(slot, mode="drop"))(flat_pos).reshape(B, K, T)
        local = jnp.where(spec.inband, local,
                          jnp.where(patch_of >= 0, win + patch_of, -1))
    else:
        local = jnp.where(spec.inband, local, -1)
    return jnp.transpose(local.reshape(B, K, nb, Bk), (0, 2, 1, 3))


def _preslice(flat, C, t, dim, which):
    """(B, T, cells*C) -> (B, T, packed lanes): concatenate each offset's
    slab-lane runs, zero-padding every slab to a 128-aligned lane width
    (one fused XLA copy pass; stays flat/lane-dense). which=1 selects the
    SOURCE cells (forward), which=0 the EXT cells (backward cotangent)."""
    B, T, _ = flat.shape
    segs = []
    for off in halo_offsets(dim):
        cells = slab_cells(off, t)[which]
        w = _round_up(len(cells) * C, 128)
        used = 0
        for (v, ln, _) in _runs(cells):
            segs.append(flat[:, :, v * C:(v + ln) * C])
            used += ln * C
        if w > used:
            segs.append(jnp.zeros((B, T, w - used), flat.dtype))
    return jnp.concatenate(segs, axis=-1)


def _has_patch(spec):
    """(B, nb) int32: 1 where the block contains any correction destination
    (the kernel's patch dots run only for those blocks)."""
    B, K, T = spec.idx.shape
    nb = spec.starts.shape[2]
    Bk = T // nb
    blk = jnp.where(spec.corr_ok, spec.corr_dst // Bk, nb)
    return jax.vmap(lambda bb: jnp.zeros((nb,), jnp.int32)
                    .at[bb].set(1, mode="drop"))(blk)


def _with_patch_rows(flat, spec, win):
    """[rows | patch rows]: append the correction-source rows so the
    kernel's patch DMA can reach them at a fixed offset (Tsrc). No window
    spacer: spec starts are clamped to [0, T - win] at build time, so
    window DMAs never read past the T real rows."""
    B, T, lanes = flat.shape
    P = spec.corr_src.shape[1]
    if not P:
        return flat
    rows = jnp.where(spec.corr_ok, spec.corr_src, T)
    patch = jax.vmap(lambda xx, rr: jnp.take(
        xx, rr, axis=0, mode="fill", fill_value=0))(flat, rows)
    return jnp.concatenate([flat, patch], axis=1)


# VMEM budget per grid step: slab-lane window scratch + auto-double-buffered
# in/out blocks; pallas asks for a raised ceiling (the 16 MB default scoped
# limit leaves no room). C is chunked to fit, with headroom for Mosaic's
# one-hot/result temps.
# Env-tunable (URESNET_SCRATCH_MB / URESNET_VMEM_MB) for on-chip A/B:
# chip VMEM is 128 MB; a bigger scratch budget means fewer Cin chunks,
# i.e. fewer ext rebuilds AND fewer x[..., o:o+cc] chunk-slice copies
# (measured 58 ms/step of XLA glue at bench scale).
import os as _os
_SCRATCH_BUDGET = int(_os.environ.get("URESNET_SCRATCH_MB", "20")) \
    * 1024 * 1024
_VMEM_LIMIT = int(_os.environ.get("URESNET_VMEM_MB", "64")) * 1024 * 1024


def _run_chunked(fn, x, C, per_c_bytes):
    max_c = max(8, _SCRATCH_BUDGET // per_c_bytes)
    if C <= max_c:
        return fn(x)
    nchunks = -(-C // max_c)
    cc = -(-C // nchunks)
    outs = [fn(x[..., o:o + cc]) for o in range(0, C, cc)]
    return jnp.concatenate(outs, axis=-1)


def _grouped_now(dim):
    """Trace-time: whether specs are being built with group-equal starts
    (ops.halo.HALO_GROUP). Must match the spec fed to the kernel — both
    read the same module flag within one trace."""
    from uresnet_pytorch_tpu.ops import halo as _halo_mod
    return bool(_halo_mod.HALO_GROUP) and dim in (2, 3)


def halo26_fwd(x: jnp.ndarray, spec, t: int, dim: int,
               interpret: bool = False) -> jnp.ndarray:
    """x (B, T, t^dim, C) -> (B, T, (t+2)^dim, C), exact."""
    B, T, cells, C = x.shape
    ecells = (t + 2) ** dim
    win = spec.window.shape[-1]
    itemsize = np.dtype(x.dtype).itemsize
    Bk0 = T // spec.starts.shape[2]
    P = spec.corr_src.shape[1]
    # per-channel packed width, estimated at a representative chunk size
    packl = -(-_lane_layout(t, dim, 32)[2] // 32)
    per_c = ((win + P) * packl
             + 2 * Bk0 * (cells + ecells)) * itemsize

    def run(xc):
        Cc = xc.shape[-1]
        nb = spec.starts.shape[2]
        Bk = T // nb
        lanes = cells * Cc
        elanes = ecells * Cc
        lanes_p = _round_up(lanes, 128)
        _, _, planes_p = _lane_layout(t, dim, Cc)
        elanes_p = _round_up(elanes, 128)
        xf = jnp.pad(xc.reshape(B, T, lanes),
                     ((0, 0), (0, 0), (0, lanes_p - lanes)))
        xs = _preslice(xf, Cc, t, dim, 1)
        xs = _with_patch_rows(xs, spec, win)
        lidx = spec.lidx              # precomputed at graph build
        hasp = spec.hasp
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                             lambda b, n, st, hp, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, Bk, lanes_p), lambda b, n, st, hp, bl: (b, n, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, Bk, elanes_p),
                                   lambda b, n, st, hp, bl: (b, n, 0)),
            scratch_shapes=[
                pltpu.VMEM((win + P, planes_p), xc.dtype),
                pltpu.SemaphoreType.DMA((len(halo_offsets(dim)) + 1,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, _grouped_now(dim), t, dim,
                              Cc, win, P, T, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, elanes_p), xc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(spec.starts, hasp, spec.blive, lidx, xf, xs)
        return out[:, :, :elanes].reshape(B, T, ecells, Cc)

    return _run_chunked(run, x, C, per_c)


def halo26_bwd(g: jnp.ndarray, spec, t: int, dim: int,
               interpret: bool = False) -> jnp.ndarray:
    """Transpose of halo26_fwd: cotangent (B, T, (t+2)^dim, C) ->
    (B, T, t^dim, C)."""
    B, T, ecells, C = g.shape
    cells = t ** dim
    win = spec.window.shape[-1]
    itemsize = np.dtype(g.dtype).itemsize
    Bk0 = T // spec.starts.shape[2]
    P = spec.corr_src.shape[1]
    packl = -(-_lane_layout(t, dim, 32)[2] // 32)
    per_c = ((win + P) * packl
             + Bk0 * (3 * ecells + 3 * cells)) * itemsize

    def run(gc):
        Cc = gc.shape[-1]
        nb = spec.starts.shape[2]
        Bk = T // nb
        elanes = ecells * Cc
        lanes = cells * Cc
        elanes_p = _round_up(elanes, 128)
        lanes_p = _round_up(lanes, 128)
        _, _, planes_p = _lane_layout(t, dim, Cc)
        gf = jnp.pad(gc.reshape(B, T, elanes),
                     ((0, 0), (0, 0), (0, elanes_p - elanes)))
        gs = _preslice(gf, Cc, t, dim, 0)
        gs = _with_patch_rows(gs, spec, win)
        lidx = spec.lidx              # precomputed at graph build
        hasp = spec.hasp
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                             lambda b, n, st, hp, bl: (b, n, 0, 0)),
                pl.BlockSpec((1, Bk, elanes_p), lambda b, n, st, hp, bl: (b, n, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, Bk, lanes_p),
                                   lambda b, n, st, hp, bl: (b, n, 0)),
            scratch_shapes=[
                pltpu.VMEM((win + P, planes_p), gc.dtype),
                pltpu.VMEM((Bk, lanes_p), gc.dtype),
                pltpu.SemaphoreType.DMA((len(halo_offsets(dim)) + 1,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, _grouped_now(dim), t, dim,
                              Cc, win, P, T, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, lanes_p), gc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(spec.starts, hasp, spec.blive, lidx, gf, gs)
        return out[:, :, :lanes].reshape(B, T, cells, Cc)

    return _run_chunked(run, g, C, per_c)
