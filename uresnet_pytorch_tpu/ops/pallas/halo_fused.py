"""Pallas kernel: direct 26-neighbor tile halo in one HBM pass.

Replaces the 3-gather + 3-concat halo pipeline (and its XLA reference,
ops/halo.py) on TPU. Per grid step (event b, tile block n):

  1. DMA ONE window of source tile rows (win x cells*C) into VMEM — sorted
     tile keys make all 3^d-1 neighbor row indices near-monotone, so one
     shared window covers every offset.
  2. Out-of-window stragglers ride PATCH ROWS: the wrapper gathers the
     correction list's source rows into a tail appendix of the (flat,
     lane-dense) padded input, and their window-local index becomes
     win + patch_slot — the one-hot domain is simply [window | patch], so
     corrections cost nothing extra beyond P more K-rows in the dots.
     (An XLA-side scatter into the (.., cells, C) view would force a
     C-minor HBM materialization that XLA lane-pads up to 8x — measured
     19 GB at bench scale. Everything HBM-side here stays flat.)
  3. Pack the [window|patch] slab columns (face/edge/corner source cells
     per offset) into a contiguous buffer: static lane-run copies (VPU).
  4. One (Bk, win+P) x (win+P, S_k*C) one-hot matmul per offset (MXU)
     gathers each neighbor slab; results are written straight into the
     lex-ordered halo-extended output block — conv-ready, no XLA relayout.
  5. The tile's own cells stream in as a regular blocked operand.

The backward kernel is the SAME machinery with offsets negated (gather =
scatter transpose under offset symmetry, see ops/halo.py): it reads the
cotangent's slab columns and ACCUMULATES into the source block.

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
    body_cells, halo_offsets, slab_cells)


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
    """Static copy/dot plans for the kernel, in CELL units (scaled by C at
    trace time).

    pack_plan: (src_cell, n_cells, packed_cell) — window -> packed buffer
    slab_start[k]: packed-cell offset of offset k's slab
    slab_len[k]: slab cell count
    ext_plan[k]: (slab_pos, n_cells, ext_cell) — dot result -> output block
    body_plan: (body_cell, n_cells, ext_cell) — body operand -> output block
    """
    offs = halo_offsets(dim)
    pack_plan, slab_start, slab_len, ext_plan = [], [], [], []
    pk = 0
    for off in offs:
        ecells, scells = slab_cells(off, t)
        slab_start.append(pk)
        slab_len.append(len(scells))
        for (v, n, p) in _runs(scells):
            pack_plan.append((v, n, pk + p))
        ext_plan.append([(p, n, v) for (v, n, p) in _runs(ecells)])
        pk += len(scells)
    bcells = body_cells(t, dim)
    body_plan = [(p, n, v) for (v, n, p) in _runs(bcells)]
    return pack_plan, tuple(slab_start), tuple(slab_len), ext_plan, \
        body_plan, pk


def _fwd_kernel(t, dim, C, win, P, Tsrc, Bk, starts_ref, lidx_ref, xblk_ref,
                xany_ref, out_ref, win_scr, packed, sem, psem):
    b = pl.program_id(0)
    n = pl.program_id(1)
    pack_plan, slab_start, slab_len, ext_plan, body_plan, _ = _plans(t, dim)
    K = len(halo_offsets(dim))
    dt = out_ref.dtype
    W = win + P

    st = pl.multiple_of(starts_ref[b, n], 8)
    dma = pltpu.make_async_copy(
        xany_ref.at[b, pl.ds(st, win), :], win_scr.at[pl.ds(0, win), :], sem)
    dma.start()
    if P:  # patch rows live at the fixed tail of the padded source
        pdma = pltpu.make_async_copy(
            xany_ref.at[b, pl.ds(Tsrc + win, P), :],
            win_scr.at[pl.ds(win, P), :], psem)
        pdma.start()

    # body placement happens while the DMAs are in flight
    xb = xblk_ref[0]                                   # (Bk, cells*C)
    for (c0, ln, e0) in body_plan:
        out_ref[0, :, e0 * C:(e0 + ln) * C] = xb[:, c0 * C:(c0 + ln) * C]

    dma.wait()
    if P:
        pdma.wait()
    w = win_scr[:, :]                                  # (W, cells*C)
    for (s0, ln, p0) in pack_plan:
        packed[:, p0 * C:(p0 + ln) * C] = w[:, s0 * C:(s0 + ln) * C]

    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, W), 1)
    for k in range(K):
        local = lidx_ref[0, 0, k, :].reshape(Bk, 1)    # -1 where no pair
        oh = (local == pos).astype(dt)
        p0, S = slab_start[k], slab_len[k]
        res = jnp.dot(oh, packed[:, p0 * C:(p0 + S) * C],
                      preferred_element_type=jnp.float32).astype(dt)
        for (sp, ln, e0) in ext_plan[k]:
            out_ref[0, :, e0 * C:(e0 + ln) * C] = res[:, sp * C:(sp + ln) * C]


def _bwd_kernel(t, dim, C, win, P, Tsrc, Bk, starts_ref, lidx_ref, gblk_ref,
                gany_ref, out_ref, win_scr, packed, acc, sem, psem):
    """Transpose: d_x block = body cotangent + per-offset slab cotangents
    gathered from the NEGATED offset's neighbor rows."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    pack_plan, slab_start, slab_len, ext_plan, body_plan, _ = _plans(t, dim)
    K = len(halo_offsets(dim))
    dt = out_ref.dtype
    W = win + P

    st = pl.multiple_of(starts_ref[b, n], 8)
    dma = pltpu.make_async_copy(
        gany_ref.at[b, pl.ds(st, win), :], win_scr.at[pl.ds(0, win), :], sem)
    dma.start()
    if P:
        pdma = pltpu.make_async_copy(
            gany_ref.at[b, pl.ds(Tsrc + win, P), :],
            win_scr.at[pl.ds(win, P), :], psem)
        pdma.start()

    # init accumulator with the body cotangent
    gb = gblk_ref[0]                                   # (Bk, ecells*C)
    for (c0, ln, e0) in body_plan:
        acc[:, c0 * C:(c0 + ln) * C] = gb[:, e0 * C:(e0 + ln) * C]

    dma.wait()
    if P:
        pdma.wait()
    w = win_scr[:, :]                                  # (W, ecells*C)
    # pack the EXT slab columns of the cotangent window+patch
    for k in range(K):
        p0 = slab_start[k]
        for (sp, ln, e0) in ext_plan[k]:
            packed[:, (p0 + sp) * C:(p0 + sp + ln) * C] = \
                w[:, e0 * C:(e0 + ln) * C]

    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, W), 1)
    for k in range(K):
        rk = K - 1 - k                                 # index of -delta
        local = lidx_ref[0, 0, rk, :].reshape(Bk, 1)
        oh = (local == pos).astype(dt)
        p0, S = slab_start[k], slab_len[k]
        res = jnp.dot(oh, packed[:, p0 * C:(p0 + S) * C],
                      preferred_element_type=jnp.float32).astype(dt)
        # accumulate into the SOURCE cells of offset k (runs shared with
        # the forward pack plan for this offset)
        _, scells = slab_cells(halo_offsets(dim)[k], t)
        for (v, ln, p) in _runs(scells):
            acc[:, v * C:(v + ln) * C] = (
                acc[:, v * C:(v + ln) * C] + res[:, p * C:(p + ln) * C])
    out_ref[0] = acc[:, :]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _local_idx(spec, win):
    """(B, nb, K, Bk) int32: [window|patch]-local source row per offset
    pair, -1 where no pair (kernel one-hot yields a zero row). Correction
    pairs resolve to win + patch_slot — the patch rows the wrapper appends
    after the window padding."""
    B, K, T = spec.idx.shape
    nb = spec.starts.shape[1]
    Bk = T // nb
    P = spec.corr_src.shape[1]
    local = spec.idx - jnp.repeat(spec.starts, Bk, axis=1)[:, None, :]
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


def _with_patch_rows(flat, spec, win):
    """[rows | win zeros | patch rows]: append the correction-source rows to
    the flat (B, T, lanes) array so the kernel's one-hot can reach them at
    fixed offsets. Everything stays lane-dense."""
    B, T, lanes = flat.shape
    P = spec.corr_src.shape[1]
    pad = jnp.zeros((B, win, lanes), flat.dtype)
    if not P:
        return jnp.concatenate([flat, pad], axis=1)
    rows = jnp.where(spec.corr_ok, spec.corr_src, T)
    patch = jax.vmap(lambda xx, rr: jnp.take(
        xx, rr, axis=0, mode="fill", fill_value=0))(flat, rows)
    return jnp.concatenate([flat, pad, patch], axis=1)


# VMEM budget for everything the kernel holds per grid step: window+packed
# scratch PLUS the auto-double-buffered in/out blocks. The pallas_call asks
# for a raised vmem ceiling (_VMEM_LIMIT) since the 16 MB default leaves no
# room for the window scratch; C is chunked to keep within budget, with
# headroom for Mosaic's one-hot/result temps.
_SCRATCH_BUDGET = 24 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _run_chunked(fn, x, C, per_c_bytes):
    max_c = max(8, _SCRATCH_BUDGET // per_c_bytes)
    if C <= max_c:
        return fn(x)
    nchunks = -(-C // max_c)
    cc = -(-C // nchunks)
    outs = [fn(x[..., o:o + cc]) for o in range(0, C, cc)]
    return jnp.concatenate(outs, axis=-1)


def halo26_fwd(x: jnp.ndarray, spec, t: int, dim: int,
               interpret: bool = False) -> jnp.ndarray:
    """x (B, T, t^dim, C) -> (B, T, (t+2)^dim, C), exact (corrections
    applied in XLA on the kernel output)."""
    B, T, cells, C = x.shape
    ecells = (t + 2) ** dim
    win = spec.window.shape[-1]
    _, _, _, _, _, packc = _plans(t, dim)
    itemsize = np.dtype(x.dtype).itemsize
    Bk0 = T // spec.starts.shape[1]
    W = win + spec.corr_src.shape[1]
    per_c = (W * (cells + packc)
             + 2 * Bk0 * (cells + ecells)) * itemsize

    P = spec.corr_src.shape[1]

    def run(xc):
        Cc = xc.shape[-1]
        nb = spec.starts.shape[1]
        Bk = T // nb
        lanes = cells * Cc
        elanes = ecells * Cc
        lanes_p = _round_up(lanes, 128)
        elanes_p = _round_up(elanes, 128)
        xf = jnp.pad(xc.reshape(B, T, lanes),
                     ((0, 0), (0, 0), (0, lanes_p - lanes)))
        xpad = _with_patch_rows(xf, spec, win)
        lidx = _local_idx(spec, win)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                             lambda b, n, st: (b, n, 0, 0)),
                pl.BlockSpec((1, Bk, lanes_p), lambda b, n, st: (b, n, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, Bk, elanes_p),
                                   lambda b, n, st: (b, n, 0)),
            scratch_shapes=[
                pltpu.VMEM((win + P, lanes_p), xc.dtype),
                pltpu.VMEM((win + P, _round_up(packc * Cc, 128)), xc.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, t, dim, Cc, win, P, T, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, elanes_p), xc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(spec.starts, lidx, xpad, xpad)
        return out[:, :, :elanes].reshape(B, T, ecells, Cc)

    return _run_chunked(run, x, C, per_c)


def halo26_bwd(g: jnp.ndarray, spec, t: int, dim: int,
               interpret: bool = False) -> jnp.ndarray:
    """Transpose of halo26_fwd: cotangent (B, T, (t+2)^dim, C) ->
    (B, T, t^dim, C)."""
    B, T, ecells, C = g.shape
    cells = t ** dim
    win = spec.window.shape[-1]
    _, _, _, _, _, packc = _plans(t, dim)
    itemsize = np.dtype(g.dtype).itemsize
    Bk0 = T // spec.starts.shape[1]
    W = win + spec.corr_src.shape[1]
    per_c = (W * (ecells + packc)
             + Bk0 * (3 * ecells + 3 * cells)) * itemsize

    P = spec.corr_src.shape[1]

    def run(gc):
        Cc = gc.shape[-1]
        nb = spec.starts.shape[1]
        Bk = T // nb
        elanes = ecells * Cc
        lanes = cells * Cc
        elanes_p = _round_up(elanes, 128)
        lanes_p = _round_up(lanes, 128)
        gf = jnp.pad(gc.reshape(B, T, elanes),
                     ((0, 0), (0, 0), (0, elanes_p - elanes)))
        gpad = _with_patch_rows(gf, spec, win)
        lidx = _local_idx(spec, win)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 1, lidx.shape[2], Bk),
                             lambda b, n, st: (b, n, 0, 0)),
                pl.BlockSpec((1, Bk, elanes_p), lambda b, n, st: (b, n, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, Bk, lanes_p),
                                   lambda b, n, st: (b, n, 0)),
            scratch_shapes=[
                pltpu.VMEM((win + P, elanes_p), gc.dtype),
                pltpu.VMEM((win + P, _round_up(packc * Cc, 128)), gc.dtype),
                pltpu.VMEM((Bk, lanes_p), gc.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, t, dim, Cc, win, P, T, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, lanes_p), gc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(spec.starts, lidx, gpad, gpad)
        return out[:, :, :lanes].reshape(B, T, cells, Cc)

    return _run_chunked(run, g, C, per_c)
