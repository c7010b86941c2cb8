"""Pallas kernel: direct 26-neighbor tile halo in one HBM pass.

Replaces the 3-gather + 3-concat halo pipeline (and its XLA reference,
ops/halo.py) on TPU. Per grid step (event b, tile block n):

  1. DMA ONE window of source tile rows (win x cells*C) into VMEM — sorted
     tile keys make all 3^d-1 neighbor row indices near-monotone, so one
     shared window covers every offset (out-of-window stragglers go through
     the spec's exact correction list, applied by the wrapper in XLA).
  2. Pack the window's slab columns (face/edge/corner source cells per
     offset) into a contiguous buffer: static lane-run copies (VPU).
  3. One (Bk, win) x (win, S_k*C) one-hot matmul per offset (MXU) gathers
     each neighbor slab; results are written straight into the lex-ordered
     halo-extended output block — conv-ready, no XLA relayout.
  4. The tile's own cells stream in as a regular blocked operand.

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


def _fwd_kernel(t, dim, C, win, Bk, starts_ref, lidx_ref, xblk_ref, xany_ref,
                out_ref, win_scr, packed, sem):
    b = pl.program_id(0)
    n = pl.program_id(1)
    pack_plan, slab_start, slab_len, ext_plan, body_plan, _ = _plans(t, dim)
    K = len(halo_offsets(dim))
    dt = out_ref.dtype

    st = pl.multiple_of(starts_ref[b, n], 8)
    dma = pltpu.make_async_copy(
        xany_ref.at[b, pl.ds(st, win), :], win_scr, sem)
    dma.start()

    # body placement happens while the window DMA is in flight
    xb = xblk_ref[0]                                   # (Bk, cells*C)
    for (c0, ln, e0) in body_plan:
        out_ref[0, :, e0 * C:(e0 + ln) * C] = xb[:, c0 * C:(c0 + ln) * C]

    dma.wait()
    w = win_scr[:, :]                                  # (win, cells*C)
    for (s0, ln, p0) in pack_plan:
        packed[:, p0 * C:(p0 + ln) * C] = w[:, s0 * C:(s0 + ln) * C]

    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, win), 1)
    for k in range(K):
        local = lidx_ref[0, 0, k, :].reshape(Bk, 1)    # -1 where not in-band
        oh = (local == pos).astype(dt)
        p0, S = slab_start[k], slab_len[k]
        res = jnp.dot(oh, packed[:, p0 * C:(p0 + S) * C],
                      preferred_element_type=jnp.float32).astype(dt)
        for (sp, ln, e0) in ext_plan[k]:
            out_ref[0, :, e0 * C:(e0 + ln) * C] = res[:, sp * C:(sp + ln) * C]


def _bwd_kernel(t, dim, C, win, Bk, starts_ref, lidx_ref, gblk_ref, gany_ref,
                out_ref, win_scr, packed, acc, sem):
    """Transpose: d_x block = body cotangent + per-offset slab cotangents
    gathered from the NEGATED offset's neighbor rows."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    pack_plan, slab_start, slab_len, ext_plan, body_plan, _ = _plans(t, dim)
    K = len(halo_offsets(dim))
    dt = out_ref.dtype

    st = pl.multiple_of(starts_ref[b, n], 8)
    dma = pltpu.make_async_copy(
        gany_ref.at[b, pl.ds(st, win), :], win_scr, sem)
    dma.start()

    # init accumulator with the body cotangent
    gb = gblk_ref[0]                                   # (Bk, ecells*C)
    for (c0, ln, e0) in body_plan:
        acc[:, c0 * C:(c0 + ln) * C] = gb[:, e0 * C:(e0 + ln) * C]

    dma.wait()
    w = win_scr[:, :]                                  # (win, ecells*C)
    # pack the EXT slab columns of the cotangent window
    for k in range(K):
        p0 = slab_start[k]
        for (sp, ln, e0) in ext_plan[k]:
            packed[:, (p0 + sp) * C:(p0 + sp + ln) * C] = \
                w[:, e0 * C:(e0 + ln) * C]

    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, win), 1)
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


def _local_idx(spec):
    """(B, nb, K, Bk) int32: window-local source row per offset, -1 where
    not executable in-window (kernel one-hot yields a zero row)."""
    B, K, T = spec.idx.shape
    nb = spec.starts.shape[1]
    Bk = T // nb
    local = spec.idx - jnp.repeat(spec.starts, Bk, axis=1)[:, None, :]
    local = jnp.where(spec.inband, local, -1)
    return jnp.transpose(local.reshape(B, K, nb, Bk), (0, 2, 1, 3))


# VMEM budget for (window + packed) scratch; C is chunked to fit
_SCRATCH_BUDGET = 12 * 1024 * 1024


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
    per_c = (win * cells + win * packc) * itemsize

    def run(xc):
        Cc = xc.shape[-1]
        nb = spec.starts.shape[1]
        Bk = T // nb
        lanes = cells * Cc
        elanes = ecells * Cc
        lanes_p = _round_up(lanes, 128)
        elanes_p = _round_up(elanes, 128)
        xf = xc.reshape(B, T, lanes)
        xpad = jnp.pad(xf, ((0, 0), (0, win), (0, lanes_p - lanes)))
        lidx = _local_idx(spec)
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
                pltpu.VMEM((win, lanes_p), xc.dtype),
                pltpu.VMEM((win, _round_up(packc * Cc, 128)), xc.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, t, dim, Cc, win, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, elanes_p), xc.dtype),
            interpret=interpret,
        )(spec.starts, lidx, xpad, xpad)
        return out[:, :, :elanes].reshape(B, T, ecells, Cc)

    ext = _run_chunked(run, x, C, per_c)
    return _apply_corrections(ext, x, spec, t, dim)


def halo26_bwd(g: jnp.ndarray, spec, t: int, dim: int,
               interpret: bool = False) -> jnp.ndarray:
    """Transpose of halo26_fwd: cotangent (B, T, (t+2)^dim, C) ->
    (B, T, t^dim, C)."""
    B, T, ecells, C = g.shape
    cells = t ** dim
    win = spec.window.shape[-1]
    _, _, _, _, _, packc = _plans(t, dim)
    itemsize = np.dtype(g.dtype).itemsize
    per_c = (win * ecells + win * packc + 0) * itemsize

    def run(gc):
        Cc = gc.shape[-1]
        nb = spec.starts.shape[1]
        Bk = T // nb
        elanes = ecells * Cc
        lanes = cells * Cc
        elanes_p = _round_up(elanes, 128)
        lanes_p = _round_up(lanes, 128)
        gf = gc.reshape(B, T, elanes)
        gpad = jnp.pad(gf, ((0, 0), (0, win), (0, elanes_p - elanes)))
        lidx = _local_idx(spec)
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
                pltpu.VMEM((win, elanes_p), gc.dtype),
                pltpu.VMEM((win, _round_up(packc * Cc, 128)), gc.dtype),
                pltpu.VMEM((Bk, lanes_p), gc.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, t, dim, Cc, win, Bk),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, lanes_p), gc.dtype),
            interpret=interpret,
        )(spec.starts, lidx, gpad, gpad)
        return out[:, :, :lanes].reshape(B, T, cells, Cc)

    d_x = _run_chunked(run, g, C, per_c)
    return _apply_corrections_T(d_x, g, spec, t, dim)


# ---------------------------------------------------------------------------
# exact correction lists (out-of-window pairs), applied in XLA
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _cell_tables_np(t: int, dim: int):
    """(K, Smax) src/ext cell tables, -1 padded (NumPy: lru_cache must never
    hold traced jnp values — see jax UnexpectedTracerError)."""
    offs = halo_offsets(dim)
    smax = max(len(slab_cells(o, t)[0]) for o in offs)
    src = -np.ones((len(offs), smax), np.int32)
    ext = -np.ones((len(offs), smax), np.int32)
    for k, off in enumerate(offs):
        e, s = slab_cells(off, t)
        src[k, :len(s)] = s
        ext[k, :len(e)] = e
    return src, ext


def _cell_tables(t: int, dim: int):
    src, ext = _cell_tables_np(t, dim)
    return jnp.asarray(src), jnp.asarray(ext)


def _apply_corrections(ext, x, spec, t, dim):
    """ext[dst, ecells(off)] = x[src, scells(off)] for each correction."""
    B, T, cells, C = x.shape
    P = spec.corr_src.shape[1]
    if P == 0:
        return ext
    srct, extt = _cell_tables(t, dim)
    smax = srct.shape[1]
    rows = jnp.where(spec.corr_ok, spec.corr_src, T)
    xrows = jax.vmap(lambda xx, rr: jnp.take(
        xx.reshape(T, -1), rr, axis=0, mode="fill", fill_value=0))(
        x, rows)                                       # (B, P, cells*C)
    scell = srct[spec.corr_off]                        # (B, P, smax)
    ecell = extt[spec.corr_off]
    cell_ok = (scell >= 0) & spec.corr_ok[..., None]
    gcol = jnp.where(cell_ok, scell, 0)
    vals = jax.vmap(jax.vmap(
        lambda row, cc: jnp.take(row.reshape(cells, C), cc, axis=0)))(
        xrows, gcol)                                   # (B, P, smax, C)
    vals = vals * cell_ok[..., None].astype(vals.dtype)
    ecells_n = ext.shape[2]
    flat_pos = jnp.where(cell_ok,
                         spec.corr_dst[..., None] * ecells_n + ecell,
                         T * ecells_n)
    extf = ext.reshape(B, T * ecells_n, C)
    extf = jax.vmap(lambda e, p, v: e.at[p.reshape(-1)].set(
        v.reshape(-1, C), mode="drop"))(extf, flat_pos, vals)
    return extf.reshape(B, T, ecells_n, C)


def _apply_corrections_T(d_x, g, spec, t, dim):
    """Backward corrections. The backward kernel's slab-k gather for row r
    is predicated on inband[K-1-k, r], so the pairs it drops are exactly the
    forward correction entries (off=m, dst=r, src=j) read with the offset
    NEGATED: d_x[dst, scells(K-1-m)] += g[src, ecells(K-1-m)]. Each (ok)
    neighbor pair is thus covered exactly once between kernel and list."""
    B, T, ecells_n, C = g.shape
    P = spec.corr_src.shape[1]
    if P == 0:
        return d_x
    cells = d_x.shape[2]
    srct, extt = _cell_tables(t, dim)
    K = srct.shape[0]
    off_rev = K - 1 - spec.corr_off
    rows = jnp.where(spec.corr_ok, spec.corr_src, T)
    grows = jax.vmap(lambda gg, rr: jnp.take(
        gg.reshape(T, -1), rr, axis=0, mode="fill", fill_value=0))(
        g, rows)                                       # (B, P, ecells*C)
    scell = srct[off_rev]
    ecell = extt[off_rev]
    cell_ok = (scell >= 0) & spec.corr_ok[..., None]
    gcol = jnp.where(cell_ok, ecell, 0)
    vals = jax.vmap(jax.vmap(
        lambda row, cc: jnp.take(row.reshape(ecells_n, C), cc, axis=0)))(
        grows, gcol)
    vals = vals * cell_ok[..., None].astype(vals.dtype)
    flat_pos = jnp.where(cell_ok,
                         spec.corr_dst[..., None] * cells + scell,
                         T * cells)
    dxf = d_x.reshape(B, T * cells, C)
    dxf = jax.vmap(lambda e, p, v: e.at[p.reshape(-1)].add(
        v.reshape(-1, C), mode="drop"))(dxf, flat_pos, vals)
    return dxf.reshape(B, T, cells, C)
