"""Pallas kernel: windowed row permutation (the tile engine's hot op).

Replaces the XLA implementation of GatherSpec execution
(ops/tile_conv.windowed_gather): instead of materializing the per-block
one-hot matrices and source windows in HBM (~3x the useful traffic, measured
~3 ms per face permutation at 512^3 scale), each grid step DMAs ONE source
window into VMEM, builds the one-hot in registers, and runs the (Bk, win) x
(win, F) matmul on the MXU — HBM sees only the windows and the output.

The backward pass is the transpose scatter (each source row accumulates the
cotangents of the rows that read it), expressed with XLA scatter-add — exact,
and only exercised in training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(win: int, Bk: int, nb: int, starts_ref, idx_ref, src_ref,
            out_ref, scratch, sem):
    """Double-buffered: block n's matmul overlaps block n+1's window DMA."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    slot = jax.lax.rem(n, 2)

    def dma(k, s):
        st = pl.multiple_of(starts_ref[b, k], 8)
        return pltpu.make_async_copy(
            src_ref.at[b, pl.ds(st, win), :], scratch.at[s], sem.at[s])

    @pl.when(n == 0)
    def _():
        dma(0, 0).start()

    @pl.when(n + 1 < nb)
    def _():
        dma(n + 1, jax.lax.rem(n + 1, 2)).start()

    # one-hot while DMAs are in flight
    start = pl.multiple_of(starts_ref[b, n], 8)
    idx = idx_ref[0, n, :]                            # (Bk,) from VMEM
    local = (idx - start).reshape(Bk, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (Bk, win), 1)
    oh = (local == pos).astype(out_ref.dtype)
    dma(n, slot).wait()
    # precision pinned to DEFAULT: one-hot row movement is exact at any
    # matmul precision, and an ambient default_matmul_precision("highest")
    # (e.g. the f32 exactness tests) would ask Mosaic for an fp32-precision
    # bf16 matmul it cannot lower
    out_ref[0] = jnp.dot(oh, scratch[slot],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT
                         ).astype(out_ref.dtype)


# double-buffered window scratch budget (bytes); F is chunked to fit
_SCRATCH_BUDGET = 5 * 1024 * 1024


def gather_forward(src: jnp.ndarray, spec, interpret: bool = False
                   ) -> jnp.ndarray:
    """src (B, S, F), spec: GatherSpec -> (B, N, F). Exact (includes the
    correction list). Wide feature dims are processed in chunks so the
    double-buffered window scratch stays within VMEM."""
    B, S, F = src.shape
    win_ = spec.window.shape[-1]
    max_f = max(128, (_SCRATCH_BUDGET // (2 * 2 * win_)) // 128 * 128)
    if F > max_f:
        outs = [gather_forward(src[:, :, o:o + max_f], spec, interpret)
                for o in range(0, F, max_f)]
        return jnp.concatenate(outs, axis=-1)
    N = spec.idx.shape[1]
    nb = spec.starts.shape[1]
    Bk = N // nb
    win = spec.window.shape[-1]
    dt = src.dtype

    idx_eff = jnp.where(spec.ok, spec.idx, -1).reshape(B, nb, Bk)
    Fp = ((F + 127) // 128) * 128  # window DMA needs 128-aligned lanes
    # spec starts are clamped to [0, S - win] at build time, so windows
    # never cross the row end — no row padding (a full-array copy) needed
    padded = src if Fp == F else jnp.pad(src, ((0, 0), (0, 0), (0, Fp - F)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, nb, Bk), lambda b, n, st: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Bk, Fp), lambda b, n, st: (b, n, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win, Fp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, win, Bk, nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, Fp), dt),
        interpret=interpret,
    )(spec.starts, idx_eff, padded)
    if Fp != F:
        out = out[:, :, :F]

    # exact out-of-window corrections
    cv = jax.vmap(lambda s, i: jnp.take(s, i, axis=0))(src, spec.corr_src)
    cv = cv * spec.corr_ok[..., None].astype(dt)
    dst = jnp.where(spec.corr_ok, spec.corr_dst, N)
    return jax.vmap(lambda o, d, v: o.at[d].set(v, mode="drop"))(out, dst, cv)
