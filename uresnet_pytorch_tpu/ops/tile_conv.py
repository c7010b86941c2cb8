"""Tiled-dense sparse convolutions: halo exchange + space-to-depth GEMMs.

Compute layer of the tile engine (see ops/tile_graph.py for the rationale).
Replaces SCN's CUDA gather-GEMM-scatter (SURVEY.md §2.13) with a form the
MXU actually likes:

  * 3-pass face halo: tiles exchange ±x faces, then ±y faces OF THE
    x-EXTENDED array, then ±z of that — so edge/corner data propagates
    through two hops and only 2*dim face gathers are needed per conv
    (kB-contiguous rows, HBM-bandwidth bound; never per-voxel gathers).
  * space-to-depth fold (2x per axis): the 3^d small-channel submanifold
    conv becomes 2^d GEMM taps with (2^d*Cin)-deep contractions and
    (2^d*Cout)-wide outputs — 128-lane MXU utilization at Cin=16.
    Derivation: output fine cell F = 2w+1+o needs input F+δ-1 = 2(w+d)+q
    with d=(o+δ)>>1, q=(o+δ)&1, so folded tap d's weight block (q->o) is
    the original offset weight W[o+δ... ] — built by fold_weights().
  * stride-2 down/up convs are pure GEMMs on the folded representation
    (kernel 2 stride 2 IS the fold), with collision-free corner scatters
    between tile grids.

All ops preserve the submanifold invariant by masking outputs with the
active-cell occupancy: inactive cells hold exact zeros between layers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _take_rows(arr: jnp.ndarray, idx: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) rows gathered at (B, R); masked rows -> 0."""
    g = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(arr, jnp.where(ok, idx, 0))
    shape = (ok.shape[0], ok.shape[1]) + (1,) * (arr.ndim - 2)
    return g * ok.reshape(shape).astype(g.dtype)


def fold2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, *spatial(even), C) -> (B, T, *spatial/2, 2^dim * C).

    Block-channel order: spatial block bits x-major, then original channel.
    """
    B, T = x.shape[:2]
    sp = x.shape[2:-1]
    C = x.shape[-1]
    dim = len(sp)
    shape = (B, T)
    for s in sp:
        shape += (s // 2, 2)
    shape += (C,)
    x = x.reshape(shape)
    perm = [0, 1] + [2 + 2 * d for d in range(dim)] \
        + [3 + 2 * d for d in range(dim)] + [2 + 2 * dim]
    x = x.transpose(perm)
    return x.reshape((B, T) + tuple(s // 2 for s in sp) + (2 ** dim * C,))


def unfold2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fold2: (B, T, *spatial, 2^dim * C) -> (B, T, *2*spatial, C)."""
    B, T = x.shape[:2]
    sp = x.shape[2:-1]
    dim = len(sp)
    C = x.shape[-1] // (2 ** dim)
    x = x.reshape((B, T) + sp + (2,) * dim + (C,))
    perm = [0, 1]
    for d in range(dim):
        perm += [2 + d, 2 + dim + d]
    perm += [2 + 2 * dim]
    x = x.transpose(perm)
    return x.reshape((B, T) + tuple(2 * s for s in sp) + (C,))


def fold_weights(w: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(3^dim, Cin, Cout) offset stack -> (2^dim, 2^dim*Cin, 2^dim*Cout)
    folded taps (see module docstring)."""
    K, Cin, Cout = w.shape
    assert K == 3 ** dim
    wf = jnp.zeros((2 ** dim, 2 ** dim * Cin, 2 ** dim * Cout), w.dtype)
    for o in range(2 ** dim):
        obits = [(o >> (dim - 1 - d)) & 1 for d in range(dim)]
        for k in range(3 ** dim):
            tmp, dg = k, []
            for _ in range(dim):
                dg.append(tmp % 3)
                tmp //= 3
            dg = dg[::-1]  # x-major digits of the offset
            didx = qidx = 0
            for d in range(dim):
                s = obits[d] + dg[d]
                didx = (didx << 1) | (s >> 1)
                qidx = (qidx << 1) | (s & 1)
            wf = wf.at[didx, qidx * Cin:(qidx + 1) * Cin,
                       o * Cout:(o + 1) * Cout].set(w[k])
    return wf


def halo_extend(x: jnp.ndarray, face_nbr: jnp.ndarray, face_ok: jnp.ndarray,
                t: int, dim: int) -> jnp.ndarray:
    """(B, T, t^dim, C) -> (B, T, (t+2)^dim, C) spatial, 3-pass face halo.

    face order in face_nbr: (-x, +x, -y, +y, -z, +z). Our +axis halo is the
    +axis neighbor's low face; missing neighbors contribute zeros (inactive
    region — submanifold semantics).
    """
    B, T = x.shape[:2]
    C = x.shape[-1]
    xs = x.reshape((B, T) + (t,) * dim + (C,))
    for ax in range(dim):
        sp_ax = 2 + ax  # spatial axis in the array
        lo_face = jax.lax.index_in_dim(xs, 0, sp_ax, keepdims=True)
        hi_face = jax.lax.index_in_dim(xs, xs.shape[sp_ax] - 1, sp_ax,
                                       keepdims=True)
        halo_lo = _take_rows(hi_face, face_nbr[:, 2 * ax],
                             face_ok[:, 2 * ax])      # from -axis neighbor
        halo_hi = _take_rows(lo_face, face_nbr[:, 2 * ax + 1],
                             face_ok[:, 2 * ax + 1])  # from +axis neighbor
        xs = jnp.concatenate([halo_lo, xs, halo_hi], axis=sp_ax)
    return xs.reshape((B, T) + ((t + 2) ** dim,) + (C,))


def submanifold_conv_tiled(x, occ, face_nbr, face_ok, t: int, dim: int,
                           w) -> jnp.ndarray:
    """x (B,T,t^dim,Cin), occ (B,T,t^dim) -> (B,T,t^dim,Cout)."""
    dt = x.dtype
    B, T = x.shape[:2]
    Cout = w.shape[-1]
    ext = halo_extend(x, face_nbr, face_ok, t, dim)
    ext = ext.reshape((B, T) + (t + 2,) * dim + (x.shape[-1],))
    extf = fold2(ext)                        # (B,T,(t+2)/2 per axis, 2^d Cin)
    wf = fold_weights(w, dim).astype(dt)
    th = t // 2
    out = None
    for d in range(2 ** dim):
        dbits = [(d >> (dim - 1 - a)) & 1 for a in range(dim)]
        idx = (slice(None), slice(None)) + tuple(
            slice(b, b + th) for b in dbits) + (slice(None),)
        tap = extf[idx]
        contrib = jnp.einsum("...c,cd->...d", tap.astype(dt), wf[d],
                             preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    out = unfold2(out.astype(dt))            # (B, T, t per axis, Cout)
    out = out.reshape(B, T, t ** dim, Cout)
    return out * occ[..., None].astype(dt)


def _corner_view(xc: jnp.ndarray, tc: int, dim: int) -> jnp.ndarray:
    """(B, Tc, tc^dim, C) -> (B, Tc * 2^dim, (tc/2)^dim, C): contiguous
    corner half-regions, corner bits x-major (matches DownLink.octant)."""
    B, Tc = xc.shape[:2]
    C = xc.shape[-1]
    th = tc // 2
    shape = (B, Tc)
    for _ in range(dim):
        shape += (2, th)
    shape += (C,)
    x = xc.reshape(shape)
    perm = [0, 1] + [2 + 2 * d for d in range(dim)] \
        + [3 + 2 * d for d in range(dim)] + [2 + 2 * dim]
    x = x.transpose(perm)
    return x.reshape(B, Tc * 2 ** dim, th ** dim, C)


def downsample_conv_tiled(x, parent, octant, t_f: int, t_c: int, Tc: int,
                          dim: int, w) -> jnp.ndarray:
    """Stride-2 kernel-2 conv between tile grids.

    x (B,Tf,t_f^dim,Cin), w (2^dim,Cin,Cout) -> (B,Tc,t_c^dim,Cout).
    The fold IS the stride-2 receptive field; blocks then land in coarse
    corner regions (t_c == t_f) or are the coarse tiles themselves
    (t_c == t_f // 2, grid unchanged)."""
    from uresnet_pytorch_tpu.ops.tile_graph import _scatter_blocks
    dt = x.dtype
    B, Tf = x.shape[:2]
    Cin, Cout = w.shape[1], w.shape[2]
    xs = x.reshape((B, Tf) + (t_f,) * dim + (Cin,))
    xf = fold2(xs).reshape(B, Tf, (t_f // 2) ** dim, 2 ** dim * Cin)
    wd = w.reshape(2 ** dim * Cin, Cout).astype(dt)
    blocks = jnp.einsum("btvc,cd->btvd", xf.astype(dt), wd,
                        preferred_element_type=jnp.float32).astype(dt)
    if t_c == t_f // 2:
        return blocks  # tile grid unchanged; blocks ARE the coarse tiles
    assert t_c == t_f
    ok = parent < Tc
    return jax.vmap(
        lambda b, p, o, k: _scatter_blocks(b, p, o, k, Tc, t_c, dim)
    )(blocks, parent, octant, ok)


def upsample_conv_tiled(xc, parent, octant, occ_f, t_f: int, t_c: int,
                        Tc: int, dim: int, w) -> jnp.ndarray:
    """Stride-2 kernel-2 transposed conv (decoder; reuses the down link
    transposed so the encoder's exact sites are restored).

    xc (B,Tc,t_c^dim,Cin) -> (B,Tf,t_f^dim,Cout), masked by fine occupancy.
    """
    dt = xc.dtype
    B, Tc_ = xc.shape[:2]
    Cin, Cout = w.shape[1], w.shape[2]
    if t_c == t_f // 2:
        blocks = xc  # (B, Tf, (t_f/2)^dim, Cin), same tile rows
    else:
        assert t_c == t_f
        corners = _corner_view(xc, t_c, dim)          # (B, Tc*2^d, th^d, Cin)
        ok = parent < Tc
        idx = jnp.where(ok, parent * (2 ** dim) + octant, 0)
        blocks = _take_rows(corners, idx, ok)          # (B, Tf, th^d, Cin)
    # each coarse cell expands into its 2^dim fine cells: block-channel GEMM
    wu = jnp.transpose(w, (1, 0, 2)).reshape(Cin, 2 ** dim * Cout).astype(dt)
    outf = jnp.einsum("btvc,cd->btvd", blocks.astype(dt), wu,
                      preferred_element_type=jnp.float32).astype(dt)
    th = t_f // 2
    outf = outf.reshape((B, outf.shape[1]) + (th,) * dim + (2 ** dim * Cout,))
    out = unfold2(outf).reshape(B, outf.shape[1], t_f ** dim, Cout)
    return out * occ_f[..., None].astype(dt)
