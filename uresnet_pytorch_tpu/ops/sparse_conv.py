"""Sparse convolution compute: gather -> GEMM -> scatter.

XLA reference implementations of SparseConvNet's compute kernels
(SCN/CPU/*.cpp + SCN/CUDA/*.cu, SURVEY.md §2.12-2.13): per kernel offset,
gather active rows by rulebook, multiply by that offset's (Cin, Cout) weight
slice on the MXU, scatter/accumulate into output rows. The Pallas fused
kernels (milestone M3) replace these hot paths behind the same signatures;
these stay as the correctness oracle and CPU fallback.

Key structural wins vs the CUDA formulation (see ops/sparse_graph.py):
  * submanifold conv: output row i IS input row i — accumulation happens in
    registers over offsets; no scatter at all.
  * strided conv: per corner the fine->coarse map is injective — scatter-add
    with unique indices (collision-free, no atomics).
  * deconv: pure gather.

All weights are stacked (K, Cin, Cout) so one einsum per offset hits the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uresnet_pytorch_tpu.ops.sparse_graph import gather_rows


def submanifold_conv(feats: jnp.ndarray, nbr_idx: jnp.ndarray,
                     nbr_ok: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """feats (B, V, Cin), nbr_idx/nbr_ok (B, K, V), w (K, Cin, Cout)
    -> (B, V, Cout). Sparsity pattern preserved (submanifold property)."""
    K = w.shape[0]
    dt = feats.dtype
    out = None
    for k in range(K):
        g = gather_rows(feats, nbr_idx[:, k])              # (B, V, Cin)
        g = jnp.where(nbr_ok[:, k][..., None], g, 0).astype(dt)
        contrib = jnp.einsum("bvc,cd->bvd", g, w[k].astype(dt),
                             preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return out.astype(dt)


def downsample_conv(feats_f: jnp.ndarray, parent: jnp.ndarray,
                    corner: jnp.ndarray, num_f: jnp.ndarray, cap_c: int,
                    w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 conv: feats_f (B, Vf, Cin), parent/corner (B, Vf),
    w (2^d, Cin, Cout) -> (B, Vc, Cout).

    Rows with parent == cap_c (padding / capacity-dropped) scatter nowhere
    (mode='drop')."""
    B, Vf, Cin = feats_f.shape
    K, _, Cout = w.shape
    dt = feats_f.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, Vf), 1)
    valid = rows < num_f[:, None]
    out = jnp.zeros((B, cap_c, Cout), jnp.float32)
    for o in range(K):
        m = valid & (corner == o)
        g = jnp.where(m[..., None], feats_f, 0).astype(dt)
        contrib = jnp.einsum("bvc,cd->bvd", g, w[o].astype(dt),
                             preferred_element_type=jnp.float32)
        # per-corner fine->coarse is injective: unique scatter indices
        tgt = jnp.where(m, parent, cap_c)
        out = jax.vmap(
            lambda acc, t, c: acc.at[t].add(c, mode="drop",
                                            unique_indices=True)
        )(out, tgt, contrib)
    return out.astype(dt)


def upsample_conv(feats_c: jnp.ndarray, parent: jnp.ndarray,
                  corner: jnp.ndarray, cap_c: int,
                  w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 deconv (transposed link): feats_c (B, Vc, Cin) ->
    (B, Vf, Cout) on the encoder's exact fine coordinate set."""
    K, Cin, Cout = w.shape
    dt = feats_c.dtype
    g = gather_rows(feats_c, parent)                        # (B, Vf, Cin)
    ok = (parent < cap_c)[..., None]
    g = jnp.where(ok, g, 0).astype(dt)
    out = None
    for o in range(K):
        m = (corner == o)[..., None]
        contrib = jnp.einsum("bvc,cd->bvd",
                             jnp.where(m, g, 0), w[o].astype(dt),
                             preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return out.astype(dt)
