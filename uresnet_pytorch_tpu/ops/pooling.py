"""Sparse stride-2 pooling (SCN MaxPooling / AveragePooling equivalents).

SCN's pooling layers (sparseconvnet/maxPooling.py, averagePooling.py —
SURVEY.md §2.10) use the same coordinate rules as strided convolution:
output sites are the coarse cells covering >= 1 active input site, values
pooled over the active children. Here that is one scatter-min/max or
scatter-add over the injective per-corner fine->coarse link
(ops/sparse_graph.downsample_link) — no rulebook pair lists, no atomics.

Average-pool divisor: SCN divides by the FULL pool volume (2^dim), not the
active-child count — matching that is `count_mode="volume"` (default);
`"active"` divides by the number of active children. The two agree on
fully-active grids, which is what the dense-equivalence oracle checks;
the choice is re-verifiable only against a real SCN install (SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool(feats_f: jnp.ndarray, parent: jnp.ndarray, num_f: jnp.ndarray,
             cap_c: int) -> jnp.ndarray:
    """feats_f (B, Vf, C), parent (B, Vf) coarse row (== cap_c if dropped)
    -> (B, Vc=cap_c, C): max over each coarse cell's active children."""
    B, Vf, C = feats_f.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, Vf), 1)
    valid = rows < num_f[:, None]
    tgt = jnp.where(valid, parent, cap_c)
    neg = jnp.full((B, cap_c, C), -jnp.inf, jnp.float32)
    vals = jnp.where(valid[..., None], feats_f.astype(jnp.float32), -jnp.inf)
    out = jax.vmap(lambda a, t, v: a.at[t].max(v, mode="drop"))(
        neg, tgt, vals)
    return jnp.where(jnp.isfinite(out), out, 0.0).astype(feats_f.dtype)


def avg_pool(feats_f: jnp.ndarray, parent: jnp.ndarray, num_f: jnp.ndarray,
             cap_c: int, data_dim: int,
             count_mode: str = "volume") -> jnp.ndarray:
    """Average pooling over each coarse cell's children.

    count_mode="volume": divide by 2^dim (SCN convention);
    count_mode="active": divide by the active-child count."""
    B, Vf, C = feats_f.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, Vf), 1)
    valid = rows < num_f[:, None]
    tgt = jnp.where(valid, parent, cap_c)
    vals = jnp.where(valid[..., None], feats_f.astype(jnp.float32), 0.0)
    ssum = jax.vmap(lambda t, v: jnp.zeros((cap_c, C), jnp.float32)
                    .at[t].add(v, mode="drop"))(tgt, vals)
    if count_mode == "volume":
        div = float(2 ** data_dim)
        out = ssum / div
    elif count_mode == "active":
        cnt = jax.vmap(lambda t: jnp.zeros((cap_c,), jnp.float32)
                       .at[t].add(1.0, mode="drop"))(tgt)
        out = ssum / jnp.maximum(cnt, 1.0)[..., None]
    else:
        raise ValueError(count_mode)
    return out.astype(feats_f.dtype)


def unpool(feats_c: jnp.ndarray, parent: jnp.ndarray,
           cap_c: int) -> jnp.ndarray:
    """UnPooling (SCN unPooling.py): broadcast each coarse value back to its
    active fine children (the pooling link transposed)."""
    g = jax.vmap(lambda x, i: jnp.take(x, i, axis=0, mode="fill",
                                       fill_value=0))(feats_c, parent)
    return jnp.where((parent < cap_c)[..., None], g, 0)
