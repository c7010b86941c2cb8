"""Masked BatchNorm over active voxel rows.

SCN's BatchNormalization normalises over active sites only (SURVEY.md §2.10);
the dense-tensor analog would include padding garbage, so this is a custom
module: moments over rows where mask is True, across batch and row axes.
Running stats live in the standard flax 'batch_stats' collection.

Cross-chip semantics: moments reduce over the WHOLE (masked) batch. Under
the data-parallel jit the batch axis is sharded, so GSPMD turns these sums
into cross-chip collectives — i.e. *global* batch statistics, slightly
stronger than the reference's per-GPU BN (SURVEY.md §7 hard part 4 allows
either; docs/distributed.md documents this choice, and
tests/test_parallel.py pins it: sharded and single-device steps produce
identical batch_stats).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool,
                 return_affine: bool = False):
        """x (..., C), mask (...) bool — rank-agnostic so the tiled engine
        can pass (B, T, cells, C) directly: reshaping to (B, T*cells, C)
        first was measured to force f32 layout-transpose copies around
        every BN at bench scale (~50 ms/step).

        return_affine=True (eval only): return the folded per-channel
        (a, b) instead of applying them — lets the tiled engine fuse the
        affine into the conv kernel's epilogue. Parameter/stat creation is
        identical either way (checkpoint-compatible).

        x may be a PAIR (x1, x2) standing for their channel concat — the
        decoder skip path passes (upsampled, skip) unmaterialized so the
        (B, T, cells, 2C) concat copy never hits HBM (VERDICT r3 weak #5:
        the concat capped training batch at 8). Moments/affine are
        per-channel, so the pair decomposes exactly; returns a pair."""
        if isinstance(x, (tuple, list)):
            x1, x2 = x
            C1, C2 = x1.shape[-1], x2.shape[-1]
            C = C1 + C2
            red_axes = tuple(range(x1.ndim - 1))
        else:
            C = x.shape[-1]
            red_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if train:
            m = mask[..., None].astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m), 1.0)

            def _moments(xp):
                xf = xp.astype(jnp.float32) * m
                mu = jnp.sum(xf, axis=red_axes) / count
                v = jnp.sum(jnp.square(xf), axis=red_axes) / count \
                    - jnp.square(mu)
                return mu, v
            if isinstance(x, (tuple, list)):
                (m1, v1), (m2, v2) = _moments(x1), _moments(x2)
                mean = jnp.concatenate([m1, m2])
                var = jnp.concatenate([v1, v2])
            else:
                mean, var = _moments(x)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        # fold into ONE per-channel affine applied in x's own dtype:
        # x.astype(f32) materialized a full f32 activation buffer whose
        # layout conflicted with the producing einsum/kernel (measured
        # ~6 ms transpose-copy per BN at bench scale). a/b are computed in
        # f32 and rounded once; for f32 inputs nothing changes but fp
        # reassociation.
        inv = jax.lax.rsqrt(var + self.epsilon)
        if isinstance(x, (tuple, list)):
            a = (scale * inv).astype(x1.dtype)
            b = (bias - mean * scale * inv).astype(x1.dtype)
            if return_affine:
                return a, b
            return (x1 * a[:C1] + b[:C1], x2 * a[C1:] + b[C1:])
        a = (scale * inv).astype(x.dtype)
        b = (bias - mean * scale * inv).astype(x.dtype)
        if return_affine:
            return a, b
        return x * a + b
