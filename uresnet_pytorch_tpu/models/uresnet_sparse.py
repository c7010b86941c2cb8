"""Submanifold-sparse U-ResNet.

Topology mirrors the reference sparse model (SURVEY.md §2.5, expected at
uresnet/models/uresnet_sparse.py): InputLayer -> stem SubmanifoldConvolution
(1->m) -> per level `reps` pre-activation residual blocks + stride-2
downsample -> mirrored decoder with stride-2 deconv restoring the encoder's
exact coordinate sets, skip concatenation, residual blocks -> BN+ReLU ->
linear head to num_class logits per active voxel.

TPU-native structure: the coordinate graph (sorted key arrays + rulebooks,
ops/sparse_graph.py) is built once per batch inside the jitted step; compute
layers consume static (B, V_l, C) buffers. Output logits are returned in
BLOB ROW ORDER (the reference's OutputLayer inverse permutation), so losses
and prediction writers are model-agnostic.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.models import register_model
from uresnet_pytorch_tpu.models.norm import MaskedBatchNorm
from uresnet_pytorch_tpu.ops.sparse_conv import (
    downsample_conv, submanifold_conv, upsample_conv)
from uresnet_pytorch_tpu.ops.sparse_graph import (
    SparseGraph, build_graph, gather_rows)


def _conv_init(key, shape, dtype=jnp.float32):
    """He-style init over fan_in = K * Cin (SCN convention)."""
    K, cin, _ = shape
    std = (2.0 / (K * cin)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SMConv(nn.Module):
    """SubmanifoldConvolution: 3^d gather-GEMM accumulate, no bias
    (reference stacks these with BN, SURVEY.md §2.5)."""
    cfg: URESNetConfig
    features: int

    @nn.compact
    def __call__(self, x, level):
        K = 3 ** self.cfg.data_dim
        w = self.param("w", _conv_init, (K, x.shape[-1], self.features))
        return submanifold_conv(x.astype(self.cfg.compute_dtype),
                                level.nbr_idx, level.nbr_ok, w)


class BNAct(nn.Module):
    cfg: URESNetConfig

    @nn.compact
    def __call__(self, x, mask, train, return_affine=False):
        bn = MaskedBatchNorm(momentum=self.cfg.bn_momentum,
                             epsilon=self.cfg.bn_eps)
        if return_affine:
            # eval-only: hand the folded (a, b) to a fused conv epilogue
            # (same params/stats created — checkpoint-compatible)
            a, b = bn(x, mask, False, return_affine=True)
            return (a.astype(self.cfg.compute_dtype),
                    b.astype(self.cfg.compute_dtype))
        x = bn(x, mask, train)
        s = self.cfg.leaky_relu_slope
        act = ((lambda v: nn.leaky_relu(v, negative_slope=s)) if s > 0
               else nn.relu)
        dt = self.cfg.compute_dtype
        if isinstance(x, tuple):   # unmaterialized channel-concat pair
            return tuple(act(p).astype(dt) for p in x)
        return act(x).astype(dt)


class SparseResBlock(nn.Module):
    """Pre-activation residual block; NetworkInNetwork (per-row linear)
    shortcut when channel counts differ (SURVEY.md §2.5)."""
    cfg: URESNetConfig
    features: int

    @nn.compact
    def __call__(self, x, level, mask, train):
        shortcut = x
        if x.shape[-1] != self.features:
            w = self.param("w_shortcut", _conv_init,
                           (1, x.shape[-1], self.features))
            shortcut = jnp.einsum(
                "bvc,cd->bvd", x.astype(self.cfg.compute_dtype),
                w[0].astype(self.cfg.compute_dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.cfg.compute_dtype)
        y = BNAct(self.cfg, name="bn_a")(x, mask, train)
        y = SMConv(self.cfg, self.features, name="conv_a")(y, level)
        y = BNAct(self.cfg, name="bn_b")(y, mask, train)
        y = SMConv(self.cfg, self.features, name="conv_b")(y, level)
        return shortcut + y


class UResNetSparse(nn.Module):
    cfg: URESNetConfig

    @nn.compact
    def __call__(self, coords, values, n_voxels, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        graph, _rep = build_graph(coords, values, n_voxels, cfg)
        levels, links = graph.levels, graph.links
        nlev = len(levels)
        planes = cfg.n_planes
        Kd = 2 ** cfg.data_dim

        def mask_of(l):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, levels[l].keys.shape, 1)
            return rows < levels[l].num[:, None]

        masks = [mask_of(l) for l in range(nlev)]

        # remat residual blocks in training only (backward-pass memory,
        # SURVEY.md §7); inference pays nothing
        Block = (nn.remat(SparseResBlock, static_argnums=(4,))
                 if train else SparseResBlock)
        x = SMConv(cfg, planes[0], name="stem")(graph.feats0.astype(dt),
                                                levels[0])
        skips = []
        for l in range(nlev):
            for r in range(cfg.reps):
                x = Block(cfg, planes[l], name=f"enc{l}_block{r}")(
                    x, levels[l], masks[l], train)
            if l < nlev - 1:
                skips.append(x)
                x = BNAct(cfg, name=f"down{l}_bnact")(x, masks[l], train)
                w = self.param(f"down{l}_w", _conv_init,
                               (Kd, x.shape[-1], planes[l + 1]))
                x = downsample_conv(x.astype(dt), links[l].parent,
                                    links[l].offset, levels[l].num,
                                    levels[l + 1].keys.shape[1], w)

        for l in reversed(range(nlev - 1)):
            x = BNAct(cfg, name=f"up{l}_bnact")(x, masks[l + 1], train)
            w = self.param(f"up{l}_w", _conv_init,
                           (Kd, x.shape[-1], planes[l]))
            x = upsample_conv(x.astype(dt), links[l].parent, links[l].offset,
                              levels[l + 1].keys.shape[1], w)
            x = jnp.concatenate([x, skips[l].astype(x.dtype)], axis=-1)
            for r in range(cfg.reps):
                x = Block(cfg, planes[l], name=f"dec{l}_block{r}")(
                    x, levels[l], masks[l], train)

        x = BNAct(cfg, name="head_bnact")(x, masks[0], train)
        w_head = self.param("head_w", nn.initializers.lecun_normal(),
                            (x.shape[-1], cfg.num_class))
        b_head = self.param("head_b", nn.initializers.zeros,
                            (cfg.num_class,))
        logits0 = jnp.einsum("bvc,cd->bvd", x.astype(jnp.float32),
                             w_head) + b_head                    # (B, V0, C)
        # OutputLayer inverse permutation: back to blob row order
        logits = gather_rows(logits0, graph.row_of_input)
        return jnp.where(graph.input_valid[..., None], logits, 0.0)


@register_model("uresnet_sparse")
def build_sparse(cfg: URESNetConfig):
    """Engine dispatch: 'tile' = tiled-dense MXU engine (default, fast);
    'gather' = row-gather engine (oracle/fallback). Both share the same
    parameter tree, so checkpoints are interchangeable."""
    if cfg.sparse_engine == "tile":
        from uresnet_pytorch_tpu.models.uresnet_sparse_tiled import (
            UResNetSparseTiled)
        return UResNetSparseTiled(cfg)
    return UResNetSparse(cfg)
