"""Dense 2D/3D U-ResNet — pure XLA convolutions.

Topology mirrors the reference's dense model (SURVEY.md §2.6, expected at
uresnet/models/uresnet_dense.py: ConvND+BN+LeakyReLU pre-activation residual
blocks, stride-2 conv downsample, transposed-conv upsample, skip concats,
linear classification head) and the sparse model's level structure (§2.5) so
the two are oracle-comparable on fully-active grids (SURVEY.md §4.2).

TPU-native deviations from the reference:
  * channel-last layout (XLA-preferred), bfloat16 compute / float32 params
  * consumes the padded sparse blob directly: voxelization is an on-device
    scatter, per-voxel logits an on-device gather — the host never builds
    the dense volume (reference builds it in the larcv_dense loader).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.models import register_model
from uresnet_pytorch_tpu.ops.voxelize import voxelize, gather_voxels


class BNAct(nn.Module):
    cfg: URESNetConfig

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.cfg.bn_momentum,
            epsilon=self.cfg.bn_eps, dtype=jnp.float32)(x)
        s = self.cfg.leaky_relu_slope
        x = nn.leaky_relu(x, negative_slope=s) if s > 0 else nn.relu(x)
        return x.astype(self.cfg.compute_dtype)


class ResBlock(nn.Module):
    """Pre-activation residual block; 1x1 projection shortcut when the
    channel count changes (SCN's NetworkInNetwork shortcut, SURVEY.md §2.5)."""
    cfg: URESNetConfig
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        dim = self.cfg.data_dim
        k = (3,) * dim
        shortcut = x
        if x.shape[-1] != self.features:
            shortcut = nn.Conv(self.features, (1,) * dim, use_bias=False,
                               dtype=self.cfg.compute_dtype)(x)
        y = BNAct(self.cfg)(x, train)
        y = nn.Conv(self.features, k, use_bias=False,
                    dtype=self.cfg.compute_dtype)(y)
        y = BNAct(self.cfg)(y, train)
        y = nn.Conv(self.features, k, use_bias=False,
                    dtype=self.cfg.compute_dtype)(y)
        return shortcut + y


class DenseUResNetCore(nn.Module):
    """Volume -> per-cell logits. Shared by the dense model and by the
    sparse/dense equivalence tests."""
    cfg: URESNetConfig

    @nn.compact
    def __call__(self, vol, train: bool = False):
        cfg = self.cfg
        dim = cfg.data_dim
        planes: Sequence[int] = cfg.n_planes
        x = vol.astype(cfg.compute_dtype)
        x = nn.Conv(planes[0], (3,) * dim, use_bias=False,
                    dtype=cfg.compute_dtype, name="stem")(x)
        # rematerialize residual blocks in TRAINING only: dense 3D volumes
        # at 128^3+ would otherwise hold every activation for the backward
        # pass (jax.checkpoint trades FLOPs for HBM, SURVEY.md §7);
        # inference pays nothing
        Block = (nn.remat(ResBlock, static_argnums=(2,))
                 if train else ResBlock)
        skips = []
        for level, width in enumerate(planes):
            for r in range(cfg.reps):
                x = Block(cfg, width, name=f"enc{level}_block{r}")(x, train)
            if level < len(planes) - 1:
                skips.append(x)
                x = BNAct(cfg, name=f"down{level}_bnact")(x, train)
                x = nn.Conv(planes[level + 1], (2,) * dim, strides=(2,) * dim,
                            use_bias=False, dtype=cfg.compute_dtype,
                            name=f"down{level}_conv")(x)
        for level in reversed(range(len(planes) - 1)):
            x = BNAct(cfg, name=f"up{level}_bnact")(x, train)
            x = nn.ConvTranspose(planes[level], (2,) * dim, strides=(2,) * dim,
                                 use_bias=False, dtype=cfg.compute_dtype,
                                 name=f"up{level}_deconv")(x)
            x = jnp.concatenate([x, skips[level].astype(x.dtype)], axis=-1)
            for r in range(cfg.reps):
                x = Block(cfg, planes[level], name=f"dec{level}_block{r}")(x, train)
        x = BNAct(cfg, name="head_bnact")(x, train)
        logits = nn.Conv(cfg.num_class, (1,) * dim, use_bias=True,
                         dtype=jnp.float32, name="head")(x.astype(jnp.float32))
        return logits


class UResNetDense(nn.Module):
    """Padded sparse blob -> per-voxel logits via on-device voxelize/gather."""
    cfg: URESNetConfig

    @nn.compact
    def __call__(self, coords, values, n_voxels, train: bool = False):
        cfg = self.cfg
        vol = voxelize(coords, values, n_voxels, cfg.spatial_size)
        logits_vol = DenseUResNetCore(cfg, name="core")(vol, train)
        return gather_voxels(logits_vol, coords, n_voxels, cfg.spatial_size)


@register_model("uresnet_dense")
def build_dense(cfg: URESNetConfig) -> UResNetDense:
    return UResNetDense(cfg)
