"""SCN-style layer API — the SparseConvNet Python surface, TPU-native.

The reference composes its sparse model from SparseConvNet layer classes
(sparseconvnet/*.py — SURVEY.md §2.10: InputLayer, SubmanifoldConvolution,
Convolution, Deconvolution, BatchNormalization(+LeakyReLU), MaxPooling,
AveragePooling, UnPooling, NetworkInNetwork, OutputLayer, container
modules). This module offers the same vocabulary as thin flax modules over
this framework's engine ops, so users porting SCN model code have a direct
mapping (table in README.md).

Design deviations, on purpose (functional JAX vs stateful C++ metadata):

  * SCN's SparseConvNetTensor carries an opaque C++ Metadata handle that
    accumulates every level's hash maps. Here :class:`SparseTensor` is an
    explicit NamedTuple, and the layers that CREATE a coarser level
    (Convolution, MaxPooling, AveragePooling) also RETURN the
    :class:`LevelLink` needed to come back up (Deconvolution, UnPooling) —
    the functional equivalent of SCN's implicit rulebook reuse
    (SURVEY.md §2.11 Deconvolution "reuses the downsample rulebook").
  * Containers: use flax composition directly; ``add_table``/``join_table``
    cover scn.AddTable / scn.JoinTable; scn.Sequential is ordinary code.
  * Rules are recomputed per call (sorted-key binary search, cheap and
    jit-fused). The production models instead precompute a whole-graph
    rulebook once per batch (models/uresnet_sparse*.py) — prefer those for
    training speed; this API is for surface compatibility and small nets.

Every layer is batched: features (B, V, C) over sentinel-padded sorted key
arrays (B, V).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uresnet_pytorch_tpu.models.norm import MaskedBatchNorm
from uresnet_pytorch_tpu.ops.pooling import avg_pool, max_pool, unpool
from uresnet_pytorch_tpu.ops.sparse_conv import (
    downsample_conv, submanifold_conv, upsample_conv)
from uresnet_pytorch_tpu.ops.sparse_graph import (
    build_input_level, downsample_link, gather_rows, submanifold_rules)


class SparseTensor(NamedTuple):
    """scn.SparseConvNetTensor equivalent (explicit, batched)."""
    features: jnp.ndarray   # (B, V, C)
    keys: jnp.ndarray       # (B, V) sorted int32, SENTINEL-padded
    num: jnp.ndarray        # (B,) active count
    spatial_size: int


class LevelLink(NamedTuple):
    """Fine<->coarse correspondence created by a strided layer; feed it to
    Deconvolution / UnPooling to restore the fine level exactly."""
    parent: jnp.ndarray     # (B, Vf) coarse row per fine site
    corner: jnp.ndarray     # (B, Vf) corner id in [0, 2^d)
    keys_f: jnp.ndarray     # (B, Vf) the fine level's keys
    num_f: jnp.ndarray      # (B,)
    cap_c: int


def _mask(st: SparseTensor) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, st.keys.shape, 1)
    return rows < st.num[:, None]


# ---------------------------------------------------------------------------
# IO layers
# ---------------------------------------------------------------------------

class InputLayer(nn.Module):
    """scn.InputLayer: dedupe/merge (coords, values) into a level-0 sparse
    tensor. mode: 'sum'|'mean'|'max'|'last' (SCN duplicate-merge modes).

    Returns (SparseTensor, row_of_input) — keep row_of_input for
    OutputLayer (the inverse permutation)."""
    dimension: int
    spatial_size: int
    mode: str = "sum"

    @nn.compact
    def __call__(self, coords, values, n_voxels
                 ) -> Tuple[SparseTensor, jnp.ndarray]:
        cap = coords.shape[1]
        keys, num, feats, row_of_input, _ = jax.vmap(
            lambda c, v, n: build_input_level(
                c, v, n, self.spatial_size, cap, self.mode)
        )(coords, values, n_voxels)
        return (SparseTensor(feats[..., None], keys, num,
                             self.spatial_size), row_of_input)


class OutputLayer(nn.Module):
    """scn.OutputLayer: back to input row order, (B, Vin, C)."""
    dimension: int

    @nn.compact
    def __call__(self, st: SparseTensor, row_of_input) -> jnp.ndarray:
        return gather_rows(st.features, row_of_input)


# ---------------------------------------------------------------------------
# convolutions
# ---------------------------------------------------------------------------

def _conv_init(key, shape, dtype=jnp.float32):
    K, cin, _ = shape
    std = (2.0 / (K * cin)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SubmanifoldConvolution(nn.Module):
    """scn.SubmanifoldConvolution(dimension, nIn, nOut, filter_size, bias).
    Sparsity pattern preserved (arXiv:1711.10275 §3)."""
    dimension: int
    nOut: int
    filter_size: int = 3
    bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        K = self.filter_size ** self.dimension
        w = self.param("w", _conv_init,
                       (K, st.features.shape[-1], self.nOut))
        nbr_idx, nbr_ok = jax.vmap(
            lambda k: submanifold_rules(k, st.spatial_size, self.dimension,
                                        self.filter_size))(st.keys)
        out = submanifold_conv(st.features, nbr_idx, nbr_ok, w)
        if self.bias:
            b = self.param("b", nn.initializers.zeros, (self.nOut,))
            out = jnp.where(_mask(st)[..., None], out + b, 0)
        return st._replace(features=out)


class Convolution(nn.Module):
    """scn.Convolution(dimension, nIn, nOut, 2, 2, bias) — stride-2: creates
    the coarser level. Returns (coarse SparseTensor, LevelLink)."""
    dimension: int
    nOut: int
    bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor
                 ) -> Tuple[SparseTensor, LevelLink]:
        Kd = 2 ** self.dimension
        w = self.param("w", _conv_init,
                       (Kd, st.features.shape[-1], self.nOut))
        cap_c = st.keys.shape[1]
        keys_c, num_c, parent, corner, _ = jax.vmap(
            lambda k: downsample_link(k, st.spatial_size, self.dimension,
                                      cap_c))(st.keys)
        out = downsample_conv(st.features, parent, corner, st.num, cap_c, w)
        if self.bias:
            b = self.param("b", nn.initializers.zeros, (self.nOut,))
            rows = jax.lax.broadcasted_iota(jnp.int32, keys_c.shape, 1)
            out = jnp.where((rows < num_c[:, None])[..., None], out + b, 0)
        link = LevelLink(parent, corner, st.keys, st.num, cap_c)
        return (SparseTensor(out, keys_c, num_c, st.spatial_size // 2), link)


class Deconvolution(nn.Module):
    """scn.Deconvolution(dimension, nIn, nOut, 2, 2, bias): restores the
    link's fine coordinate set exactly (skip concats stay aligned)."""
    dimension: int
    nOut: int
    bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, link: LevelLink) -> SparseTensor:
        Kd = 2 ** self.dimension
        w = self.param("w", _conv_init,
                       (Kd, st.features.shape[-1], self.nOut))
        out = upsample_conv(st.features, link.parent, link.corner,
                            link.cap_c, w)
        fine = SparseTensor(out, link.keys_f, link.num_f,
                            st.spatial_size * 2)
        if self.bias:
            b = self.param("b", nn.initializers.zeros, (self.nOut,))
            fine = fine._replace(
                features=jnp.where(_mask(fine)[..., None],
                                   fine.features + b, 0))
        return fine


class NetworkInNetwork(nn.Module):
    """scn.NetworkInNetwork: per-site linear (1x1 conv)."""
    nOut: int
    bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        w = self.param("w", _conv_init, (1, st.features.shape[-1], self.nOut))
        out = jnp.einsum("bvc,cd->bvd", st.features, w[0],
                         preferred_element_type=jnp.float32
                         ).astype(st.features.dtype)
        if self.bias:
            b = self.param("b", nn.initializers.zeros, (self.nOut,))
            out = jnp.where(_mask(st)[..., None], out + b, 0)
        return st._replace(features=out)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------

class MaxPooling(nn.Module):
    """scn.MaxPooling(dimension, 2, 2)."""
    dimension: int

    @nn.compact
    def __call__(self, st: SparseTensor) -> Tuple[SparseTensor, LevelLink]:
        cap_c = st.keys.shape[1]
        keys_c, num_c, parent, corner, _ = jax.vmap(
            lambda k: downsample_link(k, st.spatial_size, self.dimension,
                                      cap_c))(st.keys)
        out = max_pool(st.features, parent, st.num, cap_c)
        link = LevelLink(parent, corner, st.keys, st.num, cap_c)
        return (SparseTensor(out, keys_c, num_c, st.spatial_size // 2), link)


class AveragePooling(nn.Module):
    """scn.AveragePooling(dimension, 2, 2). count_mode='volume' divides by
    2^dim (SCN convention); 'active' divides by active children."""
    dimension: int
    count_mode: str = "volume"

    @nn.compact
    def __call__(self, st: SparseTensor) -> Tuple[SparseTensor, LevelLink]:
        cap_c = st.keys.shape[1]
        keys_c, num_c, parent, corner, _ = jax.vmap(
            lambda k: downsample_link(k, st.spatial_size, self.dimension,
                                      cap_c))(st.keys)
        out = avg_pool(st.features, parent, st.num, cap_c, self.dimension,
                       self.count_mode)
        link = LevelLink(parent, corner, st.keys, st.num, cap_c)
        return (SparseTensor(out, keys_c, num_c, st.spatial_size // 2), link)


class UnPooling(nn.Module):
    """scn.UnPooling: broadcast coarse values to the link's fine sites."""
    dimension: int

    @nn.compact
    def __call__(self, st: SparseTensor, link: LevelLink) -> SparseTensor:
        out = unpool(st.features, link.parent, link.cap_c)
        return SparseTensor(out, link.keys_f, link.num_f,
                            st.spatial_size * 2)


# ---------------------------------------------------------------------------
# normalization / activation / tables
# ---------------------------------------------------------------------------

class BatchNormLeakyReLU(nn.Module):
    """scn.BatchNormLeakyReLU (leakiness=0 == scn.BatchNormReLU): masked BN
    over active sites + activation."""
    leakiness: float = 0.0
    momentum: float = 0.9
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False) -> SparseTensor:
        y = MaskedBatchNorm(momentum=self.momentum, epsilon=self.epsilon)(
            st.features, _mask(st), train)
        y = (nn.leaky_relu(y, negative_slope=self.leakiness)
             if self.leakiness > 0 else nn.relu(y))
        y = jnp.where(_mask(st)[..., None], y, 0)
        return st._replace(features=y)


def BatchNormReLU(momentum: float = 0.9, epsilon: float = 1e-4):
    """scn.BatchNormReLU."""
    return BatchNormLeakyReLU(leakiness=0.0, momentum=momentum,
                              epsilon=epsilon)


def add_table(a: SparseTensor, b: SparseTensor) -> SparseTensor:
    """scn.AddTable (residual add; same coordinate set by construction)."""
    return a._replace(features=a.features + b.features)


def join_table(a: SparseTensor, b: SparseTensor) -> SparseTensor:
    """scn.JoinTable (channel concat; same coordinate set)."""
    return a._replace(
        features=jnp.concatenate([a.features, b.features], axis=-1))


# ---------------------------------------------------------------------------
# surface tail: FullConvolution / SparseToDense / BLInputLayer / FCN
# (SURVEY.md §2.10 lists them in the dependency's API; the reference model
# itself uses none of these — provided for drop-in SCN coverage)
# ---------------------------------------------------------------------------

class FullConvolution(nn.Module):
    """scn.FullConvolution(dimension, nIn, nOut, 2, 2, bias) — stride-2
    transposed conv that ACTIVATES every child site of each active coarse
    site (unlike Deconvolution, which restores a previously recorded fine
    set). Output capacity = 2^dimension x input capacity; output keys are
    the sorted child keys."""
    dimension: int
    nOut: int
    bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        from uresnet_pytorch_tpu.ops.coords import SENTINEL, decode, encode
        dim = self.dimension
        Kd = 2 ** dim
        B, V, Cin = st.features.shape
        w = self.param("w", _conv_init, (Kd, Cin, self.nOut))
        S_f = st.spatial_size * 2

        def one(keys, feats):
            coords = decode(keys, st.spatial_size, dim)
            valid = keys != SENTINEL
            child_keys, child_feats = [], []
            for o in range(Kd):
                obits = jnp.asarray(
                    [(o >> (dim - 1 - d)) & 1 for d in range(dim)],
                    jnp.int32)
                child_keys.append(encode(coords * 2 + obits, valid, S_f))
                child_feats.append(feats @ w[o])
            ck = jnp.concatenate(child_keys)             # (Kd*V,)
            cf = jnp.concatenate(child_feats, axis=0)    # (Kd*V, nOut)
            order = jnp.argsort(ck)
            return ck[order], jnp.take(cf, order, axis=0)

        keys_f, feats_f = jax.vmap(one)(st.keys, st.features)
        num_f = st.num * Kd
        mask = (jax.lax.broadcasted_iota(jnp.int32, keys_f.shape, 1)
                < num_f[:, None])
        feats_f = jnp.where(mask[..., None], feats_f, 0)
        if self.bias:
            b = self.param("b", nn.initializers.zeros, (self.nOut,))
            feats_f = jnp.where(mask[..., None], feats_f + b, 0)
        return SparseTensor(feats_f, keys_f, num_f, S_f)


class SparseToDense(nn.Module):
    """scn.SparseToDense(dimension, nPlanes): sparse tensor -> dense
    (B, *spatial, C) array (channels-LAST — the TPU-native layout; torch
    SCN emits channels-first)."""
    dimension: int

    @nn.compact
    def __call__(self, st: SparseTensor) -> jnp.ndarray:
        from uresnet_pytorch_tpu.ops.coords import SENTINEL, decode
        dim = self.dimension
        S = st.spatial_size
        B, V, C = st.features.shape

        def one(keys, feats, num):
            coords = decode(keys, S, dim)
            rows = jnp.arange(V)
            valid = (keys != SENTINEL) & (rows < num)
            flat = jnp.zeros((S ** dim, C), feats.dtype)
            lin = jnp.zeros((V,), jnp.int32)
            for d in range(dim):
                lin = lin * S + coords[..., d]
            lin = jnp.where(valid, lin, S ** dim)
            return flat.at[lin].add(
                jnp.where(valid[:, None], feats, 0),
                mode="drop").reshape((S,) * dim + (C,))

        return jax.vmap(one)(st.keys, st.features, st.num)


class BLInputLayer(nn.Module):
    """scn.BLInputLayer: batched input with MULTI-CHANNEL features
    ((B, V, dim) coords + (B, V, C) features) — InputLayer generalized
    past scalar values; duplicate coordinates merge per channel."""
    dimension: int
    spatial_size: int
    mode: str = "sum"

    @nn.compact
    def __call__(self, coords, features, n_voxels
                 ) -> Tuple[SparseTensor, jnp.ndarray]:
        cap = coords.shape[1]
        C = features.shape[-1]
        outs = [jax.vmap(
            lambda c, v, n: build_input_level(
                c, v, n, self.spatial_size, cap, self.mode)
        )(coords, features[..., ci], n_voxels) for ci in range(C)]
        keys, num, _, row_of_input, _ = outs[0]
        feats = jnp.stack([o[2] for o in outs], axis=-1)
        return (SparseTensor(feats, keys, num, self.spatial_size),
                row_of_input)


class FullyConvolutionalNet(nn.Module):
    """scn.FullyConvolutionalNet(dimension, reps, nPlanes,
    residual_blocks=False): U-style encoder whose per-level outputs are
    UnPooled back to full resolution and channel-joined (the SCN
    'hypercolumn' FCN). Output nPlanes_total = sum(nPlanes)."""
    dimension: int
    reps: int
    nPlanes: Tuple[int, ...]
    residual_blocks: bool = False
    leakiness: float = 0.0

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False) -> SparseTensor:
        dim = self.dimension
        outs = []
        links = []
        for li, planes in enumerate(self.nPlanes):
            for r in range(self.reps):
                if self.residual_blocks and st.features.shape[-1] == planes:
                    y = BatchNormLeakyReLU(self.leakiness)(st, train)
                    y = SubmanifoldConvolution(dim, planes)(y)
                    y = BatchNormLeakyReLU(self.leakiness)(y, train)
                    y = SubmanifoldConvolution(dim, planes)(y)
                    st = add_table(st, y)
                else:
                    st = SubmanifoldConvolution(dim, planes)(st)
                    st = BatchNormLeakyReLU(self.leakiness)(st, train)
            outs.append(st)
            if li < len(self.nPlanes) - 1:
                st, link = Convolution(dim, self.nPlanes[li + 1])(st)
                links.append(link)
        up = outs[-1]
        for li in reversed(range(len(self.nPlanes) - 1)):
            up = UnPooling(dim)(up, links[li])
            up = join_table(outs[li], up)
        return up
