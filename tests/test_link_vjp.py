"""Custom VJPs of the tile up/down link movement (ops/tile_conv.py):
`assemble_children_link` and `parent_corner_link` are each other's exact
transposes (down-links are injective; every fine tile has one (parent,
octant)), so neither backward pass needs a scatter-add. Validated against
autodiff through the raw implementations (whose windowed_gather VJP is the
scatter-add oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.ops.tile_conv import (
    _assemble_impl, _parent_corner_impl, assemble_children_link,
    parent_corner_link)
from uresnet_pytorch_tpu.ops.tile_graph import build_tile_graph


def _link(dim=3, spatial=16, voxels=150, seed=0):
    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=4,
        uresnet_num_strides=2, spatial_size=spatial, data_dim=dim, reps=1,
        max_voxels=256, min_level_capacity=32, batch_size=2,
        sparse_engine="tile", tile_size=4, min_tiles=64,
        compute_dtype="float32")
    rng = np.random.default_rng(seed)
    B = 2
    coords = np.zeros((B, cfg.max_voxels, dim), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        flat = rng.choice(spatial ** dim, size=voxels, replace=False)
        for d in range(dim):
            coords[b, :voxels, d] = (flat // spatial ** (dim - 1 - d)) % spatial
        values[b, :voxels] = rng.normal(size=voxels)
        nv[b] = voxels
    graph = build_tile_graph(jnp.asarray(coords), jnp.asarray(values),
                             jnp.asarray(nv), cfg)
    link = graph.links[0]
    assert len(link.children) > 1, "need a real (non-identity) link"
    t_c = 4
    Tf = link.parents[0].idx.shape[1]
    Tc = link.children[0].idx.shape[1]
    return link, t_c, Tf, Tc


def test_assemble_link_vjp_matches_autodiff():
    link, t_c, Tf, Tc = _link()
    rng = np.random.default_rng(1)
    th, dim, C = t_c // 2, 3, 3
    blocks = jnp.asarray(rng.normal(size=(2, Tf, th ** dim, C))
                         .astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, Tc, t_c ** dim, C))
                    .astype(np.float32))
    out_new, vjp_new = jax.vjp(
        lambda b: assemble_children_link(b, link, t_c, dim), blocks)
    out_ref, vjp_ref = jax.vjp(
        lambda b: _assemble_impl(b, link.children, t_c, dim), blocks)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vjp_new(g)[0]),
                               np.asarray(vjp_ref(g)[0]), atol=1e-4)


def test_parent_corner_link_vjp_matches_autodiff():
    link, t_c, Tf, Tc = _link(seed=2)
    rng = np.random.default_rng(3)
    th, dim, C = t_c // 2, 3, 4
    xc = jnp.asarray(rng.normal(size=(2, Tc, t_c ** dim, C))
                     .astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, Tf, th ** dim, C))
                    .astype(np.float32))
    out_new, vjp_new = jax.vjp(
        lambda x: parent_corner_link(x, link, t_c, dim), xc)
    out_ref, vjp_ref = jax.vjp(
        lambda x: _parent_corner_impl(x, link, t_c, dim), xc)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vjp_new(g)[0]),
                               np.asarray(vjp_ref(g)[0]), atol=1e-4)


def test_links_are_mutual_transposes():
    """<assemble(b), g> == <b, parent_corner(g)> — the identity both
    custom VJPs rely on."""
    link, t_c, Tf, Tc = _link(seed=4)
    rng = np.random.default_rng(5)
    th, dim, C = t_c // 2, 3, 2
    b = jnp.asarray(rng.normal(size=(2, Tf, th ** dim, C))
                    .astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, Tc, t_c ** dim, C))
                    .astype(np.float32))
    lhs = jnp.vdot(_assemble_impl(b, link.children, t_c, dim), g)
    rhs = jnp.vdot(b, _parent_corner_impl(g, link, t_c, dim))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)
