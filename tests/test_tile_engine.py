"""Tile-engine tests: fold/unfold algebra, single-tile dense oracle, and the
decisive cross-engine equivalence — the tiled-dense model must reproduce the
row-gather engine's logits bit-for-class with identical parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.config import URESNetConfig


def _cfg(engine, **kw):
    base = dict(model_name="uresnet_sparse", num_class=5, uresnet_filters=4,
                uresnet_num_strides=3, spatial_size=16, data_dim=3,
                reps=1, max_voxels=256, min_level_capacity=32, batch_size=2,
                io_type="synthetic", learning_rate=0.01,
                compute_dtype="float32", shuffle=False,
                sparse_engine=engine, tile_size=4, min_tiles=64)
    base.update(kw)
    return URESNetConfig(**base)


def _blob(cfg, mean_voxels=100):
    from uresnet_pytorch_tpu.iotools import io_factory
    io = io_factory(cfg, n_events=4, mean_voxels=mean_voxels)
    io.initialize()
    blob = io.next()
    io.finalize()
    return blob


def test_fold_unfold_roundtrip():
    from uresnet_pytorch_tpu.ops.tile_conv import fold2, unfold2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 4, 4, 5)).astype(np.float32))
    f = fold2(x)
    assert f.shape == (2, 3, 2, 2, 2, 40)
    np.testing.assert_array_equal(np.asarray(unfold2(f)), np.asarray(x))
    # fold block layout: block bits x-major over channels
    np.testing.assert_array_equal(np.asarray(f[0, 0, 0, 0, 0, :5]),
                                  np.asarray(x[0, 0, 0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(f[0, 0, 0, 0, 0, 5:10]),
                                  np.asarray(x[0, 0, 0, 0, 1]))  # z-bit
    np.testing.assert_array_equal(np.asarray(f[0, 0, 0, 0, 0, 20:25]),
                                  np.asarray(x[0, 0, 1, 0, 0]))  # x-bit


def _halo_from_keys(keys_np, grid, dim=3):
    """Sorted sentinel-padded per-event key array -> batched Halo26Spec."""
    from uresnet_pytorch_tpu.ops.halo import build_halo26
    return jax.vmap(lambda k: build_halo26(k, grid, dim))(
        jnp.asarray(keys_np))


def test_windowed_gather_exact():
    """The block one-hot + correction-list permutation must be EXACT for
    arbitrary index patterns, including far out-of-window jumps and
    invalid rows."""
    from uresnet_pytorch_tpu.ops.tile_graph import make_gather_spec
    from uresnet_pytorch_tpu.ops.tile_conv import windowed_gather
    rng = np.random.default_rng(5)
    B, S, N, F = 2, 192, 128, 7
    src = rng.normal(size=(B, S, F)).astype(np.float32)
    # mostly-local indices with some far jumps and some invalid rows
    base = np.clip(np.arange(N) + rng.integers(-5, 6, N), 0, S - 1)
    far = rng.random((B, N)) < 0.1
    idx = np.where(far, rng.integers(0, S, (B, N)), base[None]).astype(np.int32)
    ok = rng.random((B, N)) < 0.9
    spec = jax.vmap(lambda i, o: make_gather_spec(i, o, S, 16))(
        jnp.asarray(idx), jnp.asarray(ok))
    out = np.asarray(windowed_gather(jnp.asarray(src), spec))
    expect = np.where(ok[..., None],
                      np.take_along_axis(src, idx[..., None], axis=1), 0.0)
    np.testing.assert_allclose(out, expect, atol=1e-6)
    assert int(np.asarray(spec.overflow).sum()) == 0


def test_pallas_gather_matches_xla_interpret():
    """The Pallas windowed-gather kernel (interpret mode on CPU) must match
    the XLA reference exactly, and the custom VJP must match autodiff."""
    from uresnet_pytorch_tpu.ops.tile_graph import make_gather_spec
    from uresnet_pytorch_tpu.ops import tile_conv
    from uresnet_pytorch_tpu.ops.pallas.windowed_gather import gather_forward
    rng = np.random.default_rng(9)
    B, S, N, F = 2, 96, 64, 128
    src = jnp.asarray(rng.normal(size=(B, S, F)).astype(np.float32))
    base = np.clip(np.arange(N) * (S // N) + rng.integers(-4, 5, N), 0, S - 1)
    idx = base[None].repeat(B, 0).astype(np.int32)
    idx[0, 5] = S - 1  # a far jump -> correction path
    ok = np.ones((B, N), bool)
    ok[1, 7] = False
    spec = jax.vmap(lambda i, o: make_gather_spec(i, o, S, 16))(
        jnp.asarray(idx), jnp.asarray(ok))
    ref = tile_conv._windowed_gather_xla(src, spec)
    out = gather_forward(src, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # custom VJP == autodiff of the XLA path
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    _, vjp_ref = jax.vjp(lambda s: tile_conv._windowed_gather_xla(s, spec), src)
    _, vjp_cus = jax.vjp(lambda s: tile_conv.windowed_gather(s, spec), src)
    np.testing.assert_allclose(np.asarray(vjp_cus(g)[0]),
                               np.asarray(vjp_ref(g)[0]), atol=1e-5)


def test_single_tile_conv_matches_dense():
    """One fully-active tile, no neighbors: tiled submanifold conv == dense
    SAME conv with zero boundary."""
    from uresnet_pytorch_tpu.ops.coords import SENTINEL, encode
    from uresnet_pytorch_tpu.ops.tile_conv import submanifold_conv_tiled
    rng = np.random.default_rng(1)
    t, Cin, Cout = 4, 3, 2
    x = rng.normal(size=(1, 1, t ** 3, Cin)).astype(np.float32)
    occ = np.ones((1, 1, t ** 3), bool)
    keys = np.array([[int(encode(jnp.asarray([1, 1, 1]),
                                 jnp.asarray(True), 4))]], np.int32)
    w = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.2
    out = submanifold_conv_tiled(jnp.asarray(x), jnp.asarray(occ),
                                 _halo_from_keys(keys, 4), t, 3,
                                 jnp.asarray(w))
    dense = jax.lax.conv_general_dilated(
        jnp.asarray(x).reshape(1, t, t, t, Cin),
        jnp.asarray(w).reshape(3, 3, 3, Cin, Cout),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(out).reshape(t, t, t, Cout),
                               np.asarray(dense)[0], atol=1e-4)


def test_halo_extend_neighbors():
    """Two adjacent tiles: the halo face must carry the neighbor's data."""
    from uresnet_pytorch_tpu.ops.coords import SENTINEL, encode
    from uresnet_pytorch_tpu.ops.halo import halo26_extend
    t = 4
    x = np.zeros((1, 2, t ** 3, 1), np.float32)
    x[0, 0] = 1.0
    x[0, 1] = 2.0
    # tile 1 is at +x of tile 0 (keys sorted: x is the high bits)
    k0 = int(encode(jnp.asarray([1, 1, 1]), jnp.asarray(True), 4))
    k1 = int(encode(jnp.asarray([2, 1, 1]), jnp.asarray(True), 4))
    keys = np.array([[k0, k1]], np.int32)
    ext = np.asarray(halo26_extend(jnp.asarray(x),
                                   _halo_from_keys(keys, 4), t, 3))
    ext = ext.reshape(1, 2, t + 2, t + 2, t + 2, 1)
    # tile0 high-x halo = tile1's low-x face (interior cells only)
    assert (ext[0, 0, t + 1, 1:t + 1, 1:t + 1] == 2.0).all()
    assert (ext[0, 0, 0] == 0).all()              # no -x neighbor
    assert (ext[0, 1, 0, 1:t + 1, 1:t + 1] == 1.0).all()
    assert (ext[0, 1, :, 0] == 0).all()           # no y neighbors


@pytest.mark.parametrize("spatial,strides,tile,dim",
                         [(16, 3, 4, 3), (8, 3, 4, 3), (32, 3, 4, 2)])
def test_engine_equivalence(spatial, strides, tile, dim):
    """Gather and tile engines share params and must agree on logits.
    (8,3,4) exercises the shrinking-tile identity link at the deep level;
    the last case pins the 2D path (SURVEY.md §2.2: the reference supports
    data_dim 2 and 3)."""
    from uresnet_pytorch_tpu.models import construct
    cfg_g = _cfg("gather", spatial_size=spatial, uresnet_num_strides=strides,
                 tile_size=tile, data_dim=dim)
    cfg_t = cfg_g.replace(sparse_engine="tile")
    blob = _blob(cfg_g, mean_voxels=80)
    args = (jnp.asarray(blob["coords"]), jnp.asarray(blob["values"]),
            jnp.asarray(blob["n_voxels"]))
    mg = construct("uresnet_sparse")(cfg_g)
    mt = construct("uresnet_sparse")(cfg_t)
    rng = jax.random.PRNGKey(3)
    vg = jax.jit(mg.init, static_argnames=("train",))(rng, *args, train=False)
    vt = jax.jit(mt.init, static_argnames=("train",))(rng, *args, train=False)
    # identical parameter trees ('diag' is the tile engine's overflow
    # diagnostics channel, not state — exclude it)
    vg = {k: v for k, v in vg.items() if k != "diag"}
    vt = {k: v for k, v in vt.items() if k != "diag"}
    sg = jax.tree_util.tree_structure(vg)
    st = jax.tree_util.tree_structure(vt)
    assert sg == st, f"param trees differ:\n{sg}\nvs\n{st}"
    out_g = jax.jit(mg.apply, static_argnames=("train",))(vg, *args, train=False)
    out_t = jax.jit(mt.apply, static_argnames=("train",))(vg, *args, train=False)
    n = blob["n_voxels"]
    for b in range(len(n)):
        np.testing.assert_allclose(np.asarray(out_t)[b, :n[b]],
                                   np.asarray(out_g)[b, :n[b]],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tile_sizes", [(4, 2, 2), (4, 4, 2)])
def test_engine_equivalence_tile_schedule(tile_sizes):
    """Per-level tile_sizes schedules (config.tile_sizes) must reproduce
    the gather engine's logits exactly like the global-t engine does —
    the halving transition mid-network rides the identity-link branch
    (ops/tile_graph.build_tile_graph) with full spatial headroom, not
    just the spatial-clamp case the (8,3,4) case above pins."""
    from uresnet_pytorch_tpu.models import construct
    cfg_g = _cfg("gather", spatial_size=16, uresnet_num_strides=3,
                 tile_size=4, data_dim=3)
    cfg_t = cfg_g.replace(sparse_engine="tile", tile_sizes=tile_sizes)
    blob = _blob(cfg_g, mean_voxels=80)
    args = (jnp.asarray(blob["coords"]), jnp.asarray(blob["values"]),
            jnp.asarray(blob["n_voxels"]))
    mg = construct("uresnet_sparse")(cfg_g)
    mt = construct("uresnet_sparse")(cfg_t)
    rng = jax.random.PRNGKey(3)
    vg = jax.jit(mg.init, static_argnames=("train",))(rng, *args, train=False)
    vg = {k: v for k, v in vg.items() if k != "diag"}
    out_g = jax.jit(mg.apply, static_argnames=("train",))(vg, *args,
                                                          train=False)
    out_t = jax.jit(mt.apply, static_argnames=("train",))(vg, *args,
                                                          train=False)
    n = blob["n_voxels"]
    for b in range(len(n)):
        np.testing.assert_allclose(np.asarray(out_t)[b, :n[b]],
                                   np.asarray(out_g)[b, :n[b]],
                                   rtol=1e-4, atol=1e-4)


def test_graph_overflow_zero_midscale():
    """Correction capacities must hold with room to spare on a mid-scale
    event (the TPU-scale check lives in the bench harness)."""
    from uresnet_pytorch_tpu.ops.tile_graph import (build_tile_graph,
                                                    graph_overflows)
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    cfg = _cfg("tile", spatial_size=64, uresnet_num_strides=4,
               max_voxels=8192, batch_size=2)
    coords = np.zeros((2, cfg.max_voxels, 3), np.int32)
    values = np.zeros((2, cfg.max_voxels), np.float32)
    nv = np.zeros((2,), np.int32)
    for b in range(2):
        c, v, _ = generate_event(0, b, 64, 3, 6000)
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n
    graph = jax.jit(lambda c, v, n: build_tile_graph(c, v, n, cfg))(
        coords, values, nv)
    assert int(jax.jit(graph_overflows)(graph)) == 0


def test_capacity_spill_keeps_loss_finite():
    """Voxels whose tile is dropped by capacity overflow must yield ZERO
    logits, not NaN (a NaN at a masked row contaminates the loss sum:
    NaN * 0 weight = NaN). Regression for the jnp.take default-NaN fill."""
    from uresnet_pytorch_tpu.trainval import TrainVal
    # min_tiles floor = 8 tiles while the event spreads over many more
    cfg = _cfg("tile", spatial_size=32, uresnet_num_strides=2,
               max_voxels=512, min_tiles=8, tile_occupancy=64.0,
               batch_size=1)
    rng = np.random.default_rng(0)
    flat = rng.choice(32 ** 3, size=400, replace=False)
    blob = {
        "coords": np.zeros((1, 512, 3), np.int32),
        "values": np.zeros((1, 512), np.float32),
        "label": np.zeros((1, 512), np.int32),
        "n_voxels": np.array([400], np.int32),
        "index": np.zeros(1, np.int64),
    }
    blob["coords"][0, :400, 0] = flat // 1024
    blob["coords"][0, :400, 1] = (flat // 32) % 32
    blob["coords"][0, :400, 2] = flat % 32
    blob["values"][0, :400] = 1.0
    blob["label"][0, :400] = rng.integers(0, 5, 400)
    tv = TrainVal(cfg)
    tv.initialize()
    for _ in range(2):
        m = tv.train_step(blob)
        assert np.isfinite(float(m["loss"])), "spill produced NaN loss"
    # the spill must be COUNTED, not silent (ADVICE r2): dropped tiles and
    # the voxels they carried are surfaced as TrainVal health metrics
    assert int(m["tile_spill"]) > 0, "capacity overflow not counted"
    assert int(m["vox_spill"]) > 0, "spilled voxels not counted"


def test_tile_engine_trains():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg("tile")
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    losses = [float(tv.train_step(blob)["loss"]) for _ in range(12)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_tile_padding_invariance():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg("tile")
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    res1 = tv.forward(blob)
    blob2 = {k: v.copy() for k, v in blob.items()}
    for b in range(2):
        n = int(blob2["n_voxels"][b])
        blob2["values"][b, n:] = 55.0
        blob2["coords"][b, n:] = 3
    res2 = tv.forward(blob2)
    for b in range(2):
        n = int(blob["n_voxels"][b])
        np.testing.assert_allclose(np.asarray(res1["softmax"])[b, :n],
                                   np.asarray(res2["softmax"])[b, :n],
                                   atol=1e-5)
