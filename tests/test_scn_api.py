"""SCN-style layer API (uresnet_pytorch_tpu/scn.py): dense-equivalence
oracles on fully-active grids (the SCN upstream test pattern, SURVEY.md §4)
and sparse structural properties."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu import scn


def _full_grid_blob(S, dim, C_vals=None, seed=0):
    """Fully-active S^dim grid as a blob (1 event)."""
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(*([np.arange(S)] * dim), indexing="ij"),
                 -1).reshape(-1, dim).astype(np.int32)
    n = len(g)
    values = rng.normal(size=n).astype(np.float32)
    return g[None], values[None], np.array([n], np.int32)


def test_submanifold_conv_matches_dense_2d():
    S, dim = 8, 2
    coords, values, n = _full_grid_blob(S, dim)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, coords, values, n):
            st, roi = scn.InputLayer(dim, S)(coords, values, n)
            st = scn.SubmanifoldConvolution(dim, 4)(st)
            return scn.OutputLayer(dim)(st, roi)

    net = Net()
    v = net.init(jax.random.PRNGKey(0), coords, values, n)
    out = net.apply(v, coords, values, n)                # (1, S*S, 4)
    w = np.asarray(
        v["params"]["SubmanifoldConvolution_0"]["w"])    # (9, 1, 4)
    dense_in = np.asarray(values).reshape(1, S, S, 1)
    dense = jax.lax.conv_general_dilated(
        jnp.asarray(dense_in), jnp.asarray(w.reshape(3, 3, 1, 4)),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # blob rows are raster order (meshgrid ij) -> same layout as dense
    np.testing.assert_allclose(np.asarray(out).reshape(S, S, 4),
                               np.asarray(dense)[0], atol=1e-4)


@pytest.mark.parametrize("pool,reducer", [
    ("max", lambda v: v.max(axis=(1, 3))),
    ("avg", lambda v: v.mean(axis=(1, 3)))])
def test_pooling_matches_dense_2d(pool, reducer):
    import flax.linen as nn
    S, dim = 8, 2
    coords, values, n = _full_grid_blob(S, dim)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, coords, values, n):
            st, roi = scn.InputLayer(dim, S)(coords, values, n)
            if pool == "max":
                stc, link = scn.MaxPooling(dim)(st)
            else:
                stc, link = scn.AveragePooling(dim)(st)  # volume mode
            return stc, link

    net = Net()
    v = net.init(jax.random.PRNGKey(0), coords, values, n)
    (stc, link) = net.apply(v, coords, values, n)
    # coarse keys are sorted raster order of the S/2 grid on a full grid
    vol = np.asarray(values).reshape(S // 2, 2, S // 2, 2)
    expect = reducer(vol).reshape(-1)
    got = np.asarray(stc.features)[0, :stc.num[0], 0]
    np.testing.assert_allclose(got, expect, atol=1e-5)
    assert int(stc.num[0]) == (S // 2) ** 2


def test_unpooling_roundtrip_and_residual_tables():
    import flax.linen as nn
    S, dim = 8, 3
    rng = np.random.default_rng(4)
    # sparse event: random subset
    g = np.stack(np.meshgrid(*([np.arange(S)] * dim), indexing="ij"),
                 -1).reshape(-1, dim)
    sel = rng.choice(len(g), 100, replace=False)
    coords = g[sel][None].astype(np.int32)
    values = rng.normal(size=100).astype(np.float32)[None]
    n = np.array([100], np.int32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, coords, values, n):
            st, roi = scn.InputLayer(dim, S)(coords, values, n)
            st = scn.SubmanifoldConvolution(dim, 3)(st)
            keep = st
            stc, link = scn.MaxPooling(dim)(st)
            stu = scn.UnPooling(dim)(stc, link)
            # site sets restored exactly -> tables align
            st2 = scn.add_table(scn.join_table(stu, keep),
                                scn.join_table(keep, stu))
            return st2, keep

    net = Net()
    v = net.init(jax.random.PRNGKey(1), coords, values, n)
    (st2, keep) = net.apply(v, coords, values, n)
    assert st2.features.shape[-1] == 6
    np.testing.assert_array_equal(np.asarray(st2.keys),
                                  np.asarray(keep.keys))
    # unpooled value at each active site equals its cell's max
    assert np.isfinite(np.asarray(st2.features)).all()


def test_conv_deconv_restores_sites_3d():
    import flax.linen as nn
    S, dim = 8, 3
    rng = np.random.default_rng(9)
    g = np.stack(np.meshgrid(*([np.arange(S)] * dim), indexing="ij"),
                 -1).reshape(-1, dim)
    sel = rng.choice(len(g), 60, replace=False)
    coords = g[sel][None].astype(np.int32)
    values = rng.normal(size=60).astype(np.float32)[None]
    n = np.array([60], np.int32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, coords, values, n):
            st, roi = scn.InputLayer(dim, S)(coords, values, n)
            st = scn.SubmanifoldConvolution(dim, 2)(st)
            stc, link = scn.Convolution(dim, 4)(st)
            stf = scn.Deconvolution(dim, 2)(stc, link)
            stf = scn.BatchNormLeakyReLU(leakiness=0.1)(stf, train=False)
            return st, stc, stf

    net = Net()
    v = net.init(jax.random.PRNGKey(2), coords, values, n)
    st, stc, stf = net.apply(v, coords, values, n)
    np.testing.assert_array_equal(np.asarray(stf.keys), np.asarray(st.keys))
    assert int(stc.num[0]) <= int(st.num[0])
    assert stf.spatial_size == S and stc.spatial_size == S // 2


def test_full_convolution_activates_children_2d():
    """FullConvolution stride-2: every child of an active coarse site is
    active; dense oracle = stride-2 transposed conv on the dense grid."""
    S, dim = 4, 2
    coords, values, n = _full_grid_blob(S, dim, seed=3)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, coords, values, n):
            st, _ = scn.InputLayer(dim, S)(coords, values, n)
            st = scn.FullConvolution(dim, 3)(st)
            return scn.SparseToDense(dim)(st)

    net = Net()
    v = net.init(jax.random.PRNGKey(1), coords, values, n)
    out = np.asarray(net.apply(v, coords, values, n))    # (1, 2S, 2S, 3)
    assert out.shape == (1, 2 * S, 2 * S, 3)
    w = np.asarray(v["params"]["FullConvolution_0"]["w"])  # (4, 1, 3)
    dense_in = np.zeros((S, S))
    cds, vals = np.asarray(coords[0]), np.asarray(values[0])
    dense_in[cds[:, 0], cds[:, 1]] = vals
    ref = np.zeros((2 * S, 2 * S, 3))
    for o in range(4):
        bo = ((o >> 1) & 1, o & 1)
        ref[bo[0]::2, bo[1]::2, :] += dense_in[..., None] * w[o, 0]
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_sparse_to_dense_3d():
    S, dim = 4, 3
    coords, values, n = _full_grid_blob(S, dim, seed=5)
    # drop half the sites to make it genuinely sparse
    keep = np.arange(0, S ** dim, 2)
    coords = coords[:, keep]
    values = values[:, keep]
    n = np.array([len(keep)], np.int32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, coords, values, n):
            st, _ = scn.InputLayer(dim, S)(coords, values, n)
            return scn.SparseToDense(dim)(st)

    net = Net()
    v = net.init(jax.random.PRNGKey(0), coords, values, n)
    out = np.asarray(net.apply(v, coords, values, n))
    ref = np.zeros((S, S, S, 1))
    cds, vals = np.asarray(coords[0]), np.asarray(values[0])
    ref[cds[:, 0], cds[:, 1], cds[:, 2], 0] = vals
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


def test_bl_input_layer_multichannel_merge():
    """BLInputLayer merges duplicate coordinates per channel (sum mode)."""
    dim, S = 2, 8
    coords = np.array([[[1, 1], [2, 3], [1, 1], [4, 4]]], np.int32)
    feats = np.array([[[1., 10.], [2., 20.], [3., 30.], [4., 40.]]],
                     np.float32)
    n = np.array([4], np.int32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, c, f, n):
            st, roi = scn.BLInputLayer(dim, S)(c, f, n)
            return scn.OutputLayer(dim)(st, roi)

    net = Net()
    v = net.init(jax.random.PRNGKey(0), coords, feats, n)
    out = np.asarray(net.apply(v, coords, feats, n))     # (1, 4, 2)
    # rows 0 and 2 share (1,1): both report the merged sum (4, 40)
    np.testing.assert_allclose(out[0, 0], [4., 40.], atol=1e-6)
    np.testing.assert_allclose(out[0, 2], [4., 40.], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [2., 20.], atol=1e-6)


def test_fcn_shapes_and_submanifold_invariant():
    """FCN helper: output joins every level's planes at full resolution;
    inactive sites stay exactly zero."""
    S, dim = 8, 2
    rng = np.random.default_rng(9)
    pts = rng.choice(S * S, size=20, replace=False)
    coords = np.stack([pts // S, pts % S], -1).astype(np.int32)[None]
    values = rng.normal(size=20).astype(np.float32)[None]
    n = np.array([20], np.int32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, c, v, nn_):
            st, roi = scn.InputLayer(dim, S)(c, v, nn_)
            st = scn.FullyConvolutionalNet(dim, reps=1, nPlanes=(4, 8))(st)
            return scn.OutputLayer(dim)(st, roi)

    net = Net()
    v = net.init(jax.random.PRNGKey(2), coords, values, n)
    out = np.asarray(net.apply(v, coords, values, n))
    assert out.shape == (1, coords.shape[1], 12)   # 4 + 8 joined
    assert np.isfinite(out).all()
