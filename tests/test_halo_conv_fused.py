"""Fused halo+conv kernel (ops/pallas/halo_conv.py) vs the exact oracle
(halo26_extend_xla + lax.conv), in interpret mode on CPU. Exercises the
Toeplitz weight construction, in-window gathers, the correction path,
2D/3D, the flipped-stencil adjoint identity, and the custom VJP against
autodiff through the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.ops.halo import build_halo26, halo26_extend_xla
from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
    _fused_impl, flip_weights, halo_conv_fwd, toeplitz_weights)
from tests.test_halo26 import _random_level

_CONV_DN = {3: ("NDHWC", "DHWIO", "NDHWC"), 2: ("NHWC", "HWIO", "NHWC")}


def _spec_batched(keys_list, G, dim, **kw):
    keys = jnp.stack(keys_list)
    return keys, jax.vmap(lambda k: build_halo26(k, G, dim, **kw))(keys)


def _oracle(x, spec, t, dim, w):
    """halo-extend (exact XLA) + VALID lax.conv, f32."""
    B, T, cells, Cin = x.shape
    Cout = w.shape[-1]
    ext = halo26_extend_xla(x, spec, t, dim)
    xin = ext.reshape((B * T,) + (t + 2,) * dim + (Cin,))
    kernel = w.reshape((3,) * dim + (Cin, Cout))
    out = jax.lax.conv_general_dilated(
        xin, kernel, window_strides=(1,) * dim, padding="VALID",
        dimension_numbers=_CONV_DN[dim])
    return out.reshape(B, T, t ** dim, Cout)


@pytest.mark.parametrize("dim,G,t,Cin,Cout", [
    (3, 8, 4, 3, 5), (3, 8, 4, 16, 16), (2, 16, 4, 5, 7), (3, 4, 2, 4, 6)])
def test_fused_matches_oracle(dim, G, t, Cin, Cout):
    rng = np.random.default_rng(77)
    B, T = 2, 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    ref = _oracle(x, spec, t, dim, w)
    wt = toeplitz_weights(w, t, dim)
    out = halo_conv_fwd(x, wt, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_correction_path():
    """Tiny window forces out-of-window pairs through the patch rows; the
    conv result must stay exact."""
    rng = np.random.default_rng(5)
    dim, G, t, Cin, Cout, B, T = 3, 8, 4, 3, 4, 1, 64
    keys = [_random_level(rng, G, dim, T, 48)[0]]
    _, spec = _spec_batched(keys, G, dim, block=8, win_mult=1)
    assert int(np.asarray(spec.corr_ok).sum()) > 0
    assert int(np.asarray(spec.overflow).sum()) == 0
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    ref = _oracle(x, spec, t, dim, w)
    wt = toeplitz_weights(w, t, dim)
    out = halo_conv_fwd(x, wt, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_flip_weights_is_adjoint():
    """<conv(x), g> == <x, conv_flip(g)> on the same tile set — the
    identity the fused backward relies on."""
    rng = np.random.default_rng(11)
    dim, G, t, Cin, Cout, B, T = 3, 8, 4, 4, 6, 2, 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cout)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    lhs = jnp.vdot(_oracle(x, spec, t, dim, w), g)
    rhs = jnp.vdot(x, _oracle(g, spec, t, dim, flip_weights(w)))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_vjp_matches_autodiff_through_oracle():
    """d_x and d_w from the fused custom VJP (interpret-mode kernels) match
    autodiff through the XLA oracle."""
    rng = np.random.default_rng(13)
    dim, G, t, Cin, Cout, B, T = 3, 8, 4, 3, 4, 1, 64
    keys = [_random_level(rng, G, dim, T, 40)[0]]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    g = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cout)).astype(np.float32))

    ref_out, ref_vjp = jax.vjp(lambda xx, ww: _oracle(xx, spec, t, dim, ww),
                               x, w)
    ref_dx, ref_dw = ref_vjp(g)

    # fused bwd pieces, run via interpret-mode kernels
    d_x = _fused_impl(g, flip_weights(w), spec, t, dim, interpret=True)
    from uresnet_pytorch_tpu.ops import halo as halo_mod
    old = halo_mod.USE_PALLAS
    halo_mod.USE_PALLAS = False     # _dw_recompute path on CPU
    try:
        from uresnet_pytorch_tpu.ops.pallas.halo_conv import _dw_recompute
        d_w = _dw_recompute(x, g, spec, t, dim)
    finally:
        halo_mod.USE_PALLAS = old
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(ref_dx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(ref_dw),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("dim,G,t,Cin,Cout,B,kw", [
    (3, 8, 4, 3, 4, 1, {}),                               # v1 layout
    (3, 8, 4, 16, 8, 2, {}),                              # v2 layout
    (2, 16, 4, 5, 7, 2, {}),                              # 2D v1
    (3, 8, 4, 16, 8, 2, dict(block=8, win_mult=1)),       # v2 + patches
])
def test_dw_kernel_matches_autodiff(dim, G, t, Cin, Cout, B, kw):
    """The ext-free d_W kernel (`halo_conv_dw` + `toeplitz_adjoint`) matches
    autodiff through the oracle — v1/v2 layouts, 2D, and the correction
    path. This is the training-memory fix: the XLA `_dw_recompute` oracle
    materializes the full halo-extended array in HBM (932 MB/conv at bench
    scale), which capped training at batch 2."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import _dw_impl
    rng = np.random.default_rng(13 + dim + Cin)
    T = 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim, **kw)
    if kw:
        assert int(np.asarray(spec.corr_ok).sum()) > 0
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    g = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cout)).astype(np.float32))
    _, ref_vjp = jax.vjp(lambda xx, ww: _oracle(xx, spec, t, dim, ww), x, w)
    _, ref_dw = ref_vjp(g)
    d_w = _dw_impl(x, g, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(ref_dw),
                               atol=1e-4, rtol=1e-4)


def test_fused_v2_correction_path():
    """v2 layout (C mult of 8: planes-from-flat + slim group-0 pack) with a
    tiny window forcing pairs through the v2 patch rows — exact vs oracle.
    The small-C tests above exercise v1; this pins v2's three-segment
    window layout, plane write plans, and patch arrangement."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import _v2_layout
    rng = np.random.default_rng(23)
    dim, G, t, Cin, Cout, B, T = 3, 8, 4, 16, 8, 2, 64
    assert _v2_layout(t, dim, Cin) is not None
    keys = [_random_level(rng, G, dim, T, 48)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim, block=8, win_mult=1)
    assert int(np.asarray(spec.corr_ok).sum()) > 0
    assert int(np.asarray(spec.overflow).sum()) == 0
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    ref = _oracle(x, spec, t, dim, w)
    wt = toeplitz_weights(w, t, dim)
    out = halo_conv_fwd(x, wt, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
