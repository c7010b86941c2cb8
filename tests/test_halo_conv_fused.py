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
from tests.test_halo26 import _random_level, _zero_dead

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
    keysb, spec = _spec_batched(keys, G, dim, block=8, win_mult=1)
    assert int(np.asarray(spec.corr_ok).sum()) > 0
    assert int(np.asarray(spec.overflow).sum()) == 0
    assert int(np.asarray(spec.blive).min()) == 0   # gating engages
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    x = _zero_dead(x, keysb)
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
    keysb, spec = _spec_batched(keys, G, dim, **kw)
    if kw:
        assert int(np.asarray(spec.corr_ok).sum()) > 0
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cout)).astype(np.float32))
    x, g = _zero_dead(x, keysb), _zero_dead(g, keysb)
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    _, ref_vjp = jax.vjp(lambda xx, ww: _oracle(xx, spec, t, dim, ww), x, w)
    _, ref_dw = ref_vjp(g)
    d_w = _dw_impl(x, g, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(ref_dw),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("Cin,Cout,kw", [
    (16, 16, {}),                                # v2, single chunk
    (8, 32, {}),                                 # v2, Cg=32 asymmetric
    (16, 8, dict(block=8, win_mult=1)),          # v2 + correction path
])
def test_combined_bwd_matches_autodiff(Cin, Cout, kw):
    """The COMBINED backward kernel (`_bwd_impl`: one ext(g) build feeding
    both the flipped-stencil d_x conv and the weight-grad contraction with
    x as cotangent, mapped back through flip_weights) matches autodiff
    through the oracle."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import _bwd_impl
    rng = np.random.default_rng(31 + Cin)
    dim, G, t, B, T = 3, 8, 4, 2, 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    keysb, spec = _spec_batched(keys, G, dim, **kw)
    if kw:
        assert int(np.asarray(spec.corr_ok).sum()) > 0
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cout)).astype(np.float32))
    x, g = _zero_dead(x, keysb), _zero_dead(g, keysb)
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    _, ref_vjp = jax.vjp(lambda xx, ww: _oracle(xx, spec, t, dim, ww), x, w)
    ref_dx, ref_dw = ref_vjp(g)
    d_x, d_w = _bwd_impl(x, w, g, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(ref_dx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(ref_dw),
                               atol=1e-4, rtol=1e-4)


def test_combined_bwd_chunked_matches_unchunked():
    """Force Cg chunking in `_bwd_impl` (tiny scratch budget) and pin
    equality with the unchunked result: per-chunk d_x SUM + dwt row concat
    + flip mapping compose exactly."""
    from uresnet_pytorch_tpu.ops.pallas import halo_conv as hc
    rng = np.random.default_rng(41)
    dim, G, t, Cin, Cout, B, T = 3, 8, 4, 8, 32, 1, 64
    keys = [_random_level(rng, G, dim, T, 40)[0]]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    g = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cout)).astype(np.float32))
    ref_dx, ref_dw = hc._bwd_impl(x, w, g, spec, t, dim, interpret=True)
    old = hc._SCRATCH_BUDGET
    hc._SCRATCH_BUDGET = 1          # max_c floors at 8 -> 4 chunks of 8
    try:
        d_x, d_w = hc._bwd_impl(x, w, g, spec, t, dim, interpret=True)
    finally:
        hc._SCRATCH_BUDGET = old
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(ref_dx),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(ref_dw),
                               atol=1e-5, rtol=1e-5)


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
    keysb, spec = _spec_batched(keys, G, dim, block=8, win_mult=1)
    assert int(np.asarray(spec.corr_ok).sum()) > 0
    assert int(np.asarray(spec.overflow).sum()) == 0
    assert int(np.asarray(spec.blive).min()) == 0   # gating engages
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    x = _zero_dead(x, keysb)
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    ref = _oracle(x, spec, t, dim, w)
    wt = toeplitz_weights(w, t, dim)
    out = halo_conv_fwd(x, wt, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_bn_act_epilogue_matches_composition():
    """fused_halo_conv_bn_act (inference megafusion: conv + folded BNAct
    affine + LeakyReLU + submanifold re-mask in one kernel) vs the unfused
    composition through the exact oracle. v2-layout shapes (t=4, C%8==0 —
    the production case; other shapes return None and callers fall back)."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
        fused_halo_conv_bn_act)
    dim, G, t, Cin, Cout = 3, 8, 4, 16, 16
    alpha = 0.01
    rng = np.random.default_rng(99)
    B, T = 2, 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    a = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32)) * 0.5 + 1.0
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32)) * 0.2
    mask = jnp.asarray(rng.random((B, T, t ** dim)) > 0.3)

    z = _oracle(x, spec, t, dim, w) * a + b
    z = jnp.where(z >= 0, z, alpha * z)
    ref = z * mask[..., None]

    out = fused_halo_conv_bn_act(x, w, a, b, mask, alpha, spec, t, dim,
                                 interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_flat_chained_pair_matches_composition():
    """conv_a (BN fold, flat_out=True) -> conv_b (identity affine + mask,
    flat input) through the interpret-mode kernels vs the composed oracle:
    the flat handoff (raw padded rows, garbage pad lanes) must be
    invisible to the result. This is the eval res-block inner pipeline."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
        fused_halo_conv_bn_act)
    dim, G, t, C = 3, 8, 4, 16
    alpha = 0.01
    rng = np.random.default_rng(7)
    B, T = 2, 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, C)).astype(np.float32))
    w_a = jnp.asarray(
        rng.normal(size=(3 ** dim, C, C)).astype(np.float32)) * 0.3
    w_b = jnp.asarray(
        rng.normal(size=(3 ** dim, C, C)).astype(np.float32)) * 0.3
    a = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.5 + 1.0
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.2
    mask = jnp.asarray(rng.random((B, T, t ** dim)) > 0.3)

    z = _oracle(x, spec, t, dim, w_a) * a + b
    z = jnp.where(z >= 0, z, alpha * z)
    y_ref = z * mask[..., None]
    ref = _oracle(y_ref, spec, t, dim, w_b) * mask[..., None]

    y_flat = fused_halo_conv_bn_act(x, w_a, a, b, mask, alpha, spec, t,
                                    dim, interpret=True, flat_out=True)
    assert y_flat is not None and y_flat.ndim == 3
    ones = jnp.ones((C,), jnp.float32)
    zeros = jnp.zeros((C,), jnp.float32)
    out = fused_halo_conv_bn_act(y_flat, w_b, ones, zeros, mask, 1.0,
                                 spec, t, dim, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_bn_act_model_path_matches_unfused():
    """The tiled model's eval forward with the epilogue fold vs the same
    weights through the train-structured (unfused) composition: force the
    XLA fallback on CPU and pin exact agreement of the block math."""
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.models import construct

    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=3, uresnet_filters=8,
        uresnet_num_strides=2, spatial_size=16, data_dim=3, reps=1,
        max_voxels=256, min_level_capacity=64, batch_size=2,
        compute_dtype="float32")
    B = 2
    coords = np.zeros((B, cfg.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    rng = np.random.default_rng(5)
    for bb in range(B):
        c, v, _ = generate_event(5, bb, 16, 3, 120)
        n = min(len(c), cfg.max_voxels)
        coords[bb, :n], values[bb, :n], nv[bb] = c[:n], v[:n], n
    m = construct("uresnet_sparse")(cfg)
    vr = m.init(jax.random.PRNGKey(0), coords, values, nv, train=False)
    # randomize BN stats/affine so the fold is non-trivial
    import jax.tree_util as jtu
    leaves, treedef = jtu.tree_flatten(vr)
    leaves = [jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) * 0.3
              + (1.0 if l.ndim == 1 else 0.0)
              if l.dtype == jnp.float32 else l for l in leaves]
    vr = jtu.tree_unflatten(treedef, leaves)
    out_eval = np.asarray(m.apply(vr, coords, values, nv, train=False))
    # cross-engine equality of the folded eval path is pinned by
    # tests/test_tile_engine.py::test_engine_equivalence (train=False);
    # here pin finiteness + the blob-row mask invariant
    assert np.isfinite(out_eval).all()
    for bb in range(B):
        assert (out_eval[bb, int(nv[bb]):] == 0).all()


@pytest.mark.parametrize("C,t,dim,dtype", [
    (16, 4, 3, np.float32), (16, 4, 3, "bfloat16"),
    (48, 4, 3, np.float32), (8, 4, 2, np.float32),
    (5, 4, 3, np.float32),   # C not lane-aligned: pad columns exercise -1 idx
])
def test_preslice0_lowerings_agree(monkeypatch, C, t, dim, dtype):
    """The three _preslice0 lowerings (concat / dot / take) must agree
    BITWISE: the TPU default is 'dot' but the CPU suite otherwise always
    resolves to 'concat' (ADVICE r4: the default lowering had no direct
    equivalence test). The dot must be exact for f32 too (ADVICE r4
    medium: default MXU precision rounds f32 operands to bf16; the
    Precision.HIGHEST guard keeps it bit-exact on TPU — on CPU all
    precisions are exact, so this test pins shape/selection correctness
    and the TPU-gated suite pins the on-chip precision contract)."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import _preslice0
    rng = np.random.default_rng(123)
    B, T = 2, 16
    cells = t ** dim
    lanes_p = ((cells * C + 127) // 128) * 128
    x = rng.normal(size=(B, T, lanes_p)).astype(np.float32)
    flat = jnp.asarray(x).astype(dtype)
    outs = {}
    for mode in ("concat", "dot", "take"):
        monkeypatch.setenv("URESNET_PRESLICE", mode)
        outs[mode] = np.asarray(_preslice0(flat, C, t, dim))
    assert outs["concat"].shape == outs["dot"].shape == outs["take"].shape
    np.testing.assert_array_equal(outs["dot"], outs["concat"])
    np.testing.assert_array_equal(outs["take"], outs["concat"])


def test_block_liveness_gating_exact():
    """Per-block liveness gating (Halo26Spec.blive): blocks beyond the
    sorted live-tile prefix skip the ext build + conv dots and write
    zeros. With the production invariant (dead rows all-zero), the gated
    kernel must equal the oracle everywhere AND emit exact zeros on dead
    blocks — the mechanism that makes static tile capacity nearly free in
    issued MACs (VERDICT r4: deep levels run 2-3x more capacity than
    occupied tiles)."""
    rng = np.random.default_rng(57)
    dim, G, t, Cin, Cout, B, T, live = 3, 8, 4, 16, 8, 2, 128, 40
    keys = [_random_level(rng, G, dim, T, live)[0] for _ in range(B)]
    keysb, spec = _spec_batched(keys, G, dim, block=16)
    bl = np.asarray(spec.blive)
    nb = bl.shape[1]
    Bk = T // nb
    # blive is exactly the live-prefix block mask
    expect = (np.arange(nb) * Bk < live).astype(np.int32)
    np.testing.assert_array_equal(bl, np.tile(expect, (B, 1)))
    assert bl.min() == 0 and bl.max() == 1     # gating actually engages
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    x = _zero_dead(x, keysb)
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    ref = _oracle(x, spec, t, dim, w)
    wt = toeplitz_weights(w, t, dim)
    out = np.asarray(halo_conv_fwd(x, wt, spec, t, dim, interpret=True))
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4, rtol=1e-4)
    # dead blocks: bitwise zero (written by the gate's else-branch)
    dead0 = (np.ceil(live / Bk).astype(int)) * Bk
    assert (out[:, dead0:] == 0).all()


@pytest.mark.parametrize("C,live", [(16, 40), (48, 40), (16, 128)])
def test_preslice0_pallas_matches_concat(C, live):
    """The gated Pallas repack (`_preslice0_pallas` — the TPU xs0/gs0
    path) matches the XLA concat lowering bitwise on live rows and emits
    exact zeros on dead blocks."""
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
        _preslice0, _preslice0_pallas, _round_up)
    rng = np.random.default_rng(61)
    dim, G, t, B, T = 3, 8, 4, 2, 128
    keys = [_random_level(rng, G, dim, T, live)[0] for _ in range(B)]
    keysb, spec = _spec_batched(keys, G, dim, block=16)
    cells = t ** dim
    lanes_p = _round_up(cells * C, 128)
    x = rng.normal(size=(B, T, lanes_p)).astype(np.float32)
    flat = _zero_dead(jnp.asarray(x), keysb)
    out = np.asarray(_preslice0_pallas(flat, C, t, dim, spec,
                                       interpret=True))
    ref = np.asarray(_preslice0(flat, C, t, dim))
    np.testing.assert_array_equal(out, ref)
    bl = np.asarray(spec.blive)
    if bl.min() == 0:
        Bk = T // bl.shape[1]
        dead0 = int(np.ceil(live / Bk)) * Bk
        assert (out[:, dead0:] == 0).all()
