"""TPU-only correctness tests (VERDICT r1 #6): the CPU suite validates the
Pallas kernels in interpret mode only; these run the COMPILED kernels on the
real chip at production-like shapes and compare against the exact XLA
reference. Auto-skipped unless jax runs on TPU.

Run before benching:
    URESNET_TPU_TESTS=1 python -m pytest tests/test_tpu_gated.py -q
(URESNET_TPU_TESTS=1 stops conftest.py pinning the suite to CPU)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    pytest.skip("CPU run requested", allow_module_level=True)
try:
    _ON_TPU = jax.default_backend() == "tpu"
except Exception:
    _ON_TPU = False
if not _ON_TPU:
    pytest.skip("needs a TPU backend", allow_module_level=True)

import jax.numpy as jnp


def _zero_dead_rows(arr, keys):
    """Zero rows at sentinel (dead) tile keys — the production invariant
    (scatter-built feats + re-masking) that block-liveness gating
    (Halo26Spec.blive) relies on; oracle comparisons must not feed random
    values into rows the model guarantees are zero."""
    from uresnet_pytorch_tpu.ops.coords import SENTINEL
    live = (np.asarray(keys) != SENTINEL)
    return arr * jnp.asarray(live)[(...,) + (None,) * (arr.ndim - 2)].astype(
        arr.dtype)


def _level_from_event(spatial, t, n_vox, seed=0):
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.ops.tile_graph import build_tile_graph
    cfg = URESNetConfig(
        model_name="uresnet_sparse", spatial_size=spatial,
        uresnet_num_strides=2, max_voxels=max(256, 1 << int(
            np.ceil(np.log2(n_vox * 1.3)))),
        batch_size=2, compute_dtype="bfloat16")
    B = 2
    coords = np.zeros((B, cfg.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, _ = generate_event(seed, b, spatial, 3, int(n_vox * 1.5))
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n
    graph = jax.jit(lambda c, v, n: build_tile_graph(c, v, n, cfg))(
        coords, values, nv)
    return graph.levels[0], cfg


def test_halo_kernel_matches_xla_on_chip():
    """Compiled halo26 forward+backward vs the exact XLA reference at a
    mid-production shape (128^3, ~12k voxels).

    Inputs are bf16 — the production activation dtype — and the comparison
    is EXACT: one-hot row movement of bf16 values through the MXU is
    bit-preserving. (With f32 inputs the MXU's bf16-pass dots round each
    gathered value to bf16, ~0.4% rel — measured, documented in
    ops/pallas/halo_fused.py; the model never feeds the kernel f32.)"""
    from uresnet_pytorch_tpu.ops.halo import (
        halo26_extend_xla, halo26_transpose_xla)
    from uresnet_pytorch_tpu.ops.pallas.halo_fused import (
        halo26_bwd, halo26_fwd)
    lev, cfg = _level_from_event(128, 4, 12000)
    spec = lev.halo
    T = lev.keys.shape[1]
    rng = np.random.default_rng(0)
    C = 16
    x = jnp.asarray(rng.normal(size=(2, T, 64, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    x = _zero_dead_rows(x, lev.keys)
    ref = np.asarray(jax.jit(
        lambda a: halo26_extend_xla(a, spec, 4, 3))(x).astype(jnp.float32))
    out = np.asarray(jax.jit(
        lambda a: halo26_fwd(a, spec, 4, 3))(x).astype(jnp.float32))
    np.testing.assert_array_equal(out, ref)
    g = jnp.asarray(rng.normal(size=(2, T, 216, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = _zero_dead_rows(g, lev.keys)
    refb = np.asarray(jax.jit(
        lambda a: halo26_transpose_xla(a, spec, 4, 3))(g).astype(jnp.float32))
    outb = np.asarray(jax.jit(
        lambda a: halo26_bwd(a, spec, 4, 3))(g).astype(jnp.float32))
    # backward ACCUMULATES (sums across offsets) — bf16 sums round; compare
    # to the reference computed in the same dtype with bf16-level tolerance
    np.testing.assert_allclose(outb, refb, rtol=2e-2, atol=1e-2)
    assert int(np.asarray(spec.overflow).sum()) == 0


def test_engine_equivalence_on_chip():
    """Tile engine (compiled Pallas path) vs row-gather oracle, on-chip."""
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.models import construct
    cfg_g = URESNetConfig(
        model_name="uresnet_sparse", sparse_engine="gather", num_class=5,
        uresnet_filters=8, uresnet_num_strides=3, spatial_size=64,
        data_dim=3, reps=1, max_voxels=4096, min_level_capacity=128,
        batch_size=2, compute_dtype="bfloat16")
    cfg_t = cfg_g.replace(sparse_engine="tile")
    B = 2
    coords = np.zeros((B, cfg_g.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg_g.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, _ = generate_event(3, b, 64, 3, 3000)
        n = min(len(c), cfg_g.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n
    args = (jnp.asarray(coords), jnp.asarray(values), jnp.asarray(nv))
    mg = construct("uresnet_sparse")(cfg_g)
    mt = construct("uresnet_sparse")(cfg_t)
    vg = jax.jit(mg.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), *args, train=False)
    out_g = np.asarray(jax.jit(mg.apply, static_argnames=("train",))(
        vg, *args, train=False))
    out_t = np.asarray(jax.jit(mt.apply, static_argnames=("train",))(
        vg, *args, train=False))
    # both engines run bf16 on-chip but with different op orders, so a few
    # per-voxel logits accumulate visibly different rounding; the [T]
    # north-star criterion is per-voxel CLASS parity — check bulk closeness
    # (99.9th percentile) + argmax agreement
    agree = total = 0
    for b in range(B):
        n = int(nv[b])
        diff = np.abs(out_t[b, :n] - out_g[b, :n])
        scale = np.maximum(np.abs(out_g[b, :n]), 1.0)
        rel = diff / scale
        assert np.quantile(rel, 0.99) < 5e-2, \
            f"bulk logit divergence p99={np.quantile(rel, 0.99)}"
        assert np.quantile(rel, 0.999) < 0.15, \
            f"tail logit divergence p999={np.quantile(rel, 0.999)}"
        assert diff.max() < 0.5, f"outlier logit diff {diff.max()}"
        agree += (out_t[b, :n].argmax(-1) == out_g[b, :n].argmax(-1)).sum()
        total += n
    assert agree / total > 0.995, f"class agreement {agree / total:.4f}"


def test_fused_halo_conv_matches_oracle_on_chip():
    """Compiled fused halo+conv kernel (ops/pallas/halo_conv.py) vs the
    exact XLA oracle (halo26_extend_xla + lax.conv) at a mid-production
    shape, bf16. The fused kernel's in-kernel Toeplitz dots accumulate in
    f32 on the MXU like XLA's conv emitter but in a different order, so
    agreement is to bf16 rounding, not bitwise. Also pins the adjoint
    path (d_x = same kernel, flipped stencil)."""
    from uresnet_pytorch_tpu.ops.halo import halo26_extend_xla
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
        flip_weights, fused_halo_conv)
    lev, cfg = _level_from_event(128, 4, 12000)
    spec = lev.halo
    T = lev.keys.shape[1]
    rng = np.random.default_rng(7)
    Cin, Cout = 16, 32
    x = jnp.asarray(rng.normal(size=(2, T, 64, Cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    x = _zero_dead_rows(x, lev.keys)
    w = jnp.asarray((rng.normal(size=(27, Cin, Cout)) * 0.2
                     ).astype(np.float32))

    def oracle(a, ww):
        ext = halo26_extend_xla(a, spec, 4, 3)
        xin = ext.reshape((-1, 6, 6, 6, ww.shape[1]))
        kernel = ww.reshape(3, 3, 3, ww.shape[1], ww.shape[2]).astype(a.dtype)
        out = jax.lax.conv_general_dilated(
            xin, kernel, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out.reshape(a.shape[0], T, 64, ww.shape[2])

    ref = np.asarray(jax.jit(oracle)(x, w).astype(jnp.float32))
    out = np.asarray(jax.jit(
        lambda a, ww: fused_halo_conv(a, ww, spec, 4, 3))(x, w)
        .astype(jnp.float32))
    scale = np.maximum(np.abs(ref), 0.5)
    assert (np.abs(out - ref) / scale).max() < 3e-2, \
        f"fwd divergence {(np.abs(out - ref) / scale).max()}"

    # adjoint data path on-chip: flipped stencil through the same kernel
    g = jnp.asarray(rng.normal(size=(2, T, 64, Cout)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = _zero_dead_rows(g, lev.keys)
    ref_dx = np.asarray(jax.jit(
        lambda a, ww: oracle(a, flip_weights(ww)))(g, w)
        .astype(jnp.float32))
    out_dx = np.asarray(jax.jit(
        lambda a, ww: fused_halo_conv(a, flip_weights(ww), spec, 4, 3))(g, w)
        .astype(jnp.float32))
    scale = np.maximum(np.abs(ref_dx), 0.5)
    assert (np.abs(out_dx - ref_dx) / scale).max() < 3e-2
    assert int(np.asarray(spec.overflow).sum()) == 0


def test_dw_kernel_matches_oracle_on_chip():
    """Compiled ext-free d_W kernel (halo_conv_dw + toeplitz_adjoint) vs
    autodiff through the XLA oracle at a mid-production shape, bf16 — the
    kernel that removed the 932 MB/conv backward HBM materialization and
    unlocked training batch > 2."""
    from uresnet_pytorch_tpu.ops.halo import halo26_extend_xla
    from uresnet_pytorch_tpu.ops.pallas.halo_conv import _dw_impl
    lev, cfg = _level_from_event(128, 4, 12000)
    spec = lev.halo
    T = lev.keys.shape[1]
    rng = np.random.default_rng(17)
    Cin, Cout = 16, 32
    x = jnp.asarray(rng.normal(size=(2, T, 64, Cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    x = _zero_dead_rows(x, lev.keys)
    w = jnp.asarray((rng.normal(size=(27, Cin, Cout)) * 0.2
                     ).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, T, 64, Cout)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = _zero_dead_rows(g, lev.keys)

    def oracle(a, ww):
        ext = halo26_extend_xla(a, spec, 4, 3)
        xin = ext.reshape((-1, 6, 6, 6, ww.shape[1]))
        kernel = ww.reshape(3, 3, 3, ww.shape[1], ww.shape[2]).astype(a.dtype)
        out = jax.lax.conv_general_dilated(
            xin, kernel, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out.reshape(a.shape[0], T, 64, ww.shape[2])

    def ref_dw(a, ww, gg):
        # cotangent dtype must match the oracle's (bf16) output dtype
        _, vjp = jax.vjp(lambda w_: oracle(a, w_), ww)
        return vjp(gg.astype(a.dtype))[0]

    ref = np.asarray(jax.jit(ref_dw)(x, w, g))
    out = np.asarray(jax.jit(
        lambda a, gg: _dw_impl(a, gg, spec, 4, 3))(x, g))
    # Exact MATH is pinned by the f32 interpret-mode tests
    # (test_halo_conv_fused.py::test_dw_kernel_matches_autodiff); this
    # pins the COMPILED bf16 lowering at rounding level. A per-entry
    # relative criterion is unsound here: entries are ~470k-term reductions
    # of random-sign bf16 products, so near-cancelling entries carry an
    # absolute rounding error on the order of any small-value floor.
    # Measured on-chip: fro_rel 0.0016, max_abs/absmax 0.0018 (both pure
    # rounding — the same kernel is exact to 1e-4 in f32 interpret mode).
    fro_rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert fro_rel < 1e-2, f"d_w fro divergence {fro_rel}"
    assert np.abs(out - ref).max() < 1e-2 * np.abs(ref).max()


def test_f32_engine_exactness_on_chip():
    """Both engines in f32 on-chip: per-voxel argmax agreement must be
    100% and logits tight (~1e-4) — proving the documented ~0.5% bf16
    cross-engine disagreement budget is ROUNDING, not a latent engine bug
    ([T] 'bit-for-class'; VERDICT r2 weak #3). With f32, auto-dispatch
    routes both engines through the exact XLA paths.

    Matmul precision is forced to `highest` (3-pass f32 on the MXU):
    the TPU DEFAULT evaluates f32 matmuls/convs in single bf16 passes,
    so without it the two engines' different contraction formulations
    (lax.conv vs gather-einsum) truncate differently and diverge at
    bf16 magnitude even with f32 dtypes — measured max_abs 0.36 /
    99.5% argmax at default vs 1.1e-5 / 100% at highest."""
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.models import construct
    cfg_g = URESNetConfig(
        model_name="uresnet_sparse", sparse_engine="gather", num_class=5,
        uresnet_filters=8, uresnet_num_strides=3, spatial_size=64,
        data_dim=3, reps=1, max_voxels=4096, min_level_capacity=128,
        batch_size=2, compute_dtype="float32")
    cfg_t = cfg_g.replace(sparse_engine="tile")
    B = 2
    coords = np.zeros((B, cfg_g.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg_g.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, _ = generate_event(3, b, 64, 3, 3000)
        n = min(len(c), cfg_g.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n
    args = (jnp.asarray(coords), jnp.asarray(values), jnp.asarray(nv))
    mg = construct("uresnet_sparse")(cfg_g)
    mt = construct("uresnet_sparse")(cfg_t)
    with jax.default_matmul_precision("highest"):
        vg = jax.jit(mg.init, static_argnames=("train",))(
            jax.random.PRNGKey(1), *args, train=False)
        out_g = np.asarray(jax.jit(mg.apply, static_argnames=("train",))(
            vg, *args, train=False))
        out_t = np.asarray(jax.jit(mt.apply, static_argnames=("train",))(
            vg, *args, train=False))
    for b in range(B):
        n = int(nv[b])
        np.testing.assert_allclose(out_t[b, :n], out_g[b, :n],
                                   rtol=1e-4, atol=1e-4)
        agree = (out_t[b, :n].argmax(-1) == out_g[b, :n].argmax(-1)).mean()
        assert agree == 1.0, f"f32 class agreement {agree:.6f} != 1.0"


def test_graph_build_zero_drops_at_bench_scale():
    """Regression: the rank-windowed monotone lookups in the graph build
    are exact-with-budget; at bench scale (512^3, ~1e5 voxels, batch 8)
    the budgets must never be exceeded. The r3 scatter-free lookup first
    shipped with a shared 2048-entry correction budget across all 8 corner
    rows of _down_link, which silently dropped up to 898 link pairs/event
    at this scale (caught by the post-training overflow sweep, not by the
    small-shape suites — hence this test)."""
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.ops.tile_graph import (
        build_tile_graph, graph_overflows, graph_spills)

    B, VOX = 8, 100_000
    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=16,
        uresnet_num_strides=5, spatial_size=512, data_dim=3, reps=2,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(VOX * 1.3)))),
        capacity_factor=0.5, min_level_capacity=2048,
        batch_size=B, compute_dtype="bfloat16")
    coords = np.zeros((B, cfg.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, _ = generate_event(0, b, 512, 3, int(VOX * 1.5))
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n
    g = jax.jit(lambda c, v, n: build_tile_graph(c, v, n, cfg))(
        coords, values, nv)
    assert int(graph_overflows(g)) == 0
    assert int(graph_spills(g)) == 0
    for li, link in enumerate(g.links):
        assert int(np.asarray(link.overflow).sum()) == 0, f"link {li}"
