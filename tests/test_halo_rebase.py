"""Per-offset sub-window rebasing (ops/halo.py HALO_REBASE): the conv
kernels' one-hot gathers contract over a narrow rebased slice of the group
window. These tests force NONZERO rebase (big T, grouped windows with
spread) and pin kernel-vs-oracle equality plus the spec invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.ops import halo as halo_mod
from uresnet_pytorch_tpu.ops.halo import build_halo26
from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
    halo_conv_fwd, toeplitz_weights)
from tests.test_halo26 import _random_level, _zero_dead
from tests.test_halo_conv_fused import _oracle, _spec_batched


def _big_level(rng, G, dim, T, density):
    """A level whose tile keys span enough rank that the grouped window
    start spread is nonzero (rebase actually engages)."""
    keys, _ = _random_level(rng, G, dim, T, density)
    return keys


def test_rebase_engages_and_spec_invariants():
    rng = np.random.default_rng(11)
    dim, G, T = 3, 16, 512
    keys = jnp.asarray(_big_level(rng, G, dim, T, 400))
    spec = build_halo26(keys, G, dim, block=64)
    win = spec.window.shape[-1]
    wo = spec.subwin.shape[-1]
    assert wo <= win
    rb = np.asarray(spec.rebase)
    assert rb.min() >= 0 and (rb % 8 == 0).all()
    assert (rb <= win - wo).all()
    if not halo_mod.HALO_GROUP or not halo_mod.HALO_REBASE:
        pytest.skip("rebasing off via env")
    # grouped default (win_mult 3 > per-offset 2) must actually narrow
    assert wo < win
    # the whole point: group spread exists somewhere -> nonzero rebase
    assert rb.max() > 0
    # in-band pairs lie inside the rebased sub-window
    K = rb.shape[0]
    Bk = T // rb.shape[1]
    local = np.asarray(spec.idx) - np.repeat(np.asarray(spec.starts), Bk,
                                             axis=1)
    rbr = np.repeat(rb, Bk, axis=1)
    ib = np.asarray(spec.inband)
    assert (local[ib] >= rbr[ib]).all()
    assert (local[ib] < rbr[ib] + wo).all()
    # every valid pair is in-band or on the correction list (none lost)
    n_corr = int(np.asarray(spec.corr_ok).sum())
    n_out = int((np.asarray(spec.ok) & ~ib).sum())
    assert n_corr + int(np.asarray(spec.overflow)) >= n_out


@pytest.mark.parametrize("Cin,Cout", [(3, 5), (16, 16)])
def test_rebased_kernel_matches_oracle(Cin, Cout):
    """Kernel with engaged rebasing == exact oracle (interpret mode)."""
    rng = np.random.default_rng(23)
    dim, G, t, B, T = 3, 16, 4, 1, 512
    keys = [_big_level(rng, G, dim, T, 400)]
    keysb, spec = _spec_batched(keys, G, dim, block=64)
    assert np.asarray(spec.rebase).max() > 0, "fixture must engage rebase"
    x = jnp.asarray(
        rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    x = _zero_dead(x, keysb)
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    ref = _oracle(x, spec, t, dim, w)
    wt = toeplitz_weights(w, t, dim)
    out = halo_conv_fwd(x, wt, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_rebase_off_matches_on(monkeypatch):
    """HALO_REBASE=0 (wo=win, rb=0) and rebasing-on produce identical conv
    results — rebasing is an execution strategy, not a semantic change."""
    rng = np.random.default_rng(31)
    dim, G, t, B, T, Cin, Cout = 3, 16, 4, 1, 512, 4, 6
    keys = [_big_level(rng, G, dim, T, 400)]
    x = jnp.asarray(
        rng.normal(size=(B, T, t ** dim, Cin)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(3 ** dim, Cin, Cout)).astype(np.float32)) * 0.3
    wt = toeplitz_weights(w, t, dim)

    _, spec_on = _spec_batched(keys, G, dim, block=64)
    out_on = halo_conv_fwd(x, wt, spec_on, t, dim, interpret=True)

    monkeypatch.setattr(halo_mod, "HALO_REBASE", 0)
    _, spec_off = _spec_batched(keys, G, dim, block=64)
    assert np.asarray(spec_off.rebase).max() == 0
    out_off = halo_conv_fwd(x, wt, spec_off, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               atol=1e-5, rtol=1e-5)
