"""Pallas fused-halo kernel (ops/pallas/halo_fused.py) vs the exact XLA
reference, in interpret mode on CPU. Exercises: in-window gathers, the
correction path (scattered tiles force out-of-window pairs), C chunking,
2D/3D, and the backward (transpose) kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.ops import halo as halo_mod
from uresnet_pytorch_tpu.ops.halo import (
    build_halo26, halo26_extend_xla, halo26_transpose_xla)
from uresnet_pytorch_tpu.ops.pallas.halo_fused import halo26_bwd, halo26_fwd
from tests.test_halo26 import _random_level, _zero_dead


def _spec_batched(keys_list, G, dim, **kw):
    keys = jnp.stack(keys_list)
    return keys, jax.vmap(lambda k: build_halo26(k, G, dim, **kw))(keys)


@pytest.mark.parametrize("dim,G,t,C", [(3, 8, 4, 3), (3, 8, 4, 16),
                                       (2, 16, 4, 5), (3, 4, 2, 4)])
def test_fwd_kernel_matches_xla(dim, G, t, C):
    rng = np.random.default_rng(21)
    B, T = 2, 64
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    _, spec = _spec_batched(keys, G, dim)
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, C)).astype(np.float32))
    ref = halo26_extend_xla(x, spec, t, dim)
    out = halo26_fwd(x, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fwd_kernel_correction_path():
    """Tiny window + zero-ish win_mult forces out-of-window pairs through
    the correction list — the result must stay exact."""
    rng = np.random.default_rng(5)
    dim, G, t, C, B, T = 3, 8, 4, 3, 1, 64
    keys = [_random_level(rng, G, dim, T, 48)[0]]
    keysb, spec = _spec_batched(keys, G, dim, block=8, win_mult=1)
    # confirm the scenario actually exercises corrections
    assert int(np.asarray(spec.corr_ok).sum()) > 0
    assert int(np.asarray(spec.overflow).sum()) == 0
    x = jnp.asarray(rng.normal(size=(B, T, t ** dim, C)).astype(np.float32))
    x = _zero_dead(x, keysb)
    ref = halo26_extend_xla(x, spec, t, dim)
    out = halo26_fwd(x, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("block,win_mult", [(None, None), (8, 1)])
def test_bwd_kernel_matches_xla(block, win_mult):
    rng = np.random.default_rng(31)
    dim, G, t, C, B, T = 3, 8, 4, 3, 2, 64
    kw = {}
    if block:
        kw = dict(block=block, win_mult=win_mult)
    keys = [_random_level(rng, G, dim, T, 40)[0] for _ in range(B)]
    keysb, spec = _spec_batched(keys, G, dim, **kw)
    g = jnp.asarray(
        rng.normal(size=(B, T, (t + 2) ** dim, C)).astype(np.float32))
    g = _zero_dead(g, keysb)
    ref = halo26_transpose_xla(g, spec, t, dim)
    out = halo26_bwd(g, spec, t, dim, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
