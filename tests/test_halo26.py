"""Direct 26-neighbor halo (ops/halo.py): dense-volume oracle, adjoint
identity, and custom-VJP-vs-autodiff. The Pallas kernel is validated against
halo26_extend_xla separately (tests/test_halo_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.ops.coords import SENTINEL, encode
from uresnet_pytorch_tpu.ops.halo import (
    Halo26Spec, body_cells, build_halo26, halo26_extend, halo26_extend_xla,
    halo26_transpose_xla, halo_offsets, slab_cells)


def _random_level(rng, G, dim, T, n_active):
    """Sorted sentinel-padded tile keys for n_active distinct tiles."""
    flat = rng.choice(G ** dim, size=n_active, replace=False)
    coords = np.zeros((n_active, dim), np.int64)
    f = flat.copy()
    for d in reversed(range(dim)):
        coords[:, d] = f % G
        f //= G
    keys = np.asarray(encode(jnp.asarray(coords, jnp.int32),
                             jnp.ones(n_active, bool), G))
    keys = np.sort(keys)
    out = np.full(T, SENTINEL, np.int32)
    out[:n_active] = keys
    return jnp.asarray(out), coords[np.argsort(
        np.asarray(encode(jnp.asarray(coords, jnp.int32),
                          jnp.ones(n_active, bool), G)))]


def _zero_dead(arr, keys):
    """Zero rows at sentinel (dead) tile keys — the production invariant
    (scatter-built feats + downstream re-masking keep dead rows all-zero)
    that the liveness-gated kernels rely on: fully-dead tile blocks skip
    compute and write zeros, so oracle comparisons must not feed random
    values into rows the model guarantees are zero."""
    live = jnp.asarray(np.asarray(keys) != SENTINEL)
    return arr * live[(...,) + (None,) * (arr.ndim - live.ndim)].astype(
        arr.dtype)


def _dense_oracle(keys, x, G, t, dim):
    """Place tiles into a dense volume, read back each tile's halo-extended
    block — the ground truth for any halo implementation."""
    T, cells, C = x.shape[1:]
    vol = np.zeros((G * t,) * dim + (C,), np.float32)
    k = np.asarray(keys[0])
    xv = np.asarray(x[0])
    coords = []
    for r in range(T):
        if k[r] == SENTINEL:
            coords.append(None)
            continue
        key = int(k[r])
        c = []
        for _ in range(dim):
            c.append(key & (2 ** int(np.ceil(np.log2(G))) - 1))
            key >>= int(np.ceil(np.log2(G)))
        c = c[::-1]
        coords.append(c)
        block = xv[r].reshape((t,) * dim + (C,))
        sl = tuple(slice(cc * t, (cc + 1) * t) for cc in c)
        vol[sl] = block
    pad = np.pad(vol, [(1, 1)] * dim + [(0, 0)])
    ext = np.zeros((T, (t + 2) ** dim, C), np.float32)
    for r, c in enumerate(coords):
        if c is None:
            continue
        sl = tuple(slice(cc * t, cc * t + t + 2) for cc in c)
        ext[r] = pad[sl].reshape(-1, C)
    return ext[None]


@pytest.mark.parametrize("dim,G,t", [(3, 4, 4), (2, 8, 4), (3, 4, 2)])
def test_halo26_matches_dense_oracle(dim, G, t):
    rng = np.random.default_rng(3)
    T = 64
    n_active = 40
    keys, _ = _random_level(rng, G, dim, T, n_active)
    C = 3
    x = np.zeros((1, T, t ** dim, C), np.float32)
    x[0, :n_active] = rng.normal(size=(n_active, t ** dim, C))
    spec = jax.tree_util.tree_map(lambda a: a[None],
                                  build_halo26(keys, G, dim))
    ext = np.asarray(halo26_extend_xla(jnp.asarray(x), spec, t, dim))
    oracle = _dense_oracle(keys[None], jnp.asarray(x), G, t, dim)
    np.testing.assert_allclose(ext, oracle, atol=1e-6)


def test_halo26_transpose_is_adjoint():
    """<extend(x), g> == <x, transpose(g)> for random x, g."""
    rng = np.random.default_rng(7)
    dim, G, t, T, C = 3, 4, 4, 32, 2
    keys, _ = _random_level(rng, G, dim, T, 24)
    spec = jax.tree_util.tree_map(lambda a: a[None],
                                  build_halo26(keys, G, dim))
    x = jnp.asarray(rng.normal(size=(1, T, t ** dim, C)).astype(np.float32))
    g = jnp.asarray(
        rng.normal(size=(1, T, (t + 2) ** dim, C)).astype(np.float32))
    lhs = jnp.sum(halo26_extend_xla(x, spec, t, dim) * g)
    rhs = jnp.sum(x * halo26_transpose_xla(g, spec, t, dim))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_halo26_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(11)
    dim, G, t, T, C = 3, 4, 4, 32, 2
    keys, _ = _random_level(rng, G, dim, T, 20)
    spec = jax.tree_util.tree_map(lambda a: a[None],
                                  build_halo26(keys, G, dim))
    x = jnp.asarray(rng.normal(size=(1, T, t ** dim, C)).astype(np.float32))
    g = jnp.asarray(
        rng.normal(size=(1, T, (t + 2) ** dim, C)).astype(np.float32))
    _, vjp_ref = jax.vjp(lambda s: halo26_extend_xla(s, spec, t, dim), x)
    _, vjp_cus = jax.vjp(lambda s: halo26_extend(s, spec, t, dim), x)
    np.testing.assert_allclose(np.asarray(vjp_cus(g)[0]),
                               np.asarray(vjp_ref(g)[0]), atol=1e-5)


def test_offset_symmetry_and_slab_geometry():
    offs = halo_offsets(3)
    assert len(offs) == 26
    for k, off in enumerate(offs):
        assert offs[len(offs) - 1 - k] == tuple(-o for o in off)
    # slabs + body tile the extended block exactly
    t = 4
    all_cells = sorted(
        list(body_cells(t, 3)) +
        [c for off in offs for c in slab_cells(off, t)[0]])
    assert all_cells == list(range(6 ** 3))
    # face/edge/corner sizes
    sizes = sorted(len(slab_cells(off, t)[0]) for off in offs)
    assert sizes == [1] * 8 + [4] * 12 + [16] * 6
