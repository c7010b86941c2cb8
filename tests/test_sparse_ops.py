"""Sparse-core unit tests (SURVEY.md §4.1): key codec, input dedup/merge,
rulebook invariants, and the sparse-vs-dense equivalence oracle — each sparse
conv op evaluated on a fully-active grid must match the corresponding dense
XLA convolution exactly (the SCN oracle pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.ops.coords import SENTINEL, decode, encode, lookup
from uresnet_pytorch_tpu.ops.sparse_graph import (
    build_input_level, downsample_link, kernel_offsets, submanifold_rules)
from uresnet_pytorch_tpu.ops.sparse_conv import (
    downsample_conv, submanifold_conv, upsample_conv)


# ---------------------------------------------------------------- key codec
def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    S = 512
    coords = rng.integers(0, S, (100, 3)).astype(np.int32)
    valid = np.ones(100, bool)
    keys = encode(jnp.asarray(coords), jnp.asarray(valid), S)
    assert (np.asarray(keys) != SENTINEL).all()
    back = decode(keys, S, 3)
    np.testing.assert_array_equal(np.asarray(back), coords)
    # sorted key order == lexicographic coord order
    order = np.argsort(np.asarray(keys))
    lex = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    np.testing.assert_array_equal(order, lex)


def test_encode_invalid_and_bounds():
    S = 16
    coords = jnp.asarray([[0, 0, 0], [15, 15, 15], [16, 0, 0], [-1, 2, 3],
                          [1, 2, 3]], jnp.int32)
    valid = jnp.asarray([True, True, True, True, False])
    keys = np.asarray(encode(coords, valid, S))
    assert keys[0] != SENTINEL and keys[1] != SENTINEL
    assert keys[2] == SENTINEL  # out of bounds
    assert keys[3] == SENTINEL
    assert keys[4] == SENTINEL  # invalid row


def test_lookup():
    keys = jnp.sort(encode(jnp.asarray([[1, 1], [2, 3], [5, 0]], jnp.int32),
                           jnp.ones(3, bool), 8))
    keys = jnp.concatenate([keys, jnp.full((5,), SENTINEL, jnp.int32)])
    q = encode(jnp.asarray([[2, 3], [4, 4]], jnp.int32), jnp.ones(2, bool), 8)
    idx, found = lookup(keys, q)
    assert bool(found[0]) and not bool(found[1])
    assert np.asarray(keys)[int(idx[0])] == np.asarray(q)[0]


def test_lookup_monotone_matches_lookup():
    """Rank-windowed lookup == sort lookup on offset-neighbor queries (the
    monotone family it is built for), across sizes that exercise the
    fallback (V<=win), multi-hop windows, and the correction path."""
    from uresnet_pytorch_tpu.ops.coords import lookup_monotone
    rng = np.random.default_rng(7)
    offs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
            for c in (-1, 0, 1) if (a, b, c) != (0, 0, 0)]
    for V, G in [(128, 8), (1024, 32), (4096, 64)]:
        # clustered random-walk coordinates (track-like key clumping)
        pts, p = [], rng.integers(0, G, 3)
        while len(pts) < V * 2:
            p = np.clip(p + rng.integers(-1, 2, 3), 0, G - 1)
            pts.append(p.copy())
            if rng.random() < 0.02:
                p = rng.integers(0, G, 3)
        pts = np.unique(np.array(pts), axis=0)
        n = min(len(pts), V)
        co = np.zeros((V, 3), np.int32)
        co[:n] = pts[:n]
        valid = np.arange(V) < n
        keys = jnp.sort(encode(jnp.asarray(co), jnp.asarray(valid), G))
        kc = decode(keys, G, 3)
        kv = keys != SENTINEL
        qs = jnp.stack([encode(kc + jnp.asarray(o, jnp.int32), kv, G)
                        for o in offs])
        i0, f0 = lookup(keys, qs)
        i1, f1, nd = lookup_monotone(keys, qs, corr_cap=512)
        assert int(nd) == 0
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
        m = np.asarray(f0)
        np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


def test_lookup_monotone_drops_counted_never_wrong():
    """Adversarial (non-monotone) queries: beyond-budget pairs are dropped
    AND counted; resolved pairs are never false positives."""
    from uresnet_pytorch_tpu.ops.coords import lookup_monotone
    rng = np.random.default_rng(3)
    keys = jnp.asarray(np.sort(rng.integers(0, 1 << 20, 2048)), jnp.int32)
    qs = jnp.asarray(rng.integers(0, 1 << 20, (4, 2048)), jnp.int32)
    i0, f0 = lookup(keys, qs)
    i1, f1, nd = lookup_monotone(keys, qs, corr_cap=64)
    f0, f1 = np.asarray(f0), np.asarray(f1)
    assert not (f1 & ~f0).any()           # no false positives
    missed = int((f0 & ~f1).sum())
    assert missed <= int(nd)              # every miss is counted
    m = f1
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


# ------------------------------------------------------------- input level
def _input_level(coords, values, n, S=16, cap=16, mode="sum"):
    return build_input_level(jnp.asarray(coords, jnp.int32),
                             jnp.asarray(values, jnp.float32),
                             jnp.asarray(n), S, cap, mode)


def test_input_dedup_merge_modes():
    coords = np.array([[1, 1, 1], [2, 2, 2], [1, 1, 1], [3, 3, 3],
                       [0, 0, 0], [9, 9, 9]], np.int32)
    values = np.array([1.0, 2.0, 5.0, 3.0, 4.0, 99.0], np.float32)
    n = 5  # row 5 is padding
    for mode, expected in [("sum", {(1, 1, 1): 6.0}), ("mean", {(1, 1, 1): 3.0}),
                           ("max", {(1, 1, 1): 5.0}), ("last", {(1, 1, 1): 5.0})]:
        keys, num, feats, row_of_input, rep = _input_level(
            coords, values, n, mode=mode)
        assert int(num) == 4  # 4 unique coords
        k = np.asarray(keys)
        assert (np.diff(k[:4]) > 0).all() and (k[4:] == SENTINEL).all()
        cmap = {tuple(c): v for c, v in
                zip(np.asarray(decode(keys, 16, 3))[:4], np.asarray(feats)[:4])}
        assert cmap[(1, 1, 1)] == expected[(1, 1, 1)], mode
        assert cmap[(0, 0, 0)] == 4.0
        # duplicate rows map to the same level-0 row
        roi = np.asarray(row_of_input)
        assert roi[0] == roi[2]
        # representative row = first occurrence
        assert np.asarray(rep)[roi[0]] == 0


def test_input_label_alignment():
    """rep gathers per-voxel labels onto level-0 rows consistently."""
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 16, (20, 3)).astype(np.int32)
    values = rng.normal(size=20).astype(np.float32)
    labels = rng.integers(0, 5, 20)
    keys, num, feats, roi, rep = _input_level(coords, values, 20, cap=32)
    roi, rep = np.asarray(roi), np.asarray(rep)
    for i in range(20):
        r = roi[i]
        assert r < 32
        # representative input row carries the same coordinate, so labels
        # gathered through rep land on the right level-0 row
        np.testing.assert_array_equal(coords[rep[r]], coords[i])
        k = np.asarray(keys)[r]
        expect = np.asarray(encode(jnp.asarray(coords[i]),
                                   jnp.asarray(True), 16))
        assert k == expect


# --------------------------------------------------------------- rulebooks
def test_submanifold_rules_center_identity_and_symmetry():
    rng = np.random.default_rng(2)
    S, cap = 16, 64
    coords = rng.integers(0, S, (40, 3)).astype(np.int32)
    keys, num, *_ = _input_level(coords, np.ones(40, np.float32), 40,
                                 S=S, cap=cap)
    nbr_idx, nbr_ok = submanifold_rules(keys, S, 3)
    K = 27
    assert nbr_idx.shape == (K, cap)
    center = 13
    n = int(num)
    np.testing.assert_array_equal(np.asarray(nbr_idx)[center, :n],
                                  np.arange(n))
    assert np.asarray(nbr_ok)[center, :n].all()
    assert not np.asarray(nbr_ok)[:, n:].any()
    # symmetry: if j is i's neighbor at offset k, i is j's at mirrored offset
    offs = kernel_offsets(3, 3)
    idx, ok = np.asarray(nbr_idx), np.asarray(nbr_ok)
    for k in range(K):
        mk = K - 1 - k  # mirrored offset index in raster order
        for i in range(n):
            if ok[k, i]:
                j = idx[k, i]
                assert ok[mk, j] and idx[mk, j] == i


def test_downsample_link_invariants():
    rng = np.random.default_rng(3)
    S, cap, capc = 16, 64, 64
    coords = rng.integers(0, S, (50, 3)).astype(np.int32)
    keys, num, *_ = _input_level(coords, np.ones(50, np.float32), 50,
                                 S=S, cap=cap)
    keys_c, num_c, parent, corner, dropped = downsample_link(keys, S, 3, capc)
    n, nc = int(num), int(num_c)
    assert int(dropped) == 0
    kc = np.asarray(keys_c)
    assert (np.diff(kc[:nc]) > 0).all() and (kc[nc:] == SENTINEL).all()
    # every fine site's parent cell key matches floor(coords/2)
    cf = np.asarray(decode(keys, S, 3))[:n]
    par = np.asarray(parent)[:n]
    cc = np.asarray(decode(keys_c, S // 2, 3))
    np.testing.assert_array_equal(cc[par], cf >> 1)
    # corner id = interleaved low bits (x highest)
    expect = ((cf[:, 0] & 1) << 2) | ((cf[:, 1] & 1) << 1) | (cf[:, 2] & 1)
    np.testing.assert_array_equal(np.asarray(corner)[:n], expect)
    # padding rows point at capc (drop)
    assert (np.asarray(parent)[n:] == capc).all()


def test_downsample_overflow_drops_and_counts():
    # 8 fine sites in 8 distinct coarse cells, capacity 4 -> 4 dropped
    coords = np.array([[x, y, z] for x in (0, 2) for y in (0, 2)
                       for z in (0, 2)], np.int32)
    keys, num, *_ = _input_level(coords, np.ones(8, np.float32), 8,
                                 S=8, cap=16)
    keys_c, num_c, parent, corner, dropped = downsample_link(keys, 8, 3, 4)
    assert int(num_c) == 4 and int(dropped) == 4
    par = np.asarray(parent)[:8]
    assert (par[par < 4] < 4).sum() == 4 and (par == 4).sum() == 4


# ----------------------------------------------- dense equivalence oracles
def _full_grid(S, dim=3):
    """All sites of an S^dim grid, already in key-sorted (lexicographic) order."""
    axes = [np.arange(S)] * dim
    g = np.meshgrid(*axes, indexing="ij")
    return np.stack([a.ravel() for a in g], -1).astype(np.int32)


def test_submanifold_conv_equals_dense_conv():
    rng = np.random.default_rng(4)
    S, Cin, Cout = 6, 3, 5
    coords = _full_grid(S)
    V = S ** 3
    feats_grid = rng.normal(size=(S, S, S, Cin)).astype(np.float32)
    w = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1

    keys = encode(jnp.asarray(coords), jnp.ones(V, bool), S)  # already sorted
    assert (np.diff(np.asarray(keys)) > 0).all()
    nbr_idx, nbr_ok = submanifold_rules(keys, S, 3)
    feats = feats_grid.reshape(V, Cin)  # key order == raster order
    out = submanifold_conv(jnp.asarray(feats)[None], nbr_idx[None],
                           nbr_ok[None], jnp.asarray(w))[0]

    kernel = w.reshape(3, 3, 3, Cin, Cout)  # raster offsets == DHWIO kernel
    dense = jax.lax.conv_general_dilated(
        jnp.asarray(feats_grid)[None], jnp.asarray(kernel),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    np.testing.assert_allclose(np.asarray(out).reshape(S, S, S, Cout),
                               np.asarray(dense), atol=1e-4)


def test_downsample_conv_equals_dense_strided_conv():
    rng = np.random.default_rng(5)
    S, Cin, Cout = 6, 3, 4
    coords = _full_grid(S)
    V = S ** 3
    feats_grid = rng.normal(size=(S, S, S, Cin)).astype(np.float32)
    w = rng.normal(size=(8, Cin, Cout)).astype(np.float32) * 0.1

    keys = encode(jnp.asarray(coords), jnp.ones(V, bool), S)
    capc = (S // 2) ** 3
    keys_c, num_c, parent, corner, dropped = downsample_link(keys, S, 3, capc)
    assert int(num_c) == capc and int(dropped) == 0
    feats = feats_grid.reshape(V, Cin)
    out = downsample_conv(jnp.asarray(feats)[None], parent[None],
                          corner[None], jnp.asarray([V]), capc,
                          jnp.asarray(w))[0]

    kernel = w.reshape(2, 2, 2, Cin, Cout)
    dense = jax.lax.conv_general_dilated(
        jnp.asarray(feats_grid)[None], jnp.asarray(kernel),
        window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    Sc = S // 2
    np.testing.assert_allclose(np.asarray(out).reshape(Sc, Sc, Sc, Cout),
                               np.asarray(dense), atol=1e-4)


def test_upsample_conv_equals_dense_transposed_conv():
    rng = np.random.default_rng(6)
    S, Cin, Cout = 6, 4, 3
    Sc = S // 2
    coords = _full_grid(S)
    V = S ** 3
    coarse_grid = rng.normal(size=(Sc, Sc, Sc, Cin)).astype(np.float32)
    w = rng.normal(size=(8, Cin, Cout)).astype(np.float32) * 0.1

    keys = encode(jnp.asarray(coords), jnp.ones(V, bool), S)
    capc = Sc ** 3
    keys_c, num_c, parent, corner, dropped = downsample_link(keys, S, 3, capc)
    feats_c = coarse_grid.reshape(capc, Cin)
    out = upsample_conv(jnp.asarray(feats_c)[None], parent[None],
                        corner[None], capc, jnp.asarray(w))[0]

    # direct definition of stride-2 transposed conv: out[c] = K[c & 1] @ in[c >> 1]
    dense = np.zeros((S, S, S, Cout), np.float32)
    for x in range(S):
        for y in range(S):
            for z in range(S):
                k = ((x & 1) << 2) | ((y & 1) << 1) | (z & 1)
                dense[x, y, z] = coarse_grid[x // 2, y // 2, z // 2] @ w[k]
    got = np.asarray(out).reshape(S, S, S, Cout)
    np.testing.assert_allclose(got, dense, atol=1e-4)


def test_conv_padding_rows_inert():
    """Garbage in padding rows never contributes (masked-buffer invariant)."""
    rng = np.random.default_rng(7)
    S, cap = 8, 32
    coords = rng.integers(0, S, (12, 3)).astype(np.int32)
    # ensure unique
    coords = np.unique(coords, axis=0)
    n = len(coords)
    vals = rng.normal(size=n).astype(np.float32)

    def run(pad_val):
        v = np.full((cap,), pad_val, np.float32)
        c = np.zeros((cap, 3), np.int32)
        c[:n], v[:n] = coords, vals
        keys, num, feats, roi, rep = _input_level(c, v, n, S=S, cap=cap)
        nbr_idx, nbr_ok = submanifold_rules(keys, S, 3)
        w = np.random.default_rng(0).normal(size=(27, 1, 4)).astype(np.float32)
        out = submanifold_conv(feats[None, :, None], nbr_idx[None],
                               nbr_ok[None], jnp.asarray(w))[0]
        return np.asarray(out)[: int(num)]

    np.testing.assert_array_equal(run(0.0), run(777.0))
