"""Native host backend (csrc/uresnet_native.cpp): build, correctness vs the
NumPy fallbacks, and loader integration."""

import numpy as np
import pytest

from uresnet_pytorch_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable / build failed")


def test_encode_keys_matches_python():
    rng = np.random.default_rng(0)
    coords = rng.integers(-2, 66, size=(200, 3)).astype(np.int32)
    keys = native.encode_keys(coords, 64)
    bits = 6
    exp = np.full(200, np.iinfo(np.int64).max)
    ok = ((coords >= 0) & (coords < 64)).all(1)
    packed = (coords[:, 0].astype(np.int64) << (2 * bits)) | \
             (coords[:, 1].astype(np.int64) << bits) | coords[:, 2]
    exp[ok] = packed[ok]
    np.testing.assert_array_equal(keys, exp)


def test_dedup_modes():
    coords = np.array([[1, 1, 1], [2, 2, 2], [1, 1, 1]], np.int32)
    values = np.array([1.0, 5.0, 3.0], np.float32)
    for mode, expect in [("sum", 4.0), ("mean", 2.0), ("max", 3.0),
                         ("last", 3.0)]:
        c, v = native.dedup(coords, values, 8, mode)
        assert len(c) == 2
        got = {tuple(cc): vv for cc, vv in zip(c, v)}
        assert got[(1, 1, 1)] == expect, mode
        assert got[(2, 2, 2)] == 5.0


def test_native_collate_matches_python():
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.io_base import IOBase
    rng = np.random.default_rng(1)
    cfg = URESNetConfig(io_type="synthetic", spatial_size=32, data_dim=3,
                        max_voxels=64, batch_size=3, uresnet_num_strides=3)
    io = IOBase(cfg)
    events = []
    for i in range(3):
        n = int(rng.integers(5, 100))  # one event exceeds capacity 64
        coords = rng.integers(0, 32, (n, 3)).astype(np.int32)
        vals = rng.normal(size=n).astype(np.float32)
        labs = rng.integers(0, 5, n).astype(np.float32)
        events.append({"data": (coords, vals), "label": (coords, labs)})
    idx = np.arange(3)
    b_native = io._collate_native(events, idx, 3, 64, 3)
    b_python = io._collate_python(events, idx, 3, 64, 3)
    for k in b_python:
        np.testing.assert_array_equal(b_native[k], b_python[k], err_msg=k)
