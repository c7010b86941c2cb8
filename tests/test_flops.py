"""Tests for benchmarks/flops.py — the MFU/utilization denominator
(VERDICT r3 #6). Pure NumPy; no device work."""

import numpy as np
import pytest

from benchmarks.flops import (annotate_result, dense_flops, event_flops,
                              level_sites, model_convs, pair_count,
                              tile_actual_flops, utilization)


def _full_grid(s, dim):
    ax = [np.arange(s)] * dim
    return np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, dim)


def test_pair_count_full_grid_matches_bruteforce():
    s, dim = 5, 3
    coords = _full_grid(s, dim)
    keys = coords[:, 0].astype(np.int64)
    bits = max(1, int(np.ceil(np.log2(s))))
    for d in range(1, dim):
        keys = (keys << bits) | coords[:, d]
    got = pair_count(np.unique(keys), s, dim)
    # brute force: for each site, count in-bounds 3^d neighbors (all active)
    want = 0
    for c in coords:
        for off in _full_grid(3, dim) - 1:
            n = c + off
            if np.all((n >= 0) & (n < s)):
                want += 1
    assert got == want


def test_pair_count_isolated_site():
    # one lone voxel: only the center tap pairs
    coords = np.array([[3, 3, 3]])
    keys = np.array([(3 << 6) | (3 << 3) | 3], np.int64)
    assert pair_count(keys, 8, 3) == 1


def test_level_sites_halving():
    coords = np.array([[0, 0, 0], [1, 1, 1], [7, 7, 7]])
    lv = level_sites(coords, 8, 3)
    assert len(lv[0]) == 3
    # (0,0,0) and (1,1,1) share a coarse cell at level 1
    assert len(lv[1]) == 2
    assert len(lv[2]) == 2  # (0,0,0) and (1,1,1) at level 2


def test_model_convs_enumeration():
    planes = [16, 32, 48]
    convs = model_convs(planes, reps=2)
    kinds = [c[0] for c in convs]
    # stem + 3 levels * 2 reps * 2 convs + 2 downs + per dec level:
    # (up + nin + 2*reps convs) * 2 + head
    assert kinds.count("down") == 2 and kinds.count("up") == 2
    assert kinds.count("nin") == 2 and kinds.count("head") == 1
    assert kinds.count("sm") == 1 + 12 + 8
    # decoder block0 consumes the concat
    ups = [c for c in convs if c[0] == "nin"]
    assert all(cin == 2 * cout for _, _, cin, cout in ups)


def test_event_flops_ideal_leq_dense27():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 64, (500, 3)).astype(np.int32)
    f = event_flops(coords, 64, [16, 32], 2, 5)
    assert 0 < f["sparse_ideal"] <= f["dense27_ideal"]
    assert f["sites"][0] <= 500


def test_dense_flops_scales_with_volume():
    a = dense_flops(64, 3, [16, 32], 2, 5)
    b = dense_flops(128, 3, [16, 32], 2, 5)
    assert 7 < b / a < 9  # dominated by the finest level: ~8x


def test_utilization_and_annotate():
    u = utilization(10.0, 85e9)  # 10 ev/s at 85 GFLOP/ev
    assert abs(u["achieved_tf_s"] - 0.85) < 1e-6
    from uresnet_pytorch_tpu.config import URESNetConfig
    cfg = URESNetConfig(model_name="uresnet_sparse", spatial_size=64,
                        uresnet_filters=8, uresnet_num_strides=3,
                        max_voxels=512, batch_size=2)
    rng = np.random.default_rng(1)
    blob = {"coords": rng.integers(0, 64, (2, 512, 3)).astype(np.int32),
            "n_voxels": np.array([400, 300], np.int32)}
    row = annotate_result({"metric": "m", "value": 5.0}, cfg, blob)
    assert row["flops_per_event_sparse_ideal"] > 0
    assert row["flops_per_event_tile_actual"] > \
        row["flops_per_event_sparse_ideal"]
    assert row["pct_peak_sparse_ideal"] < row["pct_peak_tile_actual"] * 100
    # dense path
    dcfg = URESNetConfig(model_name="uresnet_dense", spatial_size=64,
                         uresnet_filters=8, uresnet_num_strides=3,
                         max_voxels=512, batch_size=1)
    drow = annotate_result({"metric": "d", "value": 2.0}, dcfg, blob,
                           train=True)
    assert drow["flops_per_event_dense"] > 0 and drow["pct_peak"] > 0


def test_tile_actual_liveness_gating():
    """tile_actual_flops with event coords charges only live blocks
    (Halo26Spec.blive gating): a sparse event costs strictly less than the
    static capacity bound, never more, and monotonically more voxels never
    cost fewer conv rows."""
    from uresnet_pytorch_tpu.config import URESNetConfig
    from benchmarks.flops import level_tiles, tile_actual_flops
    cfg = URESNetConfig(model_name="uresnet_sparse", spatial_size=128,
                        uresnet_filters=8, uresnet_num_strides=4,
                        max_voxels=8192, batch_size=1)
    rng = np.random.default_rng(3)
    # a compact track-like cluster: few occupied tiles
    base = rng.integers(20, 40, (1, 3))
    small = (base + rng.integers(0, 12, (600, 3))).astype(np.int32) % 128
    cap_bound = tile_actual_flops(cfg)          # no coords: capacity rows
    gated = tile_actual_flops(cfg, small)
    assert gated < cap_bound
    # spread voxels everywhere -> occupied tiles approach capacity
    big = rng.integers(0, 128, (8192, 3)).astype(np.int32)
    assert tile_actual_flops(cfg, big) <= cap_bound
    assert tile_actual_flops(cfg, big) >= gated
    nt = level_tiles(small, cfg)
    assert all(n > 0 for n in nt) and nt == sorted(nt, reverse=True)
