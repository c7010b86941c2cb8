"""Runtime overflow surfacing: TrainVal metrics carry the tile engine's
correction-list overflow count (SURVEY.md §7 hard part 1 — overflow
detection + documented spill policy). A production run that exceeds the
correction capacity trains on corrupted halos; the count must be visible."""

import numpy as np
import pytest

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.iotools.synthetic import generate_event
from uresnet_pytorch_tpu.trainval import TrainVal


def _blob(cfg, mean_voxels=200, seed=0):
    B = cfg.batch_size
    coords = np.zeros((B, cfg.max_voxels, cfg.data_dim), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    labels = np.zeros((B, cfg.max_voxels), np.int32)
    n_voxels = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, l = generate_event(seed, b, cfg.spatial_size, cfg.data_dim,
                                 mean_voxels)
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], labels[b, :n] = c[:n], v[:n], l[:n]
        n_voxels[b] = n
    return {"coords": coords, "values": values, "label": labels,
            "n_voxels": n_voxels, "index": np.arange(B)}


def _cfg(**kw):
    base = dict(model_name="uresnet_sparse", sparse_engine="tile",
                num_class=5, uresnet_filters=4, uresnet_num_strides=3,
                spatial_size=64, data_dim=3, reps=1, max_voxels=2048,
                min_level_capacity=128, batch_size=1,
                compute_dtype="float32")
    base.update(kw)
    return URESNetConfig(**base)


def test_metrics_carry_overflow_zero():
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    m = tv.train_step(blob)
    assert "overflow" in m
    assert int(m["overflow"]) == 0
    m = tv.forward(blob)
    assert int(m["overflow"]) == 0


def test_forced_overflow_is_reported(monkeypatch):
    """Shrink windows + zero the correction budget: the dropped pairs must
    show up in the step metrics instead of silently corrupting halos."""
    from uresnet_pytorch_tpu.ops import halo
    monkeypatch.setattr(halo, "HALO_CORR_CAP", 0)
    monkeypatch.setattr(halo, "HALO_BLOCK", 8)
    monkeypatch.setattr(halo, "HALO_WIN_MULT", 1)
    # the grouped-window path (default) reads its own taller multiplier
    monkeypatch.setattr(halo, "HALO_GROUP_WIN_MULT", 1)

    cfg = _cfg(max_voxels=4096)
    tv = TrainVal(cfg)
    tv.initialize()
    # a solid block spanning many tiles guarantees cross-slab x-neighbors,
    # which a 1x8-row window cannot cover
    side = 16
    g = np.stack(np.meshgrid(*([np.arange(side)] * 3), indexing="ij"),
                 -1).reshape(-1, 3).astype(np.int32)
    n = len(g)
    assert n <= cfg.max_voxels
    blob = {
        "coords": np.zeros((1, cfg.max_voxels, 3), np.int32),
        "values": np.zeros((1, cfg.max_voxels), np.float32),
        "label": np.zeros((1, cfg.max_voxels), np.int32),
        "n_voxels": np.array([n], np.int32),
        "index": np.arange(1),
    }
    blob["coords"][0, :n] = g
    blob["values"][0, :n] = 1.0
    m = tv.forward(blob)
    assert int(m["overflow"]) > 0
