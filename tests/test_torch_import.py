"""PyTorch checkpoint interop (SURVEY.md §5.4): layout converters and
export->import roundtrip through a real torch-saved file."""

import numpy as np
import pytest

from uresnet_pytorch_tpu.utils import torch_import as ti


def test_dense_kernel_layouts():
    w = np.arange(2 * 3 * 4 * 5 * 6, dtype=np.float32).reshape(2, 3, 4, 5, 6)
    f = ti.dense_kernel_to_flax(w)          # OIDHW -> DHWIO
    assert f.shape == (4, 5, 6, 3, 2)
    np.testing.assert_array_equal(ti.dense_kernel_to_torch(f), w)
    # spot value: torch w[o,i,d,h,w] == flax f[d,h,w,i,o]
    assert w[1, 2, 3, 4, 5] == f[3, 4, 5, 2, 1]


def test_export_import_roundtrip_through_torch_file(tmp_path):
    torch = pytest.importorskip("torch")
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.trainval import TrainVal

    cfg = URESNetConfig(model_name="uresnet_sparse", sparse_engine="gather",
                        num_class=5, uresnet_filters=2,
                        uresnet_num_strides=2, spatial_size=8, data_dim=3,
                        reps=1, max_voxels=32, min_level_capacity=8,
                        batch_size=1, compute_dtype="float32")
    tv = TrainVal(cfg)
    tv.initialize()
    params, stats = tv.state["params"], tv.state["batch_stats"]

    sd = ti.export_state_dict(params, stats)
    assert any(k.endswith("running_mean") for k in sd)
    # write an actual reference-style checkpoint with torch, reload
    path = str(tmp_path / "ref.ckpt")
    torch.save({"global_step": 7,
                "state_dict": {("module." + k): torch.from_numpy(
                    np.ascontiguousarray(v)) for k, v in sd.items()}}, path)
    sd2 = ti.load_torch_state_dict(path)  # strips 'module.'
    assert set(sd2) == set(sd)
    assert ti.global_step_of(path) == 7

    p2, s2 = ti.import_state_dict(params, stats, sd2)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_shape_mismatch_raises():
    params = {"layer": {"w": np.zeros((2, 3), np.float32)}}
    stats = {}
    sd = {"layer.w": np.zeros((3, 2), np.float32)}
    with pytest.raises(ValueError, match="shape"):
        ti.import_state_dict(params, stats, sd)
