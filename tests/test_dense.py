"""Dense U-ResNet end-to-end tests (milestone M1, SURVEY.md §7)."""

import os

import numpy as np
import pytest

from uresnet_pytorch_tpu.config import URESNetConfig


def _cfg(**kw):
    base = dict(model_name="uresnet_dense", num_class=5, uresnet_filters=4,
                uresnet_num_strides=3, spatial_size=32, data_dim=3,
                reps=1, max_voxels=512, batch_size=2, io_type="synthetic",
                iteration=5, checkpoint_step=0, report_step=0,
                learning_rate=0.005, compute_dtype="float32", shuffle=False)
    base.update(kw)
    return URESNetConfig(**base)


def _blob(cfg, seed=0):
    from uresnet_pytorch_tpu.iotools import io_factory
    io = io_factory(cfg, n_events=4, mean_voxels=200)
    io.initialize()
    blob = io.next()
    io.finalize()
    return blob


def test_voxelize_gather_roundtrip():
    import jax.numpy as jnp
    from uresnet_pytorch_tpu.ops.voxelize import voxelize, gather_voxels
    rng = np.random.default_rng(0)
    S, B, V = 16, 2, 64
    n = np.array([40, 64], np.int32)
    coords = np.zeros((B, V, 3), np.int32)
    values = np.zeros((B, V), np.float32)
    for b in range(B):
        flat = rng.choice(S ** 3, size=n[b], replace=False)
        coords[b, :n[b], 0] = flat // (S * S)
        coords[b, :n[b], 1] = (flat // S) % S
        coords[b, :n[b], 2] = flat % S
        values[b, :n[b]] = rng.normal(size=n[b]).astype(np.float32)
    vol = voxelize(jnp.asarray(coords), jnp.asarray(values), jnp.asarray(n), S)
    assert vol.shape == (B, S, S, S, 1)
    np.testing.assert_allclose(np.asarray(vol).sum(), values.sum(), rtol=1e-5)
    back = gather_voxels(vol, jnp.asarray(coords), jnp.asarray(n), S)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(back)[b, :n[b], 0],
                                   values[b, :n[b]], rtol=1e-6)


def test_dense_forward_shape():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    res = tv.forward(blob)
    assert res["softmax"].shape == (2, cfg.max_voxels, 5)
    sm = np.asarray(res["softmax"])
    np.testing.assert_allclose(sm.sum(-1), 1.0, atol=1e-4)
    assert np.isfinite(float(res["loss"]))


def test_dense_training_reduces_loss():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    losses = [float(tv.train_step(blob)["loss"]) for _ in range(15)]
    assert losses[-1] < losses[0] * 0.8, losses
    assert tv.global_step == 15


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg(weight_prefix=str(tmp_path / "snap"))
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    tv.train_step(blob)
    path = tv.save_state(1)
    assert path.endswith("snap-1.ckpt") and os.path.exists(path)
    ref = tv.forward(blob)
    tv2 = TrainVal(cfg.replace(model_path=path))
    tv2.initialize()
    res = tv2.forward(blob)
    np.testing.assert_allclose(np.asarray(res["softmax"]),
                               np.asarray(ref["softmax"]), atol=1e-6)
    assert tv2.global_step == 1
    # resume auto-discovery
    tv3 = TrainVal(cfg.replace(resume=True))
    tv3.initialize()
    assert tv3.global_step == 1


def test_train_inference_e2e(tmp_path):
    from uresnet_pytorch_tpu import main_funcs
    cfg = _cfg(iteration=3, checkpoint_step=3, report_step=1,
               weight_prefix=str(tmp_path / "w" / "snap"),
               log_dir=str(tmp_path / "log"))
    main_funcs.train(cfg)
    assert os.path.exists(tmp_path / "w" / "snap-3.ckpt")
    assert os.path.exists(tmp_path / "log" / "train_log.csv")
    with open(tmp_path / "log" / "train_log.csv") as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("iter,epoch,loss,accuracy")
    assert len(lines) == 4  # header + 3 iters

    # inference sweep over the checkpoint glob + prediction writing
    icfg = cfg.replace(model_path=str(tmp_path / "w" / "snap-*.ckpt"),
                       output_file=str(tmp_path / "pred.h5"),
                       iteration=2, train=False)
    summary = main_funcs.inference(icfg)
    assert "accuracy" in summary
    import h5py
    with h5py.File(tmp_path / "pred.h5") as f:
        g = f["prediction"]
        assert g["softmax"].shape[1] == 5
        assert g["coords"].shape[0] == g["softmax"].shape[0] > 0
        assert g["row_splits"][-1] == g["coords"].shape[0]


def test_iotest_mode():
    from uresnet_pytorch_tpu import main_funcs
    cfg = _cfg(iteration=3)
    eps = main_funcs.iotest(cfg)
    assert eps > 0
