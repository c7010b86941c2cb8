"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4.4):
the sharded step must produce the same updates as single-device."""

import jax
import numpy as np
import pytest

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.parallel import make_mesh


def _cfg(**kw):
    base = dict(model_name="uresnet_sparse", num_class=5, uresnet_filters=4,
                uresnet_num_strides=2, spatial_size=16, data_dim=3,
                reps=1, max_voxels=128, min_level_capacity=32, batch_size=8,
                io_type="synthetic", learning_rate=0.01,
                compute_dtype="float32", shuffle=False)
    base.update(kw)
    return URESNetConfig(**base)


def _blob(cfg):
    from uresnet_pytorch_tpu.iotools import io_factory
    io = io_factory(cfg, n_events=8, mean_voxels=60)
    io.initialize()
    blob = io.next()
    io.finalize()
    return blob


def test_mesh_construction():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.devices.size == 8 and mesh.axis_names == ("data",)
    mesh1 = make_mesh(device_ids=[0])
    assert mesh1.devices.size == 1


def test_dp_matches_single_device():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    blob = _blob(cfg)

    tv8 = TrainVal(cfg, mesh=make_mesh())
    tv8.initialize()
    tv1 = TrainVal(cfg, mesh=make_mesh(device_ids=[0]))
    tv1.initialize()

    for step in range(3):
        m8 = tv8.train_step(blob)
        m1 = tv1.train_step(blob)
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=1e-4), step
        # argmax ties flip on fp reduction-order differences, and early in
        # training most logits ARE near-ties — loss (rtol 1e-4) and the
        # final param comparison below carry the real parity signal; the
        # accuracy check only guards against gross divergence
        np.testing.assert_allclose(float(m8["accuracy"]),
                                   float(m1["accuracy"]), atol=0.10)
    # parameters stay in sync after several updates
    p8 = jax.tree_util.tree_leaves(tv8.state["params"])
    p1 = jax.tree_util.tree_leaves(tv1.state["params"])
    # fp reduction orders differ between the sharded and single-device
    # programs (and under remat); after 3 Adam steps a few-1e-4 drift on
    # O(1e-2) params is expected noise
    for a, b in zip(p8, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=3e-4)


def test_batch_divisibility_enforced():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg(batch_size=3)
    tv = TrainVal(cfg, mesh=make_mesh())  # 8 devices, batch 3
    with pytest.raises(ValueError, match="not divisible"):
        tv.initialize()


def test_minibatch_size_semantics():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg(batch_size=8, minibatch_size=1)
    tv = TrainVal(cfg, mesh=make_mesh())
    tv.initialize()  # 1 event/device * 8 devices == 8: ok
    cfg_bad = _cfg(batch_size=8, minibatch_size=2)
    tv2 = TrainVal(cfg_bad, mesh=make_mesh())
    with pytest.raises(ValueError, match="minibatch"):
        tv2.initialize()
