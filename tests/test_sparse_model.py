"""Sparse U-ResNet model-level tests (M2, SURVEY.md §4.2)."""

import numpy as np
import pytest

from uresnet_pytorch_tpu.config import URESNetConfig


def _cfg(**kw):
    base = dict(model_name="uresnet_sparse", num_class=5, uresnet_filters=4,
                uresnet_num_strides=3, spatial_size=16, data_dim=3,
                reps=1, max_voxels=256, min_level_capacity=32, batch_size=2,
                io_type="synthetic", iteration=5, checkpoint_step=0,
                report_step=0, learning_rate=0.005, compute_dtype="float32",
                shuffle=False)
    base.update(kw)
    return URESNetConfig(**base)


def _blob(cfg):
    from uresnet_pytorch_tpu.iotools import io_factory
    io = io_factory(cfg, n_events=4, mean_voxels=100)
    io.initialize()
    blob = io.next()
    io.finalize()
    return blob


def test_sparse_forward_shape_and_masking():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    res = tv.forward(blob)
    sm = np.asarray(res["softmax"])
    assert sm.shape == (2, cfg.max_voxels, 5)
    assert np.isfinite(float(res["loss"]))
    for b in range(2):
        n = int(blob["n_voxels"][b])
        np.testing.assert_allclose(sm[b, :n].sum(-1), 1.0, atol=1e-4)


def test_sparse_padding_invariance():
    """Changing garbage in padding rows must not change valid logits."""
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    res1 = tv.forward(blob)
    blob2 = {k: v.copy() for k, v in blob.items()}
    for b in range(2):
        n = int(blob2["n_voxels"][b])
        blob2["values"][b, n:] = 123.0
        blob2["coords"][b, n:] = 7
    res2 = tv.forward(blob2)
    for b in range(2):
        n = int(blob["n_voxels"][b])
        np.testing.assert_allclose(np.asarray(res1["softmax"])[b, :n],
                                   np.asarray(res2["softmax"])[b, :n],
                                   atol=1e-5)


def test_sparse_row_permutation_equivariance():
    """Logits follow their voxel rows when the input rows are permuted
    (reference OutputLayer returns original row order)."""
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    res1 = tv.forward(blob)
    rng = np.random.default_rng(0)
    blob2 = {k: v.copy() for k, v in blob.items()}
    perms = []
    for b in range(2):
        n = int(blob["n_voxels"][b])
        p = rng.permutation(n)
        perms.append(p)
        blob2["coords"][b, :n] = blob["coords"][b, :n][p]
        blob2["values"][b, :n] = blob["values"][b, :n][p]
        blob2["label"][b, :n] = blob["label"][b, :n][p]
    res2 = tv.forward(blob2)
    for b in range(2):
        n = int(blob["n_voxels"][b])
        np.testing.assert_allclose(
            np.asarray(res2["softmax"])[b, :n],
            np.asarray(res1["softmax"])[b, :n][perms[b]], atol=1e-5)


def test_sparse_training_reduces_loss():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg()
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    losses = [float(tv.train_step(blob)["loss"]) for _ in range(15)]
    assert losses[-1] < losses[0] * 0.8, losses


def test_sparse_2d():
    from uresnet_pytorch_tpu.trainval import TrainVal
    cfg = _cfg(data_dim=2, uresnet_num_strides=2)
    tv = TrainVal(cfg)
    tv.initialize()
    blob = _blob(cfg)
    res = tv.forward(blob)
    assert np.asarray(res["softmax"]).shape == (2, cfg.max_voxels, 5)
    assert np.isfinite(float(res["loss"]))


def test_train_pair_path_param_tree_matches_eval():
    """The decoder's unmaterialized (up, skip) pair (train) and the eval
    concat path must create IDENTICAL parameter trees — checkpoints are
    interchangeable between them (VERDICT r3 weak #5 fix)."""
    import jax
    from uresnet_pytorch_tpu.models import construct

    cfg = _cfg()
    blob = _blob(cfg)
    model = construct(cfg.model_name)(cfg)
    args = (blob["coords"], blob["values"], blob["n_voxels"])
    v_eval = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *args, train=False)
    v_train = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *args, train=True)
    s_eval = jax.tree_util.tree_map(lambda a: a.shape, v_eval["params"])
    s_train = jax.tree_util.tree_map(lambda a: a.shape, v_train["params"])
    assert s_eval == s_train
    # and the eval forward accepts train-initialized params verbatim
    out = jax.jit(
        lambda vr, c, v, n: model.apply(vr, c, v, n, train=False)
    )(v_train, *args)
    assert np.isfinite(np.asarray(out)).all()


def test_eval_pair_path_matches_concat(monkeypatch):
    """URESNET_EVAL_PAIR=1 routes eval through the unmaterialized
    (up, skip) pair (the b16 HBM-headroom A/B, VERDICT r4 weak #6);
    same params must give the same logits as the default eval concat
    (f32: the pair decomposition is exact channel-splitting)."""
    import jax
    from uresnet_pytorch_tpu.models import construct

    cfg = _cfg()
    blob = _blob(cfg)
    model = construct(cfg.model_name)(cfg)
    args = (blob["coords"], blob["values"], blob["n_voxels"])
    vr = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *args, train=False)

    def run():
        # jit caches on the traced graph, and the env knob is read at
        # trace time — trace explicitly each way, no jit cache reuse
        return np.asarray(model.apply(vr, *args, train=False))

    monkeypatch.delenv("URESNET_EVAL_PAIR", raising=False)
    out_concat = run()
    monkeypatch.setenv("URESNET_EVAL_PAIR", "1")
    out_pair = run()
    np.testing.assert_allclose(out_pair, out_concat, rtol=2e-4, atol=2e-5)
