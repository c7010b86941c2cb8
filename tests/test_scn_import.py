"""SCN-convention (reference-name) checkpoint import: round-trip a
synthetic sparseModel.N-style state_dict through the structural matcher and
verify identical forward logits — the parity harness minus only the real
reference file (SURVEY.md §5.4, §7 hard part 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.models import construct
from uresnet_pytorch_tpu.utils.scn_import import (
    classify_groups, export_reference_style, import_reference_state_dict,
    reference_slot_sequence)


def _cfg(**kw):
    base = dict(model_name="uresnet_sparse", sparse_engine="gather",
                num_class=5, uresnet_filters=4, uresnet_num_strides=3,
                spatial_size=16, data_dim=3, reps=2, max_voxels=256,
                min_level_capacity=32, batch_size=1,
                compute_dtype="float32")
    base.update(kw)
    return URESNetConfig(**base)


def _init(cfg, seed=0):
    model = construct(cfg.model_name)(cfg)
    rng = np.random.default_rng(3)
    coords = rng.integers(0, cfg.spatial_size,
                          (1, cfg.max_voxels, cfg.data_dim)).astype(np.int32)
    values = rng.normal(size=(1, cfg.max_voxels)).astype(np.float32)
    nv = np.array([80], np.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(seed), coords, values, nv, train=False)
    return model, variables, (coords, values, nv)


def test_roundtrip_and_forward_parity():
    cfg = _cfg()
    model, v0, args = _init(cfg, seed=0)
    _, v1, _ = _init(cfg, seed=7)   # different params: import must move them
    sd = export_reference_style(cfg, v0["params"], v0.get("batch_stats", {}))
    # dotted positional names, torch-convention leaves
    assert any(k.startswith("sparseModel.") for k in sd)
    assert "linear.weight" in sd and "linear.bias" in sd
    p, s = import_reference_state_dict(
        cfg, v1["params"], v1.get("batch_stats", {}), sd)
    out_ref = jax.jit(model.apply, static_argnames=("train",))(
        v0, *map(jnp.asarray, args), train=False)
    out_imp = jax.jit(model.apply, static_argnames=("train",))(
        {"params": p, "batch_stats": s}, *map(jnp.asarray, args), train=False)
    np.testing.assert_allclose(np.asarray(out_imp), np.asarray(out_ref),
                               atol=1e-6)


def test_classification_kinds():
    cfg = _cfg(reps=1)
    model, v, _ = _init(cfg)
    sd = export_reference_style(cfg, v["params"], v.get("batch_stats", {}))
    groups = classify_groups(sd, cfg.data_dim)
    kinds = [g["kind"] for g in groups]
    slots = [s["kind"] for s in reference_slot_sequence(cfg)]
    assert kinds == slots
    # decoder block0 takes the skip concat -> NiN shortcut present
    assert "nin" in kinds
    assert kinds[0] == "smconv" and kinds[-1] == "linear"


def test_mismatch_fails_loud():
    cfg = _cfg(reps=1)
    model, v, _ = _init(cfg)
    sd = export_reference_style(cfg, v["params"], v.get("batch_stats", {}))
    sd.pop("sparseModel.0.weight")
    with pytest.raises(ValueError, match="mismatch"):
        import_reference_state_dict(cfg, v["params"],
                                    v.get("batch_stats", {}), sd)
