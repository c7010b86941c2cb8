"""Model factory (reference: uresnet/models construct(), SURVEY.md §2.7)."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

_MODELS: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        _MODELS[name] = fn
        return fn
    return deco


def construct(name: str):
    """name -> model-builder callable taking a URESNetConfig and returning a
    flax Module with signature apply(vars, coords, values, n_voxels) ->
    (B, V, num_class) per-voxel logits."""
    # import for registration side effects
    import uresnet_pytorch_tpu.models.uresnet_dense  # noqa: F401
    import uresnet_pytorch_tpu.models.uresnet_sparse  # noqa: F401
    if name not in _MODELS:
        raise ValueError(f"unknown model {name!r}; have {sorted(_MODELS)}")
    return _MODELS[name]
