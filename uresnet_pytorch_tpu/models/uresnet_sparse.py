"""Submanifold-sparse U-ResNet — implemented in M2 (SURVEY.md §7).

Placeholder registration so the model factory surface is complete; replaced
by the sorted-rulebook gather-GEMM-scatter model.
"""

from __future__ import annotations

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.models import register_model


@register_model("uresnet_sparse")
def build_sparse(cfg: URESNetConfig):
    raise NotImplementedError("uresnet_sparse lands in milestone M2")
