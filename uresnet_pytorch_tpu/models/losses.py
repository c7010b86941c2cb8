"""Per-voxel segmentation loss and metrics.

Behavioral spec (reference: SegmentationLoss in
uresnet/models/uresnet_sparse.py, SURVEY.md §2.5): softmax cross-entropy per
active voxel against integer labels, times optional per-voxel weights
(class balancing), averaged; plus per-voxel argmax accuracy and per-class
nonzero accuracy at inference.

All reductions run over valid rows only (the padded-buffer invariant:
garbage rows never contribute — SURVEY.md §4.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from typing import Dict, Optional

from uresnet_pytorch_tpu.ops.voxelize import valid_mask


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      n_voxels: jnp.ndarray,
                      weights: Optional[jnp.ndarray] = None,
                      num_class: int = 5,
                      return_softmax: bool = False) -> Dict[str, jnp.ndarray]:
    """logits (B, V, C) f32; labels (B, V) i32; n_voxels (B,); weights (B, V).

    Returns {loss, accuracy, count, per_class_accuracy (C,), class_count (C,),
    softmax (B, V, C)}.
    """
    B, V, C = logits.shape
    mask = valid_mask(n_voxels, V)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels_safe = jnp.clip(labels, 0, C - 1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    w = jnp.where(mask, 1.0, 0.0)
    if weights is not None:
        w = w * weights
    count = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(nll * w) / count

    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels_safe) & mask
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    accuracy = jnp.sum(correct) / n_valid

    onehot = jax.nn.one_hot(labels_safe, C, dtype=jnp.float32) * mask[..., None]
    class_count = jnp.sum(onehot, axis=(0, 1))
    class_correct = jnp.sum(onehot * correct[..., None].astype(jnp.float32), axis=(0, 1))
    per_class_accuracy = class_correct / jnp.maximum(class_count, 1.0)

    out = {
        "loss": loss,
        "accuracy": accuracy,
        "count": jnp.sum(mask).astype(jnp.int32),
        "per_class_accuracy": per_class_accuracy,
        "class_count": class_count,
    }
    if return_softmax:
        out["softmax"] = jax.nn.softmax(logits, axis=-1)
    return out


def iou_counts(logits: jnp.ndarray, labels: jnp.ndarray, n_voxels: jnp.ndarray
               ) -> Dict[str, jnp.ndarray]:
    """Per-class intersection/union counts for mIoU (benchmark metric,
    BASELINE.md). Accumulate across batches, then iou = I / U."""
    B, V, C = logits.shape
    mask = valid_mask(n_voxels, V)
    pred = jnp.argmax(logits, axis=-1)
    labels = jnp.clip(labels, 0, C - 1)
    inter = jnp.zeros(C)
    union = jnp.zeros(C)
    p1 = jax.nn.one_hot(pred, C) * mask[..., None]
    t1 = jax.nn.one_hot(labels, C) * mask[..., None]
    inter = jnp.sum(p1 * t1, axis=(0, 1))
    union = jnp.sum(jnp.maximum(p1, t1), axis=(0, 1))
    return {"intersection": inter, "union": union}
