"""PyTorch-reference checkpoint import (SURVEY.md §5.4, §7 hard part 5).

The reference saves ``torch.save({'global_step', 'state_dict', 'optimizer'})``
(SURVEY.md §3.5, expected in uresnet/trainval.py save_state). This module
maps such a state_dict into this framework's flax param/batch_stats trees,
handling the layout differences:

  * dense convs: torch OIDHW -> flax DHWIO kernel transpose
  * sparse (SCN) convs: SCN stores submanifold weights as
    (K, Cin, Cout) per-offset stacks — same logical layout as ours; the
    offset enumeration order is raster order over the kernel cube
    (last axis fastest), which matches ops/sparse_graph.kernel_offsets.
    VERIFY against a real SCN install before trusting bit-for-class parity
    (the reference mount was empty this round — SURVEY.md §0).
  * batchnorm: torch (weight, bias, running_mean, running_var) ->
    flax (scale, bias) params + (mean, var) batch_stats.

Import entry points accept either a real ``torch`` checkpoint path (torch is
installed CPU-only in this environment) or an already-loaded
``{name: np.ndarray}`` mapping, so tests run without writing torch files.

Export is also provided so checkpoints can round-trip for diffing.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .ckpt with torch (CPU) and return numpy arrays.
    Strips DataParallel 'module.' prefixes (SURVEY.md §3.5)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = payload.get("state_dict", payload)
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def global_step_of(path: str) -> int:
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    return int(payload.get("global_step", 0))


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def dense_kernel_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvNd weight (O, I, *spatial) -> flax (*spatial, I, O)."""
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def dense_kernel_to_torch(w: np.ndarray) -> np.ndarray:
    nd = w.ndim - 2
    return np.transpose(w, (nd + 1, nd) + tuple(range(nd)))


def scn_kernel_to_stack(w: np.ndarray, data_dim: int) -> np.ndarray:
    """SCN convolution weight -> our (K, Cin, Cout) stack.

    SCN stores submanifold/conv weights as (K, Cin, Cout) already (one GEMM
    matrix per kernel offset, SURVEY.md §2.13); accept (K*Cin, Cout) flat
    variants too.
    """
    if w.ndim == 3:
        return np.ascontiguousarray(w)
    if w.ndim == 2:  # (K*Cin, Cout)
        raise ValueError(
            "flat SCN weight needs K to disambiguate; reshape to (K,Cin,Cout)")
    raise ValueError(f"unexpected SCN weight shape {w.shape}")


def bn_to_flax(prefix: str, sd: Mapping[str, np.ndarray]
               ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


# ---------------------------------------------------------------------------
# tree import/export against this framework's naming
# ---------------------------------------------------------------------------

def export_state_dict(params: Any, batch_stats: Any) -> Dict[str, np.ndarray]:
    """Flatten our flax trees into a torch-style flat state_dict
    (dotted names; conv kernels in torch layout where applicable)."""
    import jax
    out = {}

    def walk(tree, prefix, is_stats):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, Mapping):
                walk(v, name, is_stats)
            else:
                arr = np.asarray(v)
                if not is_stats and arr.ndim >= 3 and k == "kernel":
                    arr = dense_kernel_to_torch(arr)
                if is_stats:
                    name = name.replace(".mean", ".running_mean").replace(
                        ".var", ".running_var")
                out[name] = arr
    walk(params, "", False)
    walk(batch_stats, "", True)
    return out


def import_state_dict(target_params: Any, target_stats: Any,
                      sd: Mapping[str, np.ndarray]):
    """Fill our param/batch_stats trees from a flat state_dict produced by
    export_state_dict (or a converted reference dict). Shapes must match
    after layout conversion; raises KeyError/ValueError otherwise."""
    def walk(tree, prefix, is_stats):
        new = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, Mapping):
                new[k] = walk(v, name, is_stats)
            else:
                lookup = name
                if is_stats:
                    lookup = lookup.replace(".mean", ".running_mean").replace(
                        ".var", ".running_var")
                arr = np.asarray(sd[lookup])
                tgt = np.asarray(v)
                if not is_stats and tgt.ndim >= 3 and k == "kernel":
                    arr = dense_kernel_to_flax(arr)
                if arr.shape != tgt.shape:
                    raise ValueError(
                        f"{name}: shape {arr.shape} != target {tgt.shape}")
                new[k] = arr.astype(tgt.dtype)
        return new
    return (walk(target_params, "", False),
            walk(target_stats, "", True))
