"""Reference-name (SCN-convention) checkpoint import.

The reference's sparse model is an scn.Sequential tree, so its torch
state_dict keys are positional chains like ``sparseModel.3.1.0.weight``
(SURVEY.md §2.5, §5.4). Exact indices depend on the builder's nesting, which
cannot be verified while the reference mount is empty (SURVEY.md §0) — so
this importer does NOT hardcode an index map. Instead it exploits two facts
that are stable across nestings:

  1. torch state_dict iteration order == module construction order, and the
     SCN UNet builder constructs depth-recursively: level blocks, down,
     <inner levels>, up, decoder blocks (then the BN+Linear head).
  2. every parameterized SCN module has an unambiguous signature:
     BatchNorm{LeakyReLU} (running stats), SubmanifoldConvolution
     ((3^d, Cin, Cout) weight), Convolution/Deconvolution ((2^d, Cin, Cout)),
     NetworkInNetwork ((Cin, Cout), no bias), the Linear head (bias).

So: classify the reference's parameter groups in order, generate this
framework's slot sequence in the same recursive order from the config, and
match 1:1 with shape checks. Offset enumeration inside conv weights is
assumed raster order (last axis fastest) — matching
ops/sparse_graph.kernel_offsets; RE-VERIFY against a real SCN install when
available (SURVEY.md §7 hard part 5).

``export_reference_style`` emits a synthetic SCN-style state_dict from our
trees (used as the test fixture), so the parity harness is runnable the day
the reference appears.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig


# ---------------------------------------------------------------------------
# slot sequence: this framework's parameters in SCN construction order
# ---------------------------------------------------------------------------

def reference_slot_sequence(cfg: URESNetConfig) -> List[Dict[str, Any]]:
    """Ordered slots [(kind, our tree paths, shapes-free)] following the SCN
    UNet recursive construction order. Kinds: 'smconv', 'bn', 'updown',
    'nin', 'linear'."""
    planes = cfg.n_planes
    K = 3 ** cfg.data_dim
    Kd = 2 ** cfg.data_dim
    slots: List[Dict[str, Any]] = []

    def bn(path):
        slots.append({"kind": "bn", "path": path})

    def smconv(path):
        slots.append({"kind": "smconv", "path": path, "K": K})

    def updown(path):
        slots.append({"kind": "updown", "path": path, "K": Kd})

    def block(name, in_w, out_w):
        if in_w != out_w:
            slots.append({"kind": "nin",
                          "path": (name, "w_shortcut"), "K": 1})
        bn((name, "bn_a", "MaskedBatchNorm_0"))
        smconv((name, "conv_a", "w"))
        bn((name, "bn_b", "MaskedBatchNorm_0"))
        smconv((name, "conv_b", "w"))

    smconv(("stem", "w"))

    def rec(l):
        w = planes[l]
        for r in range(cfg.reps):
            block(f"enc{l}_block{r}", w, w)
        if l < cfg.uresnet_num_strides - 1:
            bn((f"down{l}_bnact", "MaskedBatchNorm_0"))
            updown((f"down{l}_w",))
            rec(l + 1)
            bn((f"up{l}_bnact", "MaskedBatchNorm_0"))
            updown((f"up{l}_w",))
            for r in range(cfg.reps):
                block(f"dec{l}_block{r}", 2 * w if r == 0 else w, w)

    rec(0)
    bn(("head_bnact", "MaskedBatchNorm_0"))
    slots.append({"kind": "linear", "path": ("head_w",),
                  "bias_path": ("head_b",)})
    return slots


# ---------------------------------------------------------------------------
# classify the reference state_dict's parameter groups, in order
# ---------------------------------------------------------------------------

def classify_groups(sd: Mapping[str, np.ndarray], data_dim: int
                    ) -> List[Dict[str, Any]]:
    """Group flat dotted keys by module prefix (insertion order) and
    classify each group by its parameter signature."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        prefix, leaf = k.rsplit(".", 1) if "." in k else ("", k)
        groups.setdefault(prefix, {})[leaf] = np.asarray(v)
    out = []
    K3, K2 = 3 ** data_dim, 2 ** data_dim
    for prefix, g in groups.items():
        ent: Dict[str, Any] = {"prefix": prefix, "arrays": g}
        if "running_mean" in g:
            ent["kind"] = "bn"
        elif "weight" in g and g["weight"].ndim == 3:
            k = g["weight"].shape[0]
            if k == K3:
                ent["kind"] = "smconv"
            elif k == K2:
                ent["kind"] = "updown"
            elif k == 1:
                ent["kind"] = "nin"
            else:
                raise ValueError(
                    f"{prefix}: unexpected offset count {k} (dim={data_dim})")
        elif "weight" in g and g["weight"].ndim == 2:
            ent["kind"] = "linear" if "bias" in g else "nin"
        else:
            raise ValueError(f"{prefix}: unrecognized group {list(g)}")
        out.append(ent)
    return out


# ---------------------------------------------------------------------------
# import / synthetic export
# ---------------------------------------------------------------------------

def _set_path(tree: Dict, path: Tuple[str, ...], leaf_updates: Dict[str, np.ndarray]):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    last = path[-1]
    if isinstance(leaf_updates, dict):
        node = node.setdefault(last, {})
        node.update(leaf_updates)
    else:
        node[last] = leaf_updates


def import_reference_state_dict(cfg: URESNetConfig, params: Any,
                                batch_stats: Any,
                                sd: Mapping[str, np.ndarray]
                                ) -> Tuple[Dict, Dict]:
    """Map an SCN-convention reference state_dict onto copies of our
    param/batch_stats trees. Raises ValueError on any kind/shape mismatch
    (fail loud — a silent misalignment would fake parity)."""
    import jax
    slots = reference_slot_sequence(cfg)
    groups = classify_groups(sd, cfg.data_dim)
    if len(slots) != len(groups):
        kinds_s = [s["kind"] for s in slots]
        kinds_g = [g["kind"] for g in groups]
        raise ValueError(
            f"slot/group count mismatch: model expects {len(slots)} "
            f"parameterized modules {kinds_s}, checkpoint has "
            f"{len(groups)} {kinds_g}")
    new_params = jax.tree_util.tree_map(np.asarray, params)
    new_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def check(tgt, arr, what):
        if tuple(tgt.shape) != tuple(arr.shape):
            raise ValueError(f"{what}: checkpoint {arr.shape} != model "
                             f"{tgt.shape}")
        return arr.astype(tgt.dtype)

    def get_path(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    for slot, grp in zip(slots, groups):
        if slot["kind"] != grp["kind"]:
            raise ValueError(
                f"order mismatch at {grp['prefix']!r}: checkpoint has "
                f"{grp['kind']}, model expects {slot['kind']} at "
                f"{'/'.join(slot['path'])}")
        g = grp["arrays"]
        if slot["kind"] == "bn":
            node_p = get_path(new_params, slot["path"])
            node_s = get_path(new_stats, slot["path"])
            node_p["scale"] = check(node_p["scale"], g["weight"], grp["prefix"])
            node_p["bias"] = check(node_p["bias"], g["bias"], grp["prefix"])
            node_s["mean"] = check(node_s["mean"], g["running_mean"],
                                   grp["prefix"])
            node_s["var"] = check(node_s["var"], g["running_var"],
                                  grp["prefix"])
        elif slot["kind"] in ("smconv", "updown", "nin"):
            w = g["weight"]
            if slot["kind"] == "nin" and w.ndim == 2:
                w = w[None]                     # (Cin,Cout) -> (1,Cin,Cout)
            parent = get_path(new_params, slot["path"][:-1]) \
                if len(slot["path"]) > 1 else new_params
            leaf = slot["path"][-1]
            parent[leaf] = check(parent[leaf], w, grp["prefix"])
        else:  # linear head: torch (out, in) -> ours (in, out)
            parent = new_params
            for p in slot["path"][:-1]:
                parent = parent[p]
            leaf = slot["path"][-1]
            parent[leaf] = check(parent[leaf], g["weight"].T, grp["prefix"])
            bparent = new_params
            for p in slot["bias_path"][:-1]:
                bparent = bparent[p]
            bparent[slot["bias_path"][-1]] = check(
                bparent[slot["bias_path"][-1]], g["bias"], grp["prefix"])
    return new_params, new_stats


def export_reference_style(cfg: URESNetConfig, params: Any, batch_stats: Any
                           ) -> Dict[str, np.ndarray]:
    """Synthetic SCN-style state_dict from our trees (positional
    ``sparseModel.N...`` names in construction order) — the test fixture for
    import_reference_state_dict and a diffing aid once the real reference
    appears."""
    slots = reference_slot_sequence(cfg)
    sd: Dict[str, np.ndarray] = {}

    def get_path(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    for i, slot in enumerate(slots):
        prefix = f"sparseModel.{i}"
        if slot["kind"] == "bn":
            sd[f"{prefix}.weight"] = get_path(params, slot["path"] + ("scale",))
            sd[f"{prefix}.bias"] = get_path(params, slot["path"] + ("bias",))
            sd[f"{prefix}.running_mean"] = get_path(
                batch_stats, slot["path"] + ("mean",))
            sd[f"{prefix}.running_var"] = get_path(
                batch_stats, slot["path"] + ("var",))
            sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)
        elif slot["kind"] == "nin":
            sd[f"{prefix}.weight"] = get_path(params, slot["path"])[0]
        elif slot["kind"] in ("smconv", "updown"):
            sd[f"{prefix}.weight"] = get_path(params, slot["path"])
        else:
            sd["linear.weight"] = get_path(params, slot["path"]).T
            sd["linear.bias"] = get_path(params, slot["bias_path"])
    return sd
