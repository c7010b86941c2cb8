"""FLOP accounting for the sparse U-ResNet: sparse-ideal vs tile-actual.

Gives every benchmark row a utilization denominator (VERDICT r3 #6): ev/s
alone hides how far execution is from the hardware; achieved TF/s and
%-of-ideal make rounds comparable in MFU terms.

Definitions:
  * sparse-ideal: FLOPs a perfect sparse engine would execute — submanifold
    convs pay 2*Cin*Cout per EXISTING (site, active-neighbor) pair (SCN's
    rulebook pair count, SURVEY.md §2.11-2.13); down/up convs pay
    2*Cin*Cout per fine site; 1x1 shortcuts and the head pay per site.
  * dense27-ideal: like sparse-ideal but charging all 3^d taps per site
    (the usual "sparse FLOPs" quoted for submanifold nets; upper bound of
    sparse-ideal, independent of event geometry).
  * tile-actual: MACs the tiled-dense engine actually issues in its conv
    dots (capacity tiles x dense t^d cells x the row-group Toeplitz band),
    ignoring gather/pack dots — the structured-overcompute denominator.

All counts are per event, computed with numpy from the event's voxel
coordinates (no device work).
"""

from __future__ import annotations

import numpy as np


def _unique_keys(coords: np.ndarray, spatial: int) -> np.ndarray:
    bits = max(1, int(np.ceil(np.log2(max(spatial, 2)))))
    key = coords[:, 0].astype(np.int64)
    for d in range(1, coords.shape[1]):
        key = (key << bits) | coords[:, d]
    return np.unique(key), bits


def level_sites(coords: np.ndarray, spatial: int, n_levels: int):
    """Active-site key arrays per resolution level (stride-2 halving)."""
    out = []
    c = np.asarray(coords, np.int64)
    s = spatial
    for _ in range(n_levels):
        keys, _ = _unique_keys(c, s)
        out.append(keys)
        # rebuild coords from keys to halve exactly once per level
        bits = max(1, int(np.ceil(np.log2(max(s, 2)))))
        dim = coords.shape[1]
        cs = []
        k = keys.copy()
        for _ in range(dim):
            cs.append(k & ((1 << bits) - 1))
            k >>= bits
        c = np.stack(cs[::-1], axis=1) >> 1
        s = max(1, s // 2)
    return out


def pair_count(keys: np.ndarray, spatial: int, dim: int) -> int:
    """Number of (site, active 3^d-neighbor) pairs incl. the center tap."""
    bits = max(1, int(np.ceil(np.log2(max(spatial, 2)))))
    cs = []
    k = keys.copy()
    for _ in range(dim):
        cs.append(k & ((1 << bits) - 1))
        k >>= bits
    coords = np.stack(cs[::-1], axis=1)
    total = 0
    rng = [-1, 0, 1]
    offs = np.stack(np.meshgrid(*([rng] * dim), indexing="ij"),
                    -1).reshape(-1, dim)
    for off in offs:
        nc = coords + off
        ok = np.all((nc >= 0) & (nc < spatial), axis=1)
        nk = nc[:, 0].astype(np.int64)
        for d in range(1, dim):
            nk = (nk << bits) | nc[:, d]
        hit = np.isin(nk[ok], keys, assume_unique=False)
        total += int(hit.sum())
    return total


def model_convs(planes, reps: int):
    """(kind, level, Cin, Cout) for every conv in the U-ResNet forward.
    kind: 'sm' submanifold 3^d, 'down'/'up' stride-2, 'nin' 1x1, 'head'."""
    n = len(planes)
    convs = [("sm", 0, 1, planes[0])]                       # stem
    for l in range(n):
        for r in range(reps):
            convs.append(("sm", l, planes[l], planes[l]))   # conv_a
            convs.append(("sm", l, planes[l], planes[l]))   # conv_b
        if l < n - 1:
            convs.append(("down", l + 1, planes[l], planes[l + 1]))
    for l in reversed(range(n - 1)):
        convs.append(("up", l, planes[l + 1], planes[l]))
        # dec block0 consumes the (up, skip) concat
        convs.append(("nin", l, 2 * planes[l], planes[l]))  # shortcut
        convs.append(("sm", l, 2 * planes[l], planes[l]))   # conv_a
        convs.append(("sm", l, planes[l], planes[l]))       # conv_b
        for r in range(1, reps):
            convs.append(("sm", l, planes[l], planes[l]))
            convs.append(("sm", l, planes[l], planes[l]))
    convs.append(("head", 0, planes[0], None))
    return convs


def event_flops(coords: np.ndarray, spatial: int, planes, reps: int,
                num_class: int) -> dict:
    """Per-event FLOP totals (see module docstring)."""
    dim = coords.shape[1]
    n = len(planes)
    sites = level_sites(coords, spatial, n)
    N = [len(s) for s in sites]
    pairs = [pair_count(sites[l], spatial >> l, dim) for l in range(n)]
    K = 3 ** dim
    ideal = dense27 = 0
    for kind, l, cin, cout in model_convs(planes, reps):
        if kind == "sm":
            ideal += 2 * pairs[l] * cin * cout
            dense27 += 2 * K * N[l] * cin * cout
        elif kind in ("down", "up"):
            # every fine site pairs with exactly one coarse site
            fine = N[l - 1] if kind == "down" else N[l]
            ideal += 2 * fine * cin * cout
            dense27 += 2 * fine * cin * cout
        elif kind == "nin":
            ideal += 2 * N[l] * cin * cout
            dense27 += 2 * N[l] * cin * cout
        else:                                               # head
            ideal += 2 * N[0] * cin * num_class
            dense27 += 2 * N[0] * cin * num_class
    return {"sparse_ideal": int(ideal), "dense27_ideal": int(dense27),
            "sites": N, "pairs": pairs}


def level_tiles(coords: np.ndarray, cfg) -> list:
    """Occupied-tile count per level for one event (numpy, host-side):
    level-l tile key = (voxel coords >> l) >> log2(t_l)."""
    from uresnet_pytorch_tpu.ops.tile_graph import tile_size_at
    c = np.asarray(coords, np.int64)
    out = []
    for l in range(cfg.uresnet_num_strides):
        t = tile_size_at(cfg, l)
        tc = (c >> l) // t
        s = max(2, cfg.level_spatial_size(l) // t)
        bits = max(1, int(np.ceil(np.log2(s))))
        key = tc[:, 0]
        for d in range(1, tc.shape[1]):
            key = (key << bits) | tc[:, d]
        out.append(len(np.unique(key)))
    return out


def tile_actual_flops(cfg, coords: np.ndarray = None) -> int:
    """Conv-dot MACs*2 the tile engine issues per event: per-(o0[,o1])-group
    banded Toeplitz dots — t^(d-1) groups x 3 blocks of (span*Cin x t*Cout)
    per tile row, span = 3*(t+2) for d=3 / (t+2) for d=2 (~2x band
    overcompute vs dense-3^d). Down/up/nin/head are dense GEMMs. One-hot
    gather/pack dots are EXCLUDED (their depth is the data-dependent window
    height, not a conv property).

    Rows charged: with `coords` (one event's voxels), the LIVENESS-GATED
    row count — live tiles rounded up to whole HALO_BLOCK blocks per level
    (ops/halo.py Halo26Spec.blive: the kernels skip capacity-padding blocks
    beyond the sorted live prefix). Without coords, the static capacity
    (the pre-gating upper bound)."""
    from uresnet_pytorch_tpu.ops.halo import HALO_BLOCK
    from uresnet_pytorch_tpu.ops.tile_graph import (tile_capacity_at,
                                                    tile_size_at)
    dim = cfg.data_dim
    planes = cfg.n_planes
    ntl = level_tiles(coords, cfg) if coords is not None else None
    total = 0
    for kind, l, cin, cout in model_convs(planes, cfg.reps):
        if kind == "head":
            cout = cfg.num_class
        lv = min(l, cfg.uresnet_num_strides - 1)
        T = tile_capacity_at(cfg, lv)
        t = tile_size_at(cfg, lv)
        cells = t ** dim
        rows = T
        if ntl is not None and kind == "sm":
            Bk = min(HALO_BLOCK, T)
            while T % Bk:
                Bk //= 2
            rows = min(T, -(-ntl[lv] // Bk) * Bk)
        # down/up/nin/head run as XLA GEMMs over capacity rows (ungated)
        if kind == "sm":
            span = 3 * (t + 2) if dim == 3 else (t + 2)
            total += 2 * rows * t ** (dim - 1) * 3 * span * cin * t * cout
        else:
            total += 2 * rows * cells * cin * cout
    return int(total)


def dense_flops(spatial: int, dim: int, planes, reps: int,
                num_class: int) -> int:
    """FLOPs of the DENSE U-ResNet forward (every site active; border taps
    ignored — <2% at 128^3). Same conv enumeration as the sparse model."""
    K = 3 ** dim
    total = 0
    for kind, l, cin, cout in model_convs(planes, reps):
        vol = max(1, spatial >> l) ** dim
        if kind == "sm":
            total += 2 * K * vol * cin * cout
        elif kind == "down":
            total += 2 * max(1, spatial >> (l - 1)) ** dim * cin * cout
        elif kind == "up":
            total += 2 * vol * cin * cout
        elif kind == "nin":
            total += 2 * vol * cin * cout
        else:
            total += 2 * vol * cin * num_class
    return int(total)


# TPU v5e bf16 peak (jax.devices()[0] here is a single v5 lite chip);
# documented denominator for every pct_peak_* field in results.json.
PEAK_TF_BF16 = 197.0


def utilization(rate_ev_s: float, flops_per_event: int,
                peak_tf: float = PEAK_TF_BF16) -> dict:
    tf = rate_ev_s * flops_per_event / 1e12
    return {"achieved_tf_s": round(tf, 4),
            "pct_of_peak": round(100.0 * tf / peak_tf, 4)}


def annotate_result(row: dict, cfg, blob, train: bool = False) -> dict:
    """Attach FLOP/utilization fields to a benchmark result row (VERDICT r3
    #6: rounds must be judged in utilization, not just ev/s).

    Fields: flops_per_event_* (sparse_ideal / dense27 / tile_actual or
    dense), achieved_tf_s + pct_peak at the sparse-ideal (resp. dense)
    denominator, and pct_peak_tile_actual for the tile engine's issued-MAC
    utilization. Training rows multiply by 3 (fwd + 2x bwd, the standard
    accounting; remat re-execution not credited)."""
    rate = float(row["value"])
    mult = 3.0 if train else 1.0
    if cfg.model_name == "uresnet_dense":
        f = dense_flops(cfg.spatial_size, cfg.data_dim, cfg.n_planes,
                        cfg.reps, cfg.num_class)
        row["flops_per_event_dense"] = f
        u = utilization(rate, f * mult)
        row["achieved_tf_s"] = u["achieved_tf_s"]
        row["pct_peak"] = u["pct_of_peak"]
        return row
    batch = blob["coords"].shape[0]
    ideal = d27 = actual = 0
    for b in range(batch):
        n = int(blob["n_voxels"][b])
        ef = event_flops(blob["coords"][b, :n], cfg.spatial_size,
                         cfg.n_planes, cfg.reps, cfg.num_class)
        ideal += ef["sparse_ideal"]
        d27 += ef["dense27_ideal"]
        actual += tile_actual_flops(cfg, blob["coords"][b, :n])
    ideal, d27, actual = ideal // batch, d27 // batch, actual // batch
    row["flops_per_event_sparse_ideal"] = ideal
    row["flops_per_event_dense27"] = d27
    row["flops_per_event_tile_actual"] = actual
    u = utilization(rate, int(ideal * mult))
    row["achieved_tf_s"] = u["achieved_tf_s"]
    row["pct_peak_sparse_ideal"] = u["pct_of_peak"]
    row["pct_peak_tile_actual"] = utilization(
        rate, int(actual * mult))["pct_of_peak"]
    return row
