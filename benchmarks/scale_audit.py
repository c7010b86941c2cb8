#!/usr/bin/env python
"""Scale-margin audit past the tuned 512^3 shape (VERDICT r4 missing #4).

The capacity schedule, halo correction budgets, and rebasing sub-windows
are tuned at 512^3 / ~1e5 voxels. `--spatial-size` is the reference's
scaling axis (SURVEY.md §5.7), so this audit builds the FULL tile graph at
a larger shape and reports every drop-and-count margin:

  * graph_overflows / graph_spills / vox_spill   (hard-drop counters)
  * per-level halo corr used vs capacity          (rebasing pushes more
    pairs onto the correction list — ROADMAP known-limits re-audit)
  * per-link child-spec corr used vs capacity

Runs on CPU (graph build only — no model forward), so it never contends
for the chip; pair it with `BENCH_SPATIAL=768 BENCH_VOXELS=250000
python bench.py` for the rate datapoint.

Usage: python benchmarks/scale_audit.py [--spatial 768] [--voxels 250000]
       [--batch 8] [--json-out path]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", type=int, default=768)
    ap.add_argument("--voxels", type=int, default=250_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tile-sizes", default="",
                    help="per-level schedule, e.g. 4,2,2,2,2 "
                         "(config.tile_sizes); empty = global tile_size 4")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    import jax
    # the audit is numeric bookkeeping — keep the chip free for benches.
    # (sitecustomize pre-imports jax with the axon platform; pin BEFORE any
    # backend query initialises it — tests/conftest.py pattern)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.ops.tile_graph import (
        build_tile_graph, graph_overflows, graph_spills)

    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=16,
        uresnet_num_strides=5, spatial_size=args.spatial, data_dim=3,
        reps=2,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(args.voxels * 1.3)))),
        capacity_factor=0.5, min_level_capacity=2048,
        tile_sizes=tuple(int(s) for s in args.tile_sizes.split(","))
        if args.tile_sizes else None,
        batch_size=args.batch, compute_dtype="bfloat16")

    coords = np.zeros((args.batch, cfg.max_voxels, 3), np.int32)
    values = np.zeros((args.batch, cfg.max_voxels), np.float32)
    nv = np.zeros((args.batch,), np.int32)
    for b in range(args.batch):
        c, v, _ = generate_event(0, b, args.spatial, 3,
                                 int(args.voxels * 1.5))
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n

    g = jax.jit(lambda c, v, n: build_tile_graph(c, v, n, cfg))(
        coords, values, nv)

    report = {
        "metric": "scale_margin_audit",
        "spatial_size": args.spatial,
        "voxels_mean": int(nv.mean()),
        "batch": args.batch,
        "graph_overflows": int(np.asarray(graph_overflows(g))),
        "graph_spills": int(np.asarray(graph_spills(g))),
        "vox_spill": int(np.asarray(g.vox_spill).sum()),
        "levels": [],
        "links": [],
    }
    for l, lev in enumerate(g.levels):
        ok = np.asarray(lev.halo.corr_ok)            # (B, P)
        report["levels"].append({
            "level": l,
            "corr_used_max": int(ok.sum(-1).max()),
            "corr_cap": int(ok.shape[-1]),
            "overflow": int(np.asarray(lev.halo.overflow).sum()),
            "live_blocks_max": int(np.asarray(lev.halo.blive).sum(-1).max()),
            "blocks": int(lev.halo.blive.shape[-1]),
        })
    for li, link in enumerate(g.links):
        used = cap = ovf = 0
        for spec in tuple(link.children) + tuple(link.parents):
            ok = np.asarray(spec.corr_ok)
            used = max(used, int(ok.sum(-1).max()))
            cap = int(ok.shape[-1])
            ovf += int(np.asarray(spec.overflow).sum())
        report["links"].append({
            "link": li, "corr_used_max": used, "corr_cap": cap,
            "overflow": ovf + int(np.asarray(link.overflow).sum())})
    line = json.dumps(report)
    print(line, flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line)
    bad = (report["graph_overflows"] or report["graph_spills"]
           or report["vox_spill"])
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
