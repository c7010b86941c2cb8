#!/usr/bin/env python
"""Config 8: full production-path inference rate (results.json row 8).

Exercises the USER's surface end-to-end — bin/uresnet.py CLI parsing, the
h5 loader threads, TrainVal restore from a real checkpoint, per-iteration
on-device metric accumulation, CSV logging — none of which the forward
bench (config 3) touches. Rate comes from inference_log.csv's steady-state
column (main_funcs.py excludes the first, compile-bearing batch).

Usage: python benchmarks/cli_inference_bench.py \
           [--ckpt runs/conv_r5/snap-3000.ckpt] [--events 48] [--batch 8]
Writes/merges results.json config 8.
"""

import argparse
import csv
import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/conv_r5/snap-3000.ckpt")
    ap.add_argument("--events", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--voxels", type=int, default=100_000)
    ap.add_argument("--tile-sizes", default="4,2,2,2,2",
                    help="per-level tile schedule passed to the CLI "
                         "(measured-best default; empty = global t=4)")
    args = ap.parse_args()

    from uresnet_pytorch_tpu.iotools.h5_io import generate_h5_file
    work = tempfile.mkdtemp(prefix="cli8_")
    h5 = os.path.join(work, "ev512.h5")
    generate_h5_file(h5, n_events=args.events, spatial_size=512, data_dim=3,
                     seed=21, mean_voxels=int(args.voxels * 1.5),
                     keys=("data", "label"))
    logd = os.path.join(work, "logs")
    cmd = [sys.executable, os.path.join(ROOT, "bin", "uresnet.py"),
           "inference", "-io", "h5", "-if", h5,
           "-bs", str(args.batch), "-it", str(args.events // args.batch),
           "-mn", "uresnet_sparse", "-ss", "512", "-uns", "5", "-uf", "16",
           "--max-voxels", "131072", "--capacity-factor", "0.5",
           "-mp", args.ckpt, "-ld", logd]
    if args.tile_sizes:
        cmd += ["--tile-sizes", args.tile_sizes]
    subprocess.run(cmd, check=True)

    with open(os.path.join(logd, "inference_log.csv")) as f:
        rows = list(csv.DictReader(f))
    r = rows[-1]
    row = {
        "metric": "e2e_cli_inference_512c_events_per_sec",
        "value": round(float(r["events_per_sec"]), 3), "config": 8,
        "unit": "events/s", "accuracy": round(float(r["accuracy"]), 4),
        "note": (f"full production path (bin/uresnet.py inference, h5 "
                 f"loader, on-device metric accumulation) on "
                 f"{args.events} synthetic 512^3/1e5-voxel events at "
                 f"batch {args.batch}, steady-state rate (excludes the "
                 f"first batch's compile); checkpoint = {args.ckpt} "
                 f"(256^3-trained, running fully-convolutionally at "
                 f"512^3)."),
    }
    out = os.path.join(ROOT, "benchmarks", "results.json")
    merged = {e.get("config"): e for e in json.load(open(out))}
    merged[8] = row
    json.dump([merged[k] for k in sorted(merged)], open(out, "w"), indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
